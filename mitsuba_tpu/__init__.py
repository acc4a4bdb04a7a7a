"""mitsuba_tpu — a TPU-native differentiable path tracer.

A from-scratch JAX/XLA/Pallas re-design of the rendering capabilities of
Mitsuba 0.6 (reference: Yujie-G/mitsuba0.6): compiled array scenes, threaded
BVH, wavefront Monte Carlo integrators, masked-dispatch BSDFs, SPMD sharding
over TPU meshes, and differentiable rendering (which the reference lacks).
"""
__version__ = "0.1.0"
