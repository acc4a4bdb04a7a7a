"""mitsuba_tpu — a TPU-native differentiable path tracer.

A from-scratch JAX/XLA/Pallas re-design of the rendering capabilities of
Mitsuba 0.6 (reference: Yujie-G/mitsuba0.6): compiled array scenes, threaded
BVH, wavefront Monte Carlo integrators, masked-dispatch BSDFs, SPMD sharding
over TPU meshes, and differentiable rendering (which the reference lacks).
"""
__version__ = "0.1.0"

import os as _os

if _os.environ.get("MTPU_COMPILE_CACHE", "1") != "0":
    # persistent XLA compilation cache: kernel compiles here go through a
    # remote service whose latency dominates iteration time
    try:
        import jax as _jax

        _cache = _os.path.expanduser("~/.cache/mitsuba_tpu_xla")
        _os.makedirs(_cache, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass
