"""Test configuration: force a virtual 8-device CPU platform BEFORE jax
imports so sharding tests exercise a multi-chip mesh without TPU hardware
(SURVEY §4: multi-host determinism testing via virtual devices)."""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# the axon harness overrides JAX_PLATFORMS during jax init; config.update
# after import is authoritative (see .claude/skills/verify/SKILL.md)
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def cornell():
    """Shared Cornell box scene (the standing fixture, like bunny.ply in
    the reference's kdbench)."""
    from mitsuba_tpu.render.scene import SceneBuilder
    from mitsuba_tpu.render import shapes

    b = SceneBuilder()
    shapes.cornell_box(b)
    scene, static = b.build()
    return scene, static


@pytest.fixture(scope="session")
def cornell_cam():
    from mitsuba_tpu.core.transform import Transform
    return Transform.look_at([0.5, 0.5, -1.39], [0.5, 0.5, 0.5], [0, 1, 0])
