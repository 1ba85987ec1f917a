"""Test configuration: force CPU with a virtual 8-device mesh.

Multi-chip TPU hardware is not available in CI; sharding tests run on a
virtual CPU mesh (the standard JAX recipe for testing pjit/shard_map
without a pod).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The environment's sitecustomize registers a TPU plugin and force-sets
# jax_platforms; override it back to CPU for the test suite.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(autouse=True)
def _bound_memory_maps():
    """Prevent vm.max_map_count exhaustion over the full suite.

    Every XLA:CPU executable holds JIT'd code in its own mmaps; by
    ~245 tests the process crosses the kernel's default 65,530-map
    limit and LLVM segfaults inside backend_compile (observed at the
    same test deterministically, passing in isolation). Dropping the
    jit caches un-maps retired executables; gate on the actual map
    count so the (recompile-cost) clear only fires a few times."""
    yield
    try:
        with open("/proc/self/maps") as f:
            n = sum(1 for _ in f)
    except OSError:
        return
    if n > 40_000:
        jax.clear_caches()


@pytest.fixture(scope="session")
def sphere_scene_dict():
    """The sphere_reflections_light.json scene, camera moved to +Z so the
    reference's fixed -Z viewport camera (renderer.go:377-390) actually sees
    the geometry (see PARITY.md: the shipped camera position renders black
    under the current reference code)."""
    return {
        "camera": {"position": [0, 0, 8], "lookAt": [0, 0, 0],
                   "up": [0, 1, 0], "fov": 60, "aspectRatio": 1.33},
        "objects": [
            {"type": "sphere", "position": [0, 0, 0], "radius": 1.0,
             "material": {"type": "metal", "color": [0.8, 0.8, 0.9],
                          "roughness": 0.1}},
            {"type": "sphere", "position": [2, 0, 0], "radius": 0.5,
             "material": {"type": "metal", "refractionIndex": 1.5}},
            {"type": "sphere", "position": [-2, 0, 0], "radius": 0.7,
             "material": {"type": "glass", "color": [0.8, 0.2, 0.2]}},
            {"type": "sphere", "position": [0, 2, 0], "radius": 0.3,
             "material": {"type": "metal", "color": [0.9, 0.9, 0.1],
                          "roughness": 0.3}},
            {"type": "sphere", "position": [0, -2, 0], "radius": 0.4,
             "material": {"type": "glass", "color": [0.2, 0.8, 0.2]}},
        ],
        "lights": [
            {"type": "point", "position": [5, 5, 5], "color": [1, 1, 1],
             "intensity": 1.0},
            {"type": "point", "position": [-3, 3, 3], "color": [0.8, 0.8, 1],
             "intensity": 0.5},
        ],
    }


@pytest.fixture(scope="session")
def simple_scene_dict():
    """One lambertian sphere + one light: cheap analytic workhorse."""
    return {
        "camera": {"position": [0, 0, 3], "lookAt": [0, 0, 0],
                   "up": [0, 1, 0], "fov": 60, "aspectRatio": 1.0},
        "objects": [
            {"type": "sphere", "position": [0, 0, 0], "radius": 1.0,
             "material": {"type": "lambertian", "color": [0.5, 0.5, 0.5]}},
        ],
        "lights": [
            {"type": "point", "position": [0, 5, 5], "color": [1, 1, 1],
             "intensity": 2.0},
        ],
    }
