"""raytrace_tpu: a TPU-native differentiable path tracer.

A ground-up JAX/Pallas rebuild of the capabilities of the Go reference
ray tracer (JoshElkind/concurrent-raytracer-go): the 32x32-tile goroutine
pipeline becomes an SPMD wavefront over a device mesh; the recursive
depth-50 shading loop becomes a bounded masked loop; materials become a
struct-of-arrays table with vectorized scatter; distribution is JAX
collectives over ICI/DCN instead of HTTP/JSON.

Quick start:
    import raytrace_tpu as rt
    scene, cfg = rt.load_scene("scene.json")
    img = rt.Renderer().render(scene, 800, 600)
"""

import os as _os

# Honor RT_PLATFORM BEFORE any submodule import: module-level jnp
# constants (e.g. intersect.BIG) initialize the default backend during
# the package import, so `python -m raytrace_tpu.cli`'s own RT_PLATFORM
# handling (which runs after this __init__) is too late - the axon TPU
# plugin would already be live. Plain JAX_PLATFORMS is force-overridden
# by sitecustomize; this config update is not.
if _os.environ.get("RT_PLATFORM"):
    import jax as _jax_rt

    _jax_rt.config.update("jax_platforms", _os.environ["RT_PLATFORM"])

# Persistent compilation cache: megakernel compiles cost minutes on TPU
# (one-time per scene shape); the cache makes fresh-process cold starts
# ~6s instead of ~190s. Repo-local by default; RT_CACHE_DIR overrides,
# RT_NO_CACHE=1 disables. TPU-intent processes only: XLA:CPU AOT entries
# bake in host ISA features and can SIGILL when loaded on a different
# machine, so CPU runs (tests, virtual meshes) skip the persistent cache.
_cpu_intent = (
    _os.environ.get("RT_PLATFORM", "").lower() == "cpu"
    or "cpu" in _os.environ.get("JAX_PLATFORMS", "").lower()
    or "xla_force_host_platform_device_count"
    in _os.environ.get("XLA_FLAGS", "")
)
if not _os.environ.get("RT_NO_CACHE") and not _cpu_intent:
    import jax as _jax

    _cache_dir = _os.environ.get(
        "RT_CACHE_DIR",
        _os.path.join(_os.path.dirname(_os.path.dirname(
            _os.path.abspath(__file__))), ".jax_cache"))
    try:
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs",
                           0.5)
    except Exception:
        pass  # older jax without these options

from .scene import load as load_scene, from_dict as scene_from_dict, Scene
from .renderer import Renderer, render_band
from .trace import TraceConfig, trace as trace_rays
from .adaptive import render_adaptive
from .aov import render_aovs
from .denoising import denoise

__version__ = "0.1.0"

__all__ = [
    "load_scene", "scene_from_dict", "Scene", "Renderer", "render_band",
    "TraceConfig", "trace_rays", "render_adaptive", "render_aovs",
    "denoise",
]
