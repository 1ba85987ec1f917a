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

from .scene import load as load_scene, from_dict as scene_from_dict, Scene
from .renderer import Renderer, render_band
from .trace import TraceConfig, trace as trace_rays

__version__ = "0.1.0"

__all__ = [
    "load_scene", "scene_from_dict", "Scene", "Renderer", "render_band",
    "TraceConfig", "trace_rays",
]
