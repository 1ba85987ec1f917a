"""Parallelism subsystems: mesh construction, SPMD sharded rendering,
multi-host orchestration, and elastic checkpoint/resume.

Maps the reference's four parallelism layers (SURVEY.md §2.4) onto the TPU:
tile pool -> pixel-axis sharding; work stealing -> static SPMD partition;
staged pipeline -> the wavefront loop in rt.trace; HTTP distribution ->
jax.distributed + collectives.
"""

from .mesh import make_mesh, single_device_mesh
from .shard import (render_band_sharded, render_linear_sharded,
                    render_wavefront_sharded)
from .checkpoint import (Accumulator, ContextShutdown, GracefulShutdown,
                         ResourceManager, SignalHandler,
                         render_with_checkpoints)
from .distributed import (DistributedRenderer, NodeStatus, heartbeat,
                          initialize, rerender_missing_rows)

__all__ = [
    "make_mesh", "single_device_mesh",
    "render_band_sharded", "render_linear_sharded",
    "render_wavefront_sharded",
    "Accumulator", "GracefulShutdown", "render_with_checkpoints",
    "ResourceManager", "ContextShutdown", "SignalHandler",
    "DistributedRenderer", "NodeStatus", "heartbeat", "initialize",
    "rerender_missing_rows",
]
