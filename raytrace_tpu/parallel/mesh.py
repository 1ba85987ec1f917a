"""Device-mesh construction: the TPU-native form of the worker pool.

The reference's parallelism inventory (SURVEY.md §2.4) maps here:
  * P1 tile data parallelism (32x32-pixel tiles over a goroutine channel,
    renderer.go:76-99,398-436) -> SPMD sharding of the pixel axis over the
    ``px`` mesh axis; a "worker" is a mesh coordinate, the tile queue is the
    static SPMD partition.
  * P2 work stealing (worker_pool.go:59-64,168-184) -> unnecessary under a
    static partition; load balance comes from oversharding the sample axis.
  * P4 multi-node HTTP fan-out (distributed_renderer.go:76-106,153-196) ->
    multi-host meshes: `jax.distributed.initialize` + collectives over
    ICI/DCN replace the JSON POST transport entirely.

Mesh axes:
  ``px``  pixel-space sharding (the context-parallel analog; each device
          owns a contiguous block of pixels),
  ``sp``  sample-space sharding (the data-parallel-with-reduction analog;
          partial per-pixel sample sums are psum'ed over this axis).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(devices: Optional[Sequence] = None,
              px: Optional[int] = None, sp: int = 1,
              axis_names=("px", "sp")) -> Mesh:
    """Build a (px, sp) mesh over the given (default: all local) devices.

    ``px * sp`` must equal the device count; by default all devices go to
    the pixel axis (pure tile data parallelism, the live reference
    strategy P1).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if px is None:
        if n % sp != 0:
            raise ValueError(f"device count {n} not divisible by sp={sp}")
        px = n // sp
    if px * sp != n:
        raise ValueError(f"px*sp = {px}*{sp} != {n} devices")
    arr = np.asarray(devices).reshape(px, sp)
    return Mesh(arr, axis_names)


def single_device_mesh() -> Mesh:
    """Degenerate 1x1 mesh (one chip): same code path, no collectives."""
    return make_mesh(jax.devices()[:1], px=1, sp=1)
