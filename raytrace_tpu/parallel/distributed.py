"""Multi-host orchestration: the working form of the HTTP distributed stub.

Reference (internal/distributed/distributed_renderer.go) fanned RenderChunk
JSON over HTTP POST (:76-106), picked min-load nodes (:108-123), and its
server returned empty pixels after a 100ms sleep (:258-283). Here the
transport is the TPU fabric itself:

  * node discovery / join  -> ``initialize()`` = jax.distributed.initialize
    (coordinator address instead of a node URL list);
  * RenderChunk POST       -> sharded SPMD render (parallel/shard.py); the
    "chunk" is the static partition of the pixel axis;
  * /status health polling -> ``node_status()`` from jax process/device
    introspection + ``heartbeat()`` (an all-gather of process ids proves
    fabric liveness, the working analog of :285-302's hardcoded NodeInfo);
  * LoadBalancer           -> unnecessary: a static SPMD partition has no
    load imbalance to balance (document per SURVEY.md §2.4 P2/P4); dynamic
    skew is absorbed by oversharding the sample axis;
  * failedJobs counter     -> elastic resume via the sample-accumulator
    checkpoint (parallel/checkpoint.py): a lost host re-renders only its
    missing samples.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Optional

import numpy as np
import jax

from . import mesh as mesh_mod
from . import shard as shard_mod


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Join (or form) a multi-host JAX cluster.

    On a real pod slice the arguments come from the scheduler environment
    and may all be None (auto-detection). Safe to call single-host: with no
    coordinator configured this is a no-op.

    The no-op decision reads ONLY environment variables: jax.distributed
    must run before any other jax.* API touches the backend, so probing
    jax.process_count() here would poison the auto-detection path.
    """
    _cluster_env = ("COORDINATOR_ADDRESS", "JAX_COORDINATOR_ADDRESS",
                    "MEGASCALE_COORDINATOR_ADDRESS", "TPU_WORKER_HOSTNAMES",
                    "SLURM_JOB_NUM_NODES", "OMPI_MCA_orte_hnp_uri")
    if (coordinator_address is None and num_processes is None
            and process_id is None
            and not any(os.environ.get(k) for k in _cluster_env)):
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


@dataclasses.dataclass
class NodeStatus:
    """Working /status payload (vs. distributed_renderer.go:285-302)."""

    process_id: int
    process_count: int
    local_devices: int
    global_devices: int
    platform: str
    available: bool
    timestamp: float

    @classmethod
    def collect(cls) -> "NodeStatus":
        devs = jax.devices()
        return cls(process_id=jax.process_index(),
                   process_count=jax.process_count(),
                   local_devices=jax.local_device_count(),
                   global_devices=len(devs),
                   platform=devs[0].platform if devs else "none",
                   available=bool(devs),
                   timestamp=time.time())


def heartbeat() -> np.ndarray:
    """Prove fabric liveness: psum a one-hot of this process's id.

    Returns the per-process participation vector; a missing host shows as a
    zero (in practice the collective raises - either way the failure is
    *detected*, unlike the reference's hardcoded-healthy status).
    """
    n = jax.process_count()
    onehot = np.zeros((max(n, 1),), np.float32)
    onehot[jax.process_index()] = 1.0
    if n == 1:
        return onehot
    from jax.sharding import PartitionSpec as P
    m = mesh_mod.make_mesh(px=len(jax.devices()), sp=1)
    out = jax.shard_map(lambda x: jax.lax.psum(x, "px"), mesh=m,
                        in_specs=P(), out_specs=P())(onehot)
    # Each process contributed local_device_count copies; normalize.
    return np.asarray(out) / jax.local_device_count()


def rerender_missing_rows(renderer, scene, partial_img: np.ndarray,
                          missing_rows, width: int, height: int,
                          cfg=None):
    """Elastic recovery: re-render only the rows a failed worker lost.

    The working replacement for the reference's `failedJobs` counter
    (distributed_renderer.go:93-104, which counted failures and did
    nothing): because every pixel's samples are a pure function of
    (pixel, sample) counters, any subset of rows can be recomputed
    IDENTICALLY by any surviving host - re-render the missing band(s) and
    splice. Returns the completed image.
    """
    import jax.numpy as jnp
    from .. import renderer as renderer_mod

    out = np.array(partial_img, copy=True)
    rows = sorted(set(int(r) for r in missing_rows))
    # group into contiguous bands
    bands = []
    for r in rows:
        if bands and r == bands[-1][1]:
            bands[-1][1] = r + 1
        else:
            bands.append([r, r + 1])
    if cfg is None:
        cfg = renderer.trace_config()
    for y0, y1 in bands:
        band = renderer_mod.render_band(
            scene, jnp.int32(y0), width=width, height=height,
            band_h=y1 - y0, samples=renderer.samples, cfg=cfg,
            go_camera=renderer.go_camera)
        out[y0:y1] = np.asarray(band)
    return out


class DistributedRenderer:
    """Drop-in multi-host render driver (distributed_renderer.go:14-27).

    Single-host it degrades to the plain sharded path; multi-host every
    process runs the same code (SPMD) and each host materializes the image
    rows its devices own; `render` gathers the full image on every host.
    """

    def __init__(self, mesh=None, sp: int = 1):
        self.mesh = mesh or mesh_mod.make_mesh(sp=sp)
        self.completed_jobs = 0
        self.failed_jobs = 0

    def render_linear(self, scene, width: int, height: int, *, samples: int,
                      cfg, go_camera: bool = True) -> np.ndarray:
        try:
            out = shard_mod.render_linear_sharded(
                scene, width, height, samples=samples, cfg=cfg,
                mesh=self.mesh, go_camera=go_camera)
            self.completed_jobs += 1
            return out
        except Exception:
            self.failed_jobs += 1
            raise

    def get_stats(self):
        """Parity with GetStats (distributed_renderer.go:198-217)."""
        total = self.completed_jobs + self.failed_jobs
        return {
            "total_nodes": jax.process_count(),
            "available_nodes": jax.process_count(),
            "completed_jobs": self.completed_jobs,
            "failed_jobs": self.failed_jobs,
            "success_rate": (self.completed_jobs / total) if total else 1.0,
            "devices": len(self.mesh.devices.ravel()),
        }
