"""Worker process for the REAL multi-process distributed test.

Each invocation is one host of a 2-process jax.distributed CPU cluster
(the working execution of what the reference's RemoteRenderServer only
stubbed, distributed_renderer.go:219-302). Spawned by
tests/test_distributed_multiproc.py (and runnable by hand):

    python tools/dist_worker.py <coordinator_addr> <num_procs> <proc_id> \
        <out_npz>

The worker joins the cluster through parallel.distributed.initialize,
collects NodeStatus, proves fabric liveness with heartbeat(), renders a
small scene through DistributedRenderer (pixel-sharded over the global
mesh, collectives over the wire), runs one sharded differentiable train
step, and dumps everything to <out_npz> for the parent to verify.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    coord, n_proc, proc_id, out_path = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])

    import jax
    # Order matters: platform + collectives config, then
    # jax.distributed.initialize, all BEFORE any op touches the backend.
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    from raytrace_tpu.parallel import distributed as dist_mod
    dist_mod.initialize(coordinator_address=coord, num_processes=n_proc,
                        process_id=proc_id)

    import numpy as np
    import jax.numpy as jnp

    import raytrace_tpu as rt
    from raytrace_tpu import trace as trace_mod
    from raytrace_tpu.parallel import mesh as mesh_mod

    status = dist_mod.NodeStatus.collect()
    assert status.process_count == n_proc, status
    hb = dist_mod.heartbeat()

    scene_dict = {
        "camera": {"position": [0, 0, 8], "lookAt": [0, 0, 0],
                   "up": [0, 1, 0], "fov": 45, "aspectRatio": 1.333},
        "objects": [
            {"type": "sphere", "position": [0, 0, 0], "radius": 1.5,
             "material": {"type": "lambertian", "albedo": [0.8, 0.3, 0.3]}},
            {"type": "sphere", "position": [2, 0.5, -1], "radius": 0.8,
             "material": {"type": "metal", "albedo": [0.9, 0.9, 0.9],
                          "roughness": 0.1, "metallic": 0.9}},
        ],
        "lights": [{"type": "point", "position": [5, 5, 5],
                    "color": [1, 1, 1], "intensity": 2.0}],
    }
    scene, _ = rt.scene_from_dict(scene_dict)

    W, H, SPP = 32, 24, 2
    cfg = trace_mod.TraceConfig(max_depth=3, shadow_samples=2)

    # Pixel-sharded render over the GLOBAL device mesh (2 procs x local
    # devices); the out_specs all-gather is real cross-process traffic.
    dr = dist_mod.DistributedRenderer(mesh=mesh_mod.make_mesh(sp=1))
    img = dr.render_linear(scene, W, H, samples=SPP, cfg=cfg)

    # One sharded differentiable step: grad of the sharded image's sum
    # w.r.t. a light-intensity scale, psum'd implicitly by the gather.
    from raytrace_tpu.parallel import shard as shard_mod

    import dataclasses as dc
    cfg_scan = dc.replace(cfg, loop="scan")  # reverse-diff needs lax.scan

    def loss(scale):
        lights = dc.replace(scene.lights,
                            intensity=scene.lights.intensity * scale)
        s2 = dc.replace(scene, lights=lights)
        band = shard_mod.render_band_sharded(
            s2, jnp.int32(0), width=W, height=H, band_h=H, samples=SPP,
            cfg=cfg_scan, mesh=dr.mesh)
        return jnp.sum(band)

    g = jax.grad(loss)(jnp.float32(1.0))
    # The grad of a psum'd scalar is fully replicated: every host holds
    # the same value and can read it directly.
    g_np = np.asarray([float(g)], np.float32)

    img_np = np.asarray(img)

    if proc_id == 0:
        np.savez(out_path, img=img_np, hb=np.asarray(hb),
                 process_count=status.process_count,
                 global_devices=status.global_devices,
                 grad=g_np.reshape(-1)[:1])
    # Both processes assert basic health so a failure in either fails
    # the subprocess (parent checks return codes).
    assert int(status.global_devices) == n_proc * jax.local_device_count()
    assert np.allclose(np.asarray(hb), 1.0), hb
    assert np.isfinite(img_np).all() and img_np.max() > 0
    return 0


if __name__ == "__main__":
    sys.exit(main())
