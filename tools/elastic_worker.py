"""Band worker for the cross-process elastic-recovery test.

Two independent worker processes each own a row band of one frame and
append per-chunk heartbeats (a work-queue model — the failure-tolerant
counterpart of the reference's distributed renderer, whose failedJobs
counter only ever counted, distributed_renderer.go:93-104). Roles:

  victim    renders its band in row chunks, heartbeating after each,
            then DIES (os._exit) partway through — a real mid-render
            crash with a real partial result on disk;
  survivor  renders its own band, then watches the victim's heartbeat;
            when it goes stale below completion, computes the missing
            rows from the victim's progress, re-renders them with
            parallel.distributed.rerender_missing_rows, splices the
            victim's completed rows + its own band, and writes the
            recovered full frame.

Spawned by tests/test_distributed_multiproc.py::test_worker_death_recovery:

    python tools/elastic_worker.py <role> <y0> <band_h> <workdir>
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

W, H, SPP = 32, 24, 2
CHUNK = 3          # rows per heartbeat
DIE_AFTER = 2      # victim dies after this many chunks
STALE_S = 4.0      # heartbeat staleness threshold

SCENE_DICT = {
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


def _hb_path(d, role):
    return os.path.join(d, f"hb_{role}.json")


def _part_path(d, role):
    return os.path.join(d, f"part_{role}.npz")


def _beat(d, role, rows_done, y0, band_h):
    tmp = _hb_path(d, role) + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"rows_done": rows_done, "y0": y0, "band_h": band_h,
                   "t": time.time()}, f)
    os.replace(tmp, _hb_path(d, role))


def main() -> int:
    role, y0, band_h, workdir = (sys.argv[1], int(sys.argv[2]),
                                 int(sys.argv[3]), sys.argv[4])
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import jax.numpy as jnp
    import raytrace_tpu as rt
    from raytrace_tpu import renderer as renderer_mod
    from raytrace_tpu import trace as trace_mod

    scene, _ = rt.scene_from_dict(SCENE_DICT)
    cfg = trace_mod.TraceConfig(max_depth=3, shadow_samples=2)

    band = np.zeros((band_h, W, 3), np.float32)
    done = 0
    _beat(workdir, role, 0, y0, band_h)
    chunks = 0
    while done < band_h:
        h = min(CHUNK, band_h - done)
        rows = renderer_mod.render_band(
            scene, jnp.int32(y0 + done), width=W, height=H, band_h=h,
            samples=SPP, cfg=cfg)
        band[done:done + h] = np.asarray(rows)
        done += h
        chunks += 1
        # persist progress BEFORE the heartbeat that advertises it
        tmp = _part_path(workdir, role)[:-4] + ".tmp.npz"
        np.savez(tmp, band=band, rows_done=done, y0=y0)
        os.replace(tmp, _part_path(workdir, role))
        _beat(workdir, role, done, y0, band_h)
        if role == "victim" and chunks >= DIE_AFTER:
            os._exit(3)  # simulated crash: no cleanup, no final write

    if role != "survivor":
        return 0

    # ---- survivor: watch the victim, recover its missing rows ----------
    vic_hb = _hb_path(workdir, "victim")
    deadline = time.time() + 120.0
    while True:
        if time.time() > deadline:
            raise RuntimeError("victim never completed nor went stale")
        try:
            with open(vic_hb) as f:
                hb = json.load(f)
        except (FileNotFoundError, json.JSONDecodeError):
            time.sleep(0.2)
            continue
        if hb["rows_done"] >= hb["band_h"]:
            raise RuntimeError("victim finished; nothing to recover")
        if time.time() - hb["t"] > STALE_S:
            break  # DEAD: heartbeat stale below completion
        time.sleep(0.2)

    vy0, vdone, vband_h = hb["y0"], hb["rows_done"], hb["band_h"]
    missing = list(range(vy0 + vdone, vy0 + vband_h))
    vic = np.load(_part_path(workdir, "victim"))
    assert int(vic["rows_done"]) == vdone

    full = np.zeros((H, W, 3), np.float32)
    full[y0:y0 + band_h] = band                      # own rows
    full[vy0:vy0 + vdone] = vic["band"][:vdone]      # victim's completed rows

    from raytrace_tpu.parallel import distributed as dist_mod
    r = rt.Renderer()
    r.samples, r.max_depth = SPP, 3
    recovered = dist_mod.rerender_missing_rows(r, scene, full, missing,
                                               W, H, cfg=cfg)

    np.savez(os.path.join(workdir, "recovered.npz"), img=recovered,
             missing=np.asarray(missing, np.int32),
             victim_rows_done=vdone)
    return 0


if __name__ == "__main__":
    sys.exit(main())
