"""Headline benchmark: sphere_reflections_light @ 800x600, 100 spp, depth 50.

Prints ONE JSON line:
  {"metric": "rays_per_second", "value": N, "unit": "camera_samples/s",
   "vs_baseline": N / 19786768}

Metric definition matches the reference exactly: rays/s = pixels/s * spp,
counting camera samples only, not bounce rays (cmd/benchmark/main.go:125-127;
BASELINE.md). Baseline = 19,786,768 rays/s (Go, 6 CPU workers,
README.md:61).
"""

from __future__ import annotations

import json
import os
import sys
import time

# Pallas program fingerprints vary with Python hash randomization, which
# defeats the persistent compilation cache across processes (measured:
# stable keys under PYTHONHASHSEED=0, fresh keys otherwise). Re-exec with
# a fixed seed so warm starts actually hit the committed .jax_cache.
if os.environ.get("PYTHONHASHSEED") != "0":
    os.environ["PYTHONHASHSEED"] = "0"
    os.execv(sys.executable, [sys.executable] + sys.argv)

GO_BASELINE_RAYS_PER_S = 19_786_768.0
W, H, SPP, DEPTH = 800, 600, 100, 50


def find_scene() -> str:
    for p in ("/root/reference/demo-assets/sphere_reflections_light.json",
              os.path.join(os.path.dirname(__file__),
                           "assets/sphere_reflections_light.json")):
        if os.path.exists(p):
            return p
    raise FileNotFoundError("sphere_reflections_light.json not found")


def wait_for_device(attempts: int = 6, probe_timeout_s: float = 300.0,
                    pause_s: float = 120.0) -> None:
    """Ride out tunnel outages: the dev TPU is reached through a relay
    that sometimes drops for minutes, and a dead tunnel makes backend
    init HANG (not raise) - so probe in a subprocess under a timeout and
    retry before committing this process to a possibly-dead backend."""
    import subprocess
    code = ("import jax, jax.numpy as jnp; "
            "jnp.zeros((2, 2)).block_until_ready(); print('ok')")
    for i in range(attempts):
        try:
            r = subprocess.run([sys.executable, "-c", code],
                               timeout=probe_timeout_s,
                               capture_output=True, text=True)
            if r.returncode == 0 and "ok" in r.stdout:
                return
        except subprocess.TimeoutExpired:
            pass
        if i == attempts - 1:
            print("device probe never succeeded; proceeding anyway",
                  file=sys.stderr, flush=True)
            return
        print(f"device probe failed; retrying in {pause_s:.0f}s "
              f"[{i + 1}/{attempts}]", file=sys.stderr, flush=True)
        time.sleep(pause_s)


def main() -> int:
    wait_for_device()
    import raytrace_tpu as rt

    with open(find_scene()) as f:
        data = json.load(f)
    # The shipped camera position [0,0,-8] faces AWAY from the scene under
    # the reference's fixed -Z viewport camera (renderer.go:377-390 ignores
    # lookAt): every ray misses and the "render" is trivially black. Mirror
    # to +Z (the framing the demo PNG shows) so the benchmark measures real
    # path-tracing work - 5 spheres, 2 lights, metal+glass, soft shadows.
    data["camera"]["position"] = [0, 0, 8]
    scene, _ = rt.scene_from_dict(data)
    r = rt.Renderer()
    r.set_samples(SPP)
    r.set_max_depth(DEPTH)

    # Warmup: compile + one full render (+ host pull to verify content).
    img = r.render_linear(scene, W, H)
    assert float(img.max()) > 0.0, "render produced a black image"

    # Timed loop: sustained same-scene throughput (the standard fixed-scene
    # fps methodology; the Go baseline's 2.43 s likewise times Render() on
    # this exact scene). Frames are produced on device and pipelined; one
    # checksum readback per batch forces completion. Through this
    # environment's tunneled TPU, pulling the framebuffer costs 150-350 ms
    # and every host round-trip ~30 ms - dev-tunnel artifacts, not
    # renderer costs (both are ~us..ms on local hardware) - so the batch
    # amortizes them out of the compute measurement.
    import jax.numpy as jnp
    from raytrace_tpu import renderer as renderer_mod
    from raytrace_tpu.ops import tonemap as tm

    cfg = r.trace_config()
    kw = dict(width=W, height=H, samples=SPP, cfg=cfg, go_camera=True)

    # The timed frame includes tonemap + uint8 quantization on device -
    # the Go baseline's 2.43 s times Render() through tone mapping and
    # image assembly (renderer.go:91-117), so strict comparability says we
    # do too. The capacity flags of every assume_capacity frame are
    # validated once per batch (flush_capacity_checks) - no silent pixel
    # drops, one amortized sync.
    def frame():
        # post=tonemap_rgb8 folds tonemap + quantization into the fused
        # render program: ONE dispatch per frame (the per-dispatch tunnel
        # latency otherwise rivals the ~24 ms compute of this scene).
        return renderer_mod.render_wavefront(
            scene, as_numpy=False, assume_capacity=True,
            post=tm.tonemap_rgb8, **kw)

    checksum = int(jnp.sum(frame().astype(jnp.int32)))
    assert checksum > 0
    renderer_mod.flush_capacity_checks()

    batch = int(os.environ.get("BENCH_BATCH", "64"))
    best = float("inf")
    for _ in range(int(os.environ.get("BENCH_REPS", "3"))):
        t0 = time.perf_counter()
        outs = [frame() for _ in range(batch)]
        int(jnp.sum(outs[-1].astype(jnp.int32)))  # in-order: sync the last
        renderer_mod.flush_capacity_checks()      # no dropped pixels
        best = min(best, (time.perf_counter() - t0) / batch)

    rays_per_s = W * H * SPP / best
    print(json.dumps({
        "metric": "rays_per_second",
        "value": round(rays_per_s, 1),
        "unit": "camera_samples/s",
        "vs_baseline": round(rays_per_s / GO_BASELINE_RAYS_PER_S, 3),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
