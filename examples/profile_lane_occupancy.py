"""Per-bounce live-lane fractions for the bench scenes (CPU, reduced res).

Mirrors the camera to +Z exactly like examples/run_benchmarks.py (the Go
fixed -Z viewport camera faces away from the scene otherwise), then drives
trace._bounce_body one bounce at a time recording live-lane fractions: the
cost model behind the scene-to-scene throughput spread in BENCHMARKS.md.
"""
import os, json, collections
os.environ["RT_PLATFORM"] = "cpu"
import numpy as np
def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from raytrace_tpu import scene as scene_mod, renderer as renderer_mod
    from raytrace_tpu import trace as trace_mod
    from raytrace_tpu.ops import intersect
    W, H, SPP = 200, 150, 4
    cfg = trace_mod.TraceConfig(max_depth=50, shadow_samples=2)
    for path in ["assets/sphere_reflections_light.json",
                 "assets/two_red_cubes_scene.json",
                 "assets/final_silver_prism_purple_cube.json",
                 "assets/atmosphere_demo.json"]:
        d = json.load(open(path))
        if d["camera"]["position"][2] < 0:
            d["camera"]["position"][2] *= -1
        s, _ = scene_mod.from_dict(d)
        lane = np.arange(W * H * SPP, dtype=np.uint32)
        pix = jnp.asarray(lane // SPP, jnp.uint32)
        samp = jnp.asarray(lane % SPP, jnp.uint32)
        o, dd = renderer_mod._lane_rays(s, pix, samp, width=W, height=H,
                                        cfg=cfg, go_camera=True)
        hit = intersect.closest_hit(s.geometry, o, dd)
        zero3 = dd * 0.0
        st = trace_mod._State(origin=o + zero3, direction=dd,
                              throughput=zero3 + 1.0, radiance=zero3,
                              alive=jnp.sum(zero3, axis=-1) == 0.0)
        body = jax.jit(lambda st, b: trace_mod._bounce_body(s, pix, samp, cfg, b, st))
        fracs = []
        for b in range(cfg.max_depth):
            st = body(st, jnp.uint32(b))
            fracs.append(float(jnp.mean(st.alive)))
            if fracs[-1] == 0.0:
                break
        shading_lanes = 1.0 + sum(fracs)  # bounce 0 shades every entering lane
        print(f"{os.path.basename(path):42s} primary-hit={float(jnp.mean(hit.hit)):.3f} "
              f"live-after-bounce: " + " ".join(f"{f:.3f}" for f in fracs[:6])
              + (f" ...(+{len(fracs)-6} more)" if len(fracs) > 6 else "")
              + f"  total-shading-work={shading_lanes:.2f}x")
main()
