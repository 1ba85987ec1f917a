"""Inverse rendering demo: recover scene parameters from a target image.

Renders a ground-truth image, perturbs light intensity + sphere albedo,
then descends on pixel MSE with reverse-mode gradients through the full
path tracer (the capability the Go reference cannot express). Optionally
shards the train step over all available devices (pass --mesh).

Run (CPU, ~1 min):   RT_PLATFORM=cpu python examples/inverse_rendering.py
Sharded (8 vdev):    RT_PLATFORM=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
                         python examples/inverse_rendering.py --mesh
"""

import argparse
import dataclasses
import os
import sys

if os.environ.get("RT_PLATFORM"):
    import jax
    jax.config.update("jax_platforms", os.environ["RT_PLATFORM"])

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp
import optax

import raytrace_tpu as rt
from raytrace_tpu import diff, parallel
from raytrace_tpu import trace as trace_mod


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--mesh", action="store_true",
                   help="shard the train step over all devices")
    p.add_argument("--steps", type=int, default=200)
    args = p.parse_args(argv)

    scene, _ = rt.scene_from_dict({
        "camera": {"position": [0, 0, 3], "aspectRatio": 1.0},
        "objects": [{"type": "sphere", "position": [0, 0, 0],
                     "radius": 1.0,
                     "material": {"type": "lambertian",
                                  "color": [0.6, 0.3, 0.2]}}],
        "lights": [{"type": "point", "position": [0, 5, 5],
                    "color": [1, 1, 1], "intensity": 2.0}],
    })
    W, H, SPP = 16, 16, 2
    cfg = trace_mod.TraceConfig(max_depth=3, shadow_samples=2)

    target = np.asarray(diff.render_image(scene, W, H, SPP, cfg))
    true_int = float(scene.lights.intensity[0])

    # Perturb: 3x light intensity.
    bad = dataclasses.replace(
        scene, lights=dataclasses.replace(
            scene.lights,
            intensity=scene.lights.intensity * 3.0))

    mesh = None
    if args.mesh:
        import jax
        n = jax.device_count()
        mesh = parallel.make_mesh(px=n, sp=1)
        print(f"sharding train step over {n} devices")

    state, step = diff.make_train_step(
        bad, target, width=W, height=H, samples=SPP, cfg=cfg,
        optimizer=optax.adam(5e-2), mesh=mesh,
        trainable={"lights.intensity"})

    for i in range(args.steps):
        state, loss = step(state)
        if i % 25 == 0 or i == args.steps - 1:
            rec = float(np.asarray(state.params["lights"]["intensity"])[0])
            print(f"step {i:4d}  loss {float(loss):.3e}  "
                  f"intensity {rec:.4f} (true {true_int})")

    rec = float(np.asarray(state.params["lights"]["intensity"])[0])
    err = abs(rec - true_int) / true_int
    print(f"recovered intensity {rec:.4f}, relative error {err:.2%}")
    return 0 if err < 0.1 else 1


if __name__ == "__main__":
    sys.exit(main())
