"""Probe the divergent pixel (52,95) of ring-1000 at 160x120.

Prints, per sample: primary-hit t / prim id, the runner-up t gap, the
hit point's distance inside neighboring spheres, and the hard-shadow
verdict margin. Pure jnp on CPU (geometry facts, not engine bits).
"""
import os
import sys

os.environ["RT_PLATFORM"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

import raytrace_tpu as rt
from raytrace_tpu import camera as cam_mod
from raytrace_tpu import rng
from raytrace_tpu import trace as trace_mod
from raytrace_tpu.bench.suite import ring_scene_dict
from raytrace_tpu.ops import intersect

W, H = 160, 120
PY, PX = 52, 95


def main():
    scene, _ = rt.scene_from_dict(ring_scene_dict(1000))
    pix = np.uint32(PY * W + PX)
    for s in range(2):
        samp = np.uint32(s)
        ju, jv, _, _ = rng.uniform4(jnp.uint32([pix]), jnp.uint32([samp]),
                                    rng.Streams.CAMERA_JITTER, 0)
        u = (PX + ju) / W
        v = (PY + jv) / H
        o, d = cam_mod.go_rays(scene.camera, u, v)
        hit = intersect.closest_hit(scene.geometry, o, d)
        g = scene.geometry
        # per-sphere closest approach t and full quadratic roots
        ox, oy, oz = [np.float64(x) for x in np.asarray(o)[0]]
        dx, dy, dz = [np.float64(x) for x in np.asarray(d)[0]]
        c = np.asarray(g.sph_center, np.float64)
        r = np.asarray(g.sph_radius, np.float64)
        ocx = ox - c[:, 0]; ocy = oy - c[:, 1]; ocz = oz - c[:, 2]
        a = dx * dx + dy * dy + dz * dz
        hb = ocx * dx + ocy * dy + ocz * dz
        cc = ocx ** 2 + ocy ** 2 + ocz ** 2 - r ** 2
        disc = hb * hb - a * cc
        t0 = np.where(disc >= 0, (-hb - np.sqrt(np.maximum(disc, 0))) / a,
                      np.inf)
        t0 = np.where(t0 >= 1e-3, t0, np.inf)
        order = np.argsort(t0)
        print(f"sample {s}: engine t={float(hit.t[0]):.9g} "
              f"mat={int(hit.mat_id[0])}")
        for k in range(4):
            i = order[k]
            print(f"   cand {i:4d} t64={t0[i]:.12g}  disc={disc[i]:.6g}")
        print(f"   gap(1st,2nd) = {t0[order[1]] - t0[order[0]]:.3e}")


if __name__ == "__main__":
    main()
