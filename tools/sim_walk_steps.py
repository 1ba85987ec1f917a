"""Offline packet-walk step counter: quantify BVH build-quality changes
without the TPU.

Simulates the megakernel bvh-mode closest-hit walk (union-of-subtrees
skip-pointer descent with per-lane t_best clamping, 2048-lane packets =
block_rows 16 x 128 lanes) in numpy and counts while-loop iterations --
the walk is latency-bound per node step (BENCHMARKS.md), so step count
is the right proxy for device walk time.

Two ray populations per scene:
  * primary: the real camera rays of an 800x600 frame (pixel-major
    blocks, matching the kernel's lane layout)
  * bounced: rays re-emitted from actual first-hit points with
    counter-RNG lambertian directions -- the incoherent population that
    dominates ring-frame cost (CLAUDE.md: bounces 2..50 are ~75%).

Usage: python tools/sim_walk_steps.py [n_spheres ...]
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # host-only analysis tool

import raytrace_tpu as rt  # noqa: E402
from raytrace_tpu import bvh as bvh_mod  # noqa: E402
from raytrace_tpu.bench.suite import ring_scene_dict  # noqa: E402

BLOCK_LANES = 16 * 128


def packet_walk_steps(tree, sph_c, sph_r, o, d, t_hit=None):
    """Count node steps for each 2048-lane packet; returns total steps.

    Mirrors megakernel closest_fn: skip-pointer walk, `boxed` = ANY live
    lane's slab test passes with near <= far, far clamped by per-lane
    t_best; leaf hits tighten t_best (spheres only -- ring scenes are
    sphere-only)."""
    nmin = np.asarray(tree.node_min)
    nmax = np.asarray(tree.node_max)
    nskip = np.asarray(tree.node_skip)
    nfirst = np.asarray(tree.node_first)
    ncount = np.asarray(tree.node_count)
    perm = np.asarray(tree.prim_index)
    n_nodes = nmin.shape[0]

    total = 0
    leaf_tests = 0
    n = o.shape[0]
    for s0 in range(0, n, BLOCK_LANES):
        oo = o[s0:s0 + BLOCK_LANES]
        dd = d[s0:s0 + BLOCK_LANES]
        ivd = 1.0 / np.where(dd == 0.0, 1e-30, dd)
        t_best = np.full(oo.shape[0], 3.0e38, np.float32)
        if t_hit is not None:
            pass  # t_best evolves from leaf tests below
        cur = 0
        while cur < n_nodes:
            total += 1
            t0 = (nmin[cur] - oo) * ivd
            t1 = (nmax[cur] - oo) * ivd
            near = np.maximum(np.minimum(t0, t1).max(axis=1), 1e-3)
            far = np.minimum(np.maximum(t0, t1).min(axis=1), t_best)
            boxed = bool((near <= far).any())
            cnt = int(ncount[cur])
            if boxed and cnt > 0:
                leaf_tests += cnt
                for j in range(cnt):
                    pid = int(perm[nfirst[cur] + j])
                    oc = oo - sph_c[pid]
                    half_b = (oc * dd).sum(axis=1)
                    c = (oc * oc).sum(axis=1) - sph_r[pid] ** 2
                    disc = half_b * half_b - c
                    ok = disc >= 0.0
                    sq = np.sqrt(np.where(ok, disc, 0.0))
                    r0 = -half_b - sq
                    r1 = -half_b + sq
                    tj = np.where(ok & (r0 >= 1e-3), r0,
                                  np.where(ok & (r1 >= 1e-3), r1, 3.0e38))
                    t_best = np.minimum(t_best, tj)
            if boxed and cnt == 0:
                cur = cur + 1
            else:
                cur = int(nskip[cur])
    return total, leaf_tests


def flags_walk_counts(tree, sph_c, sph_r, o, d):
    """Leaf visits for the flags-first walk: every leaf whose slab test
    passes for any lane with t_best = BIG (no closest-so-far clamp)
    fires its primitive loop. Phase-1 node cost is always n_nodes."""
    nmin = np.asarray(tree.node_min)
    nmax = np.asarray(tree.node_max)
    ncount = np.asarray(tree.node_count)
    visits = 0
    leafprim = 0
    n = o.shape[0]
    for s0 in range(0, n, BLOCK_LANES):
        oo = o[s0:s0 + BLOCK_LANES]
        dd = d[s0:s0 + BLOCK_LANES]
        ivd = 1.0 / np.where(dd == 0.0, 1e-30, dd)
        for i in range(nmin.shape[0]):
            cnt = int(ncount[i])
            if cnt == 0:
                continue
            t0 = (nmin[i] - oo) * ivd
            t1 = (nmax[i] - oo) * ivd
            near = np.maximum(np.minimum(t0, t1).max(axis=1), 1e-3)
            far = np.maximum(t0, t1).min(axis=1)
            if bool((near <= far).any()):
                visits += 1
                leafprim += cnt
    return visits, leafprim


def ray_populations(n_spheres, width=256, height=192):
    scene, _ = rt.scene_from_dict(ring_scene_dict(n_spheres=n_spheres))
    g = scene.geometry
    sph_c = np.asarray(g.sph_center, np.float32)
    sph_r = np.asarray(g.sph_radius, np.float32)

    # primary rays: simple pinhole at the ring-scene camera, pixel-major
    eye = np.array([0.0, 2.0, 12.0], np.float32)
    ys, xs = np.mgrid[0:height, 0:width].astype(np.float32)
    u = (xs / width - 0.5) * 2.0 * (width / height)
    v = -(ys / height - 0.5) * 2.0
    d = np.stack([u.ravel(), v.ravel(), -np.ones(u.size, np.float32)], 1)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o = np.broadcast_to(eye, d.shape).copy()

    # first hits (brute force) -> bounced lambertian rays from hit points
    t_best = np.full(d.shape[0], 3.0e38, np.float32)
    pid_best = np.full(d.shape[0], -1, np.int32)
    for j in range(sph_c.shape[0]):
        oc = o - sph_c[j]
        half_b = (oc * d).sum(1)
        c = (oc * oc).sum(1) - sph_r[j] ** 2
        disc = half_b * half_b - c
        ok = disc >= 0
        sq = np.sqrt(np.where(ok, disc, 0))
        r0 = -half_b - sq
        tj = np.where(ok & (r0 >= 1e-3), r0, 3.0e38)
        win = tj < t_best
        t_best = np.where(win, tj, t_best)
        pid_best = np.where(win, j, pid_best)
    hit = pid_best >= 0
    hp = o[hit] + d[hit] * t_best[hit, None]
    nrm = (hp - sph_c[pid_best[hit]]) / sph_r[pid_best[hit], None]
    rng = np.random.default_rng(0)
    ball = rng.normal(size=hp.shape).astype(np.float32)
    ball /= np.linalg.norm(ball, axis=1, keepdims=True)
    bd = nrm + ball
    bd /= np.maximum(np.linalg.norm(bd, axis=1, keepdims=True), 1e-8)
    bo = hp + nrm * 1e-3
    return sph_c, sph_r, (o, d), (bo.astype(np.float32), bd.astype(np.float32))


def main():
    ns = [int(a) for a in sys.argv[1:]] or [250, 1000]
    for n in ns:
        sph_c, sph_r, prim, bounce = ray_populations(n)
        lo = sph_c - sph_r[:, None]
        hi = sph_c + sph_r[:, None]
        for label, method in [("median", "median"), ("sah", "sah")]:
            try:
                tree = bvh_mod.build_bvh(lo, hi, leaf_size=16,
                                         method=method)
            except TypeError:
                if method != "median":
                    continue
                tree = bvh_mod.build_bvh(lo, hi, leaf_size=16)
            sp, lp = packet_walk_steps(tree, sph_c, sph_r, *prim)
            sb, lb = packet_walk_steps(tree, sph_c, sph_r, *bounce)
            fp, flp = flags_walk_counts(tree, sph_c, sph_r, *prim)
            fb, flb = flags_walk_counts(tree, sph_c, sph_r, *bounce)
            nn = int(np.asarray(tree.node_count).shape[0])
            print(f"ring-{n} {label:7s} nodes={nn:5d} "
                  f"primary steps={sp:7d} leafprim={lp:7d} | "
                  f"bounced steps={sb:7d} leafprim={lb:7d}", flush=True)
            print(f"  flags-mode   leaves fired (no t_best clamp): "
                  f"primary leafprim={flp:7d} ({fp} leaf visits) | "
                  f"bounced leafprim={flb:7d} ({fb} leaf visits)",
                  flush=True)


if __name__ == "__main__":
    main()
