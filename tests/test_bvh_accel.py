"""BVH acceleration of the LIVE render path.

The reference's spatial_acceleration.go:45-69 traversal was meant to
accelerate hitWorld (renderer.go:333-346) but never compiled; these tests
pin the working replacement: the unified scene BVH must produce EXACTLY
the same hits as the brute-force scan, end-to-end through the renderer.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from raytrace_tpu import bvh as bvh_mod
from raytrace_tpu import scene as scene_mod
from raytrace_tpu import trace as trace_mod
from raytrace_tpu.ops import intersect


def _mixed_geom(seed=0, ns=60, n_cubes=8, with_plane=True):
    """Random spheres + cubes (+ ground plane) as a scene dict."""
    r = np.random.default_rng(seed)
    objs = []
    for i in range(ns):
        objs.append({"type": "sphere",
                     "position": (r.uniform(-8, 8, 3)).tolist(),
                     "radius": float(r.uniform(0.3, 1.2)),
                     "material": {"type": "lambertian",
                                  "color": r.uniform(0.2, 1, 3).tolist()}})
    for i in range(n_cubes):
        objs.append({"type": "cube",
                     "position": (r.uniform(-8, 8, 3)).tolist(),
                     "size": r.uniform(0.5, 2.0, 3).tolist(),
                     "material": {"type": "metal",
                                  "color": [0.8, 0.8, 0.9],
                                  "roughness": 0.2}})
    if with_plane:
        objs.append({"type": "plane", "position": [0, -10, 0],
                     "normal": [0, 1, 0],
                     "material": {"type": "lambertian",
                                  "color": [0.5, 0.5, 0.5]}})
    return {
        "camera": {"position": [0, 0, 20], "lookAt": [0, 0, 0],
                   "up": [0, 1, 0], "fov": 60, "aspectRatio": 1.33},
        "objects": objs,
        "lights": [{"type": "point", "position": [5, 10, 10],
                    "color": [1, 1, 1], "intensity": 120.0}],
    }


def _rand_rays(n, seed=1):
    r = np.random.default_rng(seed)
    origin = jnp.asarray(r.uniform(-15, 15, (n, 3)), jnp.float32)
    direction = jnp.asarray(r.normal(size=(n, 3)), jnp.float32)
    return origin, direction


def test_auto_accel_attach():
    """from_dict attaches a BVH past BVH_THRESHOLD primitives, not below."""
    small, _ = scene_mod.from_dict(_mixed_geom(ns=4, n_cubes=0,
                                               with_plane=False))
    assert small.accel is None
    big, _ = scene_mod.from_dict(_mixed_geom())
    assert big.accel is not None
    ns = big.geometry.sph_center.shape[0]
    nt = big.geometry.tri_v0.shape[0]
    assert big.accel.prim_index.shape[0] == ns + nt
    # the permutation covers every primitive exactly once
    assert sorted(np.asarray(big.accel.prim_index).tolist()) == \
        list(range(ns + nt))


def test_accel_gate_backend():
    """The gather-walk traversal is CPU-only: on TPU each lock-step walk
    iteration is ~6 wavefront-wide gathers (measured ~3 s per 640K-lane
    any-hit walk on v5e vs ~30 ms brute force), and soft shadows stack 17
    walks per bounce - long enough to trip the tunneled worker's execution
    watchdog. intersect.use_accel must refuse the walk off-CPU; large TPU
    scenes belong to the Pallas packet-BVH kernel."""
    from unittest import mock
    assert not intersect.use_accel(None)
    assert intersect.use_accel(object()) == (jax.default_backend() == "cpu")
    with mock.patch.object(jax, "default_backend", return_value="tpu"):
        assert not intersect.use_accel(object())


def test_closest_hit_accel_equivalence():
    """BVH closest_hit == brute force on every Hit field (mixed scene,
    wild ray set including rays from inside geometry)."""
    scene, _ = scene_mod.from_dict(_mixed_geom())
    origin, direction = _rand_rays(4096)
    brute = intersect.closest_hit(scene.geometry, origin, direction)
    accel = intersect.closest_hit(scene.geometry, origin, direction,
                                  accel=scene.accel)
    np.testing.assert_array_equal(np.asarray(brute.hit),
                                  np.asarray(accel.hit))
    h = np.asarray(brute.hit)
    # rtol 2e-5: same formulas, but the two XLA programs fuse/FMA the dot
    # products differently (measured max rel diff ~1e-5 on sphere lanes).
    np.testing.assert_allclose(np.asarray(brute.t)[h],
                               np.asarray(accel.t)[h], rtol=2e-5)
    np.testing.assert_array_equal(np.asarray(brute.mat_id)[h],
                                  np.asarray(accel.mat_id)[h])
    # normals amplify the t reassociation diff by |direction| / radius
    np.testing.assert_allclose(np.asarray(brute.normal)[h],
                               np.asarray(accel.normal)[h], rtol=0,
                               atol=5e-3)
    np.testing.assert_array_equal(np.asarray(brute.front_face)[h],
                                  np.asarray(accel.front_face)[h])


def test_sah_build_equivalence_and_invariants():
    """The binned-SAH builder (build_bvh method='sah') must satisfy the
    FlatBVH structural invariants and yield the same closest hits as
    brute force on an irregular cluster layout (where SAH actually picks
    different splits from the median builder)."""
    r = np.random.default_rng(7)
    # three dense clusters + sparse outliers: median splits cut clusters
    c = np.concatenate([r.normal(loc, 0.6, (40, 3)) for loc in
                        ((-8, 0, 0), (6, 5, -2), (0, -6, 7))]
                       + [r.uniform(-12, 12, (8, 3))]).astype(np.float32)
    rad = r.uniform(0.2, 0.5, c.shape[0]).astype(np.float32)
    lo, hi = c - rad[:, None], c + rad[:, None]
    tree = bvh_mod.build_bvh(lo, hi, leaf_size=4, method="sah")
    n_nodes = int(tree.node_min.shape[0])
    perm = np.asarray(tree.prim_index)
    assert sorted(perm.tolist()) == list(range(c.shape[0]))
    cnt = np.asarray(tree.node_count)
    first = np.asarray(tree.node_first)
    skip = np.asarray(tree.node_skip)
    assert cnt.max() <= tree.leaf_size
    assert ((skip > np.arange(n_nodes)) & (skip <= n_nodes)).all()
    leaves = cnt > 0
    assert cnt[leaves].sum() == c.shape[0]
    # leaf slots are the DFS-ordered partition of the permutation
    assert (np.sort(first[leaves]) == np.cumsum(
        np.concatenate([[0], cnt[leaves][np.argsort(first[leaves])]]))
        [:-1]).all()
    origin, direction = _rand_rays(2048, seed=3)
    t_sah, pid_sah = bvh_mod.closest_hit_bvh(tree, jnp.asarray(c),
                                             jnp.asarray(rad),
                                             origin, direction)
    med = bvh_mod.build_bvh(lo, hi, leaf_size=4)
    t_med, pid_med = bvh_mod.closest_hit_bvh(med, jnp.asarray(c),
                                             jnp.asarray(rad),
                                             origin, direction)
    np.testing.assert_allclose(np.asarray(t_sah), np.asarray(t_med),
                               rtol=2e-5)
    np.testing.assert_array_equal(np.asarray(pid_sah),
                                  np.asarray(pid_med))


def test_widen4_structure_and_coverage():
    """WideBVH4 invariants: leaf slots partition the primitive slots
    exactly once, inner slots reference each wide node exactly once, and
    every slot AABB contains its subtree's live slot AABBs."""
    r = np.random.default_rng(11)
    c = r.uniform(-10, 10, (203, 3)).astype(np.float32)
    rad = r.uniform(0.2, 0.8, 203).astype(np.float32)
    tree = bvh_mod.build_bvh(c - rad[:, None], c + rad[:, None],
                             leaf_size=4)
    w = bvh_mod.widen4(tree)
    sn = np.asarray(w.slot_count)
    sf = np.asarray(w.slot_first)
    sc = np.asarray(w.slot_child)
    smin = np.asarray(w.slot_min)
    smax = np.asarray(w.slot_max)
    n_wide = sn.shape[0]
    leaf = sn > 0
    assert sn[leaf].sum() == 203
    order = np.argsort(sf[leaf], kind="stable")
    firsts, cnts = sf[leaf][order], sn[leaf][order]
    assert firsts[0] == 0
    assert (firsts[1:] == (firsts + cnts)[:-1]).all()
    inner = sc >= 0
    assert (np.sort(sc[inner]) == np.arange(1, n_wide)).all()
    assert not (leaf & inner).any()
    for wi in range(n_wide):
        for s in range(4):
            if sc[wi, s] >= 0:
                ch = sc[wi, s]
                live = (sn[ch] > 0) | (sc[ch] >= 0)
                assert (smin[ch][live] >= smin[wi, s] - 1e-5).all()
                assert (smax[ch][live] <= smax[wi, s] + 1e-5).all()
    # empty slots must be untestable (inverted AABB)
    empty = ~(leaf | inner)
    if empty.any():
        assert (smin[empty] > smax[empty]).all()
    # the stack bound must cover a worst-case DFS (3 net pushes per pop)
    assert w.max_stack >= 4


def test_closest_hit_accel_respects_t_max():
    scene, _ = scene_mod.from_dict(_mixed_geom(with_plane=False))
    origin, direction = _rand_rays(1024, seed=3)
    for t_max in (2.0, 10.0):
        brute = intersect.closest_hit(scene.geometry, origin, direction,
                                      t_max=t_max)
        accel = intersect.closest_hit(scene.geometry, origin, direction,
                                      t_max=t_max, accel=scene.accel)
        np.testing.assert_array_equal(np.asarray(brute.hit),
                                      np.asarray(accel.hit))
        h = np.asarray(brute.hit)
        # atol 1e-3: a prim marginally at t_max can pass in one program
        # and fail in the other (reassociation), letting the next-nearest
        # prim win - both outcomes are correct to float precision.
        np.testing.assert_allclose(np.asarray(brute.t)[h],
                                   np.asarray(accel.t)[h], rtol=2e-5,
                                   atol=1e-3)


def test_any_hit_accel_equivalence():
    scene, _ = scene_mod.from_dict(_mixed_geom())
    origin, direction = _rand_rays(4096, seed=2)
    # per-lane t_max exercises the shadow-ray contract
    r = np.random.default_rng(5)
    t_max = jnp.asarray(r.uniform(0.5, 30.0, (4096,)), jnp.float32)
    brute = intersect.any_hit(scene.geometry, origin, direction, 1e-3,
                              t_max)
    accel = intersect.any_hit(scene.geometry, origin, direction, 1e-3,
                              t_max, accel=scene.accel)
    np.testing.assert_array_equal(np.asarray(brute), np.asarray(accel))


def _ring_scene_dict(n=1000):
    """The reference benchmark's synthetic scene: a ground plane + a ring
    of spheres (comprehensive_benchmark.go:163-185, scaled to n)."""
    objs = [{"type": "plane", "position": [0, -1.5, 0],
             "normal": [0, 1, 0],
             "material": {"type": "lambertian", "color": [0.6, 0.6, 0.6]}}]
    for i in range(n):
        ang = 2.0 * np.pi * i / n
        rad = 4.0 + 2.0 * ((i * 37) % 5)
        objs.append({
            "type": "sphere",
            "position": [rad * np.cos(ang),
                         0.5 + 0.02 * (i % 7),
                         rad * np.sin(ang)],
            "radius": 0.25 + 0.01 * (i % 4),
            "material": {"type": "metal" if i % 3 else "lambertian",
                         "color": [0.7, 0.5 + 0.001 * (i % 100), 0.4],
                         "roughness": 0.1}})
    return {
        "camera": {"position": [0, 2, 18], "lookAt": [0, 0, 0],
                   "up": [0, 1, 0], "fov": 60, "aspectRatio": 1.33},
        "objects": objs,
        "lights": [{"type": "point", "position": [0, 15, 5],
                    "color": [1, 1, 1], "intensity": 300.0}],
    }


def test_ring_scene_render_accel_matches_brute():
    """End-to-end: a 1000-sphere ring renders identically with and without
    the BVH (tiny frame; engine-level equivalence of the live path)."""
    data = _ring_scene_dict(1000)
    scene_b, _ = scene_mod.from_dict(data, build_accel=False)
    scene_a, _ = scene_mod.from_dict(data, build_accel=True)
    assert scene_a.accel is not None and scene_b.accel is None

    from raytrace_tpu import renderer as renderer_mod
    cfg = trace_mod.TraceConfig(max_depth=3, shadow_samples=2)
    kw = dict(width=16, height=12, band_h=12, samples=1, cfg=cfg,
              go_camera=False)
    img_b = renderer_mod.render_band(scene_b, jnp.int32(0), **kw)
    img_a = renderer_mod.render_band(scene_a, jnp.int32(0), **kw)
    assert float(jnp.max(img_b)) > 0.0  # scene actually visible
    # Tolerance covers float-reassociation-level hit-point differences
    # propagating through 3 bounces of shading (not MC noise: the RNG is
    # identical on both paths).
    np.testing.assert_allclose(np.asarray(img_a), np.asarray(img_b),
                               atol=5e-3)
    assert float(jnp.mean(jnp.abs(img_a - img_b))) < 1e-4


def test_traverse_visits_fraction():
    """Sanity that the BVH actually prunes: coherent camera rays into a
    1000-sphere ring must finish in far fewer leaf tests than brute force
    (proxy: traversal loop steps bounded well under n_prims)."""
    data = _ring_scene_dict(500)
    scene, _ = scene_mod.from_dict(data, build_accel=True)
    # count iterations by instrumenting the cursor walk manually
    bvh = scene.accel
    geom = scene.geometry
    origin = jnp.tile(jnp.asarray([[0.0, 2.0, 18.0]], jnp.float32),
                      (256, 1))
    r = np.random.default_rng(7)
    direction = jnp.asarray(
        np.stack([r.uniform(-0.3, 0.3, 256), r.uniform(-0.3, 0.1, 256),
                  -np.ones(256)], axis=-1), jnp.float32)
    n_nodes = bvh.node_min.shape[0]
    inv_d = 1.0 / jnp.where(direction == 0.0, 1e-30, direction)

    cursor = jnp.zeros((256,), jnp.int32)
    steps = 0
    max_steps = n_nodes + 1
    while bool(jnp.any(cursor < n_nodes)) and steps < max_steps:
        cur = jnp.minimum(cursor, n_nodes - 1)
        hit_box = bvh_mod._aabb_hit(
            jnp.take(bvh.node_min, cur, axis=0),
            jnp.take(bvh.node_max, cur, axis=0),
            origin, inv_d, 1e-3, jnp.full((256,), bvh_mod._BIG))
        is_leaf = jnp.take(bvh.node_count, cur, axis=0) > 0
        nxt = jnp.where(hit_box & ~is_leaf, cur + 1,
                        jnp.take(bvh.node_skip, cur, axis=0))
        cursor = jnp.where(cursor < n_nodes, nxt, cursor)
        steps += 1
    # lockstep bound: the UNION walk of all 256 divergent lanes still
    # prunes (strictly fewer steps than nodes; with leaf-4 trees the
    # historical bound was n_nodes//2, but wide leaves shrink the node
    # count faster than the step count - the per-frame evidence for
    # pruning lives in tools/sweep_leaf_size.py and BENCHMARKS.md).
    assert steps < n_nodes, (steps, n_nodes)


def test_chunked_brute_force_equivalence():
    """Large scenes take the PRIM_CHUNK-scanned brute force (memory-
    bounded, one jit call); it must match the one-shot concat+argmin path
    EXACTLY - same winners, same ties, same any-hit verdicts."""
    data = _ring_scene_dict(500)
    scene, _ = scene_mod.from_dict(data, build_accel=False)
    origin, direction = _rand_rays(2048, seed=11)
    assert (scene.geometry.sph_center.shape[0] > intersect.PRIM_CHUNK)
    chunked = intersect.closest_hit(scene.geometry, origin, direction)
    orig = intersect.PRIM_CHUNK
    intersect.PRIM_CHUNK = 1 << 20  # force the one-shot path
    try:
        full = intersect.closest_hit(scene.geometry, origin, direction)
        r = np.random.default_rng(13)
        t_max = jnp.asarray(r.uniform(0.5, 30.0, (2048,)), jnp.float32)
        full_any = intersect.any_hit(scene.geometry, origin, direction,
                                     1e-3, t_max)
    finally:
        intersect.PRIM_CHUNK = orig
    chunked_any = intersect.any_hit(scene.geometry, origin, direction,
                                    1e-3, t_max)
    np.testing.assert_array_equal(np.asarray(chunked.hit),
                                  np.asarray(full.hit))
    np.testing.assert_array_equal(np.asarray(chunked.mat_id),
                                  np.asarray(full.mat_id))
    # rtol 3e-4: same formulas, but the scanned and one-shot XLA programs
    # fuse/FMA the quadratic differently (cf. the 2e-5..1e-3 tolerances on
    # the BVH-vs-brute tests above; winners and verdicts stay identical).
    np.testing.assert_allclose(np.asarray(chunked.t),
                               np.asarray(full.t), rtol=3e-4)
    np.testing.assert_array_equal(np.asarray(chunked_any),
                                  np.asarray(full_any))
