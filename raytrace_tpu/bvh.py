"""Spatial acceleration: BVH / Octree / KD-tree, built working.

The reference's internal/optimization/spatial_acceleration.go never
compiled (it calls BoundingBox()/AABB.Hit() methods that do not exist -
SURVEY.md §2.3) and its Octree child-offset math was wrong
(spatial_acceleration.go:115-119 uses i&2, i&4 as -1/-2 offsets). This
module is the real thing, designed TPU-first:

  * build on host (numpy) with the same median-split-on-longest-axis
    policy the reference intended (spatial_acceleration.go:16-43);
  * flatten to arrays in DFS order with skip ("escape") pointers so
    traversal is STACKLESS: a lane either advances to the next node (hit)
    or jumps the whole subtree (miss) - a single per-lane integer cursor,
    ideal for lax.while_loop / Pallas;
  * ``closest_hit_bvh`` is the batched traversal (all lanes step their
    cursors in lockstep until every lane is done);
  * Octree (correct child-center math) and KD-tree (depth-mod-3 axis,
    midpoint split) are provided for API parity, with query helpers.

For the demo scenes (<=30 primitives) brute force is faster and exactly
matches hitWorld (renderer.go:333-346); the renderer keeps brute force
below ``BVH_THRESHOLD`` primitives.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

BVH_THRESHOLD = 64  # below this, brute force wins on TPU
# Default build leaf size. The megakernel's packet walk is latency-bound
# per NODE step (slab test + cross-lane reduce + scalar branch) while
# leaf primitive tests are vectorized and nearly free, so wide leaves
# win: ring-1000 d50/soft16 measures 1113/890/801/817 ms/frame at leaf
# 4/8/16/32 (tools/sweep_leaf_size.py, TPU v5e).
LEAF_SIZE_DEFAULT = 16
_BIG = np.float32(3.0e38)


# ---------------------------------------------------------------------------
# Flat BVH
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class FlatBVH:
    """DFS-ordered nodes with skip pointers; leaves index a permutation
    of the primitive array.

    Primitive ids follow the scene's unified ordering: pid < n_spheres is a
    sphere, else pid - n_spheres indexes the triangle table (matching the
    concatenation order of intersect.closest_hit). ``leaf_size`` records
    the build-time cap so traversal never under-tests a leaf.
    """

    node_min: jax.Array    # (N,3) AABB lower corner
    node_max: jax.Array    # (N,3) AABB upper corner
    node_skip: jax.Array   # (N,) node to jump to when the AABB misses
    node_first: jax.Array  # (N,) first primitive slot (leaves), else -1
    node_count: jax.Array  # (N,) primitive count (0 for inner nodes)
    prim_index: jax.Array  # (P,) permutation into the original primitives
    # Static: max primitives per leaf (the traversal unroll bound).
    leaf_size: int = dataclasses.field(default=4,
                                       metadata=dict(static=True))
    # Optional 4-wide view (see widen4): the megakernel's stack walk does
    # ~4x fewer latency-bound node steps than the binary skip walk.
    wide4: Optional["WideBVH4"] = None
    # Stream-mode only: the unified HBM prim-row table in leaf order
    # (megakernel.pack_stream_table), packed once at scene build so
    # jitted render calls don't re-gather it per frame.
    stream_tab: Optional[jax.Array] = None


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class WideBVH4:
    """4-ary collapse of a FlatBVH for the TPU packet walk.

    Each wide node holds up to 4 slots (a binary node's leaf children
    plus its inner children's children). The packet walk pops one wide
    node, slab-tests all 4 slots (independent -> they pipeline, unlike
    the binary walk's one serializing cross-lane reduce per node), runs
    boxed leaf slots, and pushes boxed inner slots. Offline step counts
    (tools/sim_bvh4.py): 0.22-0.26x the binary walk's steps on ring
    scenes at leaf_size 16. Empty slots carry an inverted AABB so the
    slab test can never pass. Shares the parent FlatBVH's prim_index.
    """

    slot_min: jax.Array    # (W,4,3)
    slot_max: jax.Array    # (W,4,3)
    slot_child: jax.Array  # (W,4) wide-node index for inner slots, -1 else
    slot_first: jax.Array  # (W,4) first prim slot for leaf slots, -1 else
    slot_count: jax.Array  # (W,4) prim count for leaf slots, 0 else
    # Static: proven traversal stack bound (max live entries while
    # popping depth-first with <=3 net pushes per pop).
    max_stack: int = dataclasses.field(default=8,
                                       metadata=dict(static=True))


def widen4(flat: FlatBVH) -> WideBVH4:
    """Collapse a binary FlatBVH into the 4-wide layout (host-side).

    Binary children are recovered from the DFS+skip layout (left = i+1,
    right = skip(left)). A wide node's slots are, per binary child:
    the child itself when it is a leaf, else its two children.
    """
    nmin = np.asarray(flat.node_min, np.float32)
    nmax = np.asarray(flat.node_max, np.float32)
    nskip = np.asarray(flat.node_skip)
    ncount = np.asarray(flat.node_count)
    nfirst = np.asarray(flat.node_first)

    def kids(i):
        left = i + 1
        return left, int(nskip[left])

    smin, smax, schild, sfirst, scount = [], [], [], [], []

    def emit(slots):
        """slots: list of (binary node, wide child id or -1)."""
        row_min = np.full((4, 3), _BIG, np.float32)
        row_max = np.full((4, 3), -_BIG, np.float32)
        row_c = np.full(4, -1, np.int32)
        row_f = np.full(4, -1, np.int32)
        row_n = np.zeros(4, np.int32)
        for s, (b, w) in enumerate(slots):
            row_min[s] = nmin[b]
            row_max[s] = nmax[b]
            row_c[s] = w
            if ncount[b] > 0:
                row_f[s] = nfirst[b]
                row_n[s] = ncount[b]
        smin.append(row_min)
        smax.append(row_max)
        schild.append(row_c)
        sfirst.append(row_f)
        scount.append(row_n)

    depth = [0]

    def rec(i, d):
        """i: binary INNER node -> its wide node id."""
        depth[0] = max(depth[0], d)
        my = len(smin)
        emit([])  # placeholder; filled below once children are known
        slots = []
        for c in kids(i):
            if ncount[c] > 0:
                slots.append((c, -1))
            else:
                for g in kids(c):
                    slots.append((g, -1))
        resolved = []
        for b, _ in slots:
            if ncount[b] > 0:
                resolved.append((b, -1))
            else:
                resolved.append((b, rec(b, d + 1)))
        # overwrite the placeholder row
        save = len(smin)
        emit(resolved)
        for arr in (smin, smax, schild, sfirst, scount):
            arr[my] = arr[save]
            del arr[save]
        return my

    if nmin.shape[0] == 1 and ncount[0] == 0:
        # zero-primitive sentinel tree (build_bvh's P==0 path): one wide
        # node with four empty (untestable) slots, so the walk pops it
        # and terminates without touching any leaf.
        emit([])
    elif ncount[0] > 0:  # root is a leaf: one wide node, slot 0 = root
        emit([(0, -1)])
    else:
        rec(0, 1)
    return WideBVH4(
        slot_min=np.stack(smin),
        slot_max=np.stack(smax),
        slot_child=np.stack(schild),
        slot_first=np.stack(sfirst),
        slot_count=np.stack(scount),
        max_stack=3 * max(depth[0], 1) + 1,
    )


def _sah_partition(lo, hi, idx, n_bins=16):
    """Binned surface-area-heuristic split -> (left_idx, right_idx).

    Standard binned SAH (Wald 2007): bin centroids on each axis, pick the
    (axis, bin boundary) minimizing N_L*A_L + N_R*A_R. Falls back to a
    longest-axis median when the centroids are degenerate. Leaf policy is
    the caller's (node <= leaf_size stays a leaf): on the TPU packet walk
    node steps are latency-bound while leaf primitive tests vectorize, so
    wide leaves win (BENCHMARKS.md leaf-16 note) and SAH only chooses
    INNER splits."""
    centers = (lo[idx] + hi[idx]) * 0.5
    cmin = centers.min(axis=0)
    cmax = centers.max(axis=0)
    ext = cmax - cmin

    def half_area(bmin, bmax):
        d = np.maximum(bmax - bmin, 0.0)
        return d[..., 0] * d[..., 1] + d[..., 1] * d[..., 2] \
            + d[..., 2] * d[..., 0]

    best = None  # (cost, axis, mask_left)
    for axis in range(3):
        if ext[axis] <= 0.0:
            continue
        b = np.minimum(((centers[:, axis] - cmin[axis])
                        * (n_bins / ext[axis])).astype(np.int64),
                       n_bins - 1)
        counts = np.bincount(b, minlength=n_bins)
        bin_lo = np.full((n_bins, 3), np.inf, np.float32)
        bin_hi = np.full((n_bins, 3), -np.inf, np.float32)
        np.minimum.at(bin_lo, b, lo[idx])
        np.maximum.at(bin_hi, b, hi[idx])
        # prefix/suffix sweeps over bin boundaries
        lo_l = np.minimum.accumulate(bin_lo, axis=0)
        hi_l = np.maximum.accumulate(bin_hi, axis=0)
        lo_r = np.minimum.accumulate(bin_lo[::-1], axis=0)[::-1]
        hi_r = np.maximum.accumulate(bin_hi[::-1], axis=0)[::-1]
        n_l = np.cumsum(counts)[:-1]
        n_r = idx.size - n_l
        cost = np.where(
            (n_l > 0) & (n_r > 0),
            n_l * half_area(lo_l[:-1], hi_l[:-1])
            + n_r * half_area(lo_r[1:], hi_r[1:]),
            np.inf)
        k = int(np.argmin(cost))
        if np.isfinite(cost[k]) and (best is None or cost[k] < best[0]):
            best = (float(cost[k]), axis, b <= k)
    if best is None:  # degenerate centroids: median on longest axis
        axis = int(np.argmax(hi[idx].max(0) - lo[idx].min(0)))
        med = np.argsort(centers[:, axis], kind="stable")
        half = idx.size // 2
        return idx[med[:half]], idx[med[half:]]
    return idx[best[2]], idx[~best[2]]


def _build_nodes(lo: np.ndarray, hi: np.ndarray, leaf_size: int,
                 method: str = "median"):
    """Split recursion -> (nodes list, primitive permutation).

    method 'median': longest-axis median split (matches the native
    builder's topology). 'sah': binned surface-area heuristic."""
    n = lo.shape[0]
    order = np.arange(n)
    nodes: List[Tuple[np.ndarray, np.ndarray, int, int]] = []
    perm: List[int] = []

    ends: dict = {}

    def rec(idx: np.ndarray) -> int:
        my = len(nodes)
        bmin = lo[idx].min(axis=0)
        bmax = hi[idx].max(axis=0)
        nodes.append([bmin, bmax, -1, 0, -1])  # min,max,first,count,skip
        parts = None
        if idx.size > leaf_size:
            if method == "sah":
                parts = _sah_partition(lo, hi, idx)
            else:
                centers = (lo[idx] + hi[idx]) * 0.5
                axis = int(np.argmax(bmax - bmin))  # longest axis
                med = np.argsort(centers[:, axis], kind="stable")
                half = idx.size // 2
                parts = (idx[med[:half]], idx[med[half:]])
        if parts is None:
            nodes[my][2] = len(perm)
            nodes[my][3] = idx.size
            perm.extend(idx.tolist())
        else:
            rec(parts[0])
            rec(parts[1])
        ends[my] = len(nodes)  # index just past my subtree (DFS layout)
        return my

    rec(order)
    n_nodes = len(nodes)

    # skip pointer: next node in DFS order that is NOT in my subtree -
    # i.e. where traversal resumes when my AABB misses.
    def assign_skip(i: int, skip: int) -> None:
        nodes[i][4] = skip
        if nodes[i][3] == 0:  # inner: left = i+1, right = end(left)
            left = i + 1
            left_end = ends[left]
            assign_skip(left, left_end)
            assign_skip(left_end, skip)

    assign_skip(0, n_nodes)
    return nodes, np.asarray(perm, np.int32)


def build_bvh(lo: np.ndarray, hi: np.ndarray,
              leaf_size: int = LEAF_SIZE_DEFAULT,
              method: str = "median") -> FlatBVH:
    """Build from per-primitive AABBs (P,3)+(P,3).

    method 'median' uses the native C++ builder (native/rt_native.cpp)
    when available - same layout and topology, ~100x faster for large
    scenes - with the numpy builder as fallback. 'sah' (binned
    surface-area heuristic) builds in numpy."""
    lo = np.asarray(lo, np.float32)
    hi = np.asarray(hi, np.float32)
    if lo.shape[0] == 0:
        z = np.zeros((1, 3), np.float32)
        return FlatBVH(jnp.asarray(z), jnp.asarray(z),
                       jnp.asarray([1], jnp.int32),
                       jnp.asarray([0], jnp.int32),
                       jnp.asarray([0], jnp.int32),
                       jnp.zeros((0,), jnp.int32),
                       leaf_size=leaf_size)
    if method == "median":  # the native builder is median-split only
        from . import native
        nat = native.build_bvh_native(lo, hi, leaf_size)
        if nat is not None:
            # numpy leaves on purpose: the builder chain (widen4, the
            # megakernel table packers) is host-side, and a jnp round
            # trip here costs device RPCs through the tunnel (observed
            # as multi-minute scene-build stalls at >4096 prims); jit
            # uploads the tables lazily at first use.
            nmin, nmax, nskip, nfirst, ncount, perm = nat
            return FlatBVH(node_min=nmin,
                           node_max=nmax,
                           node_skip=nskip,
                           node_first=nfirst,
                           node_count=ncount,
                           prim_index=perm,
                           leaf_size=leaf_size)
    nodes, perm = _build_nodes(lo, hi, leaf_size, method=method)
    as_np = lambda i, dt=np.float32: np.asarray([n[i] for n in nodes], dt)
    return FlatBVH(
        node_min=as_np(0),
        node_max=as_np(1),
        node_skip=np.asarray([n[4] for n in nodes], np.int32),
        node_first=np.asarray([n[2] for n in nodes], np.int32),
        node_count=np.asarray([n[3] for n in nodes], np.int32),
        prim_index=np.asarray(perm),
        leaf_size=leaf_size,
    )


def build_sphere_bvh(centers: np.ndarray, radii: np.ndarray,
                     leaf_size: int = LEAF_SIZE_DEFAULT) -> FlatBVH:
    r = np.asarray(radii)[:, None]
    c = np.asarray(centers)
    return build_bvh(c - r, c + r, leaf_size)


def build_triangle_bvh(v0, v1, v2, leaf_size: int = LEAF_SIZE_DEFAULT) -> FlatBVH:
    lo = np.minimum(np.minimum(v0, v1), v2)
    hi = np.maximum(np.maximum(v0, v1), v2)
    return build_bvh(lo, hi, leaf_size)


def build_scene_bvh(geom, leaf_size: int = LEAF_SIZE_DEFAULT) -> FlatBVH:
    """Unified BVH over a Geometry's spheres AND triangles.

    Primitive ids use the same concatenated ordering as
    intersect.closest_hit (spheres first, then triangles); infinite planes
    cannot be bounded and stay outside the tree (tested brute-force by the
    caller). This realizes the intent of spatial_acceleration.go:16-69
    (BVH accelerating hitWorld) that the reference never wired up.
    """
    c = np.asarray(geom.sph_center, np.float32)
    r = np.asarray(geom.sph_radius, np.float32)[:, None]
    v0 = np.asarray(geom.tri_v0, np.float32)
    v1 = np.asarray(geom.tri_v1, np.float32)
    v2 = np.asarray(geom.tri_v2, np.float32)
    lo = np.concatenate([c - r, np.minimum(np.minimum(v0, v1), v2)], axis=0)
    hi = np.concatenate([c + r, np.maximum(np.maximum(v0, v1), v2)], axis=0)
    tree = build_bvh(lo, hi, leaf_size)
    # Attach the 4-wide view for the megakernel's stack walk (host-side
    # collapse; must happen at scene build, not under jit).
    return dataclasses.replace(tree, wide4=widen4(tree))


def _aabb_hit(bmin, bmax, o, inv_d, t_min, t_max):
    """Slab test, vectorized over the trailing axis-3."""
    t0 = (bmin - o) * inv_d
    t1 = (bmax - o) * inv_d
    tlo = jnp.minimum(t0, t1)
    thi = jnp.maximum(t0, t1)
    near = jnp.maximum(jnp.max(tlo, axis=-1), t_min)
    far = jnp.minimum(jnp.min(thi, axis=-1), t_max)
    return near <= far


def sphere_hit_t(origin, direction, center, radius, t_min, t_best):
    """Per-lane single-sphere hit distance (BIG when none).

    Bit-identical op order to intersect.sphere_t (mul by 1/a, same sqrt
    guard) so the BVH path reproduces brute-force hits exactly."""
    oc = origin - center
    a = jnp.sum(direction * direction, axis=-1)
    half_b = jnp.sum(oc * direction, axis=-1)
    c = jnp.sum(oc * oc, axis=-1) - radius * radius
    disc = half_b * half_b - a * c
    ok = disc >= 0.0
    sq = jnp.sqrt(jnp.where(ok, disc, 1.0))
    inv_a = 1.0 / a
    r0 = (-half_b - sq) * inv_a
    r1 = (-half_b + sq) * inv_a
    in0 = ok & (r0 >= t_min) & (r0 <= t_best)
    in1 = ok & (r1 >= t_min) & (r1 <= t_best)
    return jnp.where(in0, r0, jnp.where(in1, r1, _BIG))


def tri_hit_t(origin, direction, v0, e1, e2, t_min, t_best):
    """Per-lane single-triangle Moller-Trumbore distance (BIG when none).

    v0/e1/e2 are per-lane gathers (B,3); same eps-1e-6 determinant test
    as the batched form (triangle.go:42)."""
    h = jnp.cross(direction, e2)
    a = jnp.sum(e1 * h, axis=-1)
    degen = jnp.abs(a) < 1e-6
    f = 1.0 / jnp.where(degen, 1.0, a)
    s = origin - v0
    u = f * jnp.sum(s * h, axis=-1)
    q = jnp.cross(s, e1)
    v = f * jnp.sum(direction * q, axis=-1)
    t = f * jnp.sum(e2 * q, axis=-1)
    valid = ((~degen) & (u >= 0.0) & (u <= 1.0) & (v >= 0.0)
             & (u + v <= 1.0) & (t >= t_min) & (t <= t_best))
    return jnp.where(valid, t, _BIG)


def closest_hit_bvh(bvh: FlatBVH, centers, radii, origin, direction,
                    t_min=1e-3, max_leaf: Optional[int] = None):
    """Stackless closest-hit over a sphere BVH, batched over lanes.

    Every lane walks its own cursor: AABB hit -> descend (cursor+1),
    miss -> jump skip pointer; leaves test <= max_leaf primitives with
    masked selects. Loop ends when all cursors reach the end. Returns
    (t, prim_id) with t = BIG / prim_id = -1 on miss.
    """
    if max_leaf is None:
        max_leaf = bvh.leaf_size  # never under-test a leaf
    n_nodes = bvh.node_min.shape[0]
    B = origin.shape[:-1]
    inv_d = 1.0 / jnp.where(direction == 0.0, 1e-30, direction)

    def cond(c):
        cursor = c[0]
        return jnp.any(cursor < n_nodes)

    def body(c):
        cursor, t_best, best_id = c
        cur = jnp.minimum(cursor, n_nodes - 1)
        bmin = jnp.take(bvh.node_min, cur, axis=0)
        bmax = jnp.take(bvh.node_max, cur, axis=0)
        skip = jnp.take(bvh.node_skip, cur, axis=0)
        first = jnp.take(bvh.node_first, cur, axis=0)
        count = jnp.take(bvh.node_count, cur, axis=0)
        active = cursor < n_nodes
        hit_box = active & _aabb_hit(bmin, bmax, origin, inv_d, t_min,
                                     t_best)
        is_leaf = count > 0
        # leaf: test up to max_leaf primitives
        for j in range(max_leaf):
            slot = jnp.minimum(first + j, bvh.prim_index.shape[0] - 1)
            pid = jnp.take(bvh.prim_index, slot, axis=0)
            cen = jnp.take(centers, pid, axis=0)
            rad = jnp.take(radii, pid, axis=0)
            t = sphere_hit_t(origin, direction, cen, rad, t_min, t_best)
            valid = hit_box & is_leaf & (j < count) & (t < t_best)
            t_best = jnp.where(valid, t, t_best)
            best_id = jnp.where(valid, pid, best_id)
        descend = hit_box & ~is_leaf
        nxt = jnp.where(descend, cur + 1, skip)
        cursor = jnp.where(active, nxt, cursor)
        return cursor, t_best, best_id

    cursor0 = jnp.zeros(B, jnp.int32)
    t0 = jnp.full(B, _BIG)
    id0 = jnp.full(B, -1, jnp.int32)
    _, t, pid = jax.lax.while_loop(cond, body, (cursor0, t0, id0))
    return t, pid


def traverse_closest(bvh: FlatBVH, geom, origin, direction,
                     t_min=1e-3, t_max=_BIG):
    """Closest hit over a unified sphere+triangle scene BVH.

    origin/direction: (..., 3) lanes, walked in lockstep (one int32 cursor
    per lane; AABB hit -> cursor+1, miss -> skip pointer). Leaves test up
    to bvh.leaf_size primitives; each slot is dispatched by pid: spheres
    (pid < Ns, sphere.go:22-59 math) vs triangles (triangle.go:36-82).
    Returns (t, pid) with t = BIG / pid = -1 on miss; pid uses the
    concatenated [spheres, triangles] ordering. Infinite planes are not in
    the tree - callers test them separately (intersect._closest_hit_accel).
    """
    ns = geom.sph_center.shape[0]
    nt = geom.tri_v0.shape[0]
    # Cube faces [occl_tris, Nt) are hit as boxes by the CALLER
    # (intersect._closest_hit_accel seeds t_best with the box winner);
    # masked here so they cannot double-win.
    occl = getattr(geom, "occl_tris", -1)
    nt_occl = nt if occl < 0 else occl
    n_nodes = bvh.node_min.shape[0]
    B = origin.shape[:-1]
    inv_d = 1.0 / jnp.where(direction == 0.0, 1e-30, direction)
    if nt:
        tri_e1 = geom.tri_v1 - geom.tri_v0
        tri_e2 = geom.tri_v2 - geom.tri_v0

    def cond(c):
        return jnp.any(c[0] < n_nodes)

    def body(c):
        cursor, t_best, best_id = c
        cur = jnp.minimum(cursor, n_nodes - 1)
        bmin = jnp.take(bvh.node_min, cur, axis=0)
        bmax = jnp.take(bvh.node_max, cur, axis=0)
        skip = jnp.take(bvh.node_skip, cur, axis=0)
        first = jnp.take(bvh.node_first, cur, axis=0)
        count = jnp.take(bvh.node_count, cur, axis=0)
        active = cursor < n_nodes
        hit_box = active & _aabb_hit(bmin, bmax, origin, inv_d, t_min,
                                     t_best)
        is_leaf = count > 0
        for j in range(bvh.leaf_size):
            slot = jnp.minimum(first + j, bvh.prim_index.shape[0] - 1)
            pid = jnp.take(bvh.prim_index, slot, axis=0)
            if ns and nt:
                is_s = pid < ns
                sidx = jnp.minimum(pid, ns - 1)
                tidx = jnp.clip(pid - ns, 0, nt - 1)
                cen = jnp.take(geom.sph_center, sidx, axis=0)
                rad = jnp.take(geom.sph_radius, sidx, axis=0)
                t_s = sphere_hit_t(origin, direction, cen, rad, t_min,
                                   t_best)
                v0 = jnp.take(geom.tri_v0, tidx, axis=0)
                e1 = jnp.take(tri_e1, tidx, axis=0)
                e2 = jnp.take(tri_e2, tidx, axis=0)
                t_t = jnp.where(tidx < nt_occl,
                                tri_hit_t(origin, direction, v0, e1, e2,
                                          t_min, t_best), _BIG)
                t = jnp.where(is_s, t_s, t_t)
            elif ns:
                cen = jnp.take(geom.sph_center, pid, axis=0)
                rad = jnp.take(geom.sph_radius, pid, axis=0)
                t = sphere_hit_t(origin, direction, cen, rad, t_min,
                                 t_best)
            else:
                v0 = jnp.take(geom.tri_v0, pid, axis=0)
                e1 = jnp.take(tri_e1, pid, axis=0)
                e2 = jnp.take(tri_e2, pid, axis=0)
                t = jnp.where(pid < nt_occl,
                              tri_hit_t(origin, direction, v0, e1, e2,
                                        t_min, t_best), _BIG)
            valid = hit_box & is_leaf & (j < count) & (t < t_best)
            t_best = jnp.where(valid, t, t_best)
            best_id = jnp.where(valid, pid, best_id)
        descend = hit_box & ~is_leaf
        nxt = jnp.where(descend, cur + 1, skip)
        cursor = jnp.where(active, nxt, cursor)
        return cursor, t_best, best_id

    cursor0 = jnp.zeros(B, jnp.int32)
    t0 = jnp.minimum(jnp.broadcast_to(jnp.asarray(t_max, origin.dtype), B),
                     _BIG)
    id0 = jnp.full(B, -1, jnp.int32)
    _, t, pid = jax.lax.while_loop(cond, body, (cursor0, t0, id0))
    # Lanes that never beat t_max report BIG (miss), matching brute force.
    return jnp.where(pid >= 0, t, _BIG), pid


def traverse_any(bvh: FlatBVH, geom, origin, direction, t_min, t_max,
                 exact=False):
    """Any-hit (occlusion) over a unified scene BVH; (B,) bool.

    t_max may be per-lane (B,) or scalar. A blocked lane jumps its cursor
    to the end immediately - shadow rays from lit regions terminate in a
    handful of node steps. Planes are not in the tree (see traverse_closest).
    ``exact=True`` uses the closest-hit triangle expressions (tri_hit_t)
    instead of the division-free form - the conservative-mask contract,
    see intersect.any_hit.
    """
    ns = geom.sph_center.shape[0]
    nt = geom.tri_v0.shape[0]
    # Cube faces [occl_tris, Nt) are excluded: the CALLER tests their
    # boxes instead (intersect.any_hit accel branch / box_blocked).
    occl = getattr(geom, "occl_tris", -1)
    nt_occl = nt if occl < 0 else occl
    n_nodes = bvh.node_min.shape[0]
    B = origin.shape[:-1]
    inv_d = 1.0 / jnp.where(direction == 0.0, 1e-30, direction)
    tm = jnp.broadcast_to(jnp.asarray(t_max, origin.dtype), B)
    if nt:
        tri_e1 = geom.tri_v1 - geom.tri_v0
        tri_e2 = geom.tri_v2 - geom.tri_v0

    def cond(c):
        return jnp.any(c[0] < n_nodes)

    def _tri_blocked(v0, e1, e2):
        # Division-free any-hit, mirroring intersect.triangle_blocked's
        # expression order exactly (shadow verdicts must agree with the
        # brute-force path bit-for-bit away from rounding boundaries).
        if exact:
            return tri_hit_t(origin, direction, v0, e1, e2, t_min,
                             tm) < _BIG
        s = origin - v0
        n2 = jnp.cross(e1, e2)
        c1 = jnp.cross(e2, s)
        q = jnp.cross(s, e1)
        det = -jnp.sum(direction * n2, axis=-1)
        sg = jnp.where(det >= 0.0, 1.0, -1.0)
        ad = det * sg
        au = jnp.sum(direction * c1, axis=-1) * sg
        av = jnp.sum(direction * q, axis=-1) * sg
        at = jnp.sum(e2 * q, axis=-1) * sg
        return ((ad >= 1e-6) & (au >= 0.0) & (av >= 0.0)
                & (au + av <= ad) & (at >= t_min * ad) & (at <= tm * ad))

    def body(c):
        cursor, blocked = c
        cur = jnp.minimum(cursor, n_nodes - 1)
        bmin = jnp.take(bvh.node_min, cur, axis=0)
        bmax = jnp.take(bvh.node_max, cur, axis=0)
        skip = jnp.take(bvh.node_skip, cur, axis=0)
        first = jnp.take(bvh.node_first, cur, axis=0)
        count = jnp.take(bvh.node_count, cur, axis=0)
        active = cursor < n_nodes
        hit_box = active & _aabb_hit(bmin, bmax, origin, inv_d, t_min, tm)
        is_leaf = count > 0
        hit_any = jnp.zeros(B, bool)
        for j in range(bvh.leaf_size):
            slot = jnp.minimum(first + j, bvh.prim_index.shape[0] - 1)
            pid = jnp.take(bvh.prim_index, slot, axis=0)
            if ns and nt:
                is_s = pid < ns
                sidx = jnp.minimum(pid, ns - 1)
                tidx = jnp.clip(pid - ns, 0, nt - 1)
                cen = jnp.take(geom.sph_center, sidx, axis=0)
                rad = jnp.take(geom.sph_radius, sidx, axis=0)
                t_s = sphere_hit_t(origin, direction, cen, rad, t_min, tm)
                v0 = jnp.take(geom.tri_v0, tidx, axis=0)
                e1 = jnp.take(tri_e1, tidx, axis=0)
                e2 = jnp.take(tri_e2, tidx, axis=0)
                hit = jnp.where(is_s, t_s < _BIG,
                                _tri_blocked(v0, e1, e2)
                                & (tidx < nt_occl))
            elif ns:
                cen = jnp.take(geom.sph_center, pid, axis=0)
                rad = jnp.take(geom.sph_radius, pid, axis=0)
                hit = sphere_hit_t(origin, direction, cen, rad, t_min,
                                   tm) < _BIG
            else:
                v0 = jnp.take(geom.tri_v0, pid, axis=0)
                e1 = jnp.take(tri_e1, pid, axis=0)
                e2 = jnp.take(tri_e2, pid, axis=0)
                hit = _tri_blocked(v0, e1, e2) & (pid < nt_occl)
            hit_any |= hit_box & is_leaf & (j < count) & hit
        blocked = blocked | hit_any
        descend = hit_box & ~is_leaf
        nxt = jnp.where(blocked, n_nodes, jnp.where(descend, cur + 1, skip))
        cursor = jnp.where(active, nxt, cursor)
        return cursor, blocked

    cursor0 = jnp.zeros(B, jnp.int32)
    blocked0 = jnp.zeros(B, bool)
    _, blocked = jax.lax.while_loop(cond, body, (cursor0, blocked0))
    return blocked


def _ray_aabb_host(o: np.ndarray, d: np.ndarray, lo, hi,
                   t_min: float, t_max: float) -> bool:
    """Host-side scalar slab test (the AABB.Hit the reference's
    spatial_acceleration.go calls but never defined - SURVEY §2.3)."""
    with np.errstate(divide="ignore", invalid="ignore"):
        inv = 1.0 / np.where(d == 0.0, 1e-300, d)
    t0 = (np.asarray(lo, np.float64) - o) * inv
    t1 = (np.asarray(hi, np.float64) - o) * inv
    near = max(float(np.minimum(t0, t1).max()), t_min)
    far = min(float(np.maximum(t0, t1).min()), t_max)
    return near <= far


# ---------------------------------------------------------------------------
# Octree (correct child-center math, cf. spatial_acceleration.go:115-119)
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class OctreeNode:
    center: np.ndarray
    half: float
    depth: int
    indices: List[int]
    children: Optional[List["OctreeNode"]] = None


class Octree:
    """Host-side octree over AABBs (insert w/ subdivision)."""

    def __init__(self, lo: np.ndarray, hi: np.ndarray,
                 max_depth: int = 8, max_objects: int = 8):
        self.lo = np.asarray(lo, np.float64)
        self.hi = np.asarray(hi, np.float64)
        self.max_depth = max_depth
        self.max_objects = max_objects
        world_lo = self.lo.min(axis=0) if len(self.lo) else np.zeros(3)
        world_hi = self.hi.max(axis=0) if len(self.hi) else np.ones(3)
        center = (world_lo + world_hi) / 2.0
        half = float((world_hi - world_lo).max() / 2.0) or 1.0
        self.root = OctreeNode(center, half, 0, [])
        for i in range(len(self.lo)):
            self._insert(self.root, i)

    def _fits_child(self, node: OctreeNode, i: int, octant: int) -> bool:
        c = self._child_center(node, octant)
        h = node.half / 2.0
        return bool(np.all(self.lo[i] >= c - h) and
                    np.all(self.hi[i] <= c + h))

    @staticmethod
    def _child_center(node: OctreeNode, octant: int) -> np.ndarray:
        # The reference's version used (i&2),(i&4) directly as offsets
        # (values 0/2 and 0/4); the correct form is +-half/2 per axis:
        h = node.half / 2.0
        return node.center + np.array([
            h if octant & 1 else -h,
            h if octant & 2 else -h,
            h if octant & 4 else -h,
        ])

    def _insert(self, node: OctreeNode, i: int) -> None:
        if node.children is None:
            node.indices.append(i)
            if (len(node.indices) > self.max_objects
                    and node.depth < self.max_depth):
                self._subdivide(node)
            return
        for octant in range(8):
            if self._fits_child(node, i, octant):
                self._insert(node.children[octant], i)
                return
        node.indices.append(i)  # straddles children: stays here

    def _subdivide(self, node: OctreeNode) -> None:
        node.children = [
            OctreeNode(self._child_center(node, o), node.half / 2.0,
                       node.depth + 1, [])
            for o in range(8)
        ]
        staying = []
        for i in node.indices:
            for octant in range(8):
                if self._fits_child(node, i, octant):
                    node.children[octant].indices.append(i)
                    break
            else:
                staying.append(i)
        node.indices = staying

    def query_point(self, p: np.ndarray) -> List[int]:
        """Objects whose AABB contains p."""
        p = np.asarray(p, np.float64)
        out: List[int] = []

        def rec(node: OctreeNode):
            if np.any(np.abs(p - node.center) > node.half):
                return
            for i in node.indices:
                if np.all(self.lo[i] <= p) and np.all(p <= self.hi[i]):
                    out.append(i)
            if node.children:
                for ch in node.children:
                    rec(ch)

        rec(self.root)
        return sorted(out)

    def query_ray(self, origin, direction, t_min: float = 1e-3,
                  t_max: float = float(_BIG)) -> List[int]:
        """Object indices whose AABB the ray hits within [t_min, t_max].

        The working form of Octree.Hit's descent
        (spatial_acceleration.go:141-171: gate on the node cube, test own
        objects, recurse children): every object lives at a node whose
        cube contains its AABB, so pruning by cube-hit is exact.
        """
        o = np.asarray(origin, np.float64)
        d = np.asarray(direction, np.float64)
        out: List[int] = []

        def rec(node: OctreeNode):
            if not _ray_aabb_host(o, d, node.center - node.half,
                                  node.center + node.half, t_min, t_max):
                return
            for i in node.indices:
                if _ray_aabb_host(o, d, self.lo[i], self.hi[i],
                                  t_min, t_max):
                    out.append(i)
            if node.children:
                for ch in node.children:
                    rec(ch)

        rec(self.root)
        return sorted(out)

    def closest_hit(self, origin, direction, hit_t,
                    t_min: float = 1e-3,
                    t_max: float = float(_BIG)) -> Tuple[float, int]:
        """Closest hit via pruned descent; (t, index) or (t_max-ish, -1).

        ``hit_t(i, t_min, t_max) -> float`` returns the primitive hit
        distance or +inf. Mirrors Octree.Hit's narrowing closestT
        (spatial_acceleration.go:150-168) but prunes child cubes against
        the CURRENT best t instead of rescanning them all.
        """
        o = np.asarray(origin, np.float64)
        d = np.asarray(direction, np.float64)
        best = [float(t_max), -1]

        def rec(node: OctreeNode):
            if not _ray_aabb_host(o, d, node.center - node.half,
                                  node.center + node.half, t_min, best[0]):
                return
            for i in node.indices:
                t = hit_t(i, t_min, best[0])
                if t_min <= t < best[0]:
                    best[0], best[1] = float(t), i
            if node.children:
                for ch in node.children:
                    rec(ch)

        rec(self.root)
        return (best[0], best[1]) if best[1] >= 0 else (float(_BIG), -1)

    def node_count(self) -> int:
        n = 0
        stack = [self.root]
        while stack:
            node = stack.pop()
            n += 1
            if node.children:
                stack.extend(node.children)
        return n


# ---------------------------------------------------------------------------
# KD-tree (depth-mod-3 axis, midpoint split - spatial_acceleration.go:173-300)
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class KDNode:
    axis: int
    split: float
    indices: List[int]
    left: Optional["KDNode"] = None
    right: Optional["KDNode"] = None
    # Union of contained objects' AABBs (the Go KDTree's Box field,
    # spatial_acceleration.go:173-179). Gating traversal on this instead
    # of plane-interval clipping alone fixes the reference's straddler
    # miss: its centroid partition puts an object wholly on one side even
    # when its extent crosses the split plane.
    box_lo: Optional[np.ndarray] = None
    box_hi: Optional[np.ndarray] = None


class KDTree:
    """Host-side k-d tree over AABB centroids."""

    def __init__(self, lo: np.ndarray, hi: np.ndarray,
                 max_depth: int = 16, leaf_size: int = 8):
        self.lo = np.asarray(lo, np.float64)
        self.hi = np.asarray(hi, np.float64)
        self.centers = (self.lo + self.hi) / 2.0
        self.leaf_size = leaf_size
        self.max_depth = max_depth
        idx = list(range(len(self.lo)))
        self.root = self._build(idx, 0)

    def _build(self, idx: List[int], depth: int) -> Optional[KDNode]:
        if not idx:
            return None
        blo = self.lo[idx].min(axis=0)
        bhi = self.hi[idx].max(axis=0)
        axis = depth % 3
        if len(idx) <= self.leaf_size or depth >= self.max_depth:
            return KDNode(axis, 0.0, idx, box_lo=blo, box_hi=bhi)
        vals = self.centers[idx, axis]
        split = float((vals.min() + vals.max()) / 2.0)  # midpoint
        left = [i for i in idx if self.centers[i, axis] < split]
        right = [i for i in idx if self.centers[i, axis] >= split]
        if not left or not right:  # degenerate: leaf
            return KDNode(axis, split, idx, box_lo=blo, box_hi=bhi)
        return KDNode(axis, split, [],
                      self._build(left, depth + 1),
                      self._build(right, depth + 1),
                      box_lo=blo, box_hi=bhi)

    def query_range(self, lo, hi) -> List[int]:
        """Objects whose AABB overlaps [lo, hi]."""
        lo = np.asarray(lo, np.float64)
        hi = np.asarray(hi, np.float64)
        out: List[int] = []

        def overlaps(i: int) -> bool:
            return bool(np.all(self.lo[i] <= hi)
                        and np.all(lo <= self.hi[i]))

        def rec(node: Optional[KDNode]):
            if node is None:
                return
            if node.left is None and node.right is None:
                out.extend(i for i in node.indices if overlaps(i))
                return
            if lo[node.axis] < node.split:
                rec(node.left)
            if hi[node.axis] >= node.split:
                rec(node.right)

        rec(self.root)
        return sorted(out)

    def _ordered_children(self, node: KDNode, o: np.ndarray,
                          d: np.ndarray):
        """(near, far) child order for a ray (KDTree.Hit's rayDir>0 swap,
        spatial_acceleration.go:260-283)."""
        if d[node.axis] > 0 or (d[node.axis] == 0
                                and o[node.axis] < node.split):
            return node.left, node.right
        return node.right, node.left

    def query_ray(self, origin, direction, t_min: float = 1e-3,
                  t_max: float = float(_BIG)) -> List[int]:
        """Object indices whose AABB the ray hits within [t_min, t_max].

        Near/far ordered descent gated on per-node boxes - the working
        form of KDTree.Hit (spatial_acceleration.go:244-300, which also
        nil-panics on one-sided nodes and drops all but the first object
        of a multi-object leaf)."""
        o = np.asarray(origin, np.float64)
        d = np.asarray(direction, np.float64)
        out: List[int] = []

        def rec(node: Optional[KDNode]):
            if node is None or not _ray_aabb_host(
                    o, d, node.box_lo, node.box_hi, t_min, t_max):
                return
            if node.left is None and node.right is None:
                for i in node.indices:
                    if _ray_aabb_host(o, d, self.lo[i], self.hi[i],
                                      t_min, t_max):
                        out.append(i)
                return
            near, far = self._ordered_children(node, o, d)
            rec(near)
            rec(far)

        rec(self.root)
        return sorted(out)

    def closest_hit(self, origin, direction, hit_t,
                    t_min: float = 1e-3,
                    t_max: float = float(_BIG)) -> Tuple[float, int]:
        """Closest hit via near/far ordered descent; (t, index) or
        (BIG, -1).

        ``hit_t(i, t_min, t_max) -> float`` returns the primitive hit
        distance or +inf. Visiting the near child first lets the far
        child's box test prune against an already-found closer t - the
        early-exit the reference's ordered traversal was reaching for."""
        o = np.asarray(origin, np.float64)
        d = np.asarray(direction, np.float64)
        best = [float(t_max), -1]

        def rec(node: Optional[KDNode]):
            if node is None or not _ray_aabb_host(
                    o, d, node.box_lo, node.box_hi, t_min, best[0]):
                return
            if node.left is None and node.right is None:
                for i in node.indices:
                    t = hit_t(i, t_min, best[0])
                    if t_min <= t < best[0]:
                        best[0], best[1] = float(t), i
                return
            near, far = self._ordered_children(node, o, d)
            rec(near)
            rec(far)

        rec(self.root)
        return (best[0], best[1]) if best[1] >= 0 else (float(_BIG), -1)

    def depth(self) -> int:
        def rec(node, d):
            if node is None:
                return d
            return max(rec(node.left, d + 1), rec(node.right, d + 1))
        return rec(self.root, 0)
