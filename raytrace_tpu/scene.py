"""Scene schema + loader: JSON -> struct-of-arrays pytree.

Mirrors the reference JSON schema (internal/scene/scene.go:12-39) but honors
the full schema superset that the Go loader silently drops:
  * ``triangularPrism`` objects (dropped at scene.go:80-83 even though the
    demo scene demo-assets/final_silver_prism_purple_cube_.json:35,48 uses
    them) - implemented here, gated by ``go_parity`` to reproduce the skip.
  * ``renderer`` / ``atmospheric`` / ``volumetric`` / ``fog`` / post-FX
    blocks (absent from the Go struct at scene.go:12-16) - parsed and
    surfaced so the renderer/effects pipeline can honor them.

Geometry becomes flat SoA arrays: spheres as (center, radius, mat_id) and all
mesh triangles flattened into one (v0, v1, v2, normal, mat_id) table; the Go
per-mesh linear scan (scene.go:196-209) is equivalent to a flat closest-hit
over the concatenation.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from .models import materials as mat_mod


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Camera:
    """Camera parameters (scene.go:18-24). Arrays so they are differentiable."""

    position: jax.Array      # (3,)
    look_at: jax.Array       # (3,)
    up: jax.Array            # (3,)
    fov: jax.Array           # ()
    aspect_ratio: jax.Array  # ()


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Geometry:
    """Flat SoA scene geometry."""

    sph_center: jax.Array   # (Ns,3)
    sph_radius: jax.Array   # (Ns,)
    sph_mat: jax.Array      # (Ns,) int32
    tri_v0: jax.Array       # (Nt,3)
    tri_v1: jax.Array       # (Nt,3)
    tri_v2: jax.Array       # (Nt,3)
    tri_normal: jax.Array   # (Nt,3) unit face normal (loader-built triangles
                            # share one normal across vertices, triangle.go:13-20,
                            # so barycentric interpolation is the identity)
    tri_mat: jax.Array      # (Nt,) int32
    # Infinite planes (geometry/plane.go:7-71 - live code the Go JSON
    # loader could never reach; reachable here via {"type": "plane"}).
    pl_point: jax.Array = dataclasses.field(
        default_factory=lambda: jnp.zeros((0, 3), jnp.float32))
    pl_normal: jax.Array = dataclasses.field(
        default_factory=lambda: jnp.zeros((0, 3), jnp.float32))
    pl_mat: jax.Array = dataclasses.field(
        default_factory=lambda: jnp.zeros((0,), jnp.int32))
    # Axis-aligned boxes: the HIT form of cubes. The loader still
    # expands every cube to 12 triangles (scene.go:150-185 parity; the
    # conservative primary-hit masks and the BVH keep using them), but
    # both the closest-hit and the occlusion tests treat the closed box
    # as ONE primitive: the slab interval's endpoints [near, far] are
    # its only surface crossings, so closest-hit takes near-else-far in
    # range (exactly sphere_t's two-root rule, intersect.box_t; outward
    # normal reconstructed point-based as the dominant axis of
    # (p - center)/half) and any-hit blocks iff either crossing is in
    # range (intersect.box_blocked). One test replaces 12 in the
    # 16-sample soft-shadow loop and in every bounce's closest hit.
    # The loader orders cube triangles LAST and sets occl_tris; hit
    # results match the 12-triangle form except at float rounding
    # boundaries (edges/grazing - measure-zero, same class as the
    # documented engine-divergence gates).
    box_min: jax.Array = dataclasses.field(
        default_factory=lambda: jnp.zeros((0, 3), jnp.float32))
    box_max: jax.Array = dataclasses.field(
        default_factory=lambda: jnp.zeros((0, 3), jnp.float32))
    box_mat: jax.Array = dataclasses.field(
        default_factory=lambda: jnp.zeros((0,), jnp.int32))
    # Triangles [0, occl_tris) participate in any-hit; [occl_tris, Nt)
    # are cube faces covered by box_min/box_max. -1 = all (no boxes).
    occl_tris: int = dataclasses.field(default=-1,
                                       metadata=dict(static=True))
    # Optional per-vertex normals, (Nt, 9) = [n0.xyz, n1.xyz, n2.xyz]:
    # barycentric-interpolated at hit time for smooth shading
    # (triangle.go:84-88 calculateInterpolatedNormal / the
    # NewTriangleWithNormals constructor). None (the default, and the
    # state for every scene without an OBJ mesh carrying ``vn``) keeps
    # flat face-normal shading bit-identical to before AND keeps the
    # triangle SMEM table at its historical 13 rows - None vs array is
    # part of the pytree structure, so each state jit-specializes.
    # Flat triangles inside a smooth scene carry their face normal in
    # all three slots (interpolation then reproduces it up to one
    # normalize rounding).
    tri_vn: Optional[jax.Array] = None


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Lights:
    """Point lights (scene.go:34-39)."""

    position: jax.Array   # (L,3)
    color: jax.Array      # (L,3)
    intensity: jax.Array  # (L,)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Scene:
    camera: Camera
    geometry: Geometry
    materials: mat_mod.MaterialTable
    lights: Lights
    # Optional spatial acceleration: a bvh.FlatBVH over the scene's
    # spheres+triangles (None for small scenes, where brute force is
    # faster AND reverse-differentiable - the BVH walk is a while_loop,
    # so rt/diff keeps accel off). Attached automatically by from_dict
    # past bvh.BVH_THRESHOLD primitives; see with_accel().
    accel: Optional[Any] = None

    @property
    def num_objects(self) -> int:
        # "objects" in the Go benchmark JSON counts hittables (spheres +
        # meshes), not triangles (renderer.go:109). Tracked host-side.
        return int(self.sph_count + self.mesh_count)

    # host-side metadata (static, not part of the pytree) ------------------
    # set via object.__setattr__ in load; defaults for constructed scenes
    sph_count: int = dataclasses.field(default=0, metadata=dict(static=True))
    mesh_count: int = dataclasses.field(default=0, metadata=dict(static=True))


def with_accel(scene: "Scene", leaf_size: Optional[int] = None) -> "Scene":
    """Return the scene with a freshly built sphere+triangle BVH attached
    (the working form of what spatial_acceleration.go aspired to wire into
    hitWorld). ``leaf_size`` defaults to bvh.LEAF_SIZE_DEFAULT (tuned for
    the TPU packet walk; see the sweep note there)."""
    from . import bvh as bvh_mod
    n = (scene.geometry.sph_center.shape[0]
         + scene.geometry.tri_v0.shape[0])
    if n == 0:
        return scene
    if leaf_size is None:
        # Use the same primitive count _kernel_mode thresholds on
        # (spheres + triangles + planes) so the leaf-size policy and the
        # stream/bvh mode decision can't disagree for plane-heavy scenes.
        leaf_size = _accel_leaf_size(n + scene.geometry.pl_point.shape[0])
    accel = bvh_mod.build_scene_bvh(scene.geometry, leaf_size)
    # The builder keeps numpy leaves (host-side chain); upload once so
    # jitted render calls don't re-upload the tables every frame.
    scene = dataclasses.replace(scene,
                                accel=jax.tree.map(jnp.asarray, accel))
    return _attach_stream_table(scene)


def _attach_stream_table(scene: "Scene") -> "Scene":
    """For stream-scale scenes (> MAX_BVH_KERNEL_PRIMS), pack the unified
    HBM prim-row table ONCE at build time and hang it off the accel.
    trace_pallas otherwise rebuilds it inside every jitted render call -
    a full-table gather+pad per frame for a static scene (up to ~134 MB
    at the 262,144-prim cap)."""
    from .ops import megakernel as _mk
    if getattr(scene, "accel", None) is None:
        return scene
    n = (scene.geometry.sph_center.shape[0]
         + scene.geometry.tri_v0.shape[0]
         + scene.geometry.pl_point.shape[0])
    if n <= _mk.MAX_BVH_KERNEL_PRIMS:
        return scene
    tab = _mk.pack_stream_table(scene)
    return dataclasses.replace(
        scene, accel=dataclasses.replace(scene.accel, stream_tab=tab))


def _accel_leaf_size(n: int) -> int:
    """Default BVH leaf size by scene scale: LEAF_SIZE_DEFAULT for the
    SMEM packet walk; past MAX_BVH_KERNEL_PRIMS (stream kernel) the leaf
    size GROWS with the scene so the SMEM node table stays bounded - a
    195K-prim tree at leaf 32 builds ~16K nodes (~590 KB of the 1 MB
    SMEM) and the trace kernel OOMs once scratch + aux tables land on
    top (observed round 5). Node-count estimate: the median split makes
    between n/leaf and 2n/leaf leaves, so <= 4n/leaf nodes; cap their
    table at ~400 KB. Leaf 32..128 measured within +-8% on stream
    scenes (BENCHMARKS "Beyond 4096" tuning), so bigger leaves are
    safe."""
    from . import bvh as bvh_mod
    from .ops import megakernel as _mk
    if n <= _mk.MAX_BVH_KERNEL_PRIMS:
        return bvh_mod.LEAF_SIZE_DEFAULT
    leaf = 32
    while leaf < 512 and (4 * n // leaf) * 36 > 400_000:
        leaf *= 2
    return leaf


def _vec3(v, default=(0.0, 0.0, 0.0)) -> List[float]:
    if v is None:
        return list(default)
    if isinstance(v, dict):
        return [float(v.get("X", 0)), float(v.get("Y", 0)), float(v.get("Z", 0))]
    return [float(v[0]), float(v[1]), float(v[2])]


def _cube_triangles(position, size):
    """Cube -> 12 triangles, exact vertex/face ordering of scene.go:150-185."""
    px, py, pz = position
    hx, hy, hz = size[0] / 2.0, size[1] / 2.0, size[2] / 2.0
    verts = np.array([
        [px - hx, py - hy, pz - hz],
        [px + hx, py - hy, pz - hz],
        [px + hx, py + hy, pz - hz],
        [px - hx, py + hy, pz - hz],
        [px - hx, py - hy, pz + hz],
        [px + hx, py - hy, pz + hz],
        [px + hx, py + hy, pz + hz],
        [px - hx, py + hy, pz + hz],
    ])
    faces = [[0, 1, 2, 3], [1, 5, 6, 2], [5, 4, 7, 6],
             [4, 0, 3, 7], [3, 2, 6, 7], [4, 5, 1, 0]]
    tris = []
    for f in faces:
        v0, v1, v2, v3 = (verts[i] for i in f)
        tris.append((v0, v1, v2))
        tris.append((v0, v2, v3))
    return tris


def _prism_triangles(vertices):
    """Triangular prism (6 vertices: front face 0-2, back face 3-5) -> 8 tris.

    The Go loader has no prism support (silently skipped, scene.go:80-83);
    this realizes the advertised object type: two triangular caps + three
    quad sides split into triangles.
    """
    v = [np.asarray(_vec3(p)) for p in vertices]
    tris = [
        (v[0], v[1], v[2]),              # front cap
        (v[3], v[5], v[4]),              # back cap (reversed winding)
        (v[0], v[3], v[4]), (v[0], v[4], v[1]),  # bottom side
        (v[1], v[4], v[5]), (v[1], v[5], v[2]),  # slanted side
        (v[2], v[5], v[3]), (v[2], v[3], v[0]),  # other slanted side
    ]
    return tris


def _face_normal(v0, v1, v2):
    n = np.cross(v1 - v0, v2 - v0)
    ln = np.linalg.norm(n)
    return n / ln if ln > 0 else n


@dataclasses.dataclass
class SceneConfig:
    """Host-side config blocks the Go struct drops (scene.go:12-16)."""

    renderer: Dict[str, Any] = dataclasses.field(default_factory=dict)
    atmospheric: Dict[str, Any] = dataclasses.field(default_factory=dict)
    volumetric: Dict[str, Any] = dataclasses.field(default_factory=dict)
    fog: Dict[str, Any] = dataclasses.field(default_factory=dict)
    effects: Dict[str, Any] = dataclasses.field(default_factory=dict)
    name: str = "demo_scene"  # GetSceneName() is hardcoded (scene.go:100-102)


def from_dict(data: Dict[str, Any], go_parity: bool = False,
              dtype=jnp.float32, build_accel: Optional[bool] = None,
              base_dir: str = "."):
    """Build (Scene, SceneConfig) from a parsed scene dict.

    go_parity=True reproduces the reference loader exactly, including
    silently skipping unknown object types such as triangularPrism.
    build_accel: attach a scene BVH (None = auto: only past
    bvh.BVH_THRESHOLD primitives; pass False for differentiable use).
    base_dir resolves relative asset paths (mesh OBJ files); load()
    passes the scene file's directory.
    """
    cam_d = data.get("camera", {})
    camera = Camera(
        position=jnp.asarray(_vec3(cam_d.get("position")), dtype),
        look_at=jnp.asarray(_vec3(cam_d.get("lookAt")), dtype),
        up=jnp.asarray(_vec3(cam_d.get("up"), (0, 1, 0)), dtype),
        fov=jnp.asarray(float(cam_d.get("fov", 60.0)), dtype),
        aspect_ratio=jnp.asarray(float(cam_d.get("aspectRatio", 1.0)), dtype),
    )

    mat_rows = []
    sph_c, sph_r, sph_m = [], [], []
    tri_v0, tri_v1, tri_v2, tri_n, tri_m = [], [], [], [], []
    tri_vn: List = []  # per-triangle (n0, n1, n2) or None (flat)
    # Cube faces are kept separately and concatenated LAST so hit paths
    # can swap them for box slab tests (Geometry.occl_tris). Cube k owns
    # triangles [occl_tris + 12k, occl_tris + 12(k+1)).
    cub_v0, cub_v1, cub_v2, cub_n, cub_m = [], [], [], [], []
    box_lo, box_hi, box_m = [], [], []
    pl_p, pl_n, pl_m = [], [], []
    sph_count = 0
    mesh_count = 0

    mat_key_index: Dict[tuple, int] = {}

    def add_material(mdata) -> int:
        # go_parity: extended kinds (subsurface/anisotropic/clearcoat/
        # sheen/emission) degrade to lambertian, exactly the Go loader's
        # unknown-type fallback (scene.go:144-147). Identical materials
        # are deduplicated (pure table compression: per-object behavior
        # is unchanged; the Go renderer never compares material identity).
        row = mat_mod.material_row(
            mdata or {"type": "lambertian"}, extended=not go_parity)
        key = mat_mod.row_key(row)
        idx = mat_key_index.get(key)
        if idx is None:
            idx = len(mat_rows)
            mat_rows.append(row)
            mat_key_index[key] = idx
        return idx

    def add_tris(tris, mid):
        # Items are (v0, v1, v2) for flat triangles or
        # (v0, v1, v2, (n0, n1, n2)) for smooth-shaded ones
        # (NewTriangleWithNormals, triangle.go:22-34).
        for item in tris:
            v0, v1, v2 = item[0], item[1], item[2]
            tri_v0.append(v0)
            tri_v1.append(v1)
            tri_v2.append(v2)
            tri_n.append(_face_normal(np.asarray(v0, np.float64),
                                      np.asarray(v1, np.float64),
                                      np.asarray(v2, np.float64)))
            tri_vn.append(item[3] if len(item) > 3 else None)
            tri_m.append(mid)

    for obj in data.get("objects", []):
        otype = str(obj.get("type", "")).lower()
        if otype == "sphere":
            mid = add_material(obj.get("material"))
            sph_c.append(_vec3(obj.get("position")))
            sph_r.append(float(obj.get("radius", 1.0)))
            sph_m.append(mid)
            sph_count += 1
        elif otype == "cube":
            mid = add_material(obj.get("material"))
            pos = _vec3(obj.get("position"))
            size = _vec3(obj.get("size"), (1, 1, 1))
            for v0, v1, v2 in _cube_triangles(pos, size):
                cub_v0.append(v0)
                cub_v1.append(v1)
                cub_v2.append(v2)
                cub_n.append(_face_normal(np.asarray(v0, np.float64),
                                          np.asarray(v1, np.float64),
                                          np.asarray(v2, np.float64)))
                cub_m.append(mid)
            box_lo.append([pos[k] - size[k] / 2.0 for k in range(3)])
            box_hi.append([pos[k] + size[k] / 2.0 for k in range(3)])
            box_m.append(mid)
            mesh_count += 1
        elif otype == "triangularprism" and not go_parity:
            mid = add_material(obj.get("material"))
            add_tris(_prism_triangles(obj.get("vertices", [])), mid)
            mesh_count += 1
        elif otype == "mesh" and not go_parity:
            # OBJ model import (models/mesh.py) — beyond the reference,
            # whose only triangle sources are cubes and the skipped
            # prism; gated so --go-parity reproduces scene.go:80-83.
            from .models import mesh as mesh_mod
            mid = add_material(obj.get("material"))
            add_tris(mesh_mod.mesh_from_dict(obj, base_dir), mid)
            mesh_count += 1
        elif otype == "plane" and not go_parity:
            # geometry/plane.go:7-11: infinite plane (point, normal). The
            # Go loader cannot produce one (scene.go:69-83); gated like
            # the prism so --go-parity reproduces the skip.
            mid = add_material(obj.get("material"))
            pl_p.append(_vec3(obj.get("position")))
            n = np.asarray(_vec3(obj.get("normal"), (0, 1, 0)), np.float64)
            ln = np.linalg.norm(n)
            pl_n.append((n / ln if ln > 0 else n).tolist())
            pl_m.append(mid)
            mesh_count += 1
        else:
            # Unknown type: skipped, same as scene.go:80-83.
            continue

    lights_d = data.get("lights", [])
    l_pos = [_vec3(l.get("position")) for l in lights_d]
    l_col = [_vec3(l.get("color"), (1, 1, 1)) for l in lights_d]
    l_int = [float(l.get("intensity", 1.0)) for l in lights_d]

    def arr(x, shape, dt=dtype):
        return jnp.asarray(np.array(x, np.float64).reshape(shape), dt)

    # Concatenate cube faces after all other triangle sources; any-hit
    # paths then cover [0, occl_tris) + the boxes (see Geometry). Note
    # the reorder can flip closest-hit ties between EXACTLY coincident
    # cube/non-cube faces - Go iterates scene order with strict "<" -
    # but coincident coplanar surfaces are degenerate input.
    n_occl = len(tri_v0) if box_lo else -1
    tri_v0 += cub_v0
    tri_v1 += cub_v1
    tri_v2 += cub_v2
    tri_n += cub_n
    tri_m += cub_m
    tri_vn += [None] * len(cub_v0)

    ns, nt, nl, npl = len(sph_c), len(tri_v0), len(l_pos), len(pl_p)
    vn_arr = None
    if any(v is not None for v in tri_vn):
        # At least one smooth triangle: build the (Nt, 9) table, flat
        # triangles replicating their unit face normal in all 3 slots.
        vn_rows = []
        for k, v in enumerate(tri_vn):
            if v is None:
                vn_rows.append(np.tile(np.asarray(tri_n[k], np.float64), 3))
            else:
                vn_rows.append(np.concatenate(
                    [np.asarray(v[j], np.float64) for j in range(3)]))
        vn_arr = jnp.asarray(
            np.array(vn_rows, np.float64).reshape(nt, 9), dtype)
    geometry = Geometry(
        sph_center=arr(sph_c, (ns, 3)),
        sph_radius=arr(sph_r, (ns,)),
        sph_mat=jnp.asarray(np.array(sph_m, np.int32).reshape(ns), jnp.int32),
        tri_v0=arr(tri_v0, (nt, 3)),
        tri_v1=arr(tri_v1, (nt, 3)),
        tri_v2=arr(tri_v2, (nt, 3)),
        tri_normal=arr(tri_n, (nt, 3)),
        tri_mat=jnp.asarray(np.array(tri_m, np.int32).reshape(nt), jnp.int32),
        pl_point=arr(pl_p, (npl, 3)),
        pl_normal=arr(pl_n, (npl, 3)),
        pl_mat=jnp.asarray(np.array(pl_m, np.int32).reshape(npl), jnp.int32),
        box_min=arr(box_lo, (len(box_lo), 3)),
        box_max=arr(box_hi, (len(box_hi), 3)),
        box_mat=jnp.asarray(np.array(box_m, np.int32).reshape(len(box_m)),
                            jnp.int32),
        occl_tris=n_occl,
        tri_vn=vn_arr,
    )
    lights = Lights(
        position=arr(l_pos, (nl, 3)),
        color=arr(l_col, (nl, 3)),
        intensity=arr(l_int, (nl,)),
    )
    scene = Scene(camera=camera, geometry=geometry,
                  materials=mat_mod.build_table(mat_rows, dtype),
                  lights=lights, sph_count=sph_count, mesh_count=mesh_count)
    if build_accel is None:
        from . import bvh as bvh_mod
        build_accel = (ns + nt) >= bvh_mod.BVH_THRESHOLD
        if vn_arr is not None:
            # Smooth scenes leave unroll mode earlier (VMEM spill, see
            # megakernel._kernel_mode); give them the BVH so they land
            # in the packet-walk kernel instead of the loop fallback.
            from .ops import megakernel as mk_mod
            build_accel = build_accel or (
                ns + nt + npl > mk_mod.UNROLL_PRIM_LIMIT_VN)
    if build_accel:
        # Build from the HOST-side arrays (the jnp Geometry's leaves may
        # already live on a remote device; pulling them back for the
        # builder costs device->host RPCs that have stalled for minutes
        # through the tunnel at >4096 prims). build_scene_bvh only needs
        # centers/radii/vertices.
        import types
        host_geom = types.SimpleNamespace(
            sph_center=np.array(sph_c, np.float32).reshape(ns, 3),
            sph_radius=np.array(sph_r, np.float32).reshape(ns),
            tri_v0=np.array(tri_v0, np.float32).reshape(nt, 3),
            tri_v1=np.array(tri_v1, np.float32).reshape(nt, 3),
            tri_v2=np.array(tri_v2, np.float32).reshape(nt, 3))
        from . import bvh as bvh_mod
        # Leaf-size policy keyed on the SAME count _kernel_mode uses
        # (spheres + triangles + planes), so plane-heavy scenes pushed
        # into stream mode get the stream-tuned leaf size.
        accel = bvh_mod.build_scene_bvh(host_geom,
                                        _accel_leaf_size(ns + nt + npl))
        # One host->device upload: numpy pytree leaves would otherwise
        # re-upload on EVERY jitted render call.
        scene = dataclasses.replace(
            scene, accel=jax.tree.map(jnp.asarray, accel))
        scene = _attach_stream_table(scene)

    cfg = SceneConfig(
        renderer=data.get("renderer", {}) or {},
        atmospheric=data.get("atmospheric", {}) or {},
        volumetric=data.get("volumetric", {}) or {},
        fog=data.get("fog", {}) or {},
        effects={k: data.get(k, {}) or {} for k in
                 ("motionBlur", "depthOfField", "lensFlare", "bloom",
                  "chromaticAberration", "vignette")},
    )
    return scene, cfg


def load(path: str, go_parity: bool = False, dtype=jnp.float32,
         build_accel: Optional[bool] = None):
    """LoadFromFile equivalent (scene.go:45-57)."""
    with open(path) as f:
        data = json.load(f)
    return from_dict(data, go_parity=go_parity, dtype=dtype,
                     build_accel=build_accel,
                     base_dir=os.path.dirname(os.path.abspath(path)))
