"""Wavefront OBJ triangle meshes as a scene object type.

The reference's only triangle sources are the cube expansion
(scene.go:150-190) and the loader-skipped triangularPrism; its Mesh type
(scene.go:192-209) is just a linear-scan triangle list. This module adds
real model import on top of the same triangle SoA: a minimal OBJ parser
(``v``/``f`` records, fan triangulation, negative indices) plus a
position/scale/yaw placement transform. Meshes expand into the scene's
triangle arrays exactly like cubes do, so every engine (jnp oracle,
Pallas unroll/bvh/loop kernels), the BVH builders, and the differentiable
path handle them with no special casing. Irregular meshes are also where
the binned-SAH builder (``bvh.build_bvh(method="sah")``) earns its keep —
ring benchmarks preferred median splits (BENCHMARKS.md).
"""
from __future__ import annotations

import math
import os
from typing import List, Sequence, Tuple, Union

import numpy as np

__all__ = ["parse_obj", "load_obj", "place_mesh", "mesh_triangles"]


def parse_obj(text: str) -> Tuple[np.ndarray, np.ndarray]:
    """Parse OBJ source into (vertices [N,3] f64, faces [M,3] i32).

    Supports ``v x y z`` and ``f`` records; face vertices may be ``i``,
    ``i/t``, ``i//n`` or ``i/t/n`` (only the position index is used),
    1-based per the spec, with negative indices counting back from the
    vertices read so far. Polygons with >3 vertices are fan-triangulated
    around their first vertex. Zero-area (repeated-index) triangles are
    dropped. Everything else (vn/vt/o/g/s/usemtl/comments) is ignored.
    """
    verts: List[List[float]] = []
    faces: List[List[int]] = []
    for ln, raw in enumerate(text.splitlines(), 1):
        line = raw.strip()
        if not line or line.startswith("#"):
            continue
        parts = line.split()
        tag = parts[0]
        if tag == "v":
            if len(parts) < 4:
                raise ValueError(f"OBJ line {ln}: v needs 3 coordinates")
            verts.append([float(parts[1]), float(parts[2]), float(parts[3])])
        elif tag == "f":
            if len(parts) < 4:
                raise ValueError(f"OBJ line {ln}: f needs >=3 vertices")
            idx = []
            for tok in parts[1:]:
                s = tok.split("/")[0]
                i = int(s)
                if i < 0:
                    i += len(verts)       # -1 = most recent vertex
                else:
                    i -= 1                # OBJ is 1-based
                if not 0 <= i < len(verts):
                    raise ValueError(
                        f"OBJ line {ln}: vertex index {tok} out of range")
                idx.append(i)
            for k in range(1, len(idx) - 1):   # fan triangulation
                a, b, c = idx[0], idx[k], idx[k + 1]
                if a != b and b != c and a != c:
                    faces.append([a, b, c])
        # vn/vt/vp/o/g/s/usemtl/mtllib: ignored
    v = np.asarray(verts, np.float64).reshape(len(verts), 3)
    f = np.asarray(faces, np.int32).reshape(len(faces), 3)
    return v, f


def load_obj(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """parse_obj over a file (relative paths resolve from the cwd)."""
    with open(path) as fh:
        return parse_obj(fh.read())


def place_mesh(verts: np.ndarray,
               position: Sequence[float] = (0.0, 0.0, 0.0),
               scale: Union[float, Sequence[float]] = 1.0,
               rotation_y: float = 0.0) -> np.ndarray:
    """Model -> world: scale, then yaw about +Y (degrees), then translate.

    The same placement fields scene JSON carries for cubes
    (position/size); scale may be a scalar or per-axis [sx, sy, sz].
    """
    v = np.asarray(verts, np.float64)
    s = np.asarray(scale, np.float64)
    v = v * (s if s.shape == (3,) else float(s))
    if rotation_y:
        th = math.radians(float(rotation_y))
        c, sn = math.cos(th), math.sin(th)
        x, y, z = v[:, 0].copy(), v[:, 1], v[:, 2].copy()
        v = np.stack([c * x + sn * z, y, -sn * x + c * z], axis=1)
    return v + np.asarray(position, np.float64)


def mesh_triangles(verts: np.ndarray, faces: np.ndarray):
    """(v0, v1, v2) triangle list in the scene loader's add_tris shape."""
    v = np.asarray(verts, np.float64)
    return [(v[a], v[b], v[c]) for a, b, c in np.asarray(faces)]


def mesh_from_dict(obj: dict, base_dir: str = "."):
    """Triangle list for a scene-JSON mesh object.

    Schema: ``{"type": "mesh", "path": "model.obj", "position": [...],
    "scale": s | [sx,sy,sz], "rotationY": deg, "material": {...}}``.
    The Go loader would silently skip the unknown type (scene.go:80-83),
    so --go-parity mode drops it; see scene.from_dict.
    """
    path = obj.get("path")
    if not path:
        raise ValueError("mesh object needs a 'path' to an OBJ file")
    if not os.path.isabs(path):
        path = os.path.join(base_dir, path)
    verts, faces = load_obj(path)
    verts = place_mesh(verts,
                       position=obj.get("position", (0.0, 0.0, 0.0)),
                       scale=obj.get("scale", 1.0),
                       rotation_y=float(obj.get("rotationY", 0.0)))
    return mesh_triangles(verts, faces)
