"""Material table: SoA arrays + vectorized scatter, TPU-native.

The reference dispatches materials through a Go interface
(internal/material/material.go:9-16) with seven live implementations
(Lambertian, Metal, ShinyMaterial, PerfectMirror, Glass, Dielectric,
DiffuseLight - see internal/scene/scene.go:104-148 for the loader dispatch).
Interface dispatch does not vectorize; here every material is a row in a
struct-of-arrays table and scatter() evaluates all branches with masked
selects - the idiomatic SPMD form of a material switch.

Property-getter parity (GetAlbedo/GetRoughness/GetMetallic/GetSpecular,
material.go:41-55,135-149,211-225,266-280,304-317 and
advanced_materials.go:51-66,151-171) is baked into the table at build time,
so the renderer reads plain arrays.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import numpy as np
import jax
import jax.numpy as jnp

# Material kinds (order is part of the on-device ABI).
LAMBERTIAN = 0
METAL = 1
SHINY = 2
PERFECT_MIRROR = 3
GLASS = 4
DIELECTRIC = 5
DIFFUSE_LIGHT = 6

KIND_NAMES = {
    "lambertian": LAMBERTIAN,
    "metal": METAL,
    "shiny": SHINY,
    "perfectmirror": PERFECT_MIRROR,
    "glass": GLASS,
    "dielectric": DIELECTRIC,
    "diffuselight": DIFFUSE_LIGHT,
}


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MaterialTable:
    """SoA material table; one row per scene material."""

    kind: jax.Array        # (M,) int32
    albedo: jax.Array      # (M,3) raw color param
    roughness: jax.Array   # (M,)
    metallic: jax.Array    # (M,) effective GetMetallic()
    specular: jax.Array    # (M,) effective GetSpecular()
    ior: jax.Array         # (M,) refraction index
    emit: jax.Array        # (M,3) Emitted()
    eff_albedo: jax.Array  # (M,3) effective GetAlbedo() (dielectric -> 1s, light -> 0s)

    def row(self, idx):
        """Gather one logical material per lane: dict of per-lane params."""
        take = lambda a: jnp.take(a, idx, axis=0)
        return {
            "kind": take(self.kind),
            "albedo": take(self.albedo),
            "roughness": take(self.roughness),
            "metallic": take(self.metallic),
            "specular": take(self.specular),
            "ior": take(self.ior),
            "emit": take(self.emit),
            "eff_albedo": take(self.eff_albedo),
        }


def _get(mdata: Dict[str, Any], key: str, default: float) -> float:
    v = mdata.get(key)
    return default if v is None else float(v)


def _color(mdata: Dict[str, Any], default=(1.0, 1.0, 1.0)):
    c = mdata.get("color")
    if c is None:
        # NOTE: the Go loader panics on a missing color (scene.go:109-146
        # asserts materialData["color"].([]interface{}) with no nil check);
        # we choose a neutral white default instead of crashing.
        return list(default)
    return [float(c[0]), float(c[1]), float(c[2])]


def material_row(mdata: Dict[str, Any]) -> Dict[str, Any]:
    """One table row from a scene-JSON material dict (scene.go:104-148)."""
    mtype = str(mdata.get("type", "lambertian")).lower()
    kind = KIND_NAMES.get(mtype, LAMBERTIAN)  # unknown type -> lambertian (scene.go:144-147)

    albedo = _color(mdata)
    rough = min(_get(mdata, "roughness", 0.0), 1.0)
    emit = [0.0, 0.0, 0.0]
    ior = 1.5

    if kind == LAMBERTIAN:
        rough, metallic, specular = 1.0, 0.0, 0.0
        eff_albedo = albedo
    elif kind == METAL:
        metallic = min(_get(mdata, "metallic", 1.0), 1.0)
        specular = min(_get(mdata, "specular", 1.0), 1.0)
        ior = 1.5  # material.go:71
        eff_albedo = albedo
    elif kind == SHINY:
        metallic = min(_get(mdata, "metallic", 0.0), 1.0)
        specular = min(_get(mdata, "specular", 1.0), 1.0)
        ior = 1.5  # material.go:166
        eff_albedo = albedo
    elif kind == PERFECT_MIRROR:
        metallic, specular = 1.0, 1.0  # advanced_materials.go:161-171
        ior = 2.0  # advanced_materials.go:119
        eff_albedo = albedo
    elif kind == GLASS:
        metallic, specular = 0.0, 1.0  # advanced_materials.go:55-66
        rough = 0.0
        ior = _get(mdata, "refractionIndex", 1.5)
        eff_albedo = albedo
    elif kind == DIELECTRIC:
        metallic, specular = 0.0, 1.0  # material.go:270-280
        rough = 0.0
        ior = _get(mdata, "refractionIndex", 1.5)
        eff_albedo = [1.0, 1.0, 1.0]
        albedo = [1.0, 1.0, 1.0]
    else:  # DIFFUSE_LIGHT
        metallic, specular = 0.0, 0.0
        rough = 1.0  # material.go:308-310
        emit = albedo  # DiffuseLight emits its color (scene.go:141-142)
        eff_albedo = [0.0, 0.0, 0.0]

    return dict(kind=kind, albedo=albedo, roughness=rough, metallic=metallic,
                specular=specular, ior=ior, emit=emit, eff_albedo=eff_albedo)


def build_table(rows, dtype=jnp.float32) -> MaterialTable:
    """Stack material rows into a MaterialTable (at least one row)."""
    if not rows:
        rows = [material_row({"type": "lambertian", "color": [0, 0, 0]})]
    f = lambda k: jnp.asarray(np.array([r[k] for r in rows]), dtype)
    return MaterialTable(
        kind=jnp.asarray(np.array([r["kind"] for r in rows]), jnp.int32),
        albedo=f("albedo"),
        roughness=f("roughness"),
        metallic=f("metallic"),
        specular=f("specular"),
        ior=f("ior"),
        emit=f("emit"),
        eff_albedo=f("eff_albedo"),
    )


# ---------------------------------------------------------------------------
# Vectorized scatter
# ---------------------------------------------------------------------------

def _pow5(x):
    """x**5 preserving sign for negative bases.

    The reference calls math.Pow(1-cosTheta, 5) where cosTheta is computed
    from an UNNORMALIZED ray direction (material.go:85,123-125), so the base
    can be negative; Go's Pow with an odd integer exponent keeps the sign,
    while jnp.power would produce NaN. Multiply instead.
    """
    x2 = x * x
    return x2 * x2 * x


def _dot(a, b):
    return jnp.sum(a * b, axis=-1, keepdims=True)


def _normalize(v, eps=0.0):
    """Go Vec3.Normalize(): zero vector stays zero (vector.go:61-67)."""
    n = jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True))
    return jnp.where(n > 0.0, v / jnp.where(n > 0.0, n, 1.0), 0.0)


def _reflect(d, n):
    return d - 2.0 * _dot(d, n) * n


def _refract(v, n, eta):
    """Go Vec3.Refract incl. its TIR fallback branch (vector.go:81-96)."""
    cos = _dot(v, n)
    flip = cos > 0.0
    n2 = jnp.where(flip, -n, n)
    eta2 = jnp.where(flip, 1.0 / eta, eta)
    cos2 = jnp.where(flip, -cos, cos)
    sin_t2 = eta2 * eta2 * (1.0 - cos2 * cos2)
    tir = sin_t2 > 1.0
    # Double-where keeps reverse-mode AD NaN-free at the TIR boundary
    # (sqrt'(0) = inf would otherwise leak through the select below).
    cos_t2 = jnp.sqrt(jnp.where(tir, 1.0, jnp.maximum(1.0 - sin_t2, 0.0)))
    refracted = v * eta2 - n2 * (eta2 * cos2 + cos_t2)
    return jnp.where(tir, _reflect(v, n2), refracted)


def _schlick_scalar(cos, ref_idx):
    """reflectance() (material.go:282-286)."""
    r0 = (1.0 - ref_idx) / (1.0 + ref_idx)
    r0 = r0 * r0
    return r0 + (1.0 - r0) * _pow5(1.0 - cos)


def scatter(mat, ray_dir, normal, front_face, ball, pick_u):
    """Vectorized Material.Scatter over a batch of lanes.

    Args:
      mat: dict of per-lane material params from MaterialTable.row().
      ray_dir: (B,3) incoming ray direction (NOT normalized - parity with Go).
      normal: (B,3) shading normal (front-face flipped).
      front_face: (B,) bool.
      ball: (B,3) uniform unit-ball sample (one per lane per bounce).
      pick_u: (B,) uniform for the dielectric reflect/refract branch.

    Returns:
      (scatter_dir (B,3), attenuation (B,3), did_scatter (B,) bool)
    """
    kind = mat["kind"]
    rough = mat["roughness"][..., None]
    metallic = mat["metallic"][..., None]
    spec = mat["specular"][..., None]
    ior = mat["ior"][..., None]
    albedo = mat["albedo"]

    # --- shared geometry terms -------------------------------------------
    reflected = _reflect(ray_dir, normal)
    # Metal/Shiny/PerfectMirror Fresnel uses |raw_dir . normal| (material.go:85).
    cos_raw = jnp.abs(_dot(ray_dir, normal))
    f0 = ((ior - 1.0) / (ior + 1.0)) ** 2
    fresnel = f0 + (1.0 - f0) * _pow5(1.0 - cos_raw)  # (B,1)

    # --- Lambertian (material.go:26-35) ----------------------------------
    lam_dir = normal + ball
    near_zero = jnp.all(jnp.abs(lam_dir) < 1e-8, axis=-1, keepdims=True)
    lam_dir = _normalize(jnp.where(near_zero, normal, lam_dir))

    # --- Metal (material.go:75-113) ---------------------------------------
    perturbed = _normalize(reflected + ball * rough)
    metal_dir = jnp.where(rough > 0.001, perturbed, reflected)
    fs = 0.6 + metallic * 0.4
    metal_att = jnp.clip(albedo * (1.0 - fs) + fresnel * fs, 0.0, 1.0)
    mfs = 0.4 + metallic * 0.5
    metal_att = jnp.where(metallic > 0.8,
                          metal_att * (1.0 - mfs) + fresnel * mfs, metal_att)

    # --- Shiny (material.go:169-189) --------------------------------------
    shiny_dir = jnp.where(rough > 0.0, perturbed, reflected)
    ss = 0.4 + spec * 0.4
    shiny_att = jnp.minimum(1.0, albedo * (1.0 - ss) + fresnel * ss)

    # --- PerfectMirror (advanced_materials.go:125-149) ---------------------
    pm_dir = metal_dir  # same >0.001 gate
    pm_att = albedo * 0.1 + fresnel * 0.9

    # --- Glass / Dielectric (advanced_materials.go:21-46, material.go:235-260)
    unit_dir = _normalize(ray_dir)
    ratio = jnp.where(front_face[..., None], 1.0 / ior, ior)
    cos_t = jnp.minimum(_dot(-unit_dir, normal), 1.0)
    sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
    cannot = ratio * sin_t > 1.0
    refl_p = _schlick_scalar(cos_t, ratio)
    use_reflect = cannot | (refl_p > pick_u[..., None])
    glass_dir = jnp.where(use_reflect, _reflect(unit_dir, normal),
                          _refract(unit_dir, normal, ratio))
    # Glass attenuates by its tint; Dielectric by (1,1,1) = eff albedo row.
    glass_att = albedo

    # --- select by kind -----------------------------------------------------
    k = kind[..., None]
    out_dir = jnp.where(k == LAMBERTIAN, lam_dir,
              jnp.where(k == METAL, metal_dir,
              jnp.where(k == SHINY, shiny_dir,
              jnp.where(k == PERFECT_MIRROR, pm_dir, glass_dir))))
    out_att = jnp.where(k == LAMBERTIAN, albedo,
              jnp.where(k == METAL, metal_att,
              jnp.where(k == SHINY, shiny_att,
              jnp.where(k == PERFECT_MIRROR, pm_att, glass_att))))
    did_scatter = kind != DIFFUSE_LIGHT  # DiffuseLight.Scatter -> false (material.go:296-298)
    return out_dir, out_att, did_scatter
