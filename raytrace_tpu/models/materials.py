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
# Extended kinds: the scatter/emit behaviors advanced_materials.go defines
# but the Go loader can never construct (SURVEY.md §2.1 "unused-by-loader").
# Reachable here from scene JSON (outside --go-parity); scenes using them
# take the jnp engine (the megakernel stays lean for the live-seven).
SUBSURFACE = 7       # advanced_materials.go:212-244
ANISOTROPIC = 8      # :246-278
CLEARCOAT = 9        # :280-330 (over a lambertian base; see scatter())
SHEEN = 10           # :332-368
EMISSION = 11        # :370-414 (point/directional/area modes)
MIRROR = 12          # :68-109 (scatter FALSE when reflection dips below
                     # the surface, :88 - the only kind whose did_scatter
                     # is data-dependent)

KIND_NAMES = {
    "lambertian": LAMBERTIAN,
    "metal": METAL,
    "shiny": SHINY,
    "perfectmirror": PERFECT_MIRROR,
    "glass": GLASS,
    "dielectric": DIELECTRIC,
    "diffuselight": DIFFUSE_LIGHT,
}

EXTENDED_KIND_NAMES = {
    **KIND_NAMES,
    "subsurface": SUBSURFACE,
    "anisotropic": ANISOTROPIC,
    "clearcoat": CLEARCOAT,
    "sheen": SHEEN,
    "emission": EMISSION,
    "mirror": MIRROR,
}

EMISSION_POINT, EMISSION_DIRECTIONAL, EMISSION_AREA = 0.0, 1.0, 2.0


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
    # Extended-kind parameters (zeros for the live seven):
    aux_vec: jax.Array = dataclasses.field(
        default_factory=lambda: jnp.zeros((0, 3), jnp.float32))
    # (M,3): SSS absorption / anisotropy direction / sheen color
    aux_a: jax.Array = dataclasses.field(
        default_factory=lambda: jnp.zeros((0,), jnp.float32))
    # (M,): SSS radius / anisotropy / clearcoat strength / sheen rough /
    #       emission mode
    aux_b: jax.Array = dataclasses.field(
        default_factory=lambda: jnp.zeros((0,), jnp.float32))
    # (M,): SSS phase / clearcoat roughness / sheen tint / emission falloff
    # Static: True when any extended kind is present (forces jnp engine and
    # enables the extra scatter branches).
    has_advanced: bool = dataclasses.field(
        default=False, metadata=dict(static=True))
    # Static: ((mat_index, texture_object), ...) procedural-texture bindings
    # (frozen texture dataclasses from models.textures, hashable). Evaluated
    # per hit point by the jnp engine (trace._bounce_body); the texture ->
    # albedo integration point the reference never built.
    textures: tuple = dataclasses.field(
        default=(), metadata=dict(static=True))

    def row(self, idx):
        """Gather one logical material per lane: dict of per-lane params."""
        take = lambda a: jnp.take(a, idx, axis=0)
        out = {
            "kind": take(self.kind),
            "albedo": take(self.albedo),
            "roughness": take(self.roughness),
            "metallic": take(self.metallic),
            "specular": take(self.specular),
            "ior": take(self.ior),
            "emit": take(self.emit),
            "eff_albedo": take(self.eff_albedo),
            "has_advanced": self.has_advanced,
        }
        if self.has_advanced:
            out["aux_vec"] = take(self.aux_vec)
            out["aux_a"] = take(self.aux_a)
            out["aux_b"] = take(self.aux_b)
        return out


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


def material_row(mdata: Dict[str, Any],
                 extended: bool = True) -> Dict[str, Any]:
    """One table row from a scene-JSON material dict (scene.go:104-148).

    extended=False reproduces the Go loader exactly (the extended kinds
    fall back to lambertian like any unknown type, scene.go:144-147).
    """
    mtype = str(mdata.get("type", "lambertian")).lower()
    names = EXTENDED_KIND_NAMES if extended else KIND_NAMES
    kind = names.get(mtype, LAMBERTIAN)  # unknown -> lambertian (scene.go:144-147)

    albedo = _color(mdata)
    rough = min(_get(mdata, "roughness", 0.0), 1.0)
    emit = [0.0, 0.0, 0.0]
    ior = 1.5
    aux_vec = [0.0, 0.0, 0.0]
    aux_a = 0.0
    aux_b = 0.0

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
    elif kind == DIFFUSE_LIGHT:
        metallic, specular = 0.0, 0.0
        rough = 1.0  # material.go:308-310
        emit = albedo  # DiffuseLight emits its color (scene.go:141-142)
        eff_albedo = [0.0, 0.0, 0.0]
    elif kind == SUBSURFACE:
        # advanced_materials.go:40-54: BaseColor, ScatteringRadius,
        # PhaseFunction, Absorption
        metallic, specular = 0.0, 0.0
        eff_albedo = albedo
        aux_vec = list(mdata.get("absorption", (1.0, 1.0, 1.0)))
        aux_a = _get(mdata, "scatteringRadius", 1.0)
        aux_b = _get(mdata, "phaseFunction", 1.0)
    elif kind == ANISOTROPIC:
        # :74-88: BaseColor, Roughness, Anisotropy, Direction
        metallic, specular = 0.0, 0.0
        eff_albedo = albedo
        aux_vec = list(mdata.get("direction", (1.0, 0.0, 0.0)))
        aux_a = _get(mdata, "anisotropy", 0.0)
    elif kind == CLEARCOAT:
        # :108-122 over a lambertian base (the Go loader cannot express
        # arbitrary-base composition either); strength/roughness/IOR
        metallic, specular = 0.0, 0.0
        eff_albedo = albedo
        ior = _get(mdata, "clearcoatIOR", 1.5)
        aux_a = _get(mdata, "strength", 0.5)
        aux_b = _get(mdata, "clearcoatRoughness", 0.1)
    elif kind == SHEEN:
        # :332-345: BaseColor, SheenColor, SheenRoughness, SheenTint
        metallic, specular = 0.0, 0.0
        eff_albedo = albedo
        aux_vec = list(mdata.get("sheenColor", (1.0, 1.0, 1.0)))
        aux_a = _get(mdata, "sheenRoughness", 0.3)
        aux_b = _get(mdata, "sheenTint", 0.5)
    elif kind == MIRROR:
        # advanced_materials.go:96-108: GetMetallic/GetSpecular both 1.0;
        # roughness capped at 1 (:76), plain color attenuation.
        metallic, specular = 1.0, 1.0
        eff_albedo = albedo
    else:  # EMISSION
        # :370-392: Color, Intensity, EmissionType, Falloff
        metallic, specular = 0.0, 0.0
        intensity = _get(mdata, "intensity", 1.0)
        emit = [c * intensity for c in albedo]
        eff_albedo = [0.0, 0.0, 0.0]
        mode = str(mdata.get("emissionType", "point")).lower()
        aux_a = {"point": EMISSION_POINT,
                 "directional": EMISSION_DIRECTIONAL,
                 "area": EMISSION_AREA}.get(mode, EMISSION_POINT)
        aux_b = _get(mdata, "falloff", 0.0)

    row = dict(kind=kind, albedo=albedo, roughness=rough, metallic=metallic,
               specular=specular, ior=ior, emit=emit, eff_albedo=eff_albedo,
               aux_vec=aux_vec, aux_a=aux_a, aux_b=aux_b)
    tex = mdata.get("texture") if extended else None
    if tex:
        from . import textures as tex_mod
        row["texture"] = tex_mod.texture_from_dict(tex)
    return row


def row_key(row: Dict[str, Any]) -> tuple:
    """Hashable identity of a material row (for load-time deduplication:
    a 1000-object scene usually has far fewer distinct materials, and the
    kernel's masked material gather is O(table rows) per bounce)."""
    return (row["kind"], tuple(row["albedo"]), row["roughness"],
            row["metallic"], row["specular"], row["ior"],
            tuple(row["emit"]), tuple(row["eff_albedo"]),
            tuple(row["aux_vec"]), row["aux_a"], row["aux_b"],
            row.get("texture"))


def build_table(rows, dtype=jnp.float32) -> MaterialTable:
    """Stack material rows into a MaterialTable (at least one row)."""
    if not rows:
        rows = [material_row({"type": "lambertian", "color": [0, 0, 0]})]
    f = lambda k: jnp.asarray(np.array([r[k] for r in rows]), dtype)
    kinds = [r["kind"] for r in rows]
    textures = tuple((i, r["texture"]) for i, r in enumerate(rows)
                     if r.get("texture") is not None)
    return MaterialTable(
        kind=jnp.asarray(np.array(kinds), jnp.int32),
        albedo=f("albedo"),
        roughness=f("roughness"),
        metallic=f("metallic"),
        specular=f("specular"),
        ior=f("ior"),
        emit=f("emit"),
        eff_albedo=f("eff_albedo"),
        aux_vec=f("aux_vec"),
        aux_a=f("aux_a"),
        aux_b=f("aux_b"),
        has_advanced=any(k > DIFFUSE_LIGHT for k in kinds),
        textures=textures,
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

    # --- extended kinds (advanced_materials.go, unreachable in Go) ---------
    # Branches only traced when the scene's table carries an extended kind
    # (has_advanced is static), so live-seven scenes pay nothing.
    if mat.get("has_advanced"):
        av = mat["aux_vec"]              # (B,3)
        aa = mat["aux_a"][..., None]     # (B,1)
        ab = mat["aux_b"][..., None]     # (B,1)

        # Subsurface (:56-67): dir = ball * phase; att = base * (abs * r).
        sss_dir = ball * ab
        sss_att = albedo * (av * aa)

        # Anisotropic (:90-101): roughness modulated by direction . normal.
        arough = rough * (1.0 + aa * _dot(av, normal))
        ani_pert = _normalize(reflected + ball * arough)
        ani_dir = jnp.where(arough > 0.0, ani_pert, reflected)

        # Clearcoat (:124-157) over a lambertian base: base dir + Schlick
        # blend of attenuations (clearcoat layer's own ray is discarded,
        # :127). `fresnel` above already uses |raw_dir . n| and this row's
        # IOR - exactly the clearcoat coat term (:150-154).
        cc_att = albedo * (1.0 - aa) + fresnel * aa

        # Sheen (:347-364): tinted sheen color on a perturbed reflection.
        sheen_col = av * (1.0 - ab) + albedo * ab
        sh_pert = _normalize(reflected + ball * aa)
        sheen_dir = jnp.where(aa > 0.0, sh_pert, reflected)

        # Mirror (:81-89): raw reflection + roughness*ball (NOT normalized,
        # unlike Metal), color attenuation; scatter returns FALSE when the
        # perturbed reflection dips below the surface (:88, strict > 0).
        mir_dir = jnp.where(rough > 0.0, reflected + ball * rough,
                            reflected)
        mir_up = _dot(mir_dir, normal)[..., 0] > 0.0

        out_dir = jnp.where(k == SUBSURFACE, sss_dir,
                  jnp.where(k == ANISOTROPIC, ani_dir,
                  jnp.where(k == CLEARCOAT, lam_dir,
                  jnp.where(k == SHEEN, sheen_dir,
                  jnp.where(k == MIRROR, mir_dir, out_dir)))))
        out_att = jnp.where(k == SUBSURFACE, sss_att,
                  jnp.where(k == ANISOTROPIC, albedo,
                  jnp.where(k == CLEARCOAT, cc_att,
                  jnp.where(k == SHEEN, sheen_col,
                  jnp.where(k == MIRROR, albedo, out_att)))))
        # Emission never scatters (it defines only Emit/Emitted); Mirror
        # only when the reflected ray stays above the surface.
        did_scatter = did_scatter & (kind != EMISSION)
        did_scatter = did_scatter & ((kind != MIRROR) | mir_up)

    return out_dir, out_att, did_scatter
