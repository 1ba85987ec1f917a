"""Wavefront path-trace loop: the TPU-native form of traceRay.

The reference recursion (renderer.go:165-227, depth <= 50) becomes a bounded
loop over a struct-of-arrays wavefront: every lane carries
(origin, direction, throughput, radiance, alive). The recursive combine

    final = emitted + direct * w_d + attenuation * recurse(...) * w_r

unrolls exactly to the iterative accumulation

    radiance += throughput * (emitted + direct * w_d)
    throughput *= attenuation * w_r

with (w_r, w_d) the metallic-tier weights (renderer.go:191-226; (1,1) for
metallic <= 0.2). Lanes die on miss (-> black, renderer.go:170-173), on a
non-scattering material (DiffuseLight: radiance += throughput * (emitted +
direct), renderer.go:181-184), or at max depth (renderer.go:166-168: level
`max_depth` contributes 0, so exactly max_depth shading iterations run).

Two loop drivers over the same body:
  * ``while`` - lax.while_loop with a global any(alive) early exit; fastest
    forward path (under shard_map each device exits independently).
  * ``scan``  - fixed-trip lax.scan with per-bounce rematerialization;
    reverse-differentiable for the inverse-rendering path (rt/diff).

Optional non-parity accelerators (off by default; both preserve the image
expectation): Russian roulette and a throughput kill threshold.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from . import rng
from .models import materials as mat_mod
from .ops import intersect, shade


@dataclasses.dataclass(frozen=True)
class TraceConfig:
    """Static (hashable) trace settings; mirrors renderer settings.go:3-25."""

    max_depth: int = 50
    soft_shadows: bool = True
    shadow_samples: int = 16
    recursive_reflections: bool = True
    seed: int = 0
    # Thin-lens DoF camera perturbation (advanced.go:29-44); applied by the
    # ray generators in renderer.py (defaults = the Go hardcoded values).
    depth_of_field: bool = False
    dof_lens_radius: float = 0.1
    dof_focus_distance: float = 10.0
    # Non-parity MC accelerators (expectation-preserving):
    russian_roulette_start: Optional[int] = None  # bounce index; None = off
    throughput_epsilon: float = 0.0               # kill lanes dimmer than this
    loop: str = "while"                           # "while" | "scan"


@dataclasses.dataclass(frozen=True)
class _State:
    origin: jax.Array      # (B,3)
    direction: jax.Array   # (B,3)
    throughput: jax.Array  # (B,3)
    radiance: jax.Array    # (B,3)
    alive: jax.Array       # (B,) bool


jax.tree_util.register_dataclass(
    _State, data_fields=["origin", "direction", "throughput", "radiance",
                         "alive"], meta_fields=[])


def _bounce_body(scene, pix_id, samp_id, cfg: TraceConfig, bounce, st: _State,
                 hit=None):
    """One shading iteration of the wavefront.

    hit: optional precomputed intersect.Hit for (st.origin, st.direction)
    (t_min=1e-3). The staged pipeline (pipeline.py) computes the intersect
    stage separately and passes it in; when None the body runs its own
    closest-hit (the fused engines).
    """
    geom, mats, lights = scene.geometry, scene.materials, scene.lights
    # Optional scene BVH (scene.Scene.accel): same hit results, walked
    # instead of scanned. Built at load for scenes past bvh.BVH_THRESHOLD.
    accel = getattr(scene, "accel", None)

    if hit is None:
        hit = intersect.closest_hit(geom, st.origin, st.direction,
                                    t_min=1e-3, accel=accel)
    alive = st.alive & hit.hit

    # Keep dead-lane geometry finite so masked math cannot overflow.
    point = jnp.where(alive[..., None], hit.point, 0.0)
    normal = jnp.where(alive[..., None], hit.normal, 0.0)

    mat = mats.row(hit.mat_id)
    emitted = mat["emit"]
    if mats.has_advanced:
        # Emission modes (advanced_materials.go:394-414): the directional
        # mode modulates by normal . (0,1,0). (The Go renderer itself only
        # ever calls the mode-less Emitted(); honoring Emit(hit)'s modes is
        # part of making the unreachable feature real.)
        is_dir_emit = ((mat["kind"] == mat_mod.EMISSION)
                       & (mat["aux_a"] == mat_mod.EMISSION_DIRECTIONAL))
        cos_up = jnp.maximum(normal[..., 1], 0.0)
        emitted = jnp.where(is_dir_emit[..., None],
                            emitted * cos_up[..., None], emitted)

    if getattr(mats, "textures", ()):
        # Procedural texture -> albedo at the hit point (the integration
        # the reference's unreachable texture classes advertised,
        # advanced_materials.go:416-631). Affects both the scatter albedo
        # and the direct-lighting diffuse color.
        from .models import textures as tex_mod
        alb = mat["albedo"]
        eff = mat["eff_albedo"]
        for mi, tex in mats.textures:
            sel = (hit.mat_id == mi)[..., None]
            t_alb = tex_mod.textured_albedo(tex, point, alb)
            alb = jnp.where(sel, t_alb, alb)
            eff = jnp.where(sel, t_alb, eff)
        mat = {**mat, "albedo": alb, "eff_albedo": eff}

    direct = shade.direct_lighting(
        geom, lights, mat, point, normal, pix_id, samp_id, bounce,
        soft_shadows=cfg.soft_shadows, shadow_samples=cfg.shadow_samples,
        seed=cfg.seed, accel=accel)

    ball = rng.unit_ball(pix_id, samp_id,
                         rng.bounce_stream(bounce, rng.Streams.SCATTER_BALL),
                         cfg.seed)
    pick = rng.uniform4(pix_id, samp_id,
                        rng.bounce_stream(bounce, rng.Streams.DIELECTRIC),
                        cfg.seed)[0]
    scat_dir, atten, did_scatter = mat_mod.scatter(
        mat, st.direction, normal, hit.front_face, ball, pick)

    w_r, w_d = shade.combine_weights(mat["metallic"])

    lit = alive[..., None]
    no_scatter = alive & ~did_scatter
    scattering = alive & did_scatter

    # emitted always lands with full throughput (renderer.go:177,196-225).
    radiance = st.radiance + jnp.where(lit, st.throughput * emitted, 0.0)
    # DiffuseLight terminal: emitted + direct, unweighted (renderer.go:181-184).
    radiance = radiance + jnp.where(no_scatter[..., None],
                                    st.throughput * direct, 0.0)
    # Scattering: direct * w_d now; attenuation * w_r folds into throughput.
    radiance = radiance + jnp.where(scattering[..., None],
                                    st.throughput * direct * w_d[..., None],
                                    0.0)

    throughput = jnp.where(scattering[..., None],
                           st.throughput * atten * w_r[..., None],
                           st.throughput)

    next_alive = scattering
    if not cfg.recursive_reflections:
        # reflectedColor stays (0,0,0) (renderer.go:186-189): lanes terminate.
        next_alive = jnp.zeros_like(next_alive)

    if cfg.throughput_epsilon > 0.0:
        next_alive &= jnp.max(throughput, axis=-1) >= cfg.throughput_epsilon

    if cfg.russian_roulette_start is not None:
        q = jnp.clip(jnp.max(throughput, axis=-1), 0.05, 1.0)
        u = rng.uniform4(pix_id, samp_id,
                         rng.bounce_stream(bounce, rng.Streams.RUSSIAN_ROULETTE),
                         cfg.seed)[0]
        do_rr = bounce >= cfg.russian_roulette_start
        kill = do_rr & (u >= q)
        next_alive &= ~kill
        throughput = jnp.where((do_rr & next_alive)[..., None],
                               throughput / q[..., None], throughput)

    origin = jnp.where(scattering[..., None], point, st.origin)
    direction = jnp.where(scattering[..., None], scat_dir, st.direction)

    return _State(origin=origin, direction=direction, throughput=throughput,
                  radiance=radiance, alive=next_alive)


def trace(scene, origin, direction, pix_id, samp_id, cfg: TraceConfig):
    """Trace a wavefront of rays to completion. Returns radiance (B,3).

    origin/direction: (B,3) camera rays (direction unnormalized, parity).
    pix_id/samp_id: (B,) uint32 lane identities for the counter-based RNG.
    """
    # Derive the init carry from the direction array (direction*0, not
    # zeros_like) so its varying-manual-axes type matches the loop body
    # under shard_map: zeros_like/ones_like produce unvarying constants -
    # and origin itself is unvarying (broadcast from the replicated camera
    # position) - which the while_loop carry type check rejects inside a
    # mesh region. direction always depends on the (varying) pixel ids.
    zero3 = direction * 0.0
    st0 = _State(
        origin=origin + zero3,
        direction=direction,
        throughput=zero3 + 1.0,
        radiance=zero3,
        alive=jnp.sum(zero3, axis=-1) == 0.0,
    )

    if cfg.loop == "while":
        def cond(carry):
            bounce, st = carry
            return (bounce < cfg.max_depth) & jnp.any(st.alive)

        def body(carry):
            bounce, st = carry
            st = _bounce_body(scene, pix_id, samp_id, cfg, bounce, st)
            return bounce + 1, st

        _, st = jax.lax.while_loop(cond, body, (jnp.int32(0), st0))
        return st.radiance

    # scan: fixed trip count, reverse-differentiable; remat each bounce so
    # the backward pass re-runs intersection instead of storing it.
    body = jax.checkpoint(
        lambda st, bounce: (_bounce_body(scene, pix_id, samp_id, cfg,
                                         bounce, st), None))
    st, _ = jax.lax.scan(body, st0, jnp.arange(cfg.max_depth, dtype=jnp.int32))
    return st.radiance
