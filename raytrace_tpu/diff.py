"""Differentiable rendering + inverse-rendering optimization.

The reference has no differentiability anywhere (it is a forward Go ray
tracer); this module is the capability the TPU rebuild adds on top of exact
forward parity (BASELINE.json north star: pixels differentiable w.r.t.
material albedo/roughness/IOR, light position/intensity, sphere
centers/radii; gradients validated against finite differences).

Design (SURVEY.md §7 step 7):
  * the forward wavefront uses ``loop="scan"`` (fixed trip count +
    per-bounce rematerialization via jax.checkpoint) so reverse-mode AD
    works with O(1)-per-bounce residual memory;
  * all MC noise is *reparameterized*: every random draw is a pure function
    of (pixel, sample, stream) counters, independent of scene parameters,
    so pathwise derivatives through the shading chain are unbiased for
    smooth parameters (albedo, intensity, roughness away from branch
    thresholds);
  * discontinuities (hit/miss boundary, dielectric branch pick, material
    tier thresholds) get biased-but-useful pathwise gradients; geometry
    parameters (centers/radii) differentiate through the closed-form hit
    distance t(center, radius) which IS smooth away from silhouettes;
  * multi-host: per-shard gradients are psum'ed over the mesh - the
    gradient all-reduce the north star asks to overlap with backward (XLA
    schedules the collective; see parallel/shard.py for the mesh layout).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from . import renderer as renderer_mod
from . import trace as trace_mod
from .scene import Scene, Camera, Geometry, Lights


# Differentiable leaves of the Scene pytree, by (sub-pytree, field).
DIFF_FIELDS = {
    "geometry": ("sph_center", "sph_radius", "tri_v0", "tri_v1", "tri_v2",
                 "pl_point", "pl_normal"),
    "materials": ("albedo", "roughness", "metallic", "specular", "ior",
                  "emit", "eff_albedo"),
    "lights": ("position", "color", "intensity"),
    "camera": ("position",),
}


def split_params(scene: Scene, keep_accel: bool = False):
    """Scene -> (params dict, closure rebuilding a Scene from params).

    params holds only the differentiable arrays; everything else (material
    kinds, mat-id tables, counts, triangle normals') stays in the closure.
    Triangle face normals are re-derived from the vertices inside merge so
    vertex gradients flow through shading normals too.

    ``keep_accel=False`` (default) drops the scene's BVH inside merge —
    the tree was built for the ORIGINAL geometry, and optimizing
    centers/radii/vertices under a stale tree can cull moved primitives.
    Pass keep_accel=True only when the caller freezes every geometry
    parameter (make_train_step's param_filter): the accel walk then
    serves the forward hit at tree cost, and reverse-mode AD works
    through it (intersect._closest_hit_accel runs the walk under
    stop_gradient with a straight-through differentiable winner t)."""
    params: Dict[str, Dict[str, Any]] = {
        group: {f: getattr(getattr(scene, group), f) for f in fields}
        for group, fields in DIFF_FIELDS.items()
    }

    def merge(p) -> Scene:
        geom = dataclasses.replace(scene.geometry, **p["geometry"])
        # Recompute unit face normals from (possibly updated) vertices.
        e1 = geom.tri_v1 - geom.tri_v0
        e2 = geom.tri_v2 - geom.tri_v0
        n = jnp.cross(e1, e2)
        ln = jnp.linalg.norm(n, axis=-1, keepdims=True)
        normal = jnp.where(ln > 0, n / jnp.where(ln > 0, ln, 1.0), n)
        # Plane normals stay unit under optimization (plane.go normalizes
        # at construction).
        pn = geom.pl_normal
        pln = jnp.linalg.norm(pn, axis=-1, keepdims=True)
        pn = jnp.where(pln > 0, pn / jnp.where(pln > 0, pln, 1.0), pn)
        geom = dataclasses.replace(geom, tri_normal=normal, pl_normal=pn)
        # Box occluders assume the cube faces form an exact axis-aligned
        # closed box; optimizing vertices breaks that premise, so the
        # differentiable path falls back to triangle occlusion (exact
        # and differentiable; the box fast path is a render-time-only
        # substitution, see scene.Geometry.box_min).
        geom = dataclasses.replace(
            geom, box_min=jnp.zeros((0, 3), jnp.float32),
            box_max=jnp.zeros((0, 3), jnp.float32),
            box_mat=jnp.zeros((0,), jnp.int32), occl_tris=-1)
        return dataclasses.replace(
            scene,
            geometry=geom,
            materials=dataclasses.replace(scene.materials, **p["materials"]),
            lights=dataclasses.replace(scene.lights, **p["lights"]),
            camera=dataclasses.replace(scene.camera, **p["camera"]),
            accel=scene.accel if keep_accel else None,
        )

    return params, merge


def _diff_cfg(cfg: trace_mod.TraceConfig) -> trace_mod.TraceConfig:
    """Reverse-differentiable variant of a trace config (scan loop)."""
    return dataclasses.replace(cfg, loop="scan")


def render_image(scene: Scene, width: int, height: int, samples: int,
                 cfg: trace_mod.TraceConfig, go_camera: bool = True):
    """Differentiable whole-image render, (H,W,3) linear radiance.

    One flat wavefront (no banding) so it stays a single traced graph;
    meant for the small images used in inverse rendering.
    """
    n_px = width * height
    pix = jnp.arange(n_px, dtype=jnp.uint32)
    pid = jnp.repeat(pix, samples)
    sid = jnp.tile(jnp.arange(samples, dtype=jnp.uint32), n_px)
    rad = renderer_mod.lane_radiance(scene, pid, sid, width=width,
                                     height=height, cfg=_diff_cfg(cfg),
                                     go_camera=go_camera)
    return rad.reshape(n_px, samples, 3).mean(axis=1).reshape(
        height, width, 3)


@partial(jax.jit, static_argnames=("width", "height", "samples", "cfg",
                                   "go_camera"))
def render_and_grad(scene: Scene, width: int, height: int, *, samples: int,
                    cfg: trace_mod.TraceConfig, go_camera: bool = True):
    """(image, d(sum of pixels)/d(params)) - the raw gradient surface the
    FD validation gate checks (BASELINE.json)."""
    params, merge = split_params(scene)

    def total(p):
        img = render_image(merge(p), width, height, samples, cfg, go_camera)
        return jnp.sum(img), img

    (_, img), grads = jax.value_and_grad(total, has_aux=True)(params)
    return img, grads


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


def make_train_step(scene: Scene, target, *, width: int, height: int,
                    samples: int, cfg: trace_mod.TraceConfig,
                    optimizer=None, go_camera: bool = True,
                    mesh=None, trainable=None):
    """Build (init_state, step_fn) for inverse rendering.

    step_fn(state) -> (state, loss): MSE between the rendered image and
    `target`, gradients w.r.t. all differentiable scene parameters,
    optimizer update. With `mesh`, lanes shard over (px, sp) and gradients
    are psum'ed across the mesh (every device ends with identical replicated
    params - pure data parallelism over pixels/samples).

    `trainable`: optional iterable of "group.field" strings (e.g.
    {"lights.intensity", "materials.albedo"}); gradients for everything
    else are zeroed. Important with adaptive optimizers (adam renormalizes
    per-parameter, so unconstrained near-zero gradients on geometry would
    otherwise random-walk the scene).
    """
    import optax
    optimizer = optimizer or optax.adam(1e-2)
    params0, merge = split_params(scene)

    if trainable is not None:
        keep = set(trainable)
        mask = {g: {f: (f"{g}.{f}" in keep) for f in sub}
                for g, sub in params0.items()}

        def apply_mask(grads):
            return {g: {f: (grads[g][f] if mask[g][f]
                            else jnp.zeros_like(grads[g][f]))
                        for f in grads[g]} for g in grads}
    else:
        def apply_mask(grads):
            return grads
    dcfg = _diff_cfg(cfg)
    n_px = width * height
    target = jnp.asarray(target, jnp.float32).reshape(n_px, 3)

    def lane_ids():
        pix = jnp.arange(n_px, dtype=jnp.uint32)
        return pix, jnp.arange(samples, dtype=jnp.uint32)

    if mesh is None:
        def loss_fn(p):
            img = render_image(merge(p), width, height, samples, dcfg,
                               go_camera)
            return jnp.mean((img.reshape(n_px, 3) - target.reshape(
                n_px, 3)) ** 2)

        @jax.jit
        def step(state: TrainState):
            loss, grads = jax.value_and_grad(loss_fn)(state.params)
            grads = apply_mask(grads)
            updates, opt_state = optimizer.update(grads, state.opt_state,
                                                  state.params)
            params = optax.apply_updates(state.params, updates)
            return TrainState(params, opt_state, state.step + 1), loss
    else:
        n_shards = mesh.shape["px"]
        n_sp = mesh.shape["sp"]
        if n_px % n_shards or samples % n_sp:
            raise ValueError(
                f"pixels ({n_px}) and samples ({samples}) must divide the "
                f"mesh ({n_shards}x{n_sp}) for the sharded train step")

        def local_grads(p, pix_l, samp_l, tgt_l):
            np_l, ns_l = pix_l.shape[0], samp_l.shape[0]

            def local_loss(p):
                pid = jnp.repeat(pix_l, ns_l)
                sid = jnp.tile(samp_l, np_l)
                rad = renderer_mod.lane_radiance(
                    merge(p), pid, sid, width=width, height=height, cfg=dcfg,
                    go_camera=go_camera)
                # mean over the FULL sample axis: psum partial sums.
                part = rad.reshape(np_l, ns_l, 3).sum(axis=1)
                px_mean = jax.lax.psum(part, "sp") / samples
                sq = jnp.sum((px_mean - tgt_l) ** 2)
                # px_mean is already reduced over 'sp' (every sp replica
                # holds the same value), so the global loss is a psum over
                # 'px' only.
                return jax.lax.psum(sq, "px") / (n_px * 3)

            loss, grads = jax.value_and_grad(local_loss)(p)
            # No manual psum here: differentiating w.r.t. replicated
            # (invarying) params inside shard_map already yields the
            # globally all-reduced gradient (JAX inserts the psum in the
            # transpose) - an extra psum would multiply by the device count.
            return loss, grads

        sharded = jax.shard_map(
            local_grads, mesh=mesh,
            in_specs=(P(), P("px"), P("sp"), P("px")),
            out_specs=(P(), P()),
        )

        @jax.jit
        def step(state: TrainState):
            pix, samp = lane_ids()
            loss, grads = sharded(state.params, pix, samp, target)
            grads = apply_mask(grads)
            updates, opt_state = optimizer.update(grads, state.opt_state,
                                                  state.params)
            params = optax.apply_updates(state.params, updates)
            return TrainState(params, opt_state, state.step + 1), loss

    state0 = TrainState(params0, optimizer.init(params0), jnp.int32(0))
    return state0, step


def finite_difference_grad(scene: Scene, width: int, height: int, *,
                           samples: int, cfg: trace_mod.TraceConfig,
                           group: str, field: str, index,
                           eps: float = 1e-3, go_camera: bool = True):
    """Central-difference d(sum image)/d(param[index]) for validation."""
    params, merge = split_params(scene)

    def total(p):
        img = render_image(merge(p), width, height, samples,
                           _diff_cfg(cfg), go_camera)
        return float(jnp.sum(img))

    for sgn in (+1, -1):
        p = jax.tree.map(lambda x: x, params)
        arr = np.asarray(p[group][field]).astype(np.float64).copy()
        arr[index] += sgn * eps
        p[group][field] = jnp.asarray(arr, params[group][field].dtype)
        if sgn > 0:
            f_plus = total(p)
        else:
            f_minus = total(p)
    return (f_plus - f_minus) / (2 * eps)
