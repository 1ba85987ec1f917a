"""Evaluate bf16 BVH slab tables offline (VERDICT r2 item 9).

The proposal: store node min/max in bf16 with conservative rounding
(min down, max up) to halve SMEM table bytes. Two facts decide it:

1. SMEM capacity is NOT the binding resource: ring-1000 nodes are
   (9, ~128) f32 = a few KB and even a 4096-prim tree's node+wide4
   tables stay under ~400 KB of the 1 MB SMEM budget.
2. Conservative rounding INFLATES every box (bf16 has 8 mantissa bits
   -> up to 2^-8 relative growth per side), which can only add node
   steps to a walk that is latency-bound per STEP (BENCHMARKS.md block
   sweep) - the per-step scalar loads it would shrink are not the
   bottleneck.

This tool measures fact 2: packet-walk node steps with exact f32 boxes
vs bf16-rounded boxes, both ray populations, via the same simulator the
SAH/octant decisions used (tools/sim_walk_steps.py).

Usage: python tools/sim_bf16_slabs.py [n_spheres ...]
"""
from __future__ import annotations

import dataclasses
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from raytrace_tpu import bvh as bvh_mod  # noqa: E402
from sim_walk_steps import packet_walk_steps, ray_populations  # noqa: E402


def bf16_conservative(tree):
    """Round node_min DOWN and node_max UP to the nearest bf16."""
    def down(a):
        b = jnp.asarray(a, jnp.float32).astype(jnp.bfloat16)
        bf = b.astype(jnp.float32)
        too_big = bf > jnp.asarray(a, jnp.float32)
        return np.asarray(jnp.where(
            too_big, jnp.nextafter(b, jnp.bfloat16(-jnp.inf)
                                   ).astype(jnp.float32), bf))

    def up(a):
        b = jnp.asarray(a, jnp.float32).astype(jnp.bfloat16)
        bf = b.astype(jnp.float32)
        too_small = bf < jnp.asarray(a, jnp.float32)
        return np.asarray(jnp.where(
            too_small, jnp.nextafter(b, jnp.bfloat16(jnp.inf)
                                     ).astype(jnp.float32), bf))

    return dataclasses.replace(tree, node_min=down(tree.node_min),
                               node_max=up(tree.node_max))


def main():
    ns = [int(a) for a in sys.argv[1:]] or [250, 1000]
    for n in ns:
        sph_c, sph_r, prim, bounce = ray_populations(n)
        lo = sph_c - sph_r[:, None]
        hi = sph_c + sph_r[:, None]
        tree = bvh_mod.build_bvh(lo, hi, leaf_size=16)
        t16 = bf16_conservative(tree)
        nn = int(np.asarray(tree.node_count).shape[0])
        f32_bytes = nn * 9 * 4
        bf_bytes = nn * 6 * 2 + nn * 3 * 4  # min/max bf16, int rows f32
        sp, lp = packet_walk_steps(tree, sph_c, sph_r, *prim)
        sb, lb = packet_walk_steps(tree, sph_c, sph_r, *bounce)
        sp2, lp2 = packet_walk_steps(t16, sph_c, sph_r, *prim)
        sb2, lb2 = packet_walk_steps(t16, sph_c, sph_r, *bounce)
        print(f"ring-{n}: nodes={nn} table f32={f32_bytes}B "
              f"bf16={bf_bytes}B (SMEM budget 1MB)")
        print(f"  primary steps {sp} -> {sp2} ({sp2 / sp:.3f}x), "
              f"leaf prim tests {lp} -> {lp2} ({lp2 / max(lp, 1):.3f}x)")
        print(f"  bounced steps {sb} -> {sb2} ({sb2 / sb:.3f}x), "
              f"leaf prim tests {lb} -> {lb2} ({lb2 / max(lb, 1):.3f}x)",
              flush=True)


if __name__ == "__main__":
    main()
