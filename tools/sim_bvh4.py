"""Offline A/B: would a 4-wide BVH cut the packet walk's node steps?

The bvh-mode megakernel walk is latency-bound per NODE STEP (slab test +
cross-lane reduce + scalar branch; BENCHMARKS.md), so a 4-ary tree that
halves step count wins if the per-step cost grows by less than the step
ratio. This tool counts steps for the committed binary skip-pointer walk
vs a stack-based 4-wide walk (children = grandchildren of the binary
tree, leaves promoted as-is) on the sim_walk_steps ray populations.

Per-step cost model for the 4-ary kernel (to interpret the ratio):
4x the slab-test vector work (cheap, VPU-bound) and either 4 cross-lane
reduces or one packed-indicator reduce per step vs 1 for binary -- so
the break-even step ratio is somewhere between 1.0x and 4x depending on
how the reduce lowers. Steps below ~0.5x of binary make it worth a real
kernel experiment.

Usage: python tools/sim_bvh4.py [n_spheres ...]
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # host-only analysis tool

from raytrace_tpu import bvh as bvh_mod  # noqa: E402
from tools.sim_walk_steps import (  # noqa: E402
    BLOCK_LANES, packet_walk_steps, ray_populations)


def binary_children(tree):
    """Recover each inner node's (left, right) from the DFS+skip layout:
    left = cur+1, right = skip(left)."""
    nskip = np.asarray(tree.node_skip)
    ncount = np.asarray(tree.node_count)
    kids = {}
    for i in range(ncount.shape[0]):
        if ncount[i] == 0:
            left = i + 1
            kids[i] = (left, int(nskip[left]))
    return kids


def collapse4(tree):
    """4-ary view: each inner node's children are its grandchildren
    (or the child itself where the child is a leaf)."""
    ncount = np.asarray(tree.node_count)
    kids = binary_children(tree)

    def children4(i):
        out = []
        for c in kids[i]:
            if ncount[c] > 0 or c not in kids:
                out.append(c)
            else:
                out.extend(kids[c])
        return out

    return children4


def walk4_steps(tree, sph_c, sph_r, o, d):
    """Stack-based 4-ary packet walk; returns (steps, leaf prim tests).

    A step = pop one 4-ary node and slab-test its <=4 children against
    all live lanes; boxed leaf children run their primitive tests
    immediately (tightening t_best), boxed inner children push."""
    nmin = np.asarray(tree.node_min)
    nmax = np.asarray(tree.node_max)
    nfirst = np.asarray(tree.node_first)
    ncount = np.asarray(tree.node_count)
    perm = np.asarray(tree.prim_index)
    children4 = collapse4(tree)

    total = 0
    leaf_tests = 0
    max_stack = 0
    n = o.shape[0]
    root_is_leaf = ncount[0] > 0
    for s0 in range(0, n, BLOCK_LANES):
        oo = o[s0:s0 + BLOCK_LANES]
        dd = d[s0:s0 + BLOCK_LANES]
        ivd = 1.0 / np.where(dd == 0.0, 1e-30, dd)
        t_best = np.full(oo.shape[0], 3.0e38, np.float32)

        def leaf(i):
            nonlocal leaf_tests, t_best
            cnt = int(ncount[i])
            leaf_tests += cnt
            for j in range(cnt):
                pid = int(perm[nfirst[i] + j])
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

        if root_is_leaf:
            leaf(0)
            continue
        stack = [0]
        while stack:
            max_stack = max(max_stack, len(stack))
            cur = stack.pop()
            total += 1
            for c in children4(cur):
                t0 = (nmin[c] - oo) * ivd
                t1 = (nmax[c] - oo) * ivd
                near = np.maximum(np.minimum(t0, t1).max(axis=1), 1e-3)
                far = np.minimum(np.maximum(t0, t1).min(axis=1), t_best)
                if bool((near <= far).any()):
                    if ncount[c] > 0:
                        leaf(c)
                    else:
                        stack.append(c)
    return total, leaf_tests, max_stack


def main():
    ns = [int(a) for a in sys.argv[1:]] or [250, 1000]
    for n in ns:
        sph_c, sph_r, prim, bounce = ray_populations(n)
        lo = sph_c - sph_r[:, None]
        hi = sph_c + sph_r[:, None]
        for leaf_size in (16, 8):
            tree = bvh_mod.build_bvh(lo, hi, leaf_size=leaf_size)
            s2p, l2p = packet_walk_steps(tree, sph_c, sph_r, *prim)
            s2b, l2b = packet_walk_steps(tree, sph_c, sph_r, *bounce)
            s4p, l4p, stk_p = walk4_steps(tree, sph_c, sph_r, *prim)
            s4b, l4b, stk_b = walk4_steps(tree, sph_c, sph_r, *bounce)
            print(f"ring-{n} leaf{leaf_size:2d} "
                  f"primary: bin {s2p:6d} steps/{l2p:7d} prim  "
                  f"4ary {s4p:6d} steps ({s4p / max(s2p, 1):4.2f}x)"
                  f"/{l4p:7d} prim, stack<={stk_p}", flush=True)
            print(f"              "
                  f"bounced: bin {s2b:6d} steps/{l2b:7d} prim  "
                  f"4ary {s4b:6d} steps ({s4b / max(s2b, 1):4.2f}x)"
                  f"/{l4b:7d} prim, stack<={stk_b}", flush=True)


if __name__ == "__main__":
    main()
