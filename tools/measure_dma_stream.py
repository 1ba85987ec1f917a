"""Feasibility + cost probe for DMA-streamed BVH leaf tables (round 4).

The megakernel's bvh mode caps at MAX_BVH_KERNEL_PRIMS = 4096 because the
prim tables must fit SMEM. The candidate design keeps the NODE table in
SMEM (it is small at leaf size >= 16) and DMA-stages each visited leaf's
prim block from HBM into an SMEM scratch.  This probe answers, on real
hardware:

  1. does Mosaic support HBM -> SMEM async_copy with a DYNAMIC source row
     offset inside a while loop? (and HBM -> VMEM as fallback)
  2. what does one such DMA cost, amortized (issue + wait, serial chain)?
  3. sanity: values land correctly (checksum vs host).

Run:  python tools/measure_dma_stream.py [n_steps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


N_ROWS = 8192          # simulated leaf count
ROW_F32 = 128          # floats per leaf block (e.g. 8 tris x 16 cols)


def make_kernel(n_steps: int, dst: str):
    def kernel(tab_hbm, seed_ref, out_ref, scratch, sem):
        def body(i, carry):
            idx, acc = carry
            dma = pltpu.make_async_copy(
                tab_hbm.at[pl.ds(idx, 1), :], scratch, sem)
            dma.start()
            dma.wait()
            if dst == "smem":
                v0 = scratch[0, 0]
                v1 = scratch[0, ROW_F32 - 1]
            else:
                v0 = scratch[0, 0]
                v1 = scratch[0, ROW_F32 - 1]
            acc = acc + v0 + v1
            # data-dependent next index (defeats prefetch/hoisting):
            nxt = (idx * 1664525 + 1013904223 + v0.astype(jnp.int32)) \
                % N_ROWS
            return nxt, acc

        idx0 = seed_ref[0]
        _, acc = jax.lax.fori_loop(0, n_steps, body,
                                   (idx0, jnp.float32(0.0)))
        out_ref[0] = acc

    return kernel


def run(n_steps: int, dst: str):
    tab = (np.arange(N_ROWS * ROW_F32, dtype=np.float32)
           .reshape(N_ROWS, ROW_F32) % 1000) * 1e-3
    scratch = (pltpu.SMEM((1, ROW_F32), jnp.float32) if dst == "smem"
               else pltpu.VMEM((1, ROW_F32), jnp.float32))
    f = pl.pallas_call(
        make_kernel(n_steps, dst),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1,), jnp.float32),
        scratch_shapes=[scratch, pltpu.SemaphoreType.DMA],
    )
    jf = jax.jit(lambda t, s: f(t, s))
    t_dev = jnp.asarray(tab)
    seed = jnp.zeros((1,), jnp.int32)
    # host-side oracle
    idx, acc = 0, 0.0
    for _ in range(n_steps):
        v0 = tab[idx, 0]
        v1 = tab[idx, ROW_F32 - 1]
        acc += v0 + v1
        idx = (idx * 1664525 + 1013904223 + int(v0 * 1000) // 1000) % N_ROWS
    got = float(np.asarray(jf(t_dev, seed))[0])
    ok = abs(got - acc) < 1e-2 * max(1.0, abs(acc))
    # timing: best of 5
    best = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(jf(t_dev, seed))
        best = min(best, time.perf_counter() - t0)
    return ok, got, acc, best


def main():
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    for dst in ("smem", "vmem"):
        try:
            ok, got, want, best = run(n_steps, dst)
            per = best / n_steps * 1e9
            print(f"dst={dst}: ok={ok} got={got:.3f} want={want:.3f} "
                  f"wall={best*1e3:.2f} ms  ~{per:.0f} ns/DMA-step "
                  f"(incl. ~30ms tunnel RPC)")
        except Exception as e:
            print(f"dst={dst}: FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
