"""Pallas-vs-XLA row-gather microbenchmark (docs/PERF.md item: can a
fused Pallas frame step beat the XLA decoder loop?).

The decode frame step is gather-dominated (HLO profile 2026-08-21:
custom-fusion gathers ~42%, sorts ~27%, layout copies ~17% — and the
copies largely OVERLAP the sort chain). A Pallas rewrite must therefore
reproduce the decoder's random row gathers inside the kernel. TPU
Pallas has no vectorized gather primitive: dynamic addressing is
scalar-driven ``pl.ds`` slices (one DMA per index) — this benchmark
measures that path against the XLA gather unit at the decoder's actual
shape (B*K = 65536 rows of a packed [S, 16] int32 table, the
state-pack gather shape at B=64, K=1024).

Run on the chip: python examples/pallas_gather_microbench.py
(compile ~100s — Pallas kernels pay the remote-compile latency;
see CLAUDE.md). Writes one JSON line per variant.
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def xla_gather(table, idx):
    return table[idx]


def make_pallas_gather(S, C, N, rows_per_step=8):
    """Gather N rows via scalar-driven dynamic slices, ``rows_per_step``
    DMAs per grid step (the only dynamic-addressing form TPU Pallas
    offers; prefetch of the index vector via scalar memory)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(idx_ref, table_ref, out_ref):
        i = pl.program_id(0)
        for j in range(rows_per_step):
            r = idx_ref[i * rows_per_step + j]
            out_ref[j, :] = table_ref[pl.ds(r, 1), :][0, :]

    grid = N // rows_per_step
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(grid,),
            # whole table resident in VMEM (3.6MB fits; in-kernel
            # dynamic loads are only legal from VMEM/SMEM refs)
            in_specs=[pl.BlockSpec((S, C), lambda i, idx: (0, 0))],
            out_specs=pl.BlockSpec(
                (rows_per_step, C), lambda i, idx: (i, 0)
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((N, C), jnp.int32),
    )


def bench(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters


def main():
    S, C, N = 56432, 16, 65536
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.integers(0, 2**30, size=(S, C)), jnp.int32)
    idx = jnp.asarray(rng.integers(0, S, size=(N,)), jnp.int32)

    t_x = bench(jax.jit(xla_gather), table, idx)
    print(json.dumps({
        "variant": "xla_gather", "us": round(t_x * 1e6, 1),
        "ns_per_row": round(t_x * 1e9 / N, 2),
    }))

    try:
        pk = make_pallas_gather(S, C, N)
        t_p = bench(jax.jit(lambda i, t: pk(i, t)), idx, table)
        ok = bool(jnp.array_equal(pk(idx, table), table[idx]))
        print(json.dumps({
            "variant": "pallas_ds_gather", "us": round(t_p * 1e6, 1),
            "ns_per_row": round(t_p * 1e9 / N, 2),
            "correct": ok,
            "slowdown_vs_xla": round(t_p / t_x, 1),
        }))
    except Exception as exc:  # pallas availability varies by backend
        print(json.dumps({
            "variant": "pallas_ds_gather", "error": str(exc)[:200],
        }))


if __name__ == "__main__":
    main()
