"""Fused word-end gather: Pallas kernel vs the XLA op chain (r3 verdict
item 1 — "build the fused kernel or measure that it loses").

The decode frame's word-end phase is its most expensive block after the
round-4 XLA wins (HLO profile 2026-08-21, per frame at B=64/KW=1536):

* fusion.182  combo row gather   [S1,15] -> [B*KW,15]   ~150us
* fusion.184  emission fsel      [B*C/4,4] quarter-rows ~150us
* copy.349/350 layout rotations of the gather outputs    ~68us

A Pallas kernel can fuse all of it: per-slot combo row DMA + emission
quarter-row DMA into a VMEM scratch (scalar-driven ``pl.ds`` loads
measured 0.50 ns/row on-chip, examples/pallas_gather_microbench.py),
one int32 transpose to column planes, then vectorized compute of the
word-end pre-scores. Outputs land in exactly the shapes the downstream
sort + merge consume (column planes + spk rows), so the XLA layout
rotations disappear too.

This benchmark runs BOTH implementations on identical synthetic data at
the headline shapes, asserts bit-equality, and times steady state. The
result decides whether the kernel is integrated into search/decoder.py
(as an opt-in — Pallas kernels pay ~100s+ remote-compile latency).

Run on the chip: python examples/pallas_wordend_microbench.py
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

BIG = 1e30
WORD_NONE = -(2**31) + 1  # stand-in; only compared for != in both paths


def _bc_f(a):
    return jax.lax.bitcast_convert_type(a, jnp.float32)


def _bc_i(a):
    return jax.lax.bitcast_convert_type(a, jnp.int32)


# ---------------------------------------------------------------- XLA path
def xla_block(w_state, w_score, combo, emis, B, KW, C_sp):
    """The decoder's current op chain (combo gather + quarter-row fsel +
    elementwise), producing the same outputs as the kernel."""
    pk = combo[w_state]  # [B,KW,20]
    word = pk[..., 0]
    wadj = _bc_f(pk[..., 1])
    lemma = pk[..., 2]
    nxt = pk[..., 3]
    cls = pk[..., 4]
    spk = pk[..., 8 : 8 + C_sp]
    # quarter-row fsel (decoder.fsel)
    Bx, N = emis.shape
    flat = emis.reshape(Bx * N)
    pad = (-(Bx * N)) % 4
    if pad:
        flat = jnp.concatenate([flat, jnp.zeros((pad,), flat.dtype)])
    xr = flat.reshape((Bx * N + pad) // 4, 4)
    off = jnp.asarray((np.arange(Bx, dtype=np.int32) * N)[:, None])
    g = cls + off
    rows = xr[g >> 2]
    lo = jnp.where((g & 1) == 0, rows[..., 0], rows[..., 1])
    hi = jnp.where((g & 1) == 0, rows[..., 2], rows[..., 3])
    e = jnp.where((g & 2) == 0, lo, hi)
    w2 = jnp.where(w_score < BIG / 2, w_score + e, BIG)
    pre = jnp.where(word != WORD_NONE, w2 + wadj, BIG)
    return pre, w2, word, lemma, nxt, spk


# ------------------------------------------------------------- Pallas path
def make_kernel(B, KW, S1, C, C_sp, unroll=int(os.environ.get("PALLAS_UNROLL", "8"))):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    CC = 24  # combo row width (20 data cols padded to 24)
    EW = 4   # emission quarter-row
    SC = 32  # scratch row: 24 combo + 4 emis + pad

    def kernel(idx_ref, wscore_ref, combo_ref, emis4_ref, pre_ref, w2_ref,
               word_ref, lemma_ref, next_ref, spk_ref, scratch):
        b = pl.program_id(0)

        # pass 1: combo rows (independent scalar-driven row loads).
        # Mosaic's fori_loop only unrolls fully or not at all — hand
        # unroll a static inner block instead (the gather microbench's
        # grid-step pattern, folded into one kernel).
        def body1(k8, _):
            for j in range(unroll):
                k = k8 * unroll + j
                s = idx_ref[b * KW + k]
                scratch[k, 0:CC] = combo_ref[pl.ds(s, 1), :][0, :]
            return 0

        jax.lax.fori_loop(0, KW // unroll, body1, 0)

        # pass 2: emission quarter-rows addressed by the class column
        def body2(k8, _):
            for j in range(unroll):
                k = k8 * unroll + j
                c = scratch[k, 4]
                row = emis4_ref[0, pl.ds(c >> 2, 1), :][0, :]
                scratch[k, CC : CC + EW] = _bc_i(row)
            return 0

        jax.lax.fori_loop(0, KW // unroll, body2, 0)

        # column planes via ONE int32 transpose (int relayout: safe for
        # smuggled f32 bit patterns — f32 relayouts flush denormals)
        tr = jnp.transpose(scratch[:, :])  # [SC, KW] int32
        word = tr[0]
        wadj = _bc_f(tr[1])
        cls = tr[4]
        e0, e1, e2, e3 = (_bc_f(tr[CC + j]) for j in range(4))
        lo = jnp.where((cls & 1) == 0, e0, e1)
        hi = jnp.where((cls & 1) == 0, e2, e3)
        e = jnp.where((cls & 2) == 0, lo, hi)
        ws = wscore_ref[0, 0, :]
        w2 = jnp.where(ws < BIG / 2, ws + e, BIG)
        pre = jnp.where(word != WORD_NONE, w2 + wadj, BIG)
        pre_ref[0, 0, :] = pre
        w2_ref[0, 0, :] = w2
        word_ref[0, 0, :] = word
        lemma_ref[0, 0, :] = tr[2]
        next_ref[0, 0, :] = tr[3]
        spk_ref[0, :, :] = scratch[:, 8 : 8 + C_sp]
        return

    # TPU block rule: the last two block dims must be 8/128-divisible
    # or equal the array dims — [B,KW] per-batch slices become
    # [B,1,KW] blocks (1 == array dim, KW % 128 == 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 1, KW), lambda b, idx: (b, 0, 0)),  # w_score
            pl.BlockSpec((S1, CC), lambda b, idx: (0, 0)),       # combo
            pl.BlockSpec((1, C // 4, EW), lambda b, idx: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, KW), lambda b, idx: (b, 0, 0)),
            pl.BlockSpec((1, 1, KW), lambda b, idx: (b, 0, 0)),
            pl.BlockSpec((1, 1, KW), lambda b, idx: (b, 0, 0)),
            pl.BlockSpec((1, 1, KW), lambda b, idx: (b, 0, 0)),
            pl.BlockSpec((1, 1, KW), lambda b, idx: (b, 0, 0)),
            pl.BlockSpec((1, KW, C_sp), lambda b, idx: (b, 0, 0)),
        ],
        scratch_shapes=[pltpu.VMEM((KW, SC), jnp.int32)],
    )
    f32 = jnp.float32
    i32 = jnp.int32
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        interpret=bool(int(os.environ.get("PALLAS_INTERPRET", "0"))),
        out_shape=[
            jax.ShapeDtypeStruct((B, 1, KW), f32),
            jax.ShapeDtypeStruct((B, 1, KW), f32),
            jax.ShapeDtypeStruct((B, 1, KW), i32),
            jax.ShapeDtypeStruct((B, 1, KW), i32),
            jax.ShapeDtypeStruct((B, 1, KW), i32),
            jax.ShapeDtypeStruct((B, KW, C_sp), i32),
        ],
    )


def bench(fn, *args, iters=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters, out


def main():
    B, KW, S1, C, C_sp = 64, 1536, 56433, 2000, 12
    rng = np.random.default_rng(0)
    combo = np.zeros((S1, 24), np.int32)
    combo[:, 0] = rng.integers(-1, 5000, size=S1)  # word (some -1)
    combo[:, 1] = _np_f2i(rng.uniform(0.2, 8.0, size=S1).astype(np.float32))
    combo[:, 2] = rng.integers(0, 5000, size=S1)   # lemma
    combo[:, 3] = rng.integers(0, S1, size=S1)     # next
    combo[:, 4] = rng.integers(0, C, size=S1)      # cls
    combo[:, 8:20] = rng.integers(0, 2**30, size=(S1, 12))
    w_state = rng.integers(0, S1, size=(B, KW)).astype(np.int32)
    w_score = rng.uniform(0, 50, size=(B, KW)).astype(np.float32)
    w_score[rng.uniform(size=(B, KW)) < 0.1] = BIG
    emis = rng.uniform(0, 20, size=(B, C)).astype(np.float32)

    combo_j = jnp.asarray(combo)
    ws_j = jnp.asarray(w_state)
    sc_j = jnp.asarray(w_score)
    em_j = jnp.asarray(emis)
    em4_j = em_j.reshape(B * C // 4, 4)

    xla = jax.jit(functools.partial(xla_block, B=B, KW=KW, C_sp=C_sp))
    t_x, out_x = bench(xla, ws_j, sc_j, combo_j[:, :20], em_j)
    print(json.dumps({"variant": "xla_block", "us": round(t_x * 1e6, 1)}))

    try:
        pk = make_kernel(B, KW, S1, C, C_sp)
        def pf_fn(i, s, c, e):
            outs = pk(
                i.reshape(-1), s[:, None, :], c,
                e.reshape(B, C // 4, 4),
            )
            return tuple(
                o[:, 0, :] if o.ndim == 3 and o.shape[1] == 1 else o
                for o in outs
            )

        pf = jax.jit(pf_fn)
        t_p, out_p = bench(pf, ws_j, sc_j, combo_j, em4_j)
        ok = all(
            bool(jnp.array_equal(a, b))
            for a, b in zip(out_x, out_p)
        )
        print(json.dumps({
            "variant": "pallas_fused_wordend", "us": round(t_p * 1e6, 1),
            "correct": ok, "speedup_vs_xla": round(t_x / t_p, 2),
        }))
    except Exception as exc:
        print(json.dumps({
            "variant": "pallas_fused_wordend", "error": str(exc)[:400],
        }))


def _np_f2i(a):
    return a.view(np.int32)


if __name__ == "__main__":
    main()
