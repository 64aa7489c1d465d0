#!/usr/bin/env python
"""On-chip probe: attack the grouped kernel's weight-unpack bound.

Round-4 finding (ROUND4_RESULTS §8): the grouped prefill GEMM is bound
by the per-(expert, n-tile) int4→bf16 weight unpack, not by the MXU or
HBM. Two lever families, measured here in isolation at V2-Lite
production shapes (T=2048, k=6, E=64, H=2048, I=1408):

1. Cheaper unpack arithmetic (variant kernel `gmm_v2`):
   - sign-extend nibbles with two shifts ((b<<28)>>28) instead of
     mask/xor/sub (3 ops → 2),
   - scale-multiply in bf16 instead of f32 (bit-identical: a ≤4-bit
     int times a bf16 scale is exact in f32, and hardware bf16 mul
     rounds the exact product — same double-rounding-free result; and
     bf16 VPU ops run at 2× f32 lane throughput),
   - skip the [K/2,N]+[K/2,N]→[K,N] concatenate copy by splitting the
     MXU dot into lo/hi halves (x[:, :K/2]·w_lo + x[:, K/2:]·w_hi).
2. Fewer unpacks: larger token tiles (tm). Total unpack work is
   n_valid_tiles × K × N; at 2048×6 picks / 64 experts ≈ 192
   picks/expert, tm=128 gives ~2 tiles/expert, tm=256 ~1 — the unpack
   halves while the extra padding rows only cost MXU FLOPs (~20% of
   step time). Round 4 only ever swept tm DOWNWARD (for decode).

Usage: python benchmarks/probe_unpack_variants.py
"""
from __future__ import annotations

import functools
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

assert jax.default_backend() == "tpu", jax.default_backend()

from krasis_tpu.config import preset_config
from krasis_tpu.ops.gmm_pallas import gmm, moe_prefill_pallas, _plan_tiles
from krasis_tpu.ops.moe_pallas import pick_tile
from krasis_tpu.quant import QTensor, random_qtensor

cfg = preset_config("deepseek-v2-lite")
T, H, I = 2048, cfg.hidden_size, cfg.moe_intermediate_size
E, K_top = cfg.n_routed_experts, cfg.num_experts_per_tok
key = jax.random.PRNGKey(0)
TN = 512


from _timing import timeit_ms as timeit  # noqa: E402


# ---------------------------------------------------------------- v2 kernel
def _unpack_scale_v2(q, s, bits, gs):
    """Variant unpack: shift sign-extend + bf16 scale mul.
    Returns (w_lo [K/2, N], w_hi [K/2, N]) bf16 — caller does split dots."""
    b = q.astype(jnp.int32)
    lo = (b << 28) >> 28
    hi = (b << 24) >> 28
    rows, N = b.shape
    K = rows * 2
    # s_full [K, N] bf16 via broadcast-reshape (no concat materialization
    # beyond what the mul needs); halves sliced for the split dots
    s_full = jnp.broadcast_to(
        s[:, None, :], (K // gs, gs, N)).reshape(K, N).astype(jnp.bfloat16)
    w_lo = lo.astype(jnp.bfloat16) * s_full[:rows]
    w_hi = hi.astype(jnp.bfloat16) * s_full[rows:]
    return w_lo, w_hi


def _gmm_kernel_v2(l_ref, tile_e_ref, tv_ref, x_ref, q_ref, s_ref, o_ref,
                   *, bits, gs):
    t = pl.program_id(0)

    @pl.when(tv_ref[t] == 1)
    def _compute():
        if bits == 4:
            w_lo, w_hi = _unpack_scale_v2(q_ref[0, 0], s_ref[0, 0], bits, gs)
            rows = w_lo.shape[0]
            o_ref[:] = (
                jnp.dot(x_ref[:, :rows], w_lo,
                        preferred_element_type=jnp.float32)
                + jnp.dot(x_ref[:, rows:], w_hi,
                          preferred_element_type=jnp.float32))
        else:
            b = q_ref[0, 0].astype(jnp.int32)
            K, N = b.shape
            s_full = jnp.broadcast_to(
                s_ref[0, 0][:, None, :], (K // gs, gs, N)
            ).reshape(K, N).astype(jnp.bfloat16)
            w = b.astype(jnp.bfloat16) * s_full
            o_ref[:] = jnp.dot(x_ref[:], w,
                               preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("tm",))
def gmm_v2(x_tiles, w: QTensor, tile_experts, tile_valid, tm: int = 128):
    Mp, K = x_tiles.shape
    N = w.n_dim
    gs = w.group_size
    q4, s4 = (w.q, w.scales) if w.q.ndim == 4 else (w.q[None], w.scales[None])
    layer_arr = jnp.zeros((1,), jnp.int32)
    rows = q4.shape[-2]
    tn = pick_tile(N, TN)
    n_tiles = Mp // tm
    grid = (n_tiles, N // tn)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, K),
                         lambda t, j, l, e, v: (jnp.where(v[t] == 1, t, 0), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, rows, tn),
                         lambda t, j, l, e, v: (
                             l[0], e[t], 0, jnp.where(v[t] == 1, j, 0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, K // gs, tn),
                         lambda t, j, l, e, v: (
                             l[0], e[t], 0, jnp.where(v[t] == 1, j, 0)),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tm, tn),
            lambda t, j, l, e, v: (jnp.where(v[t] == 1, t, n_tiles),
                                   jnp.where(v[t] == 1, j, 0)),
            memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_gmm_kernel_v2, bits=w.bits, gs=gs),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Mp + tm, N), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * K * N,
            bytes_accessed=(Mp // tm) * (rows * N + (K // gs) * N * 2)
            + Mp * K * 2 + Mp * N * 4,
            transcendentals=0,
        ),
    )(layer_arr, tile_experts.astype(jnp.int32), tile_valid.astype(jnp.int32),
      x_tiles.astype(jnp.bfloat16), q4, s4)


def main():
    results = {}
    w13 = random_qtensor(jax.random.fold_in(key, 1), (E, H, 2 * I), 4, 128)
    idx = jax.random.randint(jax.random.fold_in(key, 4), (T, K_top), 0, E)

    # plan once per tm; time the RAW gmm at w13 shapes
    for tm in (128, 256, 512):
        dest, te, tv, order, n_tiles = jax.jit(
            lambda i: _plan_tiles(i, T, K_top, E, tm=tm),
            static_argnames=())(idx)
        Mp = n_tiles * tm
        x_tiles = jax.random.normal(
            jax.random.fold_in(key, 9), (Mp, H), jnp.bfloat16) * 0.1
        base = timeit(functools.partial(gmm, tm=tm), x_tiles, w13, te, tv)
        v2 = timeit(functools.partial(gmm_v2, tm=tm), x_tiles, w13, te, tv)
        # numerics check
        a = gmm(x_tiles, w13, te, tv, tm=tm)
        b = gmm_v2(x_tiles, w13, te, tv, tm=tm)
        err = float(jnp.max(jnp.abs(a - b)))
        nvalid = int(jnp.sum(tv))
        results[f"gmm_w13_tm{tm}"] = {
            "base_ms": round(base, 3), "v2_ms": round(v2, 3),
            "n_tiles": int(n_tiles), "valid_tiles": nvalid,
            "max_abs_err": err,
        }
        print(f"tm={tm}: base {base:.3f} ms, v2 {v2:.3f} ms, "
              f"valid {nvalid}/{n_tiles}, err {err:.3e}", flush=True)

    # full MoE layer (both stages + glue) across tm for the BASE path
    w2 = random_qtensor(jax.random.fold_in(key, 2), (E, I, H), 4, 128)
    x = jax.random.normal(jax.random.fold_in(key, 3), (T, H), jnp.bfloat16) * 0.1
    wts = jax.nn.softmax(jax.random.normal(jax.random.fold_in(key, 5),
                                           (T, K_top)))
    for tm in (128, 256, 512):
        fn = jax.jit(functools.partial(
            lambda x, i, w, w13, w2, tm: moe_prefill_pallas(
                x, w13, w2, i, w, tile_rows=tm), tm=tm))
        ms = timeit(fn, x, idx, wts, w13, w2)
        flops = 2 * T * K_top * (H * 2 * I + I * H)
        results[f"moe_layer_tm{tm}"] = {"ms": round(ms, 3),
                                        "gf_s": round(flops / ms / 1e9, 1)}
        print(f"moe layer tm={tm}: {ms:.3f} ms ({flops/ms/1e9:.0f} GF/s)",
              flush=True)

    with open("benchmarks/unpack_variants.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
