"""Pallas TPU kernel: grouped (ragged) expert GEMM with in-kernel dequant.

THE prefill performance kernel — the TPU equivalent of the reference's
Marlin fused-MoE GPU path (reference python/krasis/gpu_prefill.py
fused_marlin_moe; SURVEY §7 ranks this hardest/most valuable). Tokens
sorted by expert are padded so every TM-row tile belongs to exactly one
expert (megablocks-style); the grid walks (token-tile, N-tile) with the
tile→expert map scalar-prefetched, so each step dequantizes one
[K, TN] INT4/INT8 tile of its expert's weights in VMEM and hits the MXU
with bf16 — no expert stack is ever materialized in bf16 (the XLA
fallback needs 4× the weight bytes in HBM and OOMs at V2-Lite scale).

Inactive tiles (padding beyond the last real expert group, and — under
expert parallelism — picks owned by another shard) are skipped at
near-zero cost: their compute is `pl.when`-gated off and their x / weight /
output index maps are redirected to constant blocks, so the pipeline
never re-DMAs anything for them. This is what makes the kernel run
unmodified inside an `ep` shard_map: each shard plans tiles over its
LOCAL expert slice, remote picks fall into a trash group, and per-shard
HBM traffic is exactly the local experts' bytes (the EP scaling the
reference gets from per-GPU expert slices, model.py:2719-2835).

gmm(x_sorted, w, group_sizes) is the building block; moe_prefill_pallas
composes w13-GEMM → SwiGLU → w2-GEMM with the XLA-level scatter/gather
glue (sort, pad-to-tiles, unsort, weighted combine).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..quant import QTensor
from .moe_pallas import (  # shared helpers
    _grouped_dot_i8,
    _unpack_int8,
    _unpack_scale,
    available,
    pick_tile,
    quantize_activations,
)

TM = 128      # token-tile rows
TN = 512      # output-tile lanes


def _gmm_kernel(l_ref, tile_e_ref, tv_ref, x_ref, q_ref, s_ref, o_ref,
                *, bits, gs):
    t = pl.program_id(0)

    @pl.when(tv_ref[t] == 1)
    def _compute():
        w = _unpack_scale(q_ref[0, 0], s_ref[0, 0], bits, gs)   # [K, TN] bf16
        o_ref[:] = jnp.dot(
            x_ref[:], w, preferred_element_type=jnp.float32
        )


@functools.partial(jax.jit, static_argnames=("interpret", "tm"))
def gmm(
    x_tiles: jax.Array,       # [Mp, K] bf16 — tile-aligned (Mp % tm == 0)
    w: QTensor,               # [(L,) E, K(/2), N]
    tile_experts: jax.Array,  # [Mp // tm] int32 expert id per tile
    tile_valid: jax.Array,    # [Mp // tm] int32 1 = compute, 0 = skip
    layer_idx=None,           # traced scalar into the stacked L dim
    interpret: bool = False,
    tm: int = TM,
) -> jax.Array:
    """Returns [Mp + tm, N]: one spare trailing tile absorbs the writes of
    skipped grid steps (their out index maps point there) so real tiles
    are never garbage-flushed. Callers slice [:Mp].

    `tm` is the token-tile height: 128 for prefill (MXU-shaped); the
    batched-decode grouped regime uses a small tm — at B=16 slots only
    ~2 picks hit each expert, so 128-row tiles are ~98% padding FLOPs."""
    Mp, K = x_tiles.shape
    N = w.n_dim
    gs = w.group_size
    q4, s4 = (w.q, w.scales) if w.q.ndim == 4 else (w.q[None], w.scales[None])
    layer_arr = jnp.reshape(
        jnp.asarray(0 if layer_idx is None else layer_idx, jnp.int32), (1,)
    )
    rows = q4.shape[-2]
    tn = pick_tile(N, TN)
    n_tiles = Mp // tm
    grid = (n_tiles, N // tn)

    # Skipped tiles redirect every DMA to a constant block: x to tile 0,
    # weights to (expert of the tile, lane-tile 0) — tile_experts is
    # constant over the skipped tail, so the pipeline fetches nothing new —
    # and output to the spare tile row n_tiles.
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
        functools.partial(_gmm_kernel, bits=w.bits, gs=gs),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Mp + tm, N), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * K * N,
            bytes_accessed=(Mp // tm) * (rows * N + (K // gs) * N * 2)
            + Mp * K * 2 + Mp * N * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(layer_arr, tile_experts.astype(jnp.int32), tile_valid.astype(jnp.int32),
      x_tiles.astype(jnp.bfloat16), q4, s4)


def _gmm_kernel_a8(l_ref, tile_e_ref, tv_ref, xq_ref, sx_ref, q_ref, s_ref,
                   o_ref, *, bits, gs):
    """INT8-activation tile: unpack int4→int8 (half the VPU work of
    →bf16) and per-K-group int8×int8 MXU dots — int8 MXU throughput is
    2× bf16 on v5e, so the prefill GEMM gets both a cheaper unpack and
    a faster systolic array (W4A8, quality-certified in
    benchmarks/quality/QUALITY.md)."""
    t = pl.program_id(0)

    @pl.when(tv_ref[t] == 1)
    def _compute():
        w_i8 = _unpack_int8(q_ref[0, 0], bits)                # [K, tn] i8
        o_ref[:] = _grouped_dot_i8(xq_ref[:], sx_ref[:], w_i8,
                                   s_ref[0, 0], gs)


def gmm_a8_supported(w: QTensor) -> bool:
    """int8 activations group along K, so K must be group-aligned."""
    return (isinstance(w, QTensor) and w.bits in (4, 8)
            and w.k_dim % w.group_size == 0)


@functools.partial(jax.jit, static_argnames=("interpret", "tm"))
def gmm_a8(
    xq_tiles: jax.Array,      # [Mp, K] int8 (per-row per-K-group quantized)
    sx_tiles: jax.Array,      # [Mp, K // gs] f32 activation scales
    w: QTensor,               # [(L,) E, K(/2), N]
    tile_experts: jax.Array,  # [Mp // tm] int32
    tile_valid: jax.Array,    # [Mp // tm] int32
    layer_idx=None,
    interpret: bool = False,
    tm: int = TM,
) -> jax.Array:
    """gmm with int8 activations (same tile plan / skip semantics)."""
    Mp, K = xq_tiles.shape
    N = w.n_dim
    gs = w.group_size
    q4, s4 = (w.q, w.scales) if w.q.ndim == 4 else (w.q[None], w.scales[None])
    layer_arr = jnp.reshape(
        jnp.asarray(0 if layer_idx is None else layer_idx, jnp.int32), (1,)
    )
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
            pl.BlockSpec((tm, K // gs),
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
        functools.partial(_gmm_kernel_a8, bits=w.bits, gs=gs),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Mp + tm, N), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * K * N,
            bytes_accessed=(Mp // tm) * (rows * N + (K // gs) * N * 2)
            + Mp * K + Mp * N * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(layer_arr, tile_experts.astype(jnp.int32), tile_valid.astype(jnp.int32),
      xq_tiles, sx_tiles.astype(jnp.float32), q4, s4)


# --------------------------------------------------------------------------
# Fused full-N kernels (round-5 redesign)
# --------------------------------------------------------------------------
#
# probe_gmm_terms measured the per-(token-tile, n-tile) kernel near its
# PIPELINE floor: at V2-Lite w13 shapes the empty-compute variant costs
# 1.26 ms of the full kernel's 1.74 ms — 1,771 grid steps each re-DMA
# weight blocks (the t-major walk re-reads every expert's weights once
# per token tile, ~2.5×) and pay per-step overhead; the int4→bf16
# unpack ALU cost that round 4 blamed is the small residual (cheaper
# unpack sequences measured NO change, probe_unpack_variants).
#
# Redesign: ONE grid step per token tile covering the FULL output width,
# with a static inner loop over ≤TS-wide subtiles (unpack + MXU dot per
# subtile keeps the bf16 transient ≤ ~2 MB of VMEM). Consecutive tiles
# of the same expert hit the SAME weight-block index, so the revolving
# buffer fetches each expert's weights exactly once per kernel — HBM
# weight traffic drops from ~2.5× to 1× the stack — and grid overhead
# amortizes across the whole row. The w13 kernel additionally fuses
# SwiGLU (both halves are resident at step end), writing the [tm, I]
# bf16 activations directly — the [Mp, 2I] f32 h tensor never touches
# HBM (the reference fuses the same way in fused_marlin_moe, reference
# python/krasis/gpu_prefill.py:318-565).

TS = 512          # max subtile width for the inner unpack+dot loop
_MAX_FUSED_BLOCK = 4 * 1024 * 1024   # per-expert packed block cap (bytes)


def _sub_width(N: int) -> int:
    for ts in (TS, 384, 256, 128):
        if N % ts == 0:
            return ts
    return 0


def gmm_fused_supported(w13: QTensor, w2: QTensor) -> bool:
    """Fused full-N grouped path: lane-aligned widths, packed per-expert
    blocks that fit VMEM double-buffered."""
    if not (isinstance(w13, QTensor) and isinstance(w2, QTensor)):
        return False
    if w13.bits not in (4, 8) or w2.bits not in (4, 8):
        return False
    N13, H = w13.n_dim, w2.n_dim
    I = w2.k_dim
    if N13 != 2 * I:
        return False
    if _sub_width(N13) == 0 or _sub_width(H) == 0 or I % 128:
        return False
    if w13.q.shape[-2] * N13 > _MAX_FUSED_BLOCK:
        return False
    if w2.q.shape[-2] * H > _MAX_FUSED_BLOCK:
        return False
    return True


def _gmm13_fused_kernel(l_ref, tile_e_ref, tv_ref, x_ref, q_ref, s_ref,
                        o_ref, *, bits, gs, I, ts, swiglu_limit, gpt_oss):
    t = pl.program_id(0)

    @pl.when(tv_ref[t] == 1)
    def _compute():
        N13 = 2 * I
        parts = []
        for j in range(N13 // ts):
            w = _unpack_scale(q_ref[0, 0, :, j * ts:(j + 1) * ts],
                              s_ref[0, 0, :, j * ts:(j + 1) * ts], bits, gs)
            parts.append(jnp.dot(x_ref[:], w,
                                 preferred_element_type=jnp.float32))
        h = jnp.concatenate(parts, axis=-1).astype(jnp.bfloat16)
        # swiglu at the exact production numerics (ops/activations.swiglu
        # applied to the bf16-cast h): f32 math, bf16 out
        g = h[:, :I].astype(jnp.float32)
        u = h[:, I:].astype(jnp.float32)
        if gpt_oss:
            g = jnp.minimum(g, swiglu_limit)
            u = jnp.clip(u, -swiglu_limit, swiglu_limit)
            a = g * jax.nn.sigmoid(1.702 * g) * (u + 1.0)
        else:
            a = g * jax.nn.sigmoid(g) * u
        o_ref[:] = a.astype(jnp.bfloat16)


def _gmm2_fused_kernel(l_ref, tile_e_ref, tv_ref, a_ref, q_ref, s_ref,
                       o_ref, *, bits, gs, ts):
    t = pl.program_id(0)

    @pl.when(tv_ref[t] == 1)
    def _compute():
        H = o_ref.shape[-1]
        for j in range(H // ts):
            w = _unpack_scale(q_ref[0, 0, :, j * ts:(j + 1) * ts],
                              s_ref[0, 0, :, j * ts:(j + 1) * ts], bits, gs)
            o_ref[:, j * ts:(j + 1) * ts] = jnp.dot(
                a_ref[:], w, preferred_element_type=jnp.float32)


def _fused_specs(tm, K, rows, N, gs, n_tiles):
    return [
        pl.BlockSpec((tm, K),
                     lambda t, l, e, v: (jnp.where(v[t] == 1, t, 0), 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, rows, N),
                     lambda t, l, e, v: (l[0], e[t], 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, K // gs, N),
                     lambda t, l, e, v: (l[0], e[t], 0, 0),
                     memory_space=pltpu.VMEM),
    ]


@functools.partial(jax.jit, static_argnames=(
    "swiglu_limit", "gpt_oss", "interpret", "tm"))
def gmm13_fused(
    x_tiles: jax.Array,       # [Mp, H] bf16
    w13: QTensor,             # [(L,) E, H(/2), 2I]
    tile_experts: jax.Array,
    tile_valid: jax.Array,
    layer_idx=None,
    swiglu_limit: float = 0.0,
    gpt_oss: bool = False,
    interpret: bool = False,
    tm: int = TM,
) -> jax.Array:
    """Fused w13-GEMM + SwiGLU over expert-sorted token tiles.
    Returns [Mp + tm, I] bf16 activations (spare tile absorbs skips)."""
    Mp, K = x_tiles.shape
    N13 = w13.n_dim
    I = N13 // 2
    gs = w13.group_size
    q4, s4 = (w13.q, w13.scales) if w13.q.ndim == 4 else (
        w13.q[None], w13.scales[None])
    layer_arr = jnp.reshape(
        jnp.asarray(0 if layer_idx is None else layer_idx, jnp.int32), (1,))
    rows = q4.shape[-2]
    ts = _sub_width(N13)
    n_tiles = Mp // tm
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_tiles,),
        in_specs=_fused_specs(tm, K, rows, N13, gs, n_tiles),
        out_specs=pl.BlockSpec(
            (tm, I),
            lambda t, l, e, v: (jnp.where(v[t] == 1, t, n_tiles), 0),
            memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_gmm13_fused_kernel, bits=w13.bits, gs=gs, I=I,
                          ts=ts, swiglu_limit=swiglu_limit, gpt_oss=gpt_oss),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Mp + tm, I), jnp.bfloat16),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * K * N13,
            bytes_accessed=rows * N13 * (Mp // tm) // 2 + Mp * K * 2
            + Mp * I * 2,
            transcendentals=Mp * I,
        ),
        interpret=interpret,
    )(layer_arr, tile_experts.astype(jnp.int32), tile_valid.astype(jnp.int32),
      x_tiles.astype(jnp.bfloat16), q4, s4)


@functools.partial(jax.jit, static_argnames=("interpret", "tm"))
def gmm2_fused(
    a_tiles: jax.Array,       # [Mp, I] bf16 (gmm13_fused output, sliced)
    w2: QTensor,              # [(L,) E, I(/2), H]
    tile_experts: jax.Array,
    tile_valid: jax.Array,
    layer_idx=None,
    interpret: bool = False,
    tm: int = TM,
) -> jax.Array:
    """Full-N w2 GEMM over expert-sorted activation tiles → [Mp+tm, H] f32."""
    Mp, I = a_tiles.shape
    H = w2.n_dim
    gs = w2.group_size
    q4, s4 = (w2.q, w2.scales) if w2.q.ndim == 4 else (
        w2.q[None], w2.scales[None])
    layer_arr = jnp.reshape(
        jnp.asarray(0 if layer_idx is None else layer_idx, jnp.int32), (1,))
    rows = q4.shape[-2]
    ts = _sub_width(H)
    n_tiles = Mp // tm
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_tiles,),
        in_specs=_fused_specs(tm, I, rows, H, gs, n_tiles),
        out_specs=pl.BlockSpec(
            (tm, H),
            lambda t, l, e, v: (jnp.where(v[t] == 1, t, n_tiles), 0),
            memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_gmm2_fused_kernel, bits=w2.bits, gs=gs, ts=ts),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Mp + tm, H), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * I * H,
            bytes_accessed=rows * H * (Mp // tm) // 2 + Mp * I * 2
            + Mp * H * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(layer_arr, tile_experts.astype(jnp.int32), tile_valid.astype(jnp.int32),
      a_tiles.astype(jnp.bfloat16), q4, s4)


def _plan_tiles(
    topk_idx: jax.Array, T: int, k: int, E: int,
    pick_valid: Optional[jax.Array] = None,
    tm: int = TM,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array, int]:
    """Sort (token, expert) pairs and compute the tile-aligned scatter plan.

    Picks with ``pick_valid == False`` (experts owned by another EP shard)
    go to a trash group: they are excluded from group sizes, scattered
    out-of-bounds (dropped), and read back as zero.

    Returns (dest [T*k] scatter positions, tile_experts [n_tiles],
    tile_valid [n_tiles], order [T*k] sort order, n_tiles static).
    """
    M = T * k
    flat_e = topk_idx.reshape(-1)
    if pick_valid is not None:
        flat_e = jnp.where(pick_valid.reshape(-1), flat_e, E)
    order = jnp.argsort(flat_e)
    sorted_e = jnp.take(flat_e, order)

    group_sizes = jnp.bincount(flat_e, length=E)               # [E], no trash
    padded = ((group_sizes + tm - 1) // tm) * tm
    pad_off = jnp.concatenate([jnp.zeros((1,), padded.dtype),
                               jnp.cumsum(padded)[:-1]])       # [E]
    raw_off = jnp.concatenate([jnp.zeros((1,), group_sizes.dtype),
                               jnp.cumsum(group_sizes)[:-1]])

    n_tiles = M // tm + E + 1                                  # static bound
    Mp = n_tiles * tm

    # dest position of sorted token i (rank within its expert + pad offset);
    # trash picks go past even the spare output tile (gather-with-fill → 0)
    se = jnp.minimum(sorted_e, E - 1)
    ranks = jnp.arange(M) - jnp.take(raw_off, se)
    dest = jnp.take(pad_off, se) + ranks                       # [M]
    dest = jnp.where(sorted_e < E, dest, Mp + tm)

    total_real = jnp.sum(padded)
    tile_starts = jnp.arange(n_tiles) * tm
    cum_padded = jnp.cumsum(padded)
    tile_experts = jnp.searchsorted(cum_padded, tile_starts, side="right")
    tile_experts = jnp.minimum(tile_experts, E - 1)
    tile_valid = (tile_starts < total_real).astype(jnp.int32)
    return dest, tile_experts, tile_valid, order, n_tiles


def moe_prefill_pallas(
    x: jax.Array,             # [T, H]
    w13: QTensor,             # [(L,) E, H(/2), 2I]
    w2: QTensor,              # [(L,) E, I(/2), H]
    topk_idx: jax.Array,      # [T, k]
    topk_weights: jax.Array,  # [T, k]
    swiglu_limit: float = 0.0,
    gpt_oss: bool = False,
    layer_idx=None,
    pick_valid: Optional[jax.Array] = None,  # [T, k] bool (EP shard-local)
    interpret: bool = False,
    activation: str = "bf16",
    tile_rows: Optional[int] = None,
) -> jax.Array:
    from .activations import swiglu

    T, H = x.shape
    k = topk_idx.shape[-1]
    E = w13.q.shape[-3]
    M = T * k

    # tile height stays 128 in every regime: tm=32 was MEASURED neutral
    # at 16 slots (802 vs 772-820 band) and WORSE at 48 (1,389 vs 1,516
    # steady tok/s) — the grouped step is bound by the per-(expert,
    # n-tile) weight unpack, which tm does not change, while smaller
    # tiles re-unpack hot experts' tiles more often. `tile_rows` remains
    # an explicit A/B knob.
    tm = tile_rows or TM
    dest, tile_experts, tile_valid, order, n_tiles = _plan_tiles(
        topk_idx, T, k, E, pick_valid=pick_valid, tm=tm
    )
    Mp = n_tiles * tm

    # ONE gather builds the tile-aligned activations: tile row p takes
    # token src[p] (= order[p] // k, scattered via dest); padding rows
    # read out-of-range → fill 0. Fusing repeat→sort-gather→scatter into
    # a single take removes two full [M, H] materializations from the
    # glue (measured: glue ≈ 1/3 of the grouped MoE layer).
    src = jnp.full((Mp,), T, jnp.int32).at[dest].set(
        (order // k).astype(jnp.int32), mode="drop")
    x_tiles = jnp.take(x, src, axis=0, mode="fill", fill_value=0)

    import os

    use_a8 = (activation == "int8"
              and gmm_a8_supported(w13) and gmm_a8_supported(w2))
    use_fused = (not use_a8 and gmm_fused_supported(w13, w2)
                 and os.environ.get("KRASIS_TPU_GMM") != "legacy")
    if use_a8:
        xq, sx = quantize_activations(
            x_tiles.astype(jnp.bfloat16), w13.group_size)
        h = gmm_a8(xq, sx, w13, tile_experts, tile_valid,
                   layer_idx=layer_idx, interpret=interpret, tm=tm)[:Mp]
        a = swiglu(h, swiglu_limit=swiglu_limit, gpt_oss=gpt_oss)
        aq, sa = quantize_activations(a, w2.group_size)
        o = gmm_a8(aq, sa, w2, tile_experts, tile_valid,
                   layer_idx=layer_idx, interpret=interpret, tm=tm)
    elif use_fused:
        a = gmm13_fused(x_tiles, w13, tile_experts, tile_valid,
                        layer_idx=layer_idx, swiglu_limit=swiglu_limit,
                        gpt_oss=gpt_oss, interpret=interpret, tm=tm)[:Mp]
        o = gmm2_fused(a, w2, tile_experts, tile_valid,
                       layer_idx=layer_idx, interpret=interpret, tm=tm)
    else:
        h = gmm(x_tiles, w13, tile_experts, tile_valid, layer_idx=layer_idx,
                interpret=interpret, tm=tm)[:Mp]
        a = swiglu(h.astype(jnp.bfloat16), swiglu_limit=swiglu_limit,
                   gpt_oss=gpt_oss)
        o = gmm(a, w2, tile_experts, tile_valid, layer_idx=layer_idx,
                interpret=interpret, tm=tm)                # [Mp + tm, H]

    # output combine as ONE gather: pick i sits at sorted position
    # inv[i], tile row dest[inv[i]] (trash picks index past o's rows →
    # fill 0). Replaces gather + full-[M, H] scatter.
    M_ids = jnp.arange(M, dtype=jnp.int32)
    inv = jnp.zeros((M,), jnp.int32).at[order].set(M_ids)
    o_rep = jnp.take(o, jnp.take(dest, inv), axis=0,
                     mode="fill", fill_value=0)              # [M, H]
    out = (o_rep.reshape(T, k, H) * topk_weights[..., None]).sum(axis=1)
    return out.astype(x.dtype)
