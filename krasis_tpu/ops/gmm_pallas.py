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

gmm(x_sorted, w, group_sizes) is the building block; moe_prefill_pallas
composes w13-GEMM → SwiGLU → w2-GEMM with the XLA-level scatter/gather
glue (sort, pad-to-tiles, unsort, weighted combine).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..quant import QTensor
from .moe_pallas import _unpack_scale, available, pick_tile  # shared helpers

TM = 128      # token-tile rows
TN = 512      # output-tile lanes


def _gmm_kernel(l_ref, tile_e_ref, x_ref, q_ref, s_ref, o_ref, *, bits, gs):
    w = _unpack_scale(q_ref[0, 0], s_ref[0, 0], bits, gs)   # [K, TN] bf16
    o_ref[:] = jnp.dot(
        x_ref[:], w, preferred_element_type=jnp.float32
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def gmm(
    x_tiles: jax.Array,       # [Mp, K] bf16 — tile-aligned (Mp % TM == 0)
    w: QTensor,               # [(L,) E, K(/2), N]
    tile_experts: jax.Array,  # [Mp // TM] int32 expert id per tile
    layer_idx=None,           # traced scalar into the stacked L dim
    interpret: bool = False,
) -> jax.Array:
    Mp, K = x_tiles.shape
    N = w.n_dim
    gs = w.group_size
    q4, s4 = (w.q, w.scales) if w.q.ndim == 4 else (w.q[None], w.scales[None])
    layer_arr = jnp.reshape(
        jnp.asarray(0 if layer_idx is None else layer_idx, jnp.int32), (1,)
    )
    rows = q4.shape[-2]
    tn = pick_tile(N, TN)
    grid = (Mp // TM, N // tn)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TM, K), lambda t, j, l, e: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, rows, tn), lambda t, j, l, e: (l[0], e[t], 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, K // gs, tn), lambda t, j, l, e: (l[0], e[t], 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TM, tn), lambda t, j, l, e: (t, j),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_gmm_kernel, bits=w.bits, gs=gs),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Mp, N), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * K * N,
            bytes_accessed=(Mp // TM) * (rows * N + (K // gs) * N * 2)
            + Mp * K * 2 + Mp * N * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(layer_arr, tile_experts.astype(jnp.int32), x_tiles.astype(jnp.bfloat16),
      q4, s4)


def _plan_tiles(
    topk_idx: jax.Array, T: int, k: int, E: int
) -> Tuple[jax.Array, jax.Array, jax.Array, int]:
    """Sort (token, expert) pairs and compute the tile-aligned scatter plan.

    Returns (dest [T*k] scatter positions, tile_experts [n_tiles],
    order [T*k] sort order, n_tiles static).
    """
    M = T * k
    flat_e = topk_idx.reshape(-1)
    order = jnp.argsort(flat_e)
    sorted_e = jnp.take(flat_e, order)

    group_sizes = jnp.bincount(flat_e, length=E)               # [E]
    padded = ((group_sizes + TM - 1) // TM) * TM
    pad_off = jnp.concatenate([jnp.zeros((1,), padded.dtype),
                               jnp.cumsum(padded)[:-1]])       # [E]
    raw_off = jnp.concatenate([jnp.zeros((1,), group_sizes.dtype),
                               jnp.cumsum(group_sizes)[:-1]])

    # dest position of sorted token i (rank within its expert + pad offset)
    ranks = jnp.arange(M) - jnp.take(raw_off, sorted_e)
    dest = jnp.take(pad_off, sorted_e) + ranks                 # [M]

    n_tiles = M // TM + E + 1                                  # static bound
    tile_starts = jnp.arange(n_tiles) * TM
    cum_padded = jnp.cumsum(padded)
    tile_experts = jnp.searchsorted(cum_padded, tile_starts, side="right")
    tile_experts = jnp.minimum(tile_experts, E - 1)
    return dest, tile_experts, order, n_tiles


def moe_prefill_pallas(
    x: jax.Array,             # [T, H]
    w13: QTensor,             # [(L,) E, H(/2), 2I]
    w2: QTensor,              # [(L,) E, I(/2), H]
    topk_idx: jax.Array,      # [T, k]
    topk_weights: jax.Array,  # [T, k]
    swiglu_limit: float = 0.0,
    gpt_oss: bool = False,
    layer_idx=None,
    interpret: bool = False,
) -> jax.Array:
    from .activations import swiglu

    T, H = x.shape
    k = topk_idx.shape[-1]
    E = w13.q.shape[-3]
    M = T * k

    dest, tile_experts, order, n_tiles = _plan_tiles(topk_idx, T, k, E)
    Mp = n_tiles * TM

    x_rep = jnp.repeat(x, k, axis=0)                       # [M, H]
    x_sorted = jnp.take(x_rep, order, axis=0)
    x_tiles = jnp.zeros((Mp, H), x.dtype).at[dest].set(x_sorted)

    h = gmm(x_tiles, w13, tile_experts, layer_idx=layer_idx,
            interpret=interpret)
    a = swiglu(h.astype(jnp.bfloat16), swiglu_limit=swiglu_limit,
               gpt_oss=gpt_oss)
    o = gmm(a, w2, tile_experts, layer_idx=layer_idx,
            interpret=interpret)                           # [Mp, H]

    o_sorted = jnp.take(o, dest, axis=0)                   # [M, H]
    o_rep = jnp.zeros_like(o_sorted).at[order].set(o_sorted)
    out = (o_rep.reshape(T, k, H) * topk_weights[..., None]).sum(axis=1)
    return out.astype(x.dtype)
