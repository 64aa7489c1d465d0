"""Pallas TPU kernel: gathered expert MLP for decode (M=1 per expert).

The decode-side half of the reference's expert engine (reference
src/moe.rs expert_forward_unified: per selected expert, read its packed
weights once, run gate/up → SiLU → down): one grid step per
(token, top-k expert) pair. Scalar-prefetched expert ids drive the
BlockSpec index maps, so the Pallas pipeline double-buffers the *next*
selected expert's packed INT4/INT8 weights from HBM while the current
expert computes — the TPU analog of the reference's NTA-prefetch
sequential path (moe.rs:513-531). HBM traffic per step is exactly the
selected expert's packed bytes: the bandwidth-optimal decode pattern.

The whole fused chain (dequant w13 → GEMV → SwiGLU → dequant w2 → GEMV
→ route-weight scale) runs in one kernel; the caller just sums the k
partial outputs per token.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..quant import QTensor

# Per-expert packed-bytes budget: double-buffered blocks plus the
# subtiled ≤2 MB unpack transient must fit VMEM (2×4.75 + ~2 + h/x/out
# ≈ 12 MB of 16). Round 5 raised 4 MB → 4.75 MB once the kernels
# subtiled their unpack: V2-Lite (4.33 MB/pick) now runs ONE fused
# pallas call per MoE layer instead of two N-tiled ones — the per-call
# overhead was the decode MoE term's dominant cost
# (benchmarks/decode_trace.json).
_MAX_W_BYTES = int(4.75 * 1024 * 1024)


def interpret_mode() -> bool:
    """Run the MoE kernels in Pallas interpret mode (CPU): slow but
    exercises the real kernel code paths — the sharded==unsharded EP
    tests use this so multi-chip correctness is proven WITH the
    performance kernels, not just the XLA fallbacks."""
    return bool(os.environ.get("KRASIS_TPU_PALLAS_INTERPRET"))


def available() -> bool:
    if os.environ.get("KRASIS_TPU_NO_PALLAS"):
        return False
    if interpret_mode():
        return True
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def supported(x: jax.Array, w13: QTensor, w2: QTensor) -> bool:
    if not (isinstance(w13, QTensor) and isinstance(w2, QTensor)):
        return False
    if w13.q.ndim not in (3, 4) or w2.q.ndim != w13.q.ndim:
        return False
    H, I2 = w13.k_dim, w13.n_dim
    I, H2 = w2.k_dim, w2.n_dim
    if H != H2 or I * 2 != I2:
        return False
    if I2 % 128 or H % 128:
        return False
    if w13.q.shape[-2] * w13.q.shape[-1] + w2.q.shape[-2] * w2.q.shape[-1] > _MAX_W_BYTES:
        return False
    return True


def _unpack_scale(q, s, bits, gs):
    """[rows, N] packed int → [K, N] bf16 dequantized.

    Unpack arithmetic runs at int32 width — narrower int dtypes hit
    Mosaic legalization gaps on this toolchain (arith.subi / uint8→bf16
    casts); revisit when the kernel compiler gains int8 vector ops."""
    if bits == 4:
        b = q.astype(jnp.int32)
        lo = ((b & 0xF) ^ 8) - 8
        hi = (((b >> 4) & 0xF) ^ 8) - 8
        w = jnp.concatenate([lo, hi], axis=0)
    else:
        w = q.astype(jnp.int32)
    K, N = w.shape
    wf = w.astype(jnp.float32).reshape(K // gs, gs, N)
    wf = wf * s.astype(jnp.float32)[:, None, :]
    return wf.reshape(K, N).astype(jnp.bfloat16)


def _subtiled_mm(x, q_ref, s_ref, bits, gs):
    """x [T, K] bf16 · dequant(q_ref [1,1,rows,N]) → [T, N] f32, with the
    unpack and MXU dot over static ≤512-wide column slices."""
    N = q_ref.shape[-1]
    ts = pick_tile(N, 512)
    parts = []
    for j in range(N // ts):
        w = _unpack_scale(q_ref[0, 0, :, j * ts:(j + 1) * ts],
                          s_ref[0, 0, :, j * ts:(j + 1) * ts], bits, gs)
        parts.append(jnp.dot(x, w, preferred_element_type=jnp.float32))
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=-1)


def _subtiled_mm_i8(xq, sx, q_ref, s_ref, bits, gs):
    """W4A8 form of _subtiled_mm: int8 activations (xq, sx) against
    ≤512-wide unpacked-int8 weight slices via the grouped int8 dot."""
    N = q_ref.shape[-1]
    ts = pick_tile(N, 512)
    parts = []
    for j in range(N // ts):
        w_i8 = _unpack_int8(q_ref[0, 0, :, j * ts:(j + 1) * ts], bits)
        parts.append(_grouped_dot_i8(
            xq, sx, w_i8, s_ref[0, 0, :, j * ts:(j + 1) * ts], gs))
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=-1)


def _kernel(
    # scalar prefetch
    layer_ref, expert_ref, token_ref, wt_ref,
    # tensor inputs
    x_ref, q13_ref, s13_ref, q2_ref, s2_ref,
    # output
    o_ref,
    *, bits: int, gs: int, I: int,
    swiglu_limit: float, gpt_oss: bool,
):
    # Mosaic forbids dynamically-indexed sublane rows, so each step runs
    # ALL T rows through the expert and masks to row token_ref[p] on
    # accumulate — decode is bandwidth-bound, the extra MXU rows are free.
    p = pl.program_id(0)
    t = token_ref[p]

    @pl.when(p == 0)
    def _init():
        o_ref[:] = jnp.zeros_like(o_ref)

    # Subtiled unpack+dot (≤512-wide slices): bounds the unpacked-weight
    # transient to ~2 MB so V2-Lite-size experts (4.33 MB/pick packed)
    # fit the fused kernel — one pallas call per MoE layer instead of
    # two N-tiled ones (per-call overhead measured as the decode MoE
    # term's dominant cost, benchmarks/decode_trace.json). Values are
    # bit-identical to the whole-width dot: each output column's K-sum
    # is unchanged by slicing N.
    h = _subtiled_mm(x_ref[:], q13_ref, s13_ref, bits, gs)        # [T, 2I]
    g, u = h[:, :I], h[:, I:]
    if gpt_oss:
        g = jnp.minimum(g, swiglu_limit)
        u = jnp.clip(u, -swiglu_limit, swiglu_limit)
        a = g * jax.nn.sigmoid(1.702 * g) * (u + 1.0)
    else:
        a = g * jax.nn.sigmoid(g) * u

    o = _subtiled_mm(a.astype(jnp.bfloat16), q2_ref, s2_ref, bits, gs)
    rows = jax.lax.broadcasted_iota(jnp.int32, o.shape, 0)
    o_ref[:] += jnp.where(rows == t, o * wt_ref[p], 0.0).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("swiglu_limit", "gpt_oss", "interpret")
)
def moe_gathered_pallas(
    x: jax.Array,            # [T, H] bf16
    w13: QTensor,            # [(L,) E, H(/2), 2I] + scales
    w2: QTensor,             # [(L,) E, I(/2), H] + scales
    topk_idx: jax.Array,     # [T, k] int32
    topk_weights: jax.Array, # [T, k] f32
    swiglu_limit: float = 0.0,
    gpt_oss: bool = False,
    layer_idx=None,          # traced scalar into the stacked L dim
    interpret: bool = False,
) -> jax.Array:
    T, H = x.shape
    k = topk_idx.shape[-1]
    P = T * k
    I = w2.k_dim
    gs = w13.group_size
    bits = w13.bits

    # Uniform 4D stacked view [L, E, rows, N]: pattern-stacked weights are
    # indexed IN the kernel via the layer scalar, so no per-layer slice of
    # the expert stack is ever materialized (the profiled decode bottleneck).
    q13, s13 = (w13.q, w13.scales) if w13.q.ndim == 4 else (
        w13.q[None], w13.scales[None])
    q2, s2 = (w2.q, w2.scales) if w2.q.ndim == 4 else (
        w2.q[None], w2.scales[None])
    layer_arr = jnp.reshape(
        jnp.asarray(0 if layer_idx is None else layer_idx, jnp.int32), (1,)
    )

    expert_ids = topk_idx.reshape(-1).astype(jnp.int32)
    token_ids = jnp.repeat(jnp.arange(T, dtype=jnp.int32), k)
    weights = topk_weights.reshape(-1).astype(jnp.float32)

    r13 = q13.shape[-2]
    r2 = q2.shape[-2]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(P,),
        in_specs=[
            pl.BlockSpec((T, H), lambda p, l, e, t, w: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, r13, 2 * I),
                         lambda p, l, e, t, w: (l[0], e[p], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, H // gs, 2 * I),
                         lambda p, l, e, t, w: (l[0], e[p], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, r2, H),
                         lambda p, l, e, t, w: (l[0], e[p], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, I // gs, H),
                         lambda p, l, e, t, w: (l[0], e[p], 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        # single [T, H] accumulator block: every (token, expert) step adds
        # its masked contribution; flushed once at grid end
        out_specs=pl.BlockSpec((T, H), lambda p, l, e, t, w: (0, 0),
                               memory_space=pltpu.VMEM),
    )

    partial_out = pl.pallas_call(
        functools.partial(
            _kernel, bits=bits, gs=gs, I=I,
            swiglu_limit=swiglu_limit, gpt_oss=gpt_oss,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T, H), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * P * T * H * 3 * I,
            bytes_accessed=P * (r13 * 2 * I + r2 * H) + T * H * 2 + T * H * 4,
            transcendentals=P * T * I,
        ),
        interpret=interpret,
    )(layer_arr, expert_ids, token_ids, weights, x.astype(jnp.bfloat16),
      q13, s13, q2, s2)

    return partial_out.astype(x.dtype)


# --------------------------------------------------------------------------
# W4A8: int8-activation variant of the fused gathered kernel
# --------------------------------------------------------------------------


def quantize_activations(x: jax.Array, gs: int):
    """[T, K] → (int8 [T, K], f32 scales [T, K//gs]) — per-row per-K-group
    symmetric, the activation-side analog of the weight quantizer (the
    reference's CPU decode quantizes activations to INT16 the same way,
    reference src/kernel/avx2.rs:234-307; int8 feeds the TPU's int MXU)."""
    T, K = x.shape
    xg = x.astype(jnp.float32).reshape(T, K // gs, gs)
    s = jnp.maximum(jnp.max(jnp.abs(xg), axis=-1) / 127.0, 1e-8)
    q = jnp.clip(jnp.round(xg / s[..., None]), -127, 127).astype(jnp.int8)
    return q.reshape(T, K), s


def _unpack_int8(q, bits):
    """Packed int4/int8 [rows, N] → int8 [K, N], NO scaling (scales are
    applied per group on the int32 dot results)."""
    if bits == 4:
        b = q.astype(jnp.int32)
        lo = ((b & 0xF) ^ 8) - 8
        hi = (((b >> 4) & 0xF) ^ 8) - 8
        w = jnp.concatenate([lo, hi], axis=0)
    else:
        w = q.astype(jnp.int32)
    return w.astype(jnp.int8)


def _grouped_dot_i8(xq, sx, w_i8, sw, gs):
    """Per-K-group int8×int8→int32 MXU dots with f32 scale accumulation.

    xq [T,K] int8 · w_i8 [K,N] int8, scaled by sx [T,G] (activations) and
    sw [G,N] (weights) → f32 [T,N]. The group loop is static (G = K/gs
    MXU calls); group-wise scaling is what keeps W4A8 at W4A16 quality
    minus only the activation rounding (~1.5% max rel err measured)."""
    T, K = xq.shape
    N = w_i8.shape[1]
    acc = jnp.zeros((T, N), jnp.float32)
    for g in range(K // gs):
        d = jnp.dot(xq[:, g * gs:(g + 1) * gs], w_i8[g * gs:(g + 1) * gs],
                    preferred_element_type=jnp.int32)
        acc = acc + d.astype(jnp.float32) * sx[:, g:g + 1] * \
            sw[g].astype(jnp.float32)[None, :]
    return acc


def _kernel_w4a8(
    layer_ref, expert_ref, token_ref, wt_ref,
    xq_ref, sx_ref, q13_ref, s13_ref, q2_ref, s2_ref,
    o_ref, *, bits: int, gs: int, I: int,
    swiglu_limit: float, gpt_oss: bool,
):
    p = pl.program_id(0)
    t = token_ref[p]

    @pl.when(p == 0)
    def _init():
        o_ref[:] = jnp.zeros_like(o_ref)

    h = _subtiled_mm_i8(xq_ref[:], sx_ref[:], q13_ref, s13_ref,
                        bits, gs)                              # [T, 2I] f32
    g, u = h[:, :I], h[:, I:]
    if gpt_oss:
        g = jnp.minimum(g, swiglu_limit)
        u = jnp.clip(u, -swiglu_limit, swiglu_limit)
        a = g * jax.nn.sigmoid(1.702 * g) * (u + 1.0)
    else:
        a = g * jax.nn.sigmoid(g) * u                          # [T, I] f32

    # requantize the hidden activations in-kernel (per row, per group)
    T = a.shape[0]
    ag = a.reshape(T, I // gs, gs)
    sa = jnp.maximum(jnp.max(jnp.abs(ag), axis=-1) / 127.0, 1e-8)
    aq = jnp.clip(jnp.round(ag / sa[..., None]), -127, 127
                  ).astype(jnp.int8).reshape(T, I)

    o = _subtiled_mm_i8(aq, sa, q2_ref, s2_ref, bits, gs)
    rows = jax.lax.broadcasted_iota(jnp.int32, o.shape, 0)
    o_ref[:] += jnp.where(rows == t, o * wt_ref[p], 0.0).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("swiglu_limit", "gpt_oss", "interpret")
)
def moe_gathered_w4a8_pallas(
    x: jax.Array,            # [T, H] bf16
    w13: QTensor,            # [(L,) E, H(/2), 2I] + scales
    w2: QTensor,             # [(L,) E, I(/2), H] + scales
    topk_idx: jax.Array,     # [T, k] int32
    topk_weights: jax.Array, # [T, k] f32
    swiglu_limit: float = 0.0,
    gpt_oss: bool = False,
    layer_idx=None,
    interpret: bool = False,
) -> jax.Array:
    """moe_gathered_pallas with int8 activations (QuantConfig
    expert_activation="int8"): int8×int8 MXU grouped dots replace the
    dequant-to-bf16 chain — the only formulation that beat the W4A16
    kernel's ~1.8 ms pipeline floor in the round-2 roofline study
    (ROUND2_RESULTS.md, +17% there). Quality cost is the activation
    rounding only (group-wise scales; ≲1.5% max rel err per layer)."""
    T, H = x.shape
    k = topk_idx.shape[-1]
    P = T * k
    I = w2.k_dim
    gs = w13.group_size

    q13, s13 = (w13.q, w13.scales) if w13.q.ndim == 4 else (
        w13.q[None], w13.scales[None])
    q2, s2 = (w2.q, w2.scales) if w2.q.ndim == 4 else (
        w2.q[None], w2.scales[None])
    layer_arr = jnp.reshape(
        jnp.asarray(0 if layer_idx is None else layer_idx, jnp.int32), (1,)
    )
    expert_ids = topk_idx.reshape(-1).astype(jnp.int32)
    token_ids = jnp.repeat(jnp.arange(T, dtype=jnp.int32), k)
    weights = topk_weights.reshape(-1).astype(jnp.float32)
    xq, sx = quantize_activations(x, gs)
    r13, r2 = q13.shape[-2], q2.shape[-2]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(P,),
        in_specs=[
            pl.BlockSpec((T, H), lambda p, l, e, t, w: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T, H // gs), lambda p, l, e, t, w: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, r13, 2 * I),
                         lambda p, l, e, t, w: (l[0], e[p], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, H // gs, 2 * I),
                         lambda p, l, e, t, w: (l[0], e[p], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, r2, H),
                         lambda p, l, e, t, w: (l[0], e[p], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, I // gs, H),
                         lambda p, l, e, t, w: (l[0], e[p], 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((T, H), lambda p, l, e, t, w: (0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(
            _kernel_w4a8, bits=w13.bits, gs=gs, I=I,
            swiglu_limit=swiglu_limit, gpt_oss=gpt_oss,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T, H), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * P * T * H * 3 * I,
            bytes_accessed=P * (r13 * 2 * I + r2 * H) + T * H + T * H * 4,
            transcendentals=P * T * I,
        ),
        interpret=interpret,
    )(layer_arr, expert_ids, token_ids, weights, xq, sx, q13, s13, q2, s2)
    return out.astype(x.dtype)


def w4a8_supported(x: jax.Array, w13, w2) -> bool:
    """W4A8 needs the fused-kernel shape constraints plus group-aligned
    H and I (the activation quantizer groups along K)."""
    if not supported(x, w13, w2):
        return False
    gs = w13.group_size
    return w13.k_dim % gs == 0 and w2.k_dim % gs == 0


# --------------------------------------------------------------------------
# General gathered expert matmul (N-tiled: any expert size)
# --------------------------------------------------------------------------

_TN = 512


def pick_tile(N: int, max_tile: int = _TN) -> int:
    """Largest multiple-of-128 divisor of N up to max_tile (V2-Lite's
    2I=2816 → 256; falls back to whole-N for shapes under 128)."""
    for t in range(max_tile, 127, -128):
        if N % t == 0:
            return t
    return N


def _gq_kernel(l_ref, e_ref, v_ref, x_ref, q_ref, s_ref, o_ref,
               *, bits, gs, tn):
    p = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when((p == 0) & (j == 0))
    def _init():
        o_ref[:] = jnp.zeros_like(o_ref)

    # Skipped picks (EP: experts on another shard) contribute nothing and
    # their weight-tile index maps are pinned constant, so they cost
    # neither HBM traffic nor MXU time.
    @pl.when(v_ref[p] == 1)
    def _compute():
        w = _unpack_scale(q_ref[0, 0], s_ref[0, 0], bits, gs)  # [K, tn]
        full = jnp.dot(x_ref[:], w, preferred_element_type=jnp.float32)
        rows = jax.lax.broadcasted_iota(jnp.int32, full.shape, 0)
        col = pl.multiple_of(j * tn, 128)
        o_ref[:, pl.ds(col, tn)] += jnp.where(rows == p, full, 0.0)


def gathered_qmm_supported(w: QTensor) -> bool:
    if not isinstance(w, QTensor) or w.q.ndim not in (3, 4):
        return False
    K, N = w.k_dim, w.n_dim
    if N % 128:
        return False
    rows = w.q.shape[-2]
    # per-step VMEM: packed tile (×2 buffered) + unpacked bf16 tile
    tn = pick_tile(N)
    return rows * tn * 2 + K * tn * 2 + (K // w.group_size) * tn * 2 < 10 * 1024 * 1024


@functools.partial(jax.jit, static_argnames=("interpret",))
def gathered_qmm_pallas(
    x_rows: jax.Array,       # [P, K] bf16 — row p multiplies expert e[p]
    w: QTensor,              # [(L,) E, K(/2), N] + scales
    expert_ids: jax.Array,   # [P] int32
    layer_idx=None,          # traced scalar into the stacked L dim
    pick_valid: Optional[jax.Array] = None,  # [P] 1 = compute, 0 = skip
    interpret: bool = False,
) -> jax.Array:
    """out[p] = x_rows[p] @ W[expert_ids[p]] with in-kernel dequant.

    The N-tiled building block for decode MoE on experts of any size
    (w13 and w2 run as two calls with XLA-fused SwiGLU between): per
    grid step only a [K, TN] weight tile is resident, so V2-Lite-scale
    experts (up to ~12 MB unpacked) stream through VMEM tile by tile.

    Under EP, `pick_valid` marks this shard's picks; skipped picks must
    carry the preceding valid pick's expert id (the EP wrapper arranges
    this) so their redirected index maps stay constant and fetch nothing.
    """
    P, K = x_rows.shape
    N = w.n_dim
    gs = w.group_size
    q4, s4 = (w.q, w.scales) if w.q.ndim == 4 else (w.q[None], w.scales[None])
    layer_arr = jnp.reshape(
        jnp.asarray(0 if layer_idx is None else layer_idx, jnp.int32), (1,)
    )
    rows = q4.shape[-2]
    TN = pick_tile(N)
    nn = N // TN
    if pick_valid is None:
        pick_valid = jnp.ones((P,), jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(P, nn),
        in_specs=[
            pl.BlockSpec((P, K), lambda p, j, l, e, v: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, rows, TN),
                         lambda p, j, l, e, v: (
                             l[0], e[p], 0, jnp.where(v[p] == 1, j, 0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, K // gs, TN),
                         lambda p, j, l, e, v: (
                             l[0], e[p], 0, jnp.where(v[p] == 1, j, 0)),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((P, N), lambda p, j, l, e, v: (0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_gq_kernel, bits=w.bits, gs=gs, tn=TN),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((P, N), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * P * K * N,
            bytes_accessed=P * (rows * N + (K // gs) * N * 2) + P * K * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(layer_arr, expert_ids.astype(jnp.int32),
      pick_valid.astype(jnp.int32), x_rows.astype(jnp.bfloat16),
      q4, s4)


def _gq_kernel_a8(l_ref, e_ref, v_ref, xq_ref, sx_ref, q_ref, s_ref, o_ref,
                  *, bits, gs, tn):
    """N-tiled gathered matmul with INT8 activations: unpack int4→int8
    (half the unpack work of →bf16) and per-K-group int8×int8 MXU dots
    with f32 scale accumulation — the W4A8 formulation of _gq_kernel."""
    p = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when((p == 0) & (j == 0))
    def _init():
        o_ref[:] = jnp.zeros_like(o_ref)

    @pl.when(v_ref[p] == 1)
    def _compute():
        w_i8 = _unpack_int8(q_ref[0, 0], bits)           # [K, tn] i8
        full = _grouped_dot_i8(xq_ref[:], sx_ref[:], w_i8,
                               s_ref[0, 0], gs)          # [P, tn] f32
        rows = jax.lax.broadcasted_iota(jnp.int32, full.shape, 0)
        col = pl.multiple_of(j * tn, 128)
        o_ref[:, pl.ds(col, tn)] += jnp.where(rows == p, full, 0.0)


def gathered_qmm_a8_supported(w: QTensor) -> bool:
    """The int8-activation tiled kernel additionally needs K aligned to
    the quantization group (activation groups run along K)."""
    return (gathered_qmm_supported(w) and w.k_dim % w.group_size == 0
            and w.bits in (4, 8))


@functools.partial(jax.jit, static_argnames=("interpret",))
def gathered_qmm_a8_pallas(
    xq: jax.Array,           # [P, K] int8 (per-row per-K-group quantized)
    sx: jax.Array,           # [P, K//gs] f32 activation scales
    w: QTensor,              # [(L,) E, K(/2), N] + scales
    expert_ids: jax.Array,   # [P] int32
    layer_idx=None,
    pick_valid: Optional[jax.Array] = None,
    interpret: bool = False,
) -> jax.Array:
    """gathered_qmm_pallas with int8 activations (W4A8/W8A8)."""
    P, K = xq.shape
    N = w.n_dim
    gs = w.group_size
    q4, s4 = (w.q, w.scales) if w.q.ndim == 4 else (w.q[None], w.scales[None])
    layer_arr = jnp.reshape(
        jnp.asarray(0 if layer_idx is None else layer_idx, jnp.int32), (1,)
    )
    rows = q4.shape[-2]
    TN = pick_tile(N)
    nn = N // TN
    if pick_valid is None:
        pick_valid = jnp.ones((P,), jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(P, nn),
        in_specs=[
            pl.BlockSpec((P, K), lambda p, j, l, e, v: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P, K // gs), lambda p, j, l, e, v: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, rows, TN),
                         lambda p, j, l, e, v: (
                             l[0], e[p], 0, jnp.where(v[p] == 1, j, 0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, K // gs, TN),
                         lambda p, j, l, e, v: (
                             l[0], e[p], 0, jnp.where(v[p] == 1, j, 0)),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((P, N), lambda p, j, l, e, v: (0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_gq_kernel_a8, bits=w.bits, gs=gs, tn=TN),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((P, N), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * P * K * N,
            bytes_accessed=P * (rows * N + (K // gs) * N * 2) + P * K,
            transcendentals=0,
        ),
        interpret=interpret,
    )(layer_arr, expert_ids.astype(jnp.int32),
      pick_valid.astype(jnp.int32), xq, sx.astype(jnp.float32), q4, s4)


def moe_gathered_tiled(
    x: jax.Array,            # [T, H]
    w13: QTensor,
    w2: QTensor,
    topk_idx: jax.Array,     # [T, k]
    topk_weights: jax.Array, # [T, k]
    swiglu_limit: float = 0.0,
    gpt_oss: bool = False,
    layer_idx=None,
    pick_valid: Optional[jax.Array] = None,  # [T, k] bool
    interpret: bool = False,
    activation: str = "bf16",
) -> jax.Array:
    """Decode MoE via two gathered matmul kernels + fused activation.

    activation="int8" (and group-aligned shapes): the W4A8 variant —
    activations quantized per K-group, int8×int8 MXU dots in-kernel.
    This covers experts too large for the single-pick fused W4A8 kernel
    (V2-Lite's 4.3 MB/pick exceeds its VMEM budget)."""
    from .activations import swiglu

    T, H = x.shape
    k = topk_idx.shape[-1]
    eids = topk_idx.reshape(-1)
    pv = None if pick_valid is None else (
        pick_valid.reshape(-1).astype(jnp.int32))
    use_a8 = (activation == "int8"
              and gathered_qmm_a8_supported(w13)
              and gathered_qmm_a8_supported(w2))
    if use_a8:
        xq, sx = quantize_activations(x.astype(jnp.bfloat16),
                                      w13.group_size)
        h = gathered_qmm_a8_pallas(
            jnp.repeat(xq, k, axis=0), jnp.repeat(sx, k, axis=0),
            w13, eids, layer_idx=layer_idx, pick_valid=pv,
            interpret=interpret)
        a = swiglu(h, swiglu_limit=swiglu_limit, gpt_oss=gpt_oss)
        aq, sa = quantize_activations(a, w2.group_size)
        o = gathered_qmm_a8_pallas(aq, sa, w2, eids, layer_idx=layer_idx,
                                   pick_valid=pv, interpret=interpret)
    else:
        x_rep = jnp.repeat(x, k, axis=0)                 # [P, H]
        h = gathered_qmm_pallas(x_rep, w13, eids, layer_idx=layer_idx,
                                pick_valid=pv, interpret=interpret)
        a = swiglu(h.astype(jnp.bfloat16), swiglu_limit=swiglu_limit,
                   gpt_oss=gpt_oss)
        o = gathered_qmm_pallas(a, w2, eids, layer_idx=layer_idx,
                                pick_valid=pv, interpret=interpret)
    o = o.reshape(T, k, H) * topk_weights[..., None]
    return o.sum(axis=1).astype(x.dtype)
