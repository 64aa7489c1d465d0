"""Pallas TPU kernel: dequant-fused weight-only-quantized matmul.

``x[T,K] @ W`` where W is INT4 (split-half packed [K/2, N]) or INT8
[K, N] with bf16 group scales [K/gs, N]. The kernel streams packed
weight tiles HBM→VMEM, unpacks + scales on the VPU, and feeds bf16
tiles to the MXU — so HBM traffic is the *packed* bytes (4×/2× less
than bf16), which is the whole game on bandwidth-bound decode
(reference src/kernel/avx2.rs plays the same card with AVX2 integer
kernels; here the MXU does the FLOPs and the VPU the dequant).

Grid: one program per N-tile; x stays resident in VMEM across the
grid, weight tiles double-buffer automatically via the BlockSpec
pipeline. K is kept whole per tile (all supported shapes have
K ≤ ~12k → tile VMEM ≤ ~6 MB).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..quant import QTensor

_TN = 256          # N-tile (lane-dim multiple of 128)
_MAX_K = 16384     # keep K-whole tiles within VMEM


def available() -> bool:
    if os.environ.get("KRASIS_TPU_NO_PALLAS"):
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _vmem_est(Tp: int, K: int, rows: int, gs: int, tn: int) -> int:
    # per-step VMEM: x + packed tile (×2 buffers) + unpacked bf16 tile
    return Tp * K * 2 + rows * tn * 2 + K * tn * 2 + (K // gs) * tn * 2


def _pick_tn(Tp: int, K: int, rows: int, gs: int) -> int:
    """Largest N-tile whose VMEM estimate fits — long-K weights (e.g.
    V2-Lite's dense w2 [10944, 2048]) drop to tn=128 instead of falling
    off the kernel entirely (the XLA fallback materializes the f32
    dequant: a 90 MB broadcast per step, benchmarks/decode_trace.json)."""
    for tn in (_TN, 128):
        if _vmem_est(Tp, K, rows, gs, tn) < 10 * 1024 * 1024:
            return tn
    return 0


def supported(x: jax.Array, qt: QTensor) -> bool:
    if x.ndim != 2 or qt.q.ndim != 2:
        return False
    # The dequant-fused kernel wins only in the bandwidth-bound regime
    # (decode: few rows, weights read once). At prefill scale the XLA
    # dequant+matmul is compute-bound and the whole-x-resident kernel
    # would blow VMEM.
    if x.shape[0] > 32:
        return False
    K, N = qt.k_dim, qt.n_dim
    if K > _MAX_K or K % qt.group_size or (qt.bits == 4 and K % 2):
        return False
    if N % 128:
        return False
    rows = K // 2 if qt.bits == 4 else K
    Tp = max(8, -(-x.shape[0] // 8) * 8)
    return _pick_tn(Tp, K, rows, qt.group_size) > 0


def _kernel_int4(x_ref, q_ref, s_ref, o_ref, *, gs: int, out_dtype):
    b = q_ref[:].astype(jnp.int32)                 # [K/2, TN] packed
    lo = ((b & 0xF) ^ 8) - 8                       # sign-extend low nibble
    hi = (((b >> 4) & 0xF) ^ 8) - 8
    w = jnp.concatenate([lo, hi], axis=0)          # [K, TN] int32
    Kh2, TN = b.shape
    K = Kh2 * 2
    wf = w.astype(jnp.float32).reshape(K // gs, gs, TN)
    wf = wf * s_ref[:].astype(jnp.float32)[:, None, :]
    wb = wf.reshape(K, TN).astype(jnp.bfloat16)
    o_ref[:] = jnp.dot(
        x_ref[:], wb, preferred_element_type=jnp.float32
    ).astype(out_dtype)


def _kernel_int8(x_ref, q_ref, s_ref, o_ref, *, gs: int, out_dtype):
    w = q_ref[:].astype(jnp.float32)               # [K, TN]
    K, TN = w.shape
    wf = w.reshape(K // gs, gs, TN) * s_ref[:].astype(jnp.float32)[:, None, :]
    wb = wf.reshape(K, TN).astype(jnp.bfloat16)
    o_ref[:] = jnp.dot(
        x_ref[:], wb, preferred_element_type=jnp.float32
    ).astype(out_dtype)


def supported_stacked(x: jax.Array, qt: QTensor) -> bool:
    """Layer-stacked variant: qt is [L, K(/2), N]; the layer index is
    scalar-prefetched so the PATTERN-STACKED attention projections never
    get dynamic-sliced or dequantized outside the kernel (XLA's fused
    dequant-matvec for quantized stacks is VPU-capped — int8 measured
    NO faster than bf16 on QCN's LA projections despite half the
    bytes; this kernel reads the packed bytes at the same ~600 GB/s as
    the lm_head qmm)."""
    if x.ndim != 2 or qt.q.ndim != 3:
        return False
    if x.shape[0] > 32:
        return False
    K, N = qt.k_dim, qt.n_dim
    if K > _MAX_K or K % qt.group_size or (qt.bits == 4 and K % 2):
        return False
    if N % 128:
        return False
    # The per-layer scale block [1, K/gs, N] is dynamically indexed on
    # the layer dim, which pins dim 1 to sublane tiling: Mosaic rejects
    # K/gs not divisible by 8 ("Slice shape along dimension 1 must be
    # aligned to tiling (8)" — hit by GPT-OSS K=2880, gs=64 → 45).
    if (K // qt.group_size) % 8:
        return False
    rows = K // 2 if qt.bits == 4 else K
    Tp = max(8, -(-x.shape[0] // 8) * 8)
    return _pick_tn(Tp, K, rows, qt.group_size) > 0


def _kernel_int4_st(l_ref, x_ref, q_ref, s_ref, o_ref, *, gs, out_dtype):
    _kernel_int4(x_ref, q_ref.at[0], s_ref.at[0], o_ref,
                 gs=gs, out_dtype=out_dtype)


def _kernel_int8_st(l_ref, x_ref, q_ref, s_ref, o_ref, *, gs, out_dtype):
    _kernel_int8(x_ref, q_ref.at[0], s_ref.at[0], o_ref,
                 gs=gs, out_dtype=out_dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype", "interpret"))
def qmm_stacked_pallas(x: jax.Array, qt: QTensor, layer_idx,
                       out_dtype=jnp.bfloat16,
                       interpret: bool = False) -> jax.Array:
    """x[T,K] @ dequant(qt[layer_idx]) for a [L, K(/2), N] stack."""
    T, K = x.shape
    N = qt.n_dim
    gs = qt.group_size
    Tp = max(8, -(-T // 8) * 8)
    if Tp != T:
        x = jnp.pad(x, ((0, Tp - T), (0, 0)))
    x = x.astype(jnp.bfloat16)

    kern = _kernel_int4_st if qt.bits == 4 else _kernel_int8_st
    rows = K // 2 if qt.bits == 4 else K
    tn = _pick_tn(Tp, K, rows, gs) or _TN
    layer_arr = jnp.reshape(jnp.asarray(layer_idx, jnp.int32), (1,))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(pl.cdiv(N, tn),),
        in_specs=[
            pl.BlockSpec((Tp, K), lambda j, l: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, tn), lambda j, l: (l[0], 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K // gs, tn), lambda j, l: (l[0], 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Tp, tn), lambda j, l: (0, j),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(kern, gs=gs, out_dtype=out_dtype),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Tp, N), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * Tp * K * N,
            bytes_accessed=rows * N + (K // gs) * N * 2 + Tp * K * 2
            + Tp * N * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(layer_arr, x, qt.q, qt.scales)
    return out[:T]


@functools.partial(jax.jit, static_argnames=("out_dtype", "interpret"))
def qmm_pallas(x: jax.Array, qt: QTensor, out_dtype=jnp.bfloat16,
               interpret: bool = False) -> jax.Array:
    T, K = x.shape
    N = qt.n_dim
    gs = qt.group_size
    Tp = max(8, -(-T // 8) * 8)                    # pad sublane dim
    if Tp != T:
        x = jnp.pad(x, ((0, Tp - T), (0, 0)))
    x = x.astype(jnp.bfloat16)

    kern = _kernel_int4 if qt.bits == 4 else _kernel_int8
    rows = K // 2 if qt.bits == 4 else K
    tn = _pick_tn(Tp, K, rows, gs) or _TN
    grid = (pl.cdiv(N, tn),)

    out = pl.pallas_call(
        functools.partial(kern, gs=gs, out_dtype=out_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((Tp, K), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, tn), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((K // gs, tn), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Tp, tn), lambda j: (0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Tp, N), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * Tp * K * N,
            bytes_accessed=rows * N + (K // gs) * N * 2 + Tp * K * 2 + Tp * N * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, qt.q, qt.scales)
    return out[:T]
