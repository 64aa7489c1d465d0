"""Weight-only quantization: symmetric group-wise INT4 / INT8.

Numerics match the reference quantizer (reference src/weights/marlin.rs:65-200):

* groups of ``group_size`` (default 128) consecutive elements along the
  input (K) dimension share one scale;
* INT8: ``scale = amax / 127`` (1.0 if the group is all-zero), values
  rounded and clamped to [-128, 127];
* INT4: ``scale = amax / 7`` so the positive range is fully used, values
  clamped to [-8, 7];
* scales are stored as **bfloat16**, and quantization uses the bf16-rounded
  scale (not the f32 one), exactly like the reference.

Storage layout is TPU-native rather than Marlin-tiled: weights live in
"math" orientation ``[K, N]`` (so forward is ``x[M,K] @ w[K,N]`` — K is the
reduction dim, N the lane dim, which is what the MXU wants). INT4 values
are **split-half packed**: byte ``[k, n]`` holds element ``(k, n)`` in its
low nibble and element ``(k + K/2, n)`` in its high nibble. Unpacking is
then a concat of two contiguous halves along K — no interleave, which is
cheap on the TPU's (sublane, lane) register layout. Group boundaries align
with the halves because K/2 is always a multiple of group_size for the
supported architectures.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from ml_dtypes import bfloat16


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["q", "scales"],
    meta_fields=["bits", "group_size"],
)
@dataclasses.dataclass
class QTensor:
    """A quantized weight tensor.

    q:       int8 [..., K, N] (int8 mode) or [..., K//2, N] (packed int4)
    scales:  bfloat16 [..., K//group_size, N]
    """

    q: jax.Array
    scales: jax.Array
    bits: int
    group_size: int

    @property
    def k_dim(self) -> int:
        k = self.q.shape[-2]
        return k * 2 if self.bits == 4 else k

    @property
    def n_dim(self) -> int:
        return self.q.shape[-1]


# --------------------------------------------------------------------------
# Host-side (numpy) quantization — used by the checkpoint loader
# --------------------------------------------------------------------------

def pick_group_size(K: int, group_size: int) -> int:
    """Largest divisor of K that is <= group_size (halving), falling back
    to per-channel (gs=K). The reference quantizes non-expert weights
    per-channel (reference weight_loader.py:25 quantize_to_int8); here any
    K that group 128 doesn't divide (e.g. V2-Lite dense I=10944) degrades
    gracefully to gs=64/32/... instead of failing."""
    g = group_size
    while g >= 16 and K % g:
        g //= 2
    return g if (g >= 16 and K % g == 0) else K


def quantize_np(w: np.ndarray, bits: int, group_size: int = 128) -> QTensor:
    """Quantize a [..., K, N] float array. Returns numpy-backed QTensor."""
    assert bits in (4, 8)
    *lead, K, N = w.shape
    group_size = pick_group_size(K, group_size)
    w = np.asarray(w, dtype=np.float32)

    g = w.reshape(*lead, K // group_size, group_size, N)
    amax = np.abs(g).max(axis=-2, keepdims=True)  # [..., K/gs, 1, N]
    qmax = 7.0 if bits == 4 else 127.0
    scale = np.where(amax == 0.0, np.float32(1.0), amax / qmax)
    # Round-trip through bf16 first: quantization must use the stored scale.
    scale_bf16 = scale.astype(bfloat16)
    inv = 1.0 / scale_bf16.astype(np.float32)
    lo, hi = (-8, 7) if bits == 4 else (-128, 127)
    q = np.clip(np.rint(g * inv), lo, hi).astype(np.int8)
    q = q.reshape(*lead, K, N)
    scales = scale_bf16.squeeze(-2)  # [..., K/gs, N]

    if bits == 4:
        q = pack_int4_np(q)
    return QTensor(q=q, scales=scales, bits=bits, group_size=group_size)


def quantize_host(w: np.ndarray, bits: int, group_size: int = 128) -> QTensor:
    """Host-side quantization, preferring the OpenMP C++ kernel
    (krasis_tpu/native/quant.cpp — bit-exact with quantize_np, tested in
    tests/test_native.py); numpy fallback when no toolchain."""
    group_size = pick_group_size(w.shape[-2], group_size)
    try:
        from . import native

        res = native.quantize_native(w, bits=bits, group_size=group_size)
        if res is not None:
            q, scales = res
            return QTensor(q=q, scales=scales, bits=bits, group_size=group_size)
    except Exception:
        pass
    return quantize_np(np.asarray(w, dtype=np.float32), bits, group_size)


def pack_int4_np(q: np.ndarray) -> np.ndarray:
    """Split-half pack int8-held int4 values [-8,7]: [..., K, N] → [..., K/2, N]."""
    *lead, K, N = q.shape
    assert K % 2 == 0
    half = K // 2
    lo = q[..., :half, :].astype(np.uint8) & 0xF
    hi = (q[..., half:, :].astype(np.uint8) & 0xF) << 4
    return (lo | hi).astype(np.int8)


def unpack_int4_np(packed: np.ndarray) -> np.ndarray:
    """Inverse of pack_int4_np: [..., K/2, N] int8 → [..., K, N] int8 in [-8,7]."""
    b = packed.astype(np.uint8)
    lo = (b & 0xF).astype(np.int8)
    hi = (b >> 4).astype(np.int8)
    # Sign-extend 4-bit values: (x ^ 8) - 8 maps 0..15 → -8..7.
    lo = ((lo ^ 8) - 8).astype(np.int8)
    hi = ((hi ^ 8) - 8).astype(np.int8)
    return np.concatenate([lo, hi], axis=-2)


def dequantize_np(qt: QTensor) -> np.ndarray:
    """Dequantize to float32 [..., K, N] (verification / golden tests)."""
    q = np.asarray(qt.q)
    if qt.bits == 4:
        q = unpack_int4_np(q)
    *lead, K, N = q.shape
    gs = qt.group_size
    scales = np.asarray(qt.scales, dtype=np.float32)  # [..., K/gs, N]
    out = q.astype(np.float32).reshape(*lead, K // gs, gs, N)
    return (out * scales[..., :, None, :]).reshape(*lead, K, N)


# --------------------------------------------------------------------------
# Device-side (jnp) pack/unpack/dequant — used by kernels and reference paths
# --------------------------------------------------------------------------

def unpack_int4(packed: jax.Array) -> jax.Array:
    """jnp version of unpack_int4_np. [..., K/2, N] int8 → [..., K, N] int8."""
    b = packed.astype(jnp.uint8)
    lo = ((b & 0xF) ^ 8).astype(jnp.int8) - 8
    hi = ((b >> 4) ^ 8).astype(jnp.int8) - 8
    return jnp.concatenate([lo, hi], axis=-2)


def dequantize(qt: QTensor, dtype=jnp.bfloat16) -> jax.Array:
    """Dequantize on device to [..., K, N]. This is the XLA fallback path —
    the Pallas kernels in ops/ dequantize inside the kernel instead."""
    q = qt.q
    if qt.bits == 4:
        q = unpack_int4(q)
    *lead, K, N = q.shape
    gs = qt.group_size
    # Multiply in f32 (one rounding at the end) — bf16-product rounding
    # costs ~0.4% weight error for free otherwise.
    w = q.astype(jnp.float32).reshape(*lead, K // gs, gs, N)
    w = w * qt.scales.astype(jnp.float32)[..., :, None, :]
    return w.reshape(*lead, K, N).astype(dtype)


def quantize(w: jax.Array, bits: int, group_size: int = 128) -> QTensor:
    """jnp quantizer (same numerics as quantize_np); used on-device for
    synthetic weight generation and tests."""
    assert bits in (4, 8)
    *lead, K, N = w.shape
    group_size = pick_group_size(K, group_size)
    g = w.astype(jnp.float32).reshape(*lead, K // group_size, group_size, N)
    amax = jnp.abs(g).max(axis=-2, keepdims=True)
    qmax = 7.0 if bits == 4 else 127.0
    scale = jnp.where(amax == 0.0, 1.0, amax / qmax).astype(jnp.bfloat16)
    inv = 1.0 / scale.astype(jnp.float32)
    lo, hi = (-8, 7) if bits == 4 else (-128, 127)
    q = jnp.clip(jnp.round(g * inv), lo, hi).astype(jnp.int8)
    q = q.reshape(*lead, K, N)
    scales = scale.squeeze(-2)
    if bits == 4:
        half = K // 2
        lo_n = q[..., :half, :].astype(jnp.uint8) & 0xF
        hi_n = (q[..., half:, :].astype(jnp.uint8) & 0xF) << 4
        q = (lo_n | hi_n).astype(jnp.int8)
    return QTensor(q=q, scales=scales, bits=bits, group_size=group_size)


def slice_n(qt: QTensor, start: int, size: int) -> QTensor:
    """Bit-exact column (N) slice of a QTensor: quantization groups run
    along K with per-column scales, so a column slice carries exactly
    the bytes/scales the full tensor holds for those columns."""
    return QTensor(qt.q[..., :, start:start + size],
                   qt.scales[..., :, start:start + size],
                   qt.bits, qt.group_size)


def slice_k(qt: QTensor, start: int, size: int) -> QTensor:
    """Bit-exact K (row) slice of a QTensor over element rows
    [start, start+size).

    Requires group alignment (start and size multiples of group_size) so
    the sliced scales are exactly the original group scales. INT8 is a
    plain row slice; packed INT4 needs nibble re-pairing: byte row r of
    a K-tall packed tensor holds element rows (r, r+K/2), so the slice's
    packed bytes are recomposed from the source nibbles — values remain
    BIT-IDENTICAL (the property the shared-expert fold depends on:
    dense and folded paths must compute from the same numbers)."""
    gs = qt.group_size
    assert start % gs == 0 and size % gs == 0, (start, size, gs)
    scales = qt.scales[..., start // gs:(start + size) // gs, :]
    if qt.bits != 4:
        return QTensor(qt.q[..., start:start + size, :], scales,
                       qt.bits, qt.group_size)
    assert size % 2 == 0
    K2 = qt.q.shape[-2]                      # source K/2
    half = size // 2

    def nibble(e_rows):
        """element rows [half] → (nibble values [..., half, N] uint8)"""
        is_lo = e_rows < K2
        rows = jnp.where(is_lo, e_rows, e_rows - K2)
        b = jnp.take(qt.q, rows, axis=-2).astype(jnp.uint8)
        sel = is_lo.reshape((half, 1))
        return jnp.where(sel, b & 0xF, b >> 4)

    lo = nibble(start + jnp.arange(half))
    hi = nibble(start + half + jnp.arange(half))
    packed = (lo | (hi << 4)).astype(jnp.int8)
    return QTensor(packed, scales, qt.bits, qt.group_size)


def random_qtensor(
    key: jax.Array,
    shape: Tuple[int, ...],
    bits: int,
    group_size: int = 128,
    scale_mag: float = 0.02,
) -> QTensor:
    """Generate a random quantized tensor directly in quantized form.

    The TPU analog of the reference's xorshift-filled fake weights
    (reference decode.rs:4480 fake_transposed_weight): real memory layout
    and access patterns with zero checkpoint load, for synthetic benchmarks.
    """
    *lead, K, N = shape
    group_size = pick_group_size(K, group_size)
    rows = K // 2 if bits == 4 else K
    assert N % 4 == 0
    kq, ks = jax.random.split(key)

    # Generate inside one jitted program; for large stacked tensors, scan
    # over the leading dim so the uint32 rng transient is one slice, not
    # the whole tensor (XLA materializes a 4× u32 buffer otherwise, which
    # OOMs full-size synthetic models).
    def gen_slice(k, shape):
        return jax.lax.bitcast_convert_type(
            jax.random.bits(k, (*shape[:-1], shape[-1] // 4), dtype=jnp.uint32),
            jnp.int8,
        ).reshape(shape)

    total_bytes = rows * N
    for d in lead:
        total_bytes *= d
    if lead and total_bytes > (512 << 20):
        L0 = lead[0]

        def gen_scanned(k):
            keys = jax.random.split(k, L0)
            return jax.lax.map(
                lambda kk: gen_slice(kk, (*lead[1:], rows, N)), keys
            )

        q = jax.jit(gen_scanned)(kq)
    else:
        q = jax.jit(lambda k: gen_slice(k, (*lead, rows, N)))(kq)
    scales = jax.jit(
        lambda k: (
            scale_mag
            * jax.random.uniform(k, (*lead, K // group_size, N),
                                 minval=0.5, maxval=1.5)
        ).astype(jnp.bfloat16)
    )(ks)
    return QTensor(q=q, scales=scales, bits=bits, group_size=group_size)


# --------------------------------------------------------------------------
# MXFP4 (OCP microscaling fp4) dequantization — GPT-OSS prequantized experts
# --------------------------------------------------------------------------

# e2m1 nibble value table (sign bit in the high nibble bit)
_FP4_VALUES = np.array(
    [0.0, 0.5, 1.0, 1.5, 2.0, 3.0, 4.0, 6.0,
     -0.0, -0.5, -1.0, -1.5, -2.0, -3.0, -4.0, -6.0],
    dtype=np.float32,
)


def dequant_mxfp4_np(blocks: np.ndarray, scales: np.ndarray) -> np.ndarray:
    """Dequantize MXFP4 expert tensors (reference src/weights/mod.rs:4682
    MXFP4 path; numerics match transformers.integrations.mxfp4).

    blocks: uint8 [..., G, B] — 2 fp4 values per byte, lo nibble first,
            lo/hi INTERLEAVED in the output (out[0::2]=lo, out[1::2]=hi);
    scales: uint8 [..., G] — power-of-two exponents, bias 127.
    Returns float32 [..., G * 2B].
    """
    *lead, G, B = blocks.shape
    lo = _FP4_VALUES[(blocks & 0x0F).astype(np.int64)]
    hi = _FP4_VALUES[(blocks >> 4).astype(np.int64)]
    out = np.empty((*lead, G, 2 * B), np.float32)
    out[..., 0::2] = lo
    out[..., 1::2] = hi
    exp = scales.astype(np.int32) - 127
    out *= np.exp2(exp.astype(np.float32))[..., None]
    return out.reshape(*lead, G * 2 * B)


# --------------------------------------------------------------------------
# Prequantized checkpoint input formats (dequant → requantize at load)
# --------------------------------------------------------------------------

def dequant_compressed_int4_np(
    packed: np.ndarray,    # int32 [out, in/8] — 8 nibbles per word, LSB first
    scale: np.ndarray,     # [out, in/group] (f16/bf16/f32)
    group_size: int,
) -> np.ndarray:
    """Dequantize llm-compressor "pack-quantized" symmetric INT4 weights
    (compressed-tensors format; reference src/weights/mod.rs:4675-4738
    reads these for official DeepSeek V3 INT4 checkpoints).

    Nibble i of word w holds column w*8+i as a two's-complement 4-bit
    value; groups run along the input dim. Returns float32 [out, in].
    """
    out_dim, words = packed.shape
    p = packed.astype(np.uint32)
    cols = np.empty((out_dim, words, 8), np.int8)
    for i in range(8):
        nib = ((p >> (4 * i)) & 0xF).astype(np.int8)
        cols[:, :, i] = ((nib ^ 8) - 8)
    q = cols.reshape(out_dim, words * 8)
    in_dim = q.shape[1]
    s = np.asarray(scale, np.float32)
    w = q.astype(np.float32).reshape(out_dim, in_dim // group_size, group_size)
    w = w * s[:, :, None]
    return w.reshape(out_dim, in_dim)


def dequant_fp8_block_np(
    w8: np.ndarray,         # float8_e4m3fn [out, in]
    scale_inv: np.ndarray,  # f32 [ceil(out/B), ceil(in/B)]
    block: int = 128,
) -> np.ndarray:
    """Dequantize DeepSeek-V3-style FP8 block-quantized weights
    (weight_scale_inv per 128x128 block; reference mod.rs:4675-4738).
    Returns float32 [out, in]."""
    out_dim, in_dim = w8.shape
    w = np.asarray(w8, dtype=np.float32)
    s = np.asarray(scale_inv, np.float32)
    s_full = np.repeat(np.repeat(s, block, axis=0), block, axis=1)
    return w * s_full[:out_dim, :in_dim]
