"""Quantized matmul: ``x @ W`` where W is a group-quantized QTensor.

The XLA reference path dequantizes then matmuls (XLA fuses the dequant
into the matmul's operand pipeline reasonably well). The Pallas path
(ops/qmm_pallas.py) streams int4/int8 tiles HBM→VMEM and dequantizes
in-register before hitting the MXU — on decode shapes this reads 4×
(int4) / 2× (int8) fewer HBM bytes, which is the entire value of
weight-only quantization on a bandwidth-bound step (same rationale as
reference src/kernel/avx2.rs, re-derived for TPU).

``linear()`` is the uniform entry point: it accepts a plain bf16 array
(for components the quant policy keeps at full precision) or a QTensor.
"""

from __future__ import annotations

from typing import Union

import jax
import jax.numpy as jnp

from ..quant import QTensor, dequantize

Weight = Union[jax.Array, QTensor]


def qmm_ref(x: jax.Array, qt: QTensor, out_dtype=None, precision=None) -> jax.Array:
    """Reference path: dequantize W to x.dtype, then matmul on the MXU."""
    w = dequantize(qt, dtype=x.dtype)
    return jnp.dot(
        x, w, precision=precision, preferred_element_type=jnp.float32
    ).astype(out_dtype or x.dtype)


def linear(x: jax.Array, w: Weight, out_dtype=None,
           layer_idx=None) -> jax.Array:
    """``x[..., K] @ w[K, N]`` for bf16 or quantized weights.

    A QTensor with a leading stack dim ([L, K(/2), N] — the
    pattern-stacked attention/shared projections) is indexed by
    `layer_idx`: on the decode path through the stacked Pallas kernel
    (in-kernel index, no dynamic-slice copy), otherwise by slicing."""
    if isinstance(w, QTensor):
        lead = x.shape[:-1]
        y = qmm(x.reshape(-1, x.shape[-1]), w, out_dtype=out_dtype,
                layer_idx=layer_idx)
        return y.reshape(*lead, y.shape[-1])
    y = jnp.dot(x, w.astype(x.dtype), preferred_element_type=jnp.float32)
    return y.astype(out_dtype or x.dtype)


def qmm(x: jax.Array, qt: QTensor, out_dtype=None,
        layer_idx=None) -> jax.Array:
    """[T, K] @ QTensor[K, N]. Dispatches to the Pallas kernel on TPU."""
    from . import qmm_pallas  # local import: keeps CPU tests torch-free

    if qt.q.ndim == 3:
        li = 0 if layer_idx is None else layer_idx
        if qmm_pallas.available() and qmm_pallas.supported_stacked(x, qt):
            return qmm_pallas.qmm_stacked_pallas(
                x, qt, li, out_dtype=out_dtype or x.dtype)
        qt = QTensor(
            jax.lax.dynamic_index_in_dim(qt.q, li, 0, keepdims=False),
            jax.lax.dynamic_index_in_dim(qt.scales, li, 0, keepdims=False),
            qt.bits, qt.group_size)
    if qmm_pallas.available() and qmm_pallas.supported(x, qt):
        return qmm_pallas.qmm_pallas(x, qt, out_dtype=out_dtype or x.dtype)
    return qmm_ref(x, qt, out_dtype=out_dtype)
