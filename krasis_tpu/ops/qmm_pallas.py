"""Pallas TPU kernel: dequant-fused weight-only-quantized matmul.

Placeholder module during bring-up: `available()` gates kernel use so the
XLA reference path serves until the kernel lands. The real kernel streams
packed int4/int8 weight tiles into VMEM, unpacks + scales on the VPU, and
feeds bf16 tiles to the MXU.
"""

from __future__ import annotations

import jax

from ..quant import QTensor


def available() -> bool:
    return False


def supported(x: jax.Array, qt: QTensor) -> bool:
    return False


def qmm_pallas(x: jax.Array, qt: QTensor, out_dtype=None) -> jax.Array:
    raise NotImplementedError
