"""Quantizer numerics: round-trip, packing, and reference-formula checks.

Mirrors the reference's quantize→dequantize verification tests
(reference src/weights/marlin.rs dequantize_int4/int8 round-trips).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from ml_dtypes import bfloat16

from krasis_tpu.quant import (
    QTensor,
    dequantize,
    dequantize_np,
    pack_int4_np,
    quantize,
    quantize_np,
    random_qtensor,
    unpack_int4,
    unpack_int4_np,
)


def test_pack_unpack_int4_roundtrip():
    rng = np.random.default_rng(0)
    q = rng.integers(-8, 8, size=(6, 256, 64), dtype=np.int8)
    packed = pack_int4_np(q)
    assert packed.shape == (6, 128, 64)
    np.testing.assert_array_equal(unpack_int4_np(packed), q)


def test_unpack_int4_jnp_matches_np():
    rng = np.random.default_rng(1)
    q = rng.integers(-8, 8, size=(256, 128), dtype=np.int8)
    packed = pack_int4_np(q)
    out = np.asarray(unpack_int4(jnp.asarray(packed)))
    np.testing.assert_array_equal(out, q)


@pytest.mark.parametrize("bits", [4, 8])
def test_quantize_formula(bits):
    """Scales follow amax/qmax with bf16 rounding, exactly like the reference."""
    rng = np.random.default_rng(2)
    K, N, gs = 256, 64, 128
    w = rng.standard_normal((K, N)).astype(np.float32) * 0.05
    qt = quantize_np(w, bits=bits, group_size=gs)

    qmax = 7.0 if bits == 4 else 127.0
    amax = np.abs(w.reshape(K // gs, gs, N)).max(axis=1)
    expected_scales = (amax / qmax).astype(bfloat16)
    np.testing.assert_array_equal(np.asarray(qt.scales), expected_scales)

    # Round-trip error bounded by scale/2 per element.
    deq = dequantize_np(qt)
    err = np.abs(deq - w)
    bound = expected_scales.astype(np.float32).repeat(gs, axis=0) * 0.5 + 1e-6
    assert (err <= bound).all()


def test_quantize_zero_group_scale_one():
    w = np.zeros((128, 8), dtype=np.float32)
    qt = quantize_np(w, bits=4)
    assert (np.asarray(qt.scales, dtype=np.float32) == 1.0).all()
    assert (dequantize_np(qt) == 0.0).all()


@pytest.mark.parametrize("bits", [4, 8])
def test_jnp_quantize_matches_np(bits):
    rng = np.random.default_rng(3)
    w = rng.standard_normal((2, 256, 128)).astype(np.float32) * 0.03
    qt_np = quantize_np(w, bits=bits)
    qt_j = quantize(jnp.asarray(w), bits=bits)
    # Banker's rounding (jnp) vs half-away-from-zero (np.rint also banker's):
    # both use np.rint semantics, so results must be identical.
    np.testing.assert_array_equal(np.asarray(qt_j.q), np.asarray(qt_np.q))
    np.testing.assert_array_equal(np.asarray(qt_j.scales), np.asarray(qt_np.scales))
    deq_np = dequantize_np(qt_np)
    deq_j = np.asarray(dequantize(qt_j, dtype=jnp.float32))
    np.testing.assert_allclose(deq_j, deq_np, rtol=1e-2, atol=1e-3)


def test_qtensor_is_pytree():
    qt = random_qtensor(jax.random.PRNGKey(0), (4, 256, 128), bits=4)
    leaves = jax.tree_util.tree_leaves(qt)
    assert len(leaves) == 2
    mapped = jax.tree_util.tree_map(lambda x: x, qt)
    assert isinstance(mapped, QTensor)
    assert mapped.bits == 4 and mapped.k_dim == 256 and mapped.n_dim == 128


def test_random_qtensor_dequantizes():
    qt = random_qtensor(jax.random.PRNGKey(1), (256, 128), bits=8)
    w = dequantize(qt, dtype=jnp.float32)
    assert w.shape == (256, 128)
    assert np.isfinite(np.asarray(w)).all()


def test_mxfp4_matches_transformers():
    """MXFP4 dequant vs the HF torch reference (GPT-OSS expert format)."""
    import torch

    from krasis_tpu.quant import dequant_mxfp4_np
    from transformers.integrations.mxfp4 import convert_moe_packed_tensors

    rng = np.random.default_rng(0)
    blocks = rng.integers(0, 256, size=(2, 3, 4, 16), dtype=np.uint8)
    scales = rng.integers(117, 137, size=(2, 3, 4), dtype=np.uint8)
    got = dequant_mxfp4_np(blocks, scales)
    # HF returns [E, rows, cols].transpose(1, 2) (forward-ready layout);
    # undo that to compare raw dequant values
    want = convert_moe_packed_tensors(
        torch.tensor(blocks), torch.tensor(scales), dtype=torch.float32
    ).transpose(1, 2).reshape(2, 3, -1)
    np.testing.assert_allclose(got, want.detach().cpu().numpy(), rtol=1e-6)


def test_slice_n_and_slice_k_bit_exact():
    """Bit-exactness contract of the QTensor slicing helpers (the
    shared-expert fold depends on it): a sliced QTensor must dequantize
    to exactly the corresponding rows/columns of the full tensor, for
    int8 and packed int4, with and without leading stack dims."""
    import jax
    import jax.numpy as jnp

    from krasis_tpu.quant import dequantize, quantize, slice_k, slice_n

    key = jax.random.PRNGKey(0)
    for bits in (4, 8):
        for lead in ((), (3,)):
            w = jax.random.normal(key, (*lead, 128, 96), jnp.float32)
            qt = quantize(w, bits=bits, group_size=32)
            full = np.asarray(dequantize(qt, jnp.float32))
            # column slice
            s = slice_n(qt, 16, 48)
            np.testing.assert_array_equal(
                np.asarray(dequantize(s, jnp.float32)),
                full[..., :, 16:64])
            # K (row) slice at group boundaries — including slices that
            # straddle the int4 packing half (rows 64..96 pair with
            # both halves of the byte rows)
            for start, size in ((0, 32), (32, 64), (64, 64)):
                sk = slice_k(qt, start, size)
                np.testing.assert_array_equal(
                    np.asarray(dequantize(sk, jnp.float32)),
                    full[..., start:start + size, :])
