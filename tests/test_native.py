"""Native C++ quantizer: bit-exact parity with the numpy reference
(reference-style quantize→compare test, src/weights/mod.rs:5171 analog)."""

import numpy as np
import pytest
from ml_dtypes import bfloat16

from krasis_tpu import native
from krasis_tpu.quant import quantize_np


pytestmark = pytest.mark.skipif(
    not native.available(), reason="no C++ toolchain"
)


@pytest.mark.parametrize("bits", [4, 8])
@pytest.mark.parametrize("dtype", ["f32", "bf16"])
def test_native_matches_numpy(bits, dtype):
    rng = np.random.default_rng(0)
    w = (rng.normal(size=(256, 192)) * 0.1).astype(np.float32)
    if dtype == "bf16":
        w = w.astype(bfloat16)
    ref = quantize_np(np.asarray(w, np.float32), bits=bits, group_size=64)
    got = native.quantize_native(w, bits=bits, group_size=64)
    q, scales = got
    np.testing.assert_array_equal(q, np.asarray(ref.q))
    np.testing.assert_array_equal(
        scales.view(np.uint16), np.asarray(ref.scales).view(np.uint16)
    )


def test_native_batched_experts():
    rng = np.random.default_rng(1)
    w = (rng.normal(size=(4, 128, 64)) * 0.05).astype(np.float32)
    ref = quantize_np(w, bits=4, group_size=32)
    q, scales = native.quantize_native(w, bits=4, group_size=32)
    np.testing.assert_array_equal(q, np.asarray(ref.q))
    np.testing.assert_array_equal(
        scales.view(np.uint16), np.asarray(ref.scales).view(np.uint16)
    )


def test_native_zero_group_scale_one():
    w = np.zeros((64, 32), np.float32)
    q, scales = native.quantize_native(w, bits=8, group_size=64)
    assert np.all(np.asarray(scales, np.float32) == 1.0)
    assert np.all(q == 0)
