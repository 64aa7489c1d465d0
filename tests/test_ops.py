"""Unit tests for core ops: norms, rope, routing, activations, qmm, moe.

Numerical-equivalence strategy mirrors the reference's backbone tests
(reference tests/test_rust_vs_python.py, test_moe_sanity.py): every
optimized path is compared against a plain float32 formula.
"""

import numpy as np
import jax
import jax.numpy as jnp

HI = jax.lax.Precision.HIGHEST
import pytest

from krasis_tpu.config import preset_config
from krasis_tpu.ops.norm import rms_norm, add_rms_norm, gated_rms_norm
from krasis_tpu.ops.rope import rope_cos_sin, apply_rope, compute_inv_freq, yarn_softmax_scale
from krasis_tpu.ops.routing import compute_routing
from krasis_tpu.ops.activations import swiglu
from krasis_tpu.ops.qmm import qmm_ref, linear
from krasis_tpu.ops.moe import moe_forward_ragged, moe_forward_gathered, mlp_forward
from krasis_tpu.quant import quantize_np, dequantize_np, QTensor, quantize


def test_rms_norm_matches_formula():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(4, 64)).astype(np.float32)
    w = rng.normal(size=(64,)).astype(np.float32)
    got = rms_norm(jnp.asarray(x), jnp.asarray(w), eps=1e-6)
    want = x / np.sqrt((x**2).mean(-1, keepdims=True) + 1e-6) * w
    np.testing.assert_allclose(got, want, rtol=1e-5)
    # plus-one convention
    got = rms_norm(jnp.asarray(x), jnp.asarray(w), eps=1e-6, plus_one=True)
    want = x / np.sqrt((x**2).mean(-1, keepdims=True) + 1e-6) * (1 + w)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_add_rms_norm_residual():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(3, 32)).astype(np.float32))
    r = jnp.asarray(rng.normal(size=(3, 32)).astype(np.float32))
    w = jnp.ones((32,), jnp.float32)
    normed, new_r = add_rms_norm(x, r, w)
    np.testing.assert_allclose(new_r, x + r, rtol=1e-6)
    np.testing.assert_allclose(normed, rms_norm(x + r, w), rtol=1e-6)


def test_gated_rms_norm_matches_hf_semantics():
    # HF Qwen3NextRMSNormGated: norm → weight → * silu(gate) (norm BEFORE gate).
    import torch

    rng = np.random.default_rng(2)
    x = rng.normal(size=(6, 128)).astype(np.float32)
    g = rng.normal(size=(6, 128)).astype(np.float32)
    w = rng.normal(size=(128,)).astype(np.float32)
    xt, gt, wt = map(torch.tensor, (x, g, w))
    var = xt.pow(2).mean(-1, keepdim=True)
    want = (wt * (xt * torch.rsqrt(var + 1e-6))) * torch.nn.functional.silu(gt)
    got = gated_rms_norm(jnp.asarray(x), jnp.asarray(g), jnp.asarray(w), plus_one=False)
    np.testing.assert_allclose(got, want.numpy(), rtol=2e-5, atol=2e-5)


def test_rope_neox_rotation():
    pos = jnp.arange(8)
    cos, sin = rope_cos_sin(pos, rot_dim=16, rope_theta=10000.0)
    x = jnp.asarray(np.random.default_rng(3).normal(size=(1, 8, 2, 16)).astype(np.float32))
    out = apply_rope(x, cos[None], sin[None])
    # position 0 → identity
    np.testing.assert_allclose(out[0, 0], x[0, 0], rtol=1e-5)
    # norm preserved per pair
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out), axis=-1),
        np.linalg.norm(np.asarray(x), axis=-1),
        rtol=1e-4,
    )


def test_rope_partial_passthrough():
    pos = jnp.arange(4)
    cos, sin = rope_cos_sin(pos, rot_dim=8, rope_theta=10000.0)
    x = jnp.asarray(np.random.default_rng(4).normal(size=(1, 4, 1, 32)).astype(np.float32))
    out = apply_rope(x, cos[None], sin[None])
    np.testing.assert_allclose(out[..., 8:], x[..., 8:])  # untouched tail


def test_rope_interleaved_deinterleave():
    # interleaved storage at position 0 must equal de-interleaved identity
    pos = jnp.zeros((1,), jnp.int32)
    cos, sin = rope_cos_sin(pos, rot_dim=8, rope_theta=10000.0)
    x = jnp.arange(8, dtype=jnp.float32).reshape(1, 1, 1, 8)
    out = apply_rope(x, cos[None], sin[None], interleaved=True)
    np.testing.assert_allclose(out[0, 0, 0], [0, 2, 4, 6, 1, 3, 5, 7])


def test_yarn_matches_hf_deepseek():
    """YaRN inv_freq and mscale vs the HF deepseek_v2 rotary implementation."""
    import torch
    from transformers.models.deepseek_v2.modeling_deepseek_v2 import (
        DeepseekV2Config,
    )
    from transformers import AutoConfig  # noqa: F401

    rs = dict(
        type="yarn", factor=40.0, original_max_position_embeddings=4096,
        beta_fast=32, beta_slow=1, mscale=0.707, mscale_all_dim=0.707,
    )
    inv_freq, mscale = compute_inv_freq(64, 10000.0, rs)
    # ramp endpoints: high-frequency dims keep base inv_freq,
    # low-frequency dims are divided by factor
    base = 1.0 / (10000.0 ** (np.arange(0, 32) * 2 / 64))
    np.testing.assert_allclose(inv_freq[0], base[0], rtol=1e-6)
    np.testing.assert_allclose(inv_freq[-1], base[-1] / 40.0, rtol=1e-4)
    # mscale ratio is 1.0 when mscale == mscale_all_dim
    assert abs(mscale - 1.0) < 1e-9
    # softmax scale correction: yarn_get_mscale(40, 0.707)^2
    import math
    want = (0.1 * 0.707 * math.log(40) + 1.0) ** 2
    got = yarn_softmax_scale(1.0, rs)
    assert abs(got - want) < 1e-9


def _routing_ref_softmax(x, gw, k, norm):
    logits = x @ gw
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    idx = np.argsort(-probs, axis=-1)[:, :k]
    w = np.take_along_axis(probs, idx, axis=-1)
    if norm:
        w = w / w.sum(-1, keepdims=True)
    return idx, w


def test_routing_softmax():
    cfg = preset_config("qwen3-moe")
    rng = np.random.default_rng(5)
    x = rng.normal(size=(5, 32)).astype(np.float32)
    gw = rng.normal(size=(32, cfg.n_routed_experts)).astype(np.float32)
    res = compute_routing(jnp.asarray(x), jnp.asarray(gw), cfg)
    idx, w = _routing_ref_softmax(x, gw, cfg.num_experts_per_tok, cfg.norm_topk_prob)
    np.testing.assert_array_equal(np.sort(res.topk_idx, -1), np.sort(idx, -1))
    np.testing.assert_allclose(np.sort(res.topk_weights, -1), np.sort(w, -1), rtol=1e-4)


def test_routing_sigmoid_bias_selects_biased_but_weights_unbiased():
    cfg = preset_config("deepseek-v2-lite", scoring_func="sigmoid",
                        has_router_bias=True, norm_topk_prob=True,
                        n_routed_experts=16, num_experts_per_tok=4)
    rng = np.random.default_rng(6)
    x = rng.normal(size=(3, 32)).astype(np.float32)
    gw = rng.normal(size=(32, 16)).astype(np.float32)
    bias = rng.normal(size=(16,)).astype(np.float32) * 3
    res = compute_routing(jnp.asarray(x), jnp.asarray(gw), cfg, jnp.asarray(bias))
    scores = 1 / (1 + np.exp(-(x @ gw)))
    sel = scores + bias
    idx = np.argsort(-sel, axis=-1)[:, :4]
    np.testing.assert_array_equal(np.sort(res.topk_idx, -1), np.sort(idx, -1))
    w = np.take_along_axis(scores, np.asarray(res.topk_idx), axis=-1)
    w = w / w.sum(-1, keepdims=True)
    np.testing.assert_allclose(res.topk_weights, w, rtol=1e-4)


def test_routing_group_limited():
    cfg = preset_config("deepseek-v2-lite", scoring_func="sigmoid",
                        n_routed_experts=16, num_experts_per_tok=4,
                        n_group=4, topk_group=2, topk_method="noaux_tc")
    rng = np.random.default_rng(7)
    x = rng.normal(size=(4, 32)).astype(np.float32)
    gw = rng.normal(size=(32, 16)).astype(np.float32)
    res = compute_routing(jnp.asarray(x), jnp.asarray(gw), cfg)
    # every selected expert must lie in one of the top-2 groups per token
    scores = 1 / (1 + np.exp(-(x @ gw)))
    grouped = scores.reshape(4, 4, 4)
    top2sum = np.sort(grouped, axis=-1)[..., -2:].sum(-1)
    allowed_groups = np.argsort(-top2sum, axis=-1)[:, :2]
    got_groups = np.asarray(res.topk_idx) // 4
    for t in range(4):
        assert set(got_groups[t]) <= set(allowed_groups[t])


def test_swiglu_and_gptoss_variant():
    rng = np.random.default_rng(8)
    h = rng.normal(size=(4, 8)).astype(np.float32) * 4
    got = swiglu(jnp.asarray(h))
    g, u = h[:, :4], h[:, 4:]
    want = g / (1 + np.exp(-g)) * u
    np.testing.assert_allclose(got, want, rtol=1e-5)
    got = swiglu(jnp.asarray(h), swiglu_limit=2.0, gpt_oss=True)
    gc = np.minimum(g, 2.0)
    uc = np.clip(u, -2.0, 2.0)
    want = gc / (1 + np.exp(-1.702 * gc)) * (uc + 1)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("bits", [4, 8])
def test_qmm_ref_matches_dequant(bits):
    rng = np.random.default_rng(9)
    w = rng.normal(size=(256, 128)).astype(np.float32) * 0.05
    qt_np = quantize_np(w, bits=bits)
    x = rng.normal(size=(4, 256)).astype(np.float32)
    qt = QTensor(
        q=jnp.asarray(qt_np.q), scales=jnp.asarray(np.asarray(qt_np.scales)),
        bits=bits, group_size=qt_np.group_size,
    )
    got = qmm_ref(jnp.asarray(x), qt, precision=HI)
    want = x @ dequantize_np(qt_np)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_linear_accepts_plain_and_qtensor():
    rng = np.random.default_rng(10)
    w = rng.normal(size=(128, 64)).astype(np.float32) * 0.05
    x = jnp.asarray(rng.normal(size=(2, 3, 128)).astype(np.float32))
    got_plain = linear(x, jnp.asarray(w))
    qt = quantize(jnp.asarray(w), bits=8)
    got_q = linear(x, qt)
    # default matmul precision is bf16-multiply on TPU → loose tolerance
    np.testing.assert_allclose(got_plain, np.asarray(x) @ w, rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(got_q, got_plain, rtol=3e-2, atol=3e-2)


def _moe_ref(x, w13, w2, idx, wts):
    """Plain numpy loop-over-tokens MoE oracle."""
    T, H = x.shape
    out = np.zeros((T, H), np.float32)
    for t in range(T):
        for j in range(idx.shape[1]):
            e = idx[t, j]
            h = x[t] @ w13[e]
            I = h.shape[0] // 2
            a = h[:I] / (1 + np.exp(-h[:I])) * h[I:]
            out[t] += wts[t, j] * (a @ w2[e])
    return out


@pytest.mark.parametrize("path", ["ragged", "gathered"])
def test_moe_forward_paths_match_oracle(path):
    rng = np.random.default_rng(11)
    E, H, I, T, k = 8, 64, 32, 6, 2
    x = rng.normal(size=(T, H)).astype(np.float32) * 0.5
    w13 = rng.normal(size=(E, H, 2 * I)).astype(np.float32) * 0.1
    w2 = rng.normal(size=(E, I, H)).astype(np.float32) * 0.1
    idx = rng.integers(0, E, size=(T, k)).astype(np.int32)
    # make one duplicate expert pair to exercise accumulation
    idx[0, 1] = idx[0, 0]
    wts = rng.uniform(0.1, 1.0, size=(T, k)).astype(np.float32)
    fn = moe_forward_ragged if path == "ragged" else moe_forward_gathered
    got = fn(jnp.asarray(x), jnp.asarray(w13), jnp.asarray(w2),
             jnp.asarray(idx), jnp.asarray(wts), precision=HI)
    want = _moe_ref(x, w13, w2, idx, wts)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_moe_quantized_paths_agree():
    rng = np.random.default_rng(12)
    E, H, I, T, k = 8, 128, 128, 5, 3
    key = jax.random.PRNGKey(0)
    w13 = jax.random.normal(key, (E, H, 2 * I), jnp.float32) * 0.05
    w2 = jax.random.normal(key, (E, I, H), jnp.float32) * 0.05
    q13 = quantize(w13, bits=4)
    q2 = quantize(w2, bits=4)
    x = jnp.asarray(rng.normal(size=(T, H)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, E, size=(T, k)).astype(np.int32))
    wts = jnp.asarray(rng.uniform(0.1, 1.0, size=(T, k)).astype(np.float32))
    a = moe_forward_ragged(x, q13, q2, idx, wts, precision=HI)
    b = moe_forward_gathered(x, q13, q2, idx, wts, precision=HI)
    np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-3)


def test_mlp_forward():
    rng = np.random.default_rng(13)
    H, I = 64, 32
    x = rng.normal(size=(3, H)).astype(np.float32)
    w13 = rng.normal(size=(H, 2 * I)).astype(np.float32) * 0.1
    w2 = rng.normal(size=(I, H)).astype(np.float32) * 0.1
    got = mlp_forward(jnp.asarray(x), jnp.asarray(w13), jnp.asarray(w2))
    h = x @ w13
    a = h[:, :I] / (1 + np.exp(-h[:, :I])) * h[:, I:]
    np.testing.assert_allclose(got, a @ w2, rtol=2e-2, atol=2e-2)
