"""KrasisTpuMoE embedded in a REAL host framework (flax.linen).

The reference's sglang_bridge.py exists so another serving stack can use
krasis as its expert backend while keeping attention/norms itself. The
TPU-native analog demonstrated here: a flax transformer block owns the
norms/attention/router (flax params, flax apply), and hands the routed
expert computation to KrasisTpuMoE (quantized weights owned OUTSIDE the
host framework — the same ownership split as the reference bridge,
reference sglang_bridge.py:36, fused_moe.py:24). Covers the bridge's
three contracts: drop-in output parity, expert-ID masking for split
ownership (EP hosts), and fused routing off the host's gate weights.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from krasis_tpu.config import preset_config
from krasis_tpu.fused_moe import KrasisTpuMoE

E, H, I, K = 8, 64, 32, 2
T = 16


def _ref_moe(x, w13, w2, idx, wts):
    """Dense einsum reference (f32)."""
    w13g = jnp.take(w13, idx, axis=0)            # [T,k,H,2I]
    h = jnp.einsum("th,tkhi->tki", x, w13g)
    g, u = h[..., :I], h[..., I:]
    a = g * jax.nn.sigmoid(g) * u
    w2g = jnp.take(w2, idx, axis=0)
    out = jnp.einsum("tki,tkih->tkh", a, w2g)
    return (out * wts[..., None]).sum(axis=1)


class HostBlock(nn.Module):
    """The host framework's layer: flax owns norm + router; the expert
    computation is injected (self.moe_fn), exactly how a bridge embeds."""

    moe_fn: object

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm()(x)
        logits = nn.Dense(E, use_bias=False, name="router")(h)
        wts, idx = jax.lax.top_k(jax.nn.softmax(logits, -1), K)
        return x + self.moe_fn(h, idx.astype(jnp.int32), wts)


@pytest.fixture(scope="module")
def weights():
    key = jax.random.PRNGKey(0)
    w13 = jax.random.normal(key, (E, H, 2 * I), jnp.float32) * 0.1
    w2 = jax.random.normal(jax.random.split(key)[0], (E, I, H),
                           jnp.float32) * 0.1
    return w13, w2


def test_flax_block_with_krasis_moe_matches_reference(weights):
    w13, w2 = weights
    x = jax.random.normal(jax.random.PRNGKey(1), (T, H), jnp.float32)

    krasis = HostBlock(moe_fn=KrasisTpuMoE(w13, w2, K))
    ref = HostBlock(moe_fn=lambda h, i, w: _ref_moe(h, w13, w2, i, w))

    params = ref.init(jax.random.PRNGKey(2), x)   # shared host params
    out_ref = ref.apply(params, x)
    out_k = krasis.apply(params, x)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_ref),
                               rtol=2e-4, atol=2e-4)


def test_flax_block_quantized_close(weights):
    """Same embedding with INT4-on-ingest weights: close, not exact."""
    w13, w2 = weights
    x = jax.random.normal(jax.random.PRNGKey(1), (T, H), jnp.float32)
    krasis4 = HostBlock(moe_fn=KrasisTpuMoE(w13, w2, K, expert_bits=4,
                                            group_size=32))
    ref = HostBlock(moe_fn=lambda h, i, w: _ref_moe(h, w13, w2, i, w))
    params = ref.init(jax.random.PRNGKey(2), x)
    out_ref = np.asarray(ref.apply(params, x))
    out_k = np.asarray(krasis4.apply(params, x))
    err = np.abs(out_k - out_ref).max() / (np.abs(out_ref).max() + 1e-9)
    assert err < 0.05, err


def test_split_ownership_masking(weights):
    """EP-host usage: two wrappers each own half the experts (global ids,
    -1 masks the other owner's picks); their outputs sum to the full
    wrapper's output — the reference bridge's expert-ID masking contract."""
    w13, w2 = weights
    x = jax.random.normal(jax.random.PRNGKey(3), (T, H), jnp.float32)
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.choice(E, size=(T, K)).astype(np.int32))
    wts = jnp.asarray(rng.random((T, K), np.float32))

    full = KrasisTpuMoE(w13, w2, K)(x, idx, wts)

    halves = []
    for lo, hi in ((0, E // 2), (E // 2, E)):
        local = (idx >= lo) & (idx < hi)
        # owner receives LOCAL ids (global - lo), foreign picks = -1
        own_idx = jnp.where(local, idx - lo, -1)
        halves.append(KrasisTpuMoE(w13[lo:hi], w2[lo:hi], K)(
            x, own_idx, wts))
    np.testing.assert_allclose(np.asarray(halves[0] + halves[1]),
                               np.asarray(full), rtol=2e-4, atol=2e-4)


def test_forward_routed_from_host_gate(weights):
    """forward_routed: the host hands raw gate weights; routing runs the
    production compute_routing (sigmoid/softmax/correction-bias per
    config) — reference moe.rs forward_moe_routed parity surface."""
    w13, w2 = weights
    cfg = preset_config(
        "qwen3-moe",
        hidden_size=H, moe_intermediate_size=I, n_routed_experts=E,
        num_experts_per_tok=K, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        vocab_size=256, intermediate_size=2 * H,
    )
    gate_w = jax.random.normal(jax.random.PRNGKey(5), (H, E),
                               jnp.float32) * 0.1
    x = jax.random.normal(jax.random.PRNGKey(6), (T, H), jnp.float32)

    moe = KrasisTpuMoE(w13, w2, K)
    out = moe.forward_routed(x, gate_w, cfg)

    from krasis_tpu.ops.routing import compute_routing

    r = compute_routing(x, gate_w, cfg)
    want = moe(x, r.topk_idx, r.topk_weights)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=1e-6, atol=1e-6)
