"""Gated DeltaNet numerics: chunked vs recurrent, and vs the HF torch oracle.

The reference needed 5 documented fixes for these numerics
(reference python/krasis/linear_attention.py:10-16); here every path is
pinned against transformers' torch_recurrent/chunk_gated_delta_rule.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

torch.set_grad_enabled(False)

from transformers.models.qwen3_next.modeling_qwen3_next import (
    torch_chunk_gated_delta_rule,
    torch_recurrent_gated_delta_rule,
)

from krasis_tpu.ops.deltanet import (
    DeltaNetDims,
    causal_conv,
    fix_qkvz_ordering,
    gated_delta_rule_chunked,
    gated_delta_rule_recurrent,
)

B, HK, HV, DK, DV = 2, 2, 4, 16, 32


def _rand_inputs(S, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(B, S, HK, DK)).astype(np.float32)
    k = rng.normal(size=(B, S, HK, DK)).astype(np.float32)
    v = rng.normal(size=(B, S, HV, DV)).astype(np.float32)
    g = -np.abs(rng.normal(size=(B, S, HV))).astype(np.float32) * 0.5
    beta = rng.uniform(0.2, 0.9, size=(B, S, HV)).astype(np.float32)
    return q, k, v, g, beta


def test_recurrent_matches_torch_oracle():
    S = 7
    q, k, v, g, beta = _rand_inputs(S)
    state = jnp.zeros((B, HV, DK, DV), jnp.float32)
    got, final = gated_delta_rule_recurrent(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        jnp.asarray(g), jnp.asarray(beta), state,
    )
    # HF repeats q/k to the v-head count before calling the rule
    r = HV // HK
    tq = torch.tensor(q).repeat_interleave(r, dim=2)
    tk = torch.tensor(k).repeat_interleave(r, dim=2)
    want, want_state = torch_recurrent_gated_delta_rule(
        tq, tk, torch.tensor(v),
        torch.tensor(g), torch.tensor(beta),
        initial_state=None, output_final_state=True,
        use_qk_l2norm_in_kernel=True,
    )
    np.testing.assert_allclose(got, want.detach().numpy(), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(final, want_state.detach().numpy(), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("S", [64, 100, 129])
def test_chunked_matches_recurrent(S):
    q, k, v, g, beta = _rand_inputs(S, seed=S)
    state0 = jnp.zeros((B, HV, DK, DV), jnp.float32)
    out_r, st_r = gated_delta_rule_recurrent(
        *map(jnp.asarray, (q, k, v, g, beta)), state0
    )
    out_c, st_c = gated_delta_rule_chunked(
        *map(jnp.asarray, (q, k, v, g, beta)), state0, chunk_size=64
    )
    np.testing.assert_allclose(out_c, out_r, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(st_c, st_r, rtol=2e-3, atol=2e-3)


def test_chunked_matches_torch_chunked():
    S = 96
    q, k, v, g, beta = _rand_inputs(S, seed=42)
    state0 = jnp.zeros((B, HV, DK, DV), jnp.float32)
    got, final = gated_delta_rule_chunked(
        *map(jnp.asarray, (q, k, v, g, beta)), state0, chunk_size=64
    )
    r = HV // HK
    tq = torch.tensor(q).repeat_interleave(r, dim=2)
    tk = torch.tensor(k).repeat_interleave(r, dim=2)
    want, want_state = torch_chunk_gated_delta_rule(
        tq, tk, torch.tensor(v),
        torch.tensor(g), torch.tensor(beta),
        initial_state=None, output_final_state=True,
        use_qk_l2norm_in_kernel=True,
    )
    np.testing.assert_allclose(got, want.detach().numpy(), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(final, want_state.detach().numpy(), rtol=2e-3, atol=2e-3)


def test_chunked_with_initial_state_continues_recurrence():
    """Split a sequence: chunked(first) state feeds recurrent(second)."""
    S = 80
    q, k, v, g, beta = _rand_inputs(S, seed=7)
    state0 = jnp.zeros((B, HV, DK, DV), jnp.float32)
    full_out, _ = gated_delta_rule_recurrent(
        *map(jnp.asarray, (q, k, v, g, beta)), state0
    )
    cut = 64
    _, st = gated_delta_rule_chunked(
        *map(lambda t: jnp.asarray(t[:, :cut]), (q, k, v, g, beta)), state0
    )
    out2, _ = gated_delta_rule_recurrent(
        *map(lambda t: jnp.asarray(t[:, cut:]), (q, k, v, g, beta)), st
    )
    np.testing.assert_allclose(out2, full_out[:, cut:], rtol=2e-3, atol=2e-3)


def test_fix_qkvz_ordering_matches_hf():
    """Un-interleave vs HF fix_query_key_value_ordering on random data."""
    dims = DeltaNetDims(HK, HV, DK, DV, 4)
    S = 3
    rng = np.random.default_rng(3)
    qkvz = rng.normal(size=(B, S, 2 * dims.key_dim + 2 * dims.value_dim)).astype(np.float32)
    ba = rng.normal(size=(B, S, 2 * HV)).astype(np.float32)

    q, k, v, z, b, a = fix_qkvz_ordering(jnp.asarray(qkvz), jnp.asarray(ba), dims)

    # HF reference reshape/split (modeling_qwen3_next.fix_query_key_value_ordering)
    r = HV // HK
    tq = torch.tensor(qkvz).view(B, S, HK, 2 * DK + 2 * DV * r)
    tb = torch.tensor(ba).view(B, S, HK, 2 * r)
    hq, hk_, hv_, hz = torch.split(tq, [DK, DK, r * DV, r * DV], dim=3)
    hb, ha = torch.split(tb, [r, r], dim=3)
    hv_ = hv_.reshape(B, S, -1, DV)
    hz = hz.reshape(B, S, -1, DV)
    hb = hb.reshape(B, S, HV)
    ha = ha.reshape(B, S, HV)
    np.testing.assert_allclose(q, hq.detach().numpy())
    np.testing.assert_allclose(k, hk_.detach().numpy())
    np.testing.assert_allclose(v, hv_.detach().numpy())
    np.testing.assert_allclose(z, hz.detach().numpy())
    np.testing.assert_allclose(b, hb.detach().numpy())
    np.testing.assert_allclose(a, ha.detach().numpy())


def test_causal_conv_matches_torch():
    C, K, S = 8, 4, 10
    rng = np.random.default_rng(4)
    x = rng.normal(size=(B, S, C)).astype(np.float32)
    w = rng.normal(size=(C, K)).astype(np.float32)
    state0 = jnp.zeros((B, K - 1, C), jnp.float32)
    y, new_state = causal_conv(jnp.asarray(x), jnp.asarray(w), state0)

    conv = torch.nn.Conv1d(C, C, K, groups=C, padding=K - 1, bias=False)
    with torch.no_grad():
        conv.weight.copy_(torch.tensor(w)[:, None, :])
    xt = torch.tensor(x).transpose(1, 2)  # [B, C, S]
    want = torch.nn.functional.silu(conv(xt)[:, :, :S]).transpose(1, 2)
    np.testing.assert_allclose(y, want.detach().numpy(), rtol=1e-5, atol=1e-5)
    # state = last K-1 raw inputs
    np.testing.assert_allclose(new_state, x[:, -(K - 1):, :])

    # decode continuation: feed one more token, compare against conv on S+1
    x1 = rng.normal(size=(B, 1, C)).astype(np.float32)
    y1, _ = causal_conv(jnp.asarray(x1), jnp.asarray(w), new_state)
    x_full = np.concatenate([x, x1], axis=1)
    want_full = torch.nn.functional.silu(
        conv(torch.tensor(x_full).transpose(1, 2))[:, :, : S + 1]
    ).transpose(1, 2)
    np.testing.assert_allclose(y1[:, 0], want_full[:, -1].detach().numpy(), rtol=1e-5, atol=1e-5)
