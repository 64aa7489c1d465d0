"""Prompt-lookup (n-gram) speculative decoding tests (models/spec_ngram.py).

Like the MTP tests, the contract is EXACTNESS: greedy spec output must be
bit-identical to vanilla decode for every model family — including
DeltaNet hybrids, whose recurrent state the verify step advances by only
the committed prefix (models/model.py la_spec_commit). Acceptance rate is
a pure performance knob.

No reference counterpart (brontoguana/krasis has no speculative decoding);
the drafting scheme is public prompt-lookup decoding (apoorvumang/
prompt-lookup-decoding, also in vLLM/transformers).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from krasis_tpu.config import QuantConfig, preset_config
from krasis_tpu.models.spec_ngram import ngram_draft
from krasis_tpu.models.synthetic import build_synthetic_engine
from krasis_tpu.ops.deltanet import (
    delta_state_update,
    gated_delta_rule_recurrent,
)
from krasis_tpu.ops.sampling import SamplingParams

NO_STOP = {-1}


def hybrid_cfg(**kw):
    return preset_config(
        "qwen3-coder-next",
        hidden_size=64, intermediate_size=128, moe_intermediate_size=32,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        vocab_size=256, head_dim=16,
        layer_types=["linear_attention", "linear_attention",
                     "linear_attention", "full_attention"],
        linear_num_key_heads=2, linear_num_value_heads=4,
        linear_key_head_dim=16, linear_value_head_dim=16,
        n_routed_experts=8, num_experts_per_tok=2, n_shared_experts=1,
        shared_expert_intermediate_size=32,
        **kw,
    )


# ---------------------------------------------------------------------------
# ngram_draft: pure drafting function
# ---------------------------------------------------------------------------

def _draft(hist_row, hlen, k, n_max=3):
    hist = jnp.asarray([hist_row], jnp.int32)
    return np.asarray(
        ngram_draft(hist, jnp.asarray([hlen], jnp.int32), k, n_max)
    )[0].tolist()


def test_ngram_draft_matches_most_recent_longest():
    # history: 1 2 3 9 1 2 3 7 | current tail ...1 2 3 → longest gram
    # (1,2,3) matches at 0 and 4; most recent (4) wins → draft 7,...
    hist = [1, 2, 3, 9, 1, 2, 3, 7, 5, 1, 2, 3] + [0] * 4
    assert _draft(hist, 12, 2) == [7, 5]


def test_ngram_draft_prefers_longer_gram():
    # tail ...8 4: gram (8,4) matches at 2 → draft 6. A 1-gram match of
    # (4,) also exists later (pos 5) but the longer gram wins.
    hist = [9, 9, 8, 4, 6, 4, 1, 8, 4] + [0] * 7
    assert _draft(hist, 9, 1, n_max=2) == [6]


def test_ngram_draft_no_match_repeats_last():
    hist = [1, 2, 3, 4, 5] + [0] * 11
    assert _draft(hist, 5, 3) == [5, 5, 5]


def test_ngram_draft_ignores_stale_tail():
    # stale tokens past hlen (left over from rejected drafts) must not
    # produce matches: identical window sits at pos 6 but hlen=6 hides it
    hist = [1, 2, 3, 4, 1, 2, 1, 2, 9] + [0] * 7
    assert _draft(hist, 6, 1) == [3]  # match at pos 0, not the stale one


# ---------------------------------------------------------------------------
# delta_state_update: the DeltaNet replay path
# ---------------------------------------------------------------------------

def test_delta_state_update_matches_recurrent():
    rng = np.random.default_rng(0)
    B, S, Hk, Hv, dk, dv = 2, 5, 2, 4, 8, 8
    k = jnp.asarray(rng.normal(size=(B, S, Hk, dk)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, S, Hv, dv)), jnp.float32)
    g = jnp.asarray(-np.abs(rng.normal(size=(B, S, Hv))), jnp.float32)
    beta = jnp.asarray(rng.uniform(0.1, 0.9, size=(B, S, Hv)), jnp.float32)
    q = jnp.asarray(rng.normal(size=(B, S, Hk, dk)), jnp.float32)
    s0 = jnp.asarray(rng.normal(size=(B, Hv, dk, dv)), jnp.float32)

    _, want = gated_delta_rule_recurrent(q, k, v, g, beta, s0)
    got = delta_state_update(k, v, g, beta, s0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_delta_state_update_masked_prefix():
    """Zeroed (g, beta) tail positions are exact no-ops: replaying a
    masked full window equals replaying only the prefix — the property
    la_spec_commit relies on for per-row committed counts."""
    rng = np.random.default_rng(1)
    B, S, H, d = 1, 6, 2, 4
    k = jnp.asarray(rng.normal(size=(B, S, H, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, S, H, d)), jnp.float32)
    g = jnp.asarray(-np.abs(rng.normal(size=(B, S, H))), jnp.float32)
    beta = jnp.asarray(rng.uniform(0.1, 0.9, size=(B, S, H)), jnp.float32)
    s0 = jnp.asarray(rng.normal(size=(B, H, d, d)), jnp.float32)

    n = 3
    mask = (jnp.arange(S) < n)[None, :, None]
    got = delta_state_update(k, v, jnp.where(mask, g, 0.0),
                             jnp.where(mask, beta, 0.0), s0)
    want = delta_state_update(k[:, :n], v[:, :n], g[:, :n], beta[:, :n], s0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


# ---------------------------------------------------------------------------
# Engine end-to-end
# ---------------------------------------------------------------------------

def _ngram_env(monkeypatch, k="3"):
    monkeypatch.setenv("KRASIS_TPU_SPEC_MODE", "ngram")
    monkeypatch.setenv("KRASIS_TPU_SPEC_K", k)


def _gen(eng, prompt, n, spec):
    eng.spec_available = spec
    return eng.generate(list(prompt), max_new_tokens=n,
                        sampling=SamplingParams(temperature=0.0),
                        stop_ids=NO_STOP)


def _la_states(cache):
    return [np.asarray(lc["state"])
            for lc in list(cache["prefix_layers"]) + list(cache["pattern"])
            if "state" in lc]


def test_ngram_engine_hybrid_matches_vanilla(monkeypatch):
    """Greedy equality on a DeltaNet hybrid — the family MTP spec decode
    cannot serve — PLUS bit-level equality of the final recurrent state
    (token equality alone would miss a state replay bug whose effect
    only shows several tokens later)."""
    _ngram_env(monkeypatch)
    eng = build_synthetic_engine(hybrid_cfg(), max_len=512)
    assert eng.spec_mode == "ngram"
    prompt = [5, 6, 7, 8, 9, 5, 6, 7, 8, 9, 5, 6]
    want = _gen(eng, prompt, 32, spec=False)
    want_state = _la_states(eng.cache)
    got = _gen(eng, prompt, 32, spec=True)
    got_state = _la_states(eng.cache)
    assert got.tokens == want.tokens
    assert eng.last_spec_stats["emitted"] == 32
    for a, b in zip(got_state, want_state):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_ngram_engine_full_acceptance(monkeypatch):
    """Constant-argmax model (lm_head=0 → greedy always emits token 0):
    once the history carries a few zeros the lookup drafts all-zeros and
    every verify step commits k+1 tokens — exercising the accepted-path
    state replay, which must still match vanilla bit-for-bit."""
    _ngram_env(monkeypatch, k="2")
    eng = build_synthetic_engine(hybrid_cfg(), max_len=512)
    eng.params = dict(eng.params,
                      lm_head=jax.tree_util.tree_map(jnp.zeros_like,
                                                     eng.params["lm_head"]))
    prompt = [5, 6, 7, 8]
    want = _gen(eng, prompt, 24, spec=False)
    want_state = _la_states(eng.cache)
    got = _gen(eng, prompt, 24, spec=True)
    got_state = _la_states(eng.cache)
    assert got.tokens == want.tokens == [0] * 24
    stats = eng.last_spec_stats
    assert stats["accepted"] >= stats["emitted"] // 2, stats
    for a, b in zip(got_state, want_state):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_ngram_engine_gqa(monkeypatch):
    """Pure-KV model: la_spec_commit is a no-op; the length mask alone
    provides rollback."""
    _ngram_env(monkeypatch)
    from krasis_tpu.models.synthetic import tiny_config

    eng = build_synthetic_engine(tiny_config("qwen3-moe", vocab_size=64),
                                 max_len=512)
    prompt = [5, 9, 2, 7, 5, 9, 2, 7]
    want = _gen(eng, prompt, 24, spec=False)
    got = _gen(eng, prompt, 24, spec=True)
    assert got.tokens == want.tokens


def test_ngram_engine_sampled_reproducible(monkeypatch):
    """Sampled path: same seed → same stream, and the stream is a valid
    token sequence (distribution exactness is pinned by the shared
    verify_and_sample core, already covered by the MTP sampling tests)."""
    _ngram_env(monkeypatch)
    eng = build_synthetic_engine(hybrid_cfg(), max_len=512)
    sp = SamplingParams(temperature=0.9, top_k=20, top_p=0.9)
    a = eng.generate([3, 1, 4, 1, 5], max_new_tokens=16, sampling=sp,
                     stop_ids=NO_STOP, seed=7)
    b = eng.generate([3, 1, 4, 1, 5], max_new_tokens=16, sampling=sp,
                     stop_ids=NO_STOP, seed=7)
    assert a.tokens == b.tokens


# ---------------------------------------------------------------------------
# Scheduler end-to-end
# ---------------------------------------------------------------------------

def _drain(req):
    toks = []
    while True:
        t = req.out_queue.get(timeout=180)
        if t is None:
            return toks
        toks.append(t)


def test_ngram_scheduler_matches_vanilla(monkeypatch):
    from krasis_tpu.models.params import init_synthetic_params
    from krasis_tpu.runtime.scheduler import BatchScheduler

    cfg = hybrid_cfg()
    quant = QuantConfig()
    params = init_synthetic_params(cfg, quant, jax.random.PRNGKey(0))
    greedy = SamplingParams(temperature=0.0)
    prompt = [5, 6, 7, 8, 9, 5, 6, 7, 8, 9, 5, 6]

    _ngram_env(monkeypatch, k="2")
    sched = BatchScheduler(cfg, quant, params, max_len=256, num_slots=2)
    assert sched.spec_mode == "ngram"
    try:
        reqs = [sched.submit(prompt, max_new_tokens=12, sampling=greedy,
                             stop_ids=NO_STOP) for _ in range(3)]
        outs = [_drain(r) for r in reqs]
    finally:
        sched.shutdown()

    monkeypatch.setenv("KRASIS_TPU_SPEC_MODE", "off")
    sched2 = BatchScheduler(cfg, quant, params, max_len=256, num_slots=2)
    assert sched2.spec_mode is None
    try:
        want = _drain(sched2.submit(prompt, max_new_tokens=12,
                                    sampling=greedy, stop_ids=NO_STOP))
    finally:
        sched2.shutdown()
    assert all(o == want for o in outs), (outs, want)


# ---------------------------------------------------------------------------
# spec_config gating
# ---------------------------------------------------------------------------

def test_spec_config_mode_gating(monkeypatch):
    from krasis_tpu.models.mtp import spec_config

    cfg = hybrid_cfg()
    monkeypatch.delenv("KRASIS_TPU_SPEC_MODE", raising=False)
    monkeypatch.delenv("KRASIS_TPU_SPEC_K", raising=False)
    # auto: hybrid has no MTP module → off
    assert spec_config(cfg, {})[0] is None
    monkeypatch.setenv("KRASIS_TPU_SPEC_MODE", "ngram")
    mode, k = spec_config(cfg, {})
    assert mode == "ngram" and k == 3  # ngram default depth
    monkeypatch.setenv("KRASIS_TPU_NO_SPEC", "1")
    assert spec_config(cfg, {})[0] is None
