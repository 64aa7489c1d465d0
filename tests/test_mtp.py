"""MTP speculative decoding tests (models/mtp.py).

Greedy spec decode must emit EXACTLY the vanilla greedy token stream —
the draft only changes how many tokens each device step commits. The
verify-step mechanics (accept/reject bookkeeping, cache length rollback)
are pinned deterministically by feeding known-correct / known-wrong
drafts; end-to-end equivalence runs on random synthetic weights where
acceptance is incidental.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from krasis_tpu.config import QuantConfig
from krasis_tpu.models.synthetic import build_synthetic_engine, tiny_config
from krasis_tpu.ops.sampling import SamplingParams


def make_engine(preset="deepseek-v2-lite", vocab=64, max_len=1024, **over):
    cfg = tiny_config(preset, vocab_size=vocab,
                      num_nextn_predict_layers=1, **over)
    return build_synthetic_engine(cfg, max_len=max_len)


NO_STOP = {-1}


def _greedy(eng, prompt, n, spec: bool):
    saved = eng.spec_available
    eng.spec_available = spec
    try:
        return eng.generate(list(prompt), max_new_tokens=n,
                            sampling=SamplingParams(temperature=0.0),
                            stop_ids=NO_STOP)
    finally:
        eng.spec_available = saved


def test_spec_equals_vanilla_greedy_mla():
    eng = make_engine()
    assert eng.spec_available
    prompt = list(range(1, 11))
    want = _greedy(eng, prompt, 40, spec=False)
    got = _greedy(eng, prompt, 40, spec=True)
    assert got.tokens == want.tokens
    stats = eng.last_spec_stats
    assert stats is not None and stats["emitted"] == len(got.tokens)
    assert stats["steps"] >= 1
    np.testing.assert_allclose(got.logprobs, want.logprobs,
                               rtol=2e-2, atol=2e-2)


def test_spec_equals_vanilla_gqa():
    eng = make_engine(preset="qwen3-moe", vocab=48)
    want = _greedy(eng, [5, 9, 2, 7], 32, spec=False)
    got = _greedy(eng, [5, 9, 2, 7], 32, spec=True)
    assert got.tokens == want.tokens


def test_spec_equals_vanilla_chunked_prefill():
    """Long prompt through chunked spec prefill (history buckets)."""
    eng = make_engine(max_len=2048)
    eng.chunk = 128
    rng = np.random.default_rng(7)
    prompt = rng.integers(1, 60, size=300).tolist()
    want = _greedy(eng, prompt, 24, spec=False)
    got = _greedy(eng, prompt, 24, spec=True)
    assert got.tokens == want.tokens


def _greedy_step_args(eng, key=0):
    """Sampling-state args of make_spec_decode_fn, greedy settings."""
    B, V = eng.batch_size, eng.cfg.vocab_size
    z = lambda dt: jnp.zeros((B,), dt)
    return (jax.random.PRNGKey(key), jnp.zeros((B, V), jnp.bool_),
            z(jnp.float32), jnp.ones((B,), jnp.float32), z(jnp.float32),
            z(jnp.int32))


def test_spec_verify_step_accept_and_reject():
    """Deterministic accept/reject mechanics of one verify step."""
    from krasis_tpu.models.mtp import make_spec_decode_fn

    eng = make_engine()
    prompt = [3, 1, 4, 1, 5]
    # ground truth: 3 greedy continuation tokens
    want = _greedy(eng, prompt, 3, spec=False).tokens

    fn = jax.jit(make_spec_decode_fn(eng.cfg, eng.quant, 1))

    def run_step(draft_val):
        # fresh prefill state each time
        eng.reset(eng._cache_len)
        logits, h_last = eng._spec_prefill_prompt(prompt)
        t1 = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        assert int(t1[0]) == want[0]
        _, mtp_cache = eng._first_draft_fn()(
            eng.params, t1, h_last, eng.mtp_cache)
        draft = jnp.full_like(t1, draft_val)[:, None]
        return fn(eng.params, t1, draft, eng.cache, mtp_cache,
                  *_greedy_step_args(eng))

    # correct draft → accepted, both tokens committed
    ts, _, nc, nxt, _, cache, mtp_cache, _, _ = run_step(want[1])
    assert int(nc[0, 0]) == 2
    assert int(ts[0, 0, 0]) == want[1] and int(ts[0, 0, 1]) == want[2]
    assert int(nxt[0]) == want[2]
    # both caches advanced by 2 past the prompt
    assert int(cache["length"][0]) == len(prompt) + 2
    assert int(mtp_cache["length"][0]) == len(prompt) + 2

    # wrong draft → rejected, only t1 committed, lengths rolled back
    wrong = (want[1] + 1) % eng.cfg.vocab_size
    ts, _, nc, nxt, _, cache, mtp_cache, _, _ = run_step(wrong)
    assert int(nc[0, 0]) == 1
    assert int(ts[0, 0, 0]) == want[1]
    assert int(nxt[0]) == want[1]
    assert int(cache["length"][0]) == len(prompt) + 1
    assert int(mtp_cache["length"][0]) == len(prompt) + 1


def test_spec_rejected_entries_are_overwritten():
    """A rejected draft leaves a stale cache row; the NEXT verify step
    must overwrite it — continuing from a reject stays exact-greedy."""
    from krasis_tpu.models.mtp import make_spec_decode_fn

    eng = make_engine()
    prompt = [2, 7, 2, 7]
    want = _greedy(eng, prompt, 4, spec=False).tokens

    fn = jax.jit(make_spec_decode_fn(eng.cfg, eng.quant, 1))
    eng.reset(eng._cache_len)
    logits, h_last = eng._spec_prefill_prompt(prompt)
    t1 = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    _, mtp = eng._first_draft_fn()(eng.params, t1, h_last, eng.mtp_cache)

    # step 1: force a reject (stale rows at position len(prompt)+1)
    wrong = jnp.full_like(t1, (want[1] + 1) % eng.cfg.vocab_size)[:, None]
    out = fn(eng.params, t1, wrong, eng.cache, mtp,
             *_greedy_step_args(eng))
    nxt, cache, mtp = out[3], out[5], out[6]
    assert int(nxt[0]) == want[1]
    # step 2: correct draft over the stale row — must match vanilla
    out = fn(eng.params, nxt, jnp.full_like(nxt, want[2])[:, None],
             cache, mtp, *_greedy_step_args(eng))
    ts, nc = out[0], out[2]
    assert int(nc[0, 0]) == 2
    assert int(ts[0, 0, 0]) == want[2] and int(ts[0, 0, 1]) == want[3]


def test_spec_disabled_for_hybrid_enabled_for_sampled():
    """DeltaNet models can't roll back state → no spec; sampled requests
    DO use the spec path (distribution-exact — see replay test)."""
    cfg = tiny_config("qwen3-coder-next", vocab_size=64,
                      num_nextn_predict_layers=1,
                      num_hidden_layers=4,
                      layer_types=["linear_attention", "linear_attention",
                                   "linear_attention", "full_attention"])
    eng = build_synthetic_engine(cfg, max_len=512)
    assert not eng.spec_available

    eng2 = make_engine()
    eng2.last_spec_stats = None
    res = eng2.generate([1, 2, 3], max_new_tokens=8,
                        sampling=SamplingParams(temperature=0.8),
                        stop_ids=NO_STOP)
    stats = eng2.last_spec_stats
    assert stats is not None and stats["emitted"] == len(res.tokens)


def test_spec_sampled_matches_vanilla_replay():
    """Sampled spec decode is distribution-exact: replaying the verify
    step's PRNG stream through the VANILLA decode path must reproduce the
    same sampled tokens — for both the accept and the reject branch."""
    from krasis_tpu.models.mtp import make_spec_decode_fn
    from krasis_tpu.ops.sampling import sample_batched

    eng = make_engine()
    prompt = [5, 2, 8, 1]
    B, V = eng.batch_size, eng.cfg.vocab_size
    temp = jnp.full((B,), 1.0, jnp.float32)
    topp = jnp.ones((B,), jnp.float32)
    pres = jnp.full((B,), 0.3, jnp.float32)   # exercise seen threading
    topk = jnp.zeros((B,), jnp.int32)
    K = jax.random.PRNGKey(11)
    # the verify step draws one subkey per position: key, ki = split(key)
    K1, k1 = jax.random.split(K)
    _, k2 = jax.random.split(K1)

    # vanilla replay: what sampling k1 then k2 yields step by step
    eng.reset(eng._cache_len)
    logits0, _ = eng._spec_prefill_prompt(prompt)
    tok = jnp.argmax(logits0, axis=-1).astype(jnp.int32)
    seen = jnp.zeros((B, V), jnp.bool_).at[jnp.arange(B), tok].set(True)
    vlogits1, vc = eng._decode(eng.params, tok[:, None], eng.cache)
    exp_t1 = sample_batched(k1, vlogits1, temp, topp, pres, seen, topk,
                            max_top_k=V)
    seen1 = seen.at[jnp.arange(B), exp_t1].set(True)
    vlogits2, _ = eng._decode(eng.params, exp_t1[:, None], vc)
    exp_t2 = sample_batched(k2, vlogits2, temp, topp, pres, seen1, topk,
                            max_top_k=V)

    fn = jax.jit(make_spec_decode_fn(eng.cfg, eng.quant, 1, max_top_k=V))

    def spec_step(draft_val):
        eng.reset(eng._cache_len)
        _, h_last = eng._spec_prefill_prompt(prompt)
        _, mtp = eng._first_draft_fn()(eng.params, tok, h_last,
                                       eng.mtp_cache)
        return fn(eng.params, tok, jnp.full_like(tok, draft_val)[:, None],
                  eng.cache, mtp, K, seen, temp, topp, pres, topk)

    # accept branch: draft == the token k1 will sample
    out = spec_step(int(exp_t1[0]))
    assert int(out[2][0, 0]) == 2
    assert int(out[0][0, 0, 0]) == int(exp_t1[0])
    assert int(out[0][0, 0, 1]) == int(exp_t2[0])
    # reject branch: t1 still the exact k1 sample, t2 not committed
    out = spec_step(int(exp_t1[0] + 1) % V)
    assert int(out[2][0, 0]) == 1
    assert int(out[0][0, 0, 0]) == int(exp_t1[0])
    assert int(out[3][0]) == int(exp_t1[0])


def test_spec_respects_stop_and_streaming():
    eng = make_engine()
    prompt = [9, 8, 7]
    want = _greedy(eng, prompt, 12, spec=False).tokens
    stop = want[5]
    seen = []
    eng.spec_available = True
    res = eng.generate(prompt, max_new_tokens=12,
                       sampling=SamplingParams(temperature=0.0),
                       stop_ids={stop}, on_token=seen.append)
    # emits up to and including the stop token, never past it
    idx = want.index(stop)
    assert res.tokens == want[: idx + 1]
    assert seen == res.tokens


# ---------------------------------------------------------------------------
# Scheduler-level speculative decoding
# ---------------------------------------------------------------------------

def _drain(req, timeout=300):
    toks = []
    while True:
        t = req.out_queue.get(timeout=timeout)
        if t is None:
            return toks
        toks.append(t)


def test_scheduler_spec_matches_vanilla_greedy():
    from krasis_tpu.runtime.scheduler import BatchScheduler

    eng = make_engine(max_len=256)
    ref1 = _greedy(eng, [1, 2, 3, 4, 5], 10, spec=False)
    ref2 = _greedy(eng, [9, 9, 4], 10, spec=False)

    sched = BatchScheduler(eng.cfg, eng.quant, eng.params, max_len=256,
                           num_slots=2)
    assert sched.spec
    try:
        g = SamplingParams(temperature=0.0)
        r1 = sched.submit([1, 2, 3, 4, 5], max_new_tokens=10, sampling=g,
                          stop_ids={-1})
        r2 = sched.submit([9, 9, 4], max_new_tokens=10, sampling=g,
                          stop_ids={-1})
        toks1, toks2 = _drain(r1), _drain(r2)
        assert sched.stats_spec["steps"] > 0
    finally:
        sched.shutdown()
    assert toks1 == ref1.tokens
    assert toks2 == ref2.tokens
    assert len(r1.logprobs) >= len(toks1)
    np.testing.assert_allclose(r1.logprobs[: len(toks1)],
                               ref1.logprobs, rtol=2e-2, atol=2e-2)


def test_scheduler_spec_mixed_sampling_and_reuse():
    """Sampled + greedy slots share the spec verify step; multi-turn
    prefix reuse keeps the MTP cache clamped, never wrong."""
    from krasis_tpu.runtime.scheduler import BatchScheduler

    eng = make_engine(max_len=256)
    ref = _greedy(eng, [4, 4, 2, 6], 8, spec=False)

    sched = BatchScheduler(eng.cfg, eng.quant, eng.params, max_len=256,
                           num_slots=2)
    try:
        rs = sched.submit([7, 1, 3], max_new_tokens=8,
                          sampling=SamplingParams(temperature=0.9),
                          stop_ids={-1})
        rg = sched.submit([4, 4, 2, 6], max_new_tokens=8,
                          sampling=SamplingParams(temperature=0.0),
                          stop_ids={-1})
        s_toks, g_toks = _drain(rs), _drain(rg)
        assert g_toks == ref.tokens          # greedy slot stays exact
        assert len(s_toks) == 8
        # multi-turn: second prompt extends the first → prefix reuse with
        # the clamped MTP cache; greedy continuation must stay exact
        turn2 = [4, 4, 2, 6] + ref.tokens[:3] + [5]
        ref2 = _greedy(eng, turn2, 6, spec=False)
        r3 = sched.submit(turn2, max_new_tokens=6,
                          sampling=SamplingParams(temperature=0.0),
                          stop_ids={-1})
        assert _drain(r3) == ref2.tokens
    finally:
        sched.shutdown()


# ---------------------------------------------------------------------------
# Multi-depth drafting (spec_k > 1): single-module recursion
# ---------------------------------------------------------------------------

def test_spec_depth2_equals_vanilla_greedy():
    eng = make_engine()
    eng.spec_k = 2
    prompt = [6, 1, 6, 1, 8]
    want = _greedy(eng, prompt, 40, spec=False)
    got = _greedy(eng, prompt, 40, spec=True)
    assert got.tokens == want.tokens
    stats = eng.last_spec_stats
    assert stats["emitted"] == len(got.tokens)


def test_spec_depth3_equals_vanilla_greedy_chunked():
    eng = make_engine(max_len=2048)
    eng.spec_k = 3
    eng.chunk = 128
    rng = np.random.default_rng(3)
    prompt = rng.integers(1, 60, size=200).tolist()
    want = _greedy(eng, prompt, 30, spec=False)
    got = _greedy(eng, prompt, 30, spec=True)
    assert got.tokens == want.tokens


def test_spec_depth2_full_accept_commits_three():
    """A verify step whose 2 drafts both match commits 3 tokens."""
    from krasis_tpu.models.mtp import make_spec_decode_fn

    eng = make_engine()
    prompt = [3, 1, 4, 1, 5]
    want = _greedy(eng, prompt, 4, spec=False).tokens

    fn = jax.jit(make_spec_decode_fn(eng.cfg, eng.quant, 1, k=2))
    eng.reset(eng._cache_len)
    logits, h_last = eng._spec_prefill_prompt(prompt)
    t1 = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    eng.spec_k = 2
    _, mtp = eng._first_draft_fn()(eng.params, t1, h_last, eng.mtp_cache)

    drafts = jnp.asarray([[want[1], want[2]]], jnp.int32)
    out = fn(eng.params, t1, drafts, eng.cache, mtp,
             *_greedy_step_args(eng))
    ts, nc, nxt, cache, mtpc = out[0], out[2], out[3], out[5], out[6]
    assert int(nc[0, 0]) == 3
    assert [int(ts[0, 0, j]) for j in range(3)] == want[1:4]
    assert int(nxt[0]) == want[3]
    assert int(cache["length"][0]) == len(prompt) + 3
    assert int(mtpc["length"][0]) == len(prompt) + 3

    # partial accept: first draft right, second wrong → commits 2
    eng.reset(eng._cache_len)
    _, h_last = eng._spec_prefill_prompt(prompt)
    _, mtp = eng._first_draft_fn()(eng.params, t1, h_last, eng.mtp_cache)
    drafts = jnp.asarray(
        [[want[1], (want[2] + 1) % eng.cfg.vocab_size]], jnp.int32)
    out = fn(eng.params, t1, drafts, eng.cache, mtp,
             *_greedy_step_args(eng))
    ts, nc, nxt, cache = out[0], out[2], out[3], out[5]
    assert int(nc[0, 0]) == 2
    assert [int(ts[0, 0, j]) for j in range(2)] == want[1:3]
    assert int(nxt[0]) == want[2]
    assert int(cache["length"][0]) == len(prompt) + 2


def test_scheduler_spec_depth2(monkeypatch):
    from krasis_tpu.runtime.scheduler import BatchScheduler

    monkeypatch.setenv("KRASIS_TPU_SPEC_K", "2")
    eng = make_engine(max_len=256)
    ref = _greedy(eng, [1, 2, 3, 4, 5], 10, spec=False)
    sched = BatchScheduler(eng.cfg, eng.quant, eng.params, max_len=256,
                           num_slots=2)
    assert sched.spec_k == 2
    try:
        r = sched.submit([1, 2, 3, 4, 5], max_new_tokens=10,
                         sampling=SamplingParams(temperature=0.0),
                         stop_ids={-1})
        assert _drain(r) == ref.tokens
    finally:
        sched.shutdown()


def test_spec_near_max_len_falls_back_to_vanilla():
    """The spec block's larger overshoot must never reject — or clip
    shorter than — what vanilla decode would produce."""
    eng = make_engine(vocab=32, max_len=128)
    prompt = (list(range(1, 32)) * 4)[:110]
    # vanilla room = 128-110-1-8 = 9 ≥ 5; spec room (k=1, block=8) = 1
    res = eng.generate(prompt, max_new_tokens=5,
                       sampling=SamplingParams(temperature=0.0),
                       stop_ids=NO_STOP)
    assert len(res.tokens) == 5
    assert eng.last_spec_stats is None      # routed to the vanilla path
