"""Continuous-batching scheduler: concurrent requests complete correctly
and match single-sequence engine output (greedy)."""

import queue

import jax
import numpy as np
import pytest

from krasis_tpu.config import QuantConfig, preset_config
from krasis_tpu.models.params import init_synthetic_params
from krasis_tpu.ops.sampling import SamplingParams
from krasis_tpu.runtime.engine import Engine
from krasis_tpu.runtime.scheduler import BatchScheduler


@pytest.fixture(scope="module")
def setup():
    cfg = preset_config(
        "qwen3-moe",
        hidden_size=64, intermediate_size=128, moe_intermediate_size=32,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        vocab_size=256, head_dim=16,
        n_routed_experts=8, num_experts_per_tok=2,
    )
    quant = QuantConfig(expert_bits=4, group_size=32, kv_cache_dtype="bf16")
    params = init_synthetic_params(cfg, quant, jax.random.PRNGKey(0))
    return cfg, quant, params


def _drain(req, timeout=300):
    toks = []
    while True:
        t = req.out_queue.get(timeout=timeout)
        if t is None:
            return toks
        toks.append(t)


def test_scheduler_single_matches_engine(setup):
    cfg, quant, params = setup
    greedy = SamplingParams(temperature=0.0)
    eng = Engine(cfg, quant, params, max_len=256)
    ref = eng.generate([1, 2, 3, 4, 5], max_new_tokens=6,
                       sampling=greedy, stop_ids={-1})

    sched = BatchScheduler(cfg, quant, params, max_len=256, num_slots=2)
    try:
        req = sched.submit([1, 2, 3, 4, 5], max_new_tokens=6,
                           sampling=greedy, stop_ids={-1})
        toks = _drain(req)
    finally:
        sched.shutdown()
    assert toks == ref.tokens


def test_scheduler_concurrent_requests(setup):
    cfg, quant, params = setup
    greedy = SamplingParams(temperature=0.0)
    sched = BatchScheduler(cfg, quant, params, max_len=256, num_slots=2)
    try:
        reqs = [
            sched.submit([10 + i, 20 + i, 30 + i], max_new_tokens=5,
                         sampling=greedy, stop_ids={-1})
            for i in range(4)  # 4 requests > 2 slots: queueing exercised
        ]
        outs = [_drain(r) for r in reqs]
    finally:
        sched.shutdown()
    assert all(len(o) == 5 for o in outs)

    # each request's output must equal its solo run (batch isolation)
    eng = Engine(cfg, quant, params, max_len=256)
    for i, o in enumerate(outs):
        ref = eng.generate([10 + i, 20 + i, 30 + i], max_new_tokens=5,
                           sampling=greedy, stop_ids={-1})
        assert o == ref.tokens, f"request {i} diverged"


def test_decode_interleaves_with_chunked_admission(setup):
    """Active slots must keep emitting tokens BETWEEN prefill chunks of a
    new admission (VERDICT round-1 item 6: no multi-second decode hiccup
    per admission)."""
    import queue as queue_mod

    cfg, quant, params = setup
    sch = BatchScheduler(cfg, quant, params, max_len=256, num_slots=2)
    try:
        sch.chunk = 8   # tiny chunks so a 64-token prompt = 8 chunks
        a = sch.submit(list(range(1, 5)), max_new_tokens=200,
                       sampling=SamplingParams(temperature=0.0))
        # wait for A's first token (admitted, decoding)
        first = a.out_queue.get(timeout=120)
        assert first is not None

        b = sch.submit(list(range(1, 65)), max_new_tokens=4,
                       sampling=SamplingParams(temperature=0.0))
        b_first = b.out_queue.get(timeout=120)
        assert b_first is not None
        # by the time B got its first token, A must have kept decoding
        a_during = 0
        try:
            while True:
                t = a.out_queue.get_nowait()
                if t is None:
                    break
                a_during += 1
        except queue_mod.Empty:
            pass
        assert a_during >= 1, (
            "decode stalled during chunked admission "
            f"(A emitted {a_during} tokens while B prefilled 8 chunks)")
        a.cancelled.set()
    finally:
        sch.shutdown()


def test_cancellation_mid_prefill_frees_slot(setup):
    """A disconnect during a long chunked prefill stops the admission at
    the next chunk boundary and the slot is reusable."""
    cfg, quant, params = setup
    sch = BatchScheduler(cfg, quant, params, max_len=256, num_slots=1)
    try:
        sch.chunk = 8
        c = sch.submit(list(range(1, 65)), max_new_tokens=4)
        import time as _t
        _t.sleep(0.05)          # let a chunk or two run
        c.cancelled.set()
        # end-of-stream sentinel, no guarantee of tokens
        end = c.out_queue.get(timeout=120)
        while end is not None:
            end = c.out_queue.get(timeout=120)
        # the slot must be free again: a new request completes
        d = sch.submit([1, 2, 3], max_new_tokens=3,
                       sampling=SamplingParams(temperature=0.0))
        toks = []
        while True:
            t = d.out_queue.get(timeout=120)
            if t is None:
                break
            toks.append(t)
        assert len(toks) >= 1
    finally:
        sch.shutdown()


def test_prefix_reuse_multiturn_chat(setup):
    """Multi-turn chat pattern: turn 2 re-sends turn 1's whole prompt
    plus new text. The scheduler must resume prefill after the shared
    prefix (prefix_reused_tokens > 0) and produce EXACTLY the tokens a
    fresh scheduler gives for the full prompt (greedy)."""
    cfg, quant, params = setup
    greedy = SamplingParams(temperature=0.0)
    turn1 = [(i * 7) % 250 + 1 for i in range(40)]
    turn2 = turn1 + [(i * 11) % 250 + 1 for i in range(24)]

    fresh = BatchScheduler(cfg, quant, params, max_len=256, num_slots=1)
    try:
        want = _drain(fresh.submit(turn2, max_new_tokens=6,
                                   sampling=greedy, stop_ids={-1}))
    finally:
        fresh.shutdown()

    sch = BatchScheduler(cfg, quant, params, max_len=256, num_slots=1)
    try:
        sch.chunk = 16  # several chunks per turn at this scale
        _drain(sch.submit(turn1, max_new_tokens=4,
                          sampling=greedy, stop_ids={-1}))
        assert sch.stats["prefix_reused_tokens"] == 0
        got = _drain(sch.submit(turn2, max_new_tokens=6,
                                sampling=greedy, stop_ids={-1}))
        assert sch.stats["prefix_reused_tokens"] == len(turn1)
    finally:
        sch.shutdown()
    assert got == want


def test_prefix_reuse_hybrid_deltanet():
    """Prefix reuse must carry the DeltaNet recurrent/conv state
    correctly (the state at the reuse point IS the prefix state)."""
    cfg = preset_config(
        "qwen3-coder-next",
        hidden_size=64, intermediate_size=128, moe_intermediate_size=32,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        vocab_size=256, head_dim=16,
        layer_types=["linear_attention", "linear_attention",
                     "linear_attention", "full_attention"],
        linear_num_key_heads=2, linear_num_value_heads=4,
        linear_key_head_dim=16, linear_value_head_dim=16,
        n_routed_experts=8, num_experts_per_tok=2,
        shared_expert_intermediate_size=32,
    )
    quant = QuantConfig(expert_bits=4, group_size=32, kv_cache_dtype="bf16")
    params = init_synthetic_params(cfg, quant, jax.random.PRNGKey(0))
    greedy = SamplingParams(temperature=0.0)
    turn1 = [(i * 5) % 250 + 1 for i in range(30)]
    turn2 = turn1 + [(i * 13) % 250 + 1 for i in range(18)]

    fresh = BatchScheduler(cfg, quant, params, max_len=128, num_slots=1)
    try:
        want = _drain(fresh.submit(turn2, max_new_tokens=5,
                                   sampling=greedy, stop_ids={-1}))
    finally:
        fresh.shutdown()

    sch = BatchScheduler(cfg, quant, params, max_len=128, num_slots=1)
    try:
        sch.chunk = 16
        _drain(sch.submit(turn1, max_new_tokens=3,
                          sampling=greedy, stop_ids={-1}))
        got = _drain(sch.submit(turn2, max_new_tokens=5,
                                sampling=greedy, stop_ids={-1}))
        assert sch.stats["prefix_reused_tokens"] == len(turn1)
    finally:
        sch.shutdown()
    assert got == want


def test_prefix_reuse_not_applied_on_mismatch(setup):
    """A different prompt (or a shorter one) must NOT reuse the cache."""
    cfg, quant, params = setup
    greedy = SamplingParams(temperature=0.0)
    sch = BatchScheduler(cfg, quant, params, max_len=256, num_slots=1)
    try:
        _drain(sch.submit([1, 2, 3, 4, 5, 6], max_new_tokens=3,
                          sampling=greedy, stop_ids={-1}))
        # mismatching continuation
        got = _drain(sch.submit([1, 2, 9, 9, 9, 9, 9], max_new_tokens=3,
                                sampling=greedy, stop_ids={-1}))
        assert sch.stats["prefix_reused_tokens"] == 0
        # shorter prompt (prefix of the cache) must also run fresh
        got2 = _drain(sch.submit([1, 2], max_new_tokens=3,
                                 sampling=greedy, stop_ids={-1}))
        assert sch.stats["prefix_reused_tokens"] == 0
    finally:
        sch.shutdown()

    eng = Engine(cfg, quant, params, max_len=256)
    ref = eng.generate([1, 2, 9, 9, 9, 9, 9], max_new_tokens=3,
                       sampling=greedy, stop_ids={-1})
    assert got == ref.tokens
    ref2 = eng.generate([1, 2], max_new_tokens=3,
                        sampling=greedy, stop_ids={-1})
    assert got2 == ref2.tokens


def test_admission_oom_retry_halves_chunk(setup):
    """Engine-parity failure handling: an HBM OOM during an admission's
    prefill restarts that admission with half the chunk size; the
    request still completes with the correct greedy output."""
    cfg, quant, params = setup
    greedy = SamplingParams(temperature=0.0)
    eng = Engine(cfg, quant, params, max_len=256)
    want = eng.generate([3, 1, 4, 1, 5, 9, 2, 6], max_new_tokens=4,
                        sampling=greedy, stop_ids={-1}).tokens

    sch = BatchScheduler(cfg, quant, params, max_len=256, num_slots=1)
    try:
        sch.chunk = 256
        real_prefill = sch._prefill
        state = {"failed": False}

        def failing_prefill(*a, **k):
            if not state["failed"]:
                state["failed"] = True
                raise RuntimeError("RESOURCE_EXHAUSTED: fake HBM OOM")
            return real_prefill(*a, **k)

        sch._prefill = failing_prefill
        got = _drain(sch.submit([3, 1, 4, 1, 5, 9, 2, 6], max_new_tokens=4,
                                sampling=greedy, stop_ids={-1}))
        assert state["failed"] and sch.chunk == 128
    finally:
        sch.shutdown()
    assert got == want


def test_slots_benchmark_mode(setup):
    """benchmark.run_slots_benchmark: the reproducible tooling form of
    the aggregate-throughput measurement (structure + token counts)."""
    from krasis_tpu.benchmark import run_slots_benchmark

    cfg, quant, params = setup
    res = run_slots_benchmark(cfg, quant, params, slots_list=(1, 2),
                              max_len=256, prompt_len=32,
                              decode_tokens=8, decode_block=4)
    assert set(res) == {"1", "2"}
    assert res["1"]["total_tok"] == 8
    assert res["2"]["total_tok"] == 16
    for v in res.values():
        assert v["agg_tok_s"] > 0 and v["wall_s"] > 0


def test_logprobs_opt_in_same_tokens(setup):
    """Logprobs are per-request opt-in (OpenAI semantics): the fast
    no-logprob block must emit the SAME greedy tokens, with zero
    logprobs; a want_logprobs request gets real (<0) values."""
    cfg, quant, params = setup
    greedy = SamplingParams(temperature=0.0)
    sched = BatchScheduler(cfg, quant, params, max_len=256, num_slots=2)
    try:
        r0 = sched.submit([4, 5, 6], max_new_tokens=6, sampling=greedy,
                          stop_ids={-1})
        t0 = _drain(r0)
        assert all(lp == 0.0 for lp in r0.logprobs[1:])  # fast variant
        r1 = sched.submit([4, 5, 6], max_new_tokens=6, sampling=greedy,
                          stop_ids={-1}, want_logprobs=True)
        t1 = _drain(r1)
        assert t0 == t1
        assert any(lp < 0.0 for lp in r1.logprobs)
    finally:
        sched.shutdown()

    eng = Engine(cfg, quant, params, max_len=256)
    a = eng.generate([4, 5, 6], max_new_tokens=6, sampling=greedy,
                     stop_ids={-1})
    b = eng.generate([4, 5, 6], max_new_tokens=6, sampling=greedy,
                     stop_ids={-1}, want_logprobs=False)
    assert a.tokens == b.tokens == t0
    assert any(lp < 0.0 for lp in a.logprobs)
    assert all(lp == 0.0 for lp in b.logprobs[1:])
