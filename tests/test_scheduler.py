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
