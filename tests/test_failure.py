"""Failure-detection parity (SURVEY §5 'Failure detection / recovery'):
HBM-OOM prefill retry with chunk halving (reference model.py:2613) and
the host-RAM watchdog (reference model.py:1536)."""

import threading
import time

import numpy as np
import pytest

from krasis_tpu.config import QuantConfig
from krasis_tpu.models.synthetic import build_synthetic_engine, tiny_config
from krasis_tpu.ops.sampling import SamplingParams
from krasis_tpu.runtime.engine import _is_oom
from krasis_tpu.syscheck import mem_available_gb, start_ram_watchdog


class FakeOOM(RuntimeError):
    pass


def _engine():
    cfg = tiny_config("qwen3-moe")
    return build_synthetic_engine(
        cfg, QuantConfig(expert_bits=4, group_size=32, kv_cache_dtype="bf16"),
        max_len=256,
    ), cfg


def test_is_oom_classifier():
    assert _is_oom(FakeOOM("RESOURCE_EXHAUSTED: Out of memory allocating"))
    assert _is_oom(RuntimeError("Out of memory while trying to allocate"))
    assert not _is_oom(ValueError("shape mismatch"))


def test_prefill_oom_retry_halves_chunk():
    eng, cfg = _engine()
    prompt = list(np.random.default_rng(0).integers(
        0, cfg.vocab_size, size=40))
    greedy = SamplingParams(temperature=0.0)
    ref = eng.generate(prompt, max_new_tokens=8, sampling=greedy,
                       stop_ids={-1}).tokens

    eng2, _ = _engine()
    real_prefill = eng2._prefill
    calls = {"n": 0}

    def flaky(*a, **k):
        calls["n"] += 1
        if calls["n"] == 1:
            raise FakeOOM("RESOURCE_EXHAUSTED: out of memory on device")
        return real_prefill(*a, **k)

    eng2._prefill = flaky
    out = eng2.generate(prompt, max_new_tokens=8, sampling=greedy,
                        stop_ids={-1}).tokens
    assert calls["n"] >= 2              # retried
    assert eng2.chunk == 1024           # halved from 2048
    assert out == ref                   # identical result after retry


def test_prefill_non_oom_propagates():
    eng, cfg = _engine()

    def boom(*a, **k):
        raise ValueError("not an oom")

    eng._prefill = boom
    with pytest.raises(ValueError):
        eng.generate([1, 2, 3], max_new_tokens=2,
                     sampling=SamplingParams(temperature=0.0))


def test_ram_watchdog_fires_and_stops():
    fired = threading.Event()
    vals = []

    def on_low(avail):
        vals.append(avail)
        fired.set()

    # threshold above any real machine's RAM → fires on first poll
    stop = start_ram_watchdog(min_free_gb=1e9, interval_s=0.01,
                              on_low=on_low)
    assert fired.wait(timeout=5.0)
    assert vals and vals[0] < 1e9
    stop()

    # sane threshold on a healthy box → does not fire
    fired2 = threading.Event()
    stop2 = start_ram_watchdog(min_free_gb=0.0, interval_s=0.01,
                               on_low=lambda a: fired2.set())
    time.sleep(0.1)
    stop2()
    assert not fired2.is_set()
    assert mem_available_gb() > 0
