"""The stress battery (krasis_tpu/stress_test.py) must pass end-to-end
on the tiny synthetic engine — prompts, sampling sweep (incl. greedy +
seeded determinism), contract edges (stop tokens, near-max_len, long
generation), and scheduler churn with a mid-stream cancel."""

from krasis_tpu.config import QuantConfig
from krasis_tpu.models.synthetic import build_synthetic_engine, tiny_config
from krasis_tpu.stress_test import run_all


def test_stress_battery_passes():
    cfg = tiny_config("qwen3-moe")
    quant = QuantConfig(expert_bits=4, group_size=32, kv_cache_dtype="bf16")
    engine = build_synthetic_engine(cfg, quant, max_len=1024)
    report = run_all(engine, None, max_new_tokens=48,
                     scheduler_cfg=(cfg, quant, engine.params))
    assert report["_summary"]["failed"] == [], report["_summary"]
    # the battery actually covered all four sections
    assert set(report) >= {"prompts", "sampling", "contracts", "scheduler",
                           "_summary"}
    assert report["_summary"]["total"] >= 25
