"""HBM budget model vs measured reality (reference vram_budget parity).

The strongest anchor available on this box: the XLA compile OOM measured
on 2026-08-17 — V2-Lite @ Q8 needed 15.80 GB against the v5e's 15.75 GB
usable HBM (benchmarks/suite_logs/v2lite-q8.log), while Q4 runs with
gigabytes to spare. The analytic model must reproduce that split, or the
launcher's refuse-to-start / EP-shard planning is lying to users.
"""

import pytest

from krasis_tpu.budget import compute_budget
from krasis_tpu.config import QuantConfig, preset_config

V5E_HBM = int(15.75 * 2**30)


def _fits(name, quant, n_chips=1, hbm=V5E_HBM, margin_frac=0.10, tp=False):
    cfg = preset_config(name)
    rep = compute_budget(cfg, quant)
    need = rep.per_chip(n_chips, tp_shard_attention=tp)
    # leave headroom for activations/compiler scratch like the launcher
    return need < hbm * (1 - margin_frac), need


def test_v2lite_q4_fits_one_chip():
    ok, need = _fits("deepseek-v2-lite", QuantConfig(expert_bits=4))
    assert ok, f"Q4 should fit with room: {need/2**30:.2f} GiB"


def test_v2lite_q8_does_not_fit_one_chip():
    # measured: compile OOM at 15.80/15.75 GB (suite_logs/v2lite-q8.log)
    ok, need = _fits("deepseek-v2-lite", QuantConfig(expert_bits=8),
                     margin_frac=0.0)
    assert not ok or need > 0.85 * V5E_HBM, (
        f"budget model says Q8 comfortably fits ({need/2**30:.2f} GiB) "
        "but the chip measured an OOM at this config"
    )


def test_v2lite_q8_fits_two_chips():
    ok, need = _fits("deepseek-v2-lite", QuantConfig(expert_bits=8),
                     n_chips=2)
    assert ok, f"Q8 over ep=2 should fit: {need/2**30:.2f} GiB"


@pytest.mark.parametrize("name,chips,tp", [
    ("qwen3-coder-next", 8, False),  # BASELINE north star: QCN-80B on v5e-8
    # 235B needs TP-sharded attention too: 12.5 GiB of BF16 attention
    # would otherwise replicate onto every chip
    ("qwen3-235b", 16, True),
])
def test_big_models_fit_their_pods(name, chips, tp):
    ok, need = _fits(name, QuantConfig(expert_bits=4), n_chips=chips, tp=tp)
    assert ok, f"{name} @ Q4 on {chips} chips: {need/2**30:.2f} GiB/chip"


def test_qcn_does_not_fit_one_chip():
    ok, need = _fits("qwen3-coder-next", QuantConfig(expert_bits=4))
    assert not ok, "an 80B model cannot fit one 16 GB chip"
