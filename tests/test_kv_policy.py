"""auto KV-dtype policy resolution (runtime/kv_cache.resolve_kv_quant)."""

import jax.numpy as jnp
import pytest

from krasis_tpu.config import QuantConfig, preset_config
from krasis_tpu.runtime.kv_cache import (
    init_cache, kv_bytes_per_token, resolve_kv_quant)


def _mla_cfg():
    return preset_config("deepseek-v2-lite")


def test_auto_resolves_bf16_when_fits(monkeypatch):
    cfg = _mla_cfg()
    q = resolve_kv_quant(cfg, QuantConfig(kv_cache_dtype="auto"), 1, 4096)
    assert q.kv_cache_dtype == "bf16"


def test_auto_resolves_fp8_when_over_budget(monkeypatch):
    monkeypatch.setenv("KRASIS_TPU_KV_BYTES", str(1 << 20))  # 1 MiB
    cfg = _mla_cfg()
    q = resolve_kv_quant(cfg, QuantConfig(kv_cache_dtype="auto"), 1, 4096)
    assert q.kv_cache_dtype == "fp8"


def test_explicit_dtype_untouched():
    cfg = _mla_cfg()
    for d in ("fp8", "bf16"):
        q = resolve_kv_quant(cfg, QuantConfig(kv_cache_dtype=d), 64, 65536)
        assert q.kv_cache_dtype == d


def test_boundary_exact_budget(monkeypatch):
    cfg = _mla_cfg()
    need = 2 * 128 * kv_bytes_per_token(cfg, 2)  # bf16 bytes for B=2,S=128
    monkeypatch.setenv("KRASIS_TPU_KV_BYTES", str(need))
    q = resolve_kv_quant(cfg, QuantConfig(kv_cache_dtype="auto"), 2, 128)
    assert q.kv_cache_dtype == "bf16"          # <= budget keeps bf16
    monkeypatch.setenv("KRASIS_TPU_KV_BYTES", str(need - 1))
    q = resolve_kv_quant(cfg, QuantConfig(kv_cache_dtype="auto"), 2, 128)
    assert q.kv_cache_dtype == "fp8"


def test_init_cache_resolves_auto(monkeypatch):
    cfg = preset_config(
        "deepseek-v2-lite",
        hidden_size=64, intermediate_size=128, moe_intermediate_size=32,
        num_hidden_layers=2, num_attention_heads=4,
        vocab_size=256, kv_lora_rank=32, qk_nope_head_dim=32,
        qk_rope_head_dim=16, v_head_dim=32, q_lora_rank=None,
        n_routed_experts=8, num_experts_per_tok=2, n_shared_experts=1,
        first_k_dense_replace=1,
    )
    cache = init_cache(cfg, QuantConfig(kv_cache_dtype="auto"), 1, 32)
    assert cache["prefix_layers"][0]["kv"].dtype == jnp.bfloat16
    monkeypatch.setenv("KRASIS_TPU_KV_BYTES", "1")
    cache = init_cache(cfg, QuantConfig(kv_cache_dtype="auto"), 1, 32)
    assert cache["prefix_layers"][0]["kv"].dtype == jnp.float8_e4m3fn
