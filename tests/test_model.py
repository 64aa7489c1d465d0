"""End-to-end model tests on tiny synthetic configs of each family.

The backbone invariant is prefill/decode consistency (teacher forcing):
decoding token n+1 after an n-token prefill must produce the same logits
as prefilling all n+1 tokens — this exercises cache writes, masking,
rope positions, and recurrent-state handoff in one check (the reference's
test_layer_compare.py / sanity-generation tests rolled together).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from krasis_tpu.config import ModelConfig, QuantConfig, preset_config
from krasis_tpu.models.model import forward
from krasis_tpu.models.params import init_synthetic_params, layer_specs
from krasis_tpu.runtime.kv_cache import init_cache
from krasis_tpu.runtime.engine import Engine


def tiny_mla_cfg(**kw):
    return preset_config(
        "deepseek-v2-lite",
        hidden_size=64, intermediate_size=128, moe_intermediate_size=32,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=4,
        vocab_size=256, kv_lora_rank=32, qk_nope_head_dim=16,
        qk_rope_head_dim=8, v_head_dim=16,
        n_routed_experts=8, num_experts_per_tok=2, n_shared_experts=1,
        first_k_dense_replace=1,
        **kw,
    )


def tiny_gqa_cfg(**kw):
    return preset_config(
        "qwen3-moe",
        hidden_size=64, intermediate_size=128, moe_intermediate_size=32,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        vocab_size=256, head_dim=16,
        n_routed_experts=8, num_experts_per_tok=2,
        **kw,
    )


def tiny_hybrid_cfg(**kw):
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


def tiny_qwen35_cfg(**kw):
    """Qwen3.5-35B family scaled tiny (hybrid 3:1 over 4 layers)."""
    return preset_config(
        "qwen3.5-35b",
        hidden_size=64, intermediate_size=128, moe_intermediate_size=32,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        vocab_size=256, head_dim=16,
        layer_types=["linear_attention", "linear_attention",
                     "linear_attention", "full_attention"],
        linear_num_key_heads=2, linear_num_value_heads=4,
        linear_key_head_dim=16, linear_value_head_dim=16,
        n_routed_experts=8, num_experts_per_tok=2,
        shared_expert_intermediate_size=32,
        **kw,
    )


def tiny_gptoss_cfg(**kw):
    """GPT-OSS family scaled tiny: alternating sliding/full attention,
    sinks, biased projections, clamped gpt-oss activation. Window=4 so
    the sliding mask actually truncates at test lengths."""
    return preset_config(
        "gpt-oss-20b",
        hidden_size=64, intermediate_size=32, moe_intermediate_size=32,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        vocab_size=256, head_dim=16, sliding_window=4,
        layer_types=["sliding_attention", "full_attention"] * 2,
        n_routed_experts=8, num_experts_per_tok=2,
        **kw,
    )


QUANT = QuantConfig(expert_bits=4, group_size=32, kv_cache_dtype="bf16")
QUANT_FP8 = QuantConfig(expert_bits=4, group_size=32, kv_cache_dtype="fp8")


def _consistency_check(cfg, quant=QUANT, atol=0.06):
    """prefill(n) + decode(1) logits == prefill(n+1) last logits."""
    params = init_synthetic_params(cfg, quant, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    n = 9
    ids = rng.integers(0, cfg.vocab_size, size=n + 1).astype(np.int32)

    # path A: single prefill over n+1 tokens
    cache = init_cache(cfg, quant, 1, 32)
    tokens = np.zeros((1, 16), np.int32)
    tokens[0, : n + 1] = ids
    logits_a, _ = forward(
        params, jnp.asarray(tokens), jnp.asarray([n + 1]), cache,
        cfg, quant, prefill=True,
    )

    # path B: prefill n then decode token n+1
    cache = init_cache(cfg, quant, 1, 32)
    tokens_b = np.zeros((1, 16), np.int32)
    tokens_b[0, :n] = ids[:n]
    _, cache = forward(
        params, jnp.asarray(tokens_b), jnp.asarray([n]), cache,
        cfg, quant, prefill=True,
    )
    logits_b, _ = forward(
        params, jnp.asarray([[ids[n]]]), jnp.asarray([1]), cache,
        cfg, quant, prefill=False,
    )
    np.testing.assert_allclose(
        np.asarray(logits_a[0]), np.asarray(logits_b[0]), atol=atol, rtol=0.1
    )


def test_mla_prefill_decode_consistency():
    _consistency_check(tiny_mla_cfg())


def test_gqa_prefill_decode_consistency():
    _consistency_check(tiny_gqa_cfg())


def test_hybrid_prefill_decode_consistency():
    _consistency_check(tiny_hybrid_cfg())


def test_qwen35_prefill_decode_consistency():
    _consistency_check(tiny_qwen35_cfg())


def test_gptoss_prefill_decode_consistency():
    _consistency_check(tiny_gptoss_cfg())


def test_nonfactoring_pattern_fallback_runs():
    """A layer sequence whose pattern does NOT factor (5 layers, aperiodic
    hybrid mix) silently falls back to the fully-unrolled path
    (models/params.pattern_info reps=0) — VERDICT weak #9 flagged that
    nothing covered that path's viability. Run the consistency check
    through it and pin that the fallback actually triggered."""
    from krasis_tpu.models.params import pattern_info

    cfg = preset_config(
        "qwen3-coder-next",
        hidden_size=64, intermediate_size=128, moe_intermediate_size=32,
        num_hidden_layers=5, num_attention_heads=4, num_key_value_heads=2,
        vocab_size=256, head_dim=16,
        layer_types=["linear_attention", "full_attention",
                     "linear_attention", "linear_attention",
                     "full_attention"],
        linear_num_key_heads=2, linear_num_value_heads=4,
        linear_key_head_dim=16, linear_value_head_dim=16,
        n_routed_experts=8, num_experts_per_tok=2, n_shared_experts=1,
        shared_expert_intermediate_size=32,
    )
    info = pattern_info(cfg)
    assert info.reps == 0 and info.prefix_n == 5  # unrolled fallback
    _consistency_check(cfg)


def test_fp8_kv_close_to_bf16():
    """FP8 KV cache must stay close to bf16 KV (reference test_fp8_kv.py)."""
    cfg = tiny_gqa_cfg()
    params = init_synthetic_params(cfg, QUANT, jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    ids = rng.integers(0, cfg.vocab_size, size=(1, 8)).astype(np.int32)
    outs = {}
    for name, q in [("bf16", QUANT), ("fp8", QUANT_FP8)]:
        cache = init_cache(cfg, q, 1, 32)
        _, cache = forward(params, jnp.asarray(ids), jnp.asarray([8]), cache,
                           cfg, q, prefill=True)
        logits, _ = forward(params, jnp.asarray([[5]]), jnp.asarray([1]), cache,
                            cfg, q, prefill=False)
        outs[name] = np.asarray(logits)
    np.testing.assert_allclose(outs["fp8"], outs["bf16"], atol=0.15, rtol=0.2)


def test_padding_invariance():
    """Same prompt in a bigger padded buffer → same logits."""
    cfg = tiny_hybrid_cfg()
    params = init_synthetic_params(cfg, QUANT, jax.random.PRNGKey(2))
    rng = np.random.default_rng(2)
    n = 7
    ids = rng.integers(0, cfg.vocab_size, size=n).astype(np.int32)
    res = []
    for S in (8, 16):
        cache = init_cache(cfg, QUANT, 1, 32)
        tokens = np.zeros((1, S), np.int32)
        tokens[0, :n] = ids
        logits, _ = forward(params, jnp.asarray(tokens), jnp.asarray([n]), cache,
                            cfg, QUANT, prefill=True)
        res.append(np.asarray(logits))
    np.testing.assert_allclose(res[0], res[1], atol=2e-2, rtol=0.05)


def test_engine_generate_greedy_deterministic():
    cfg = tiny_gqa_cfg()
    params = init_synthetic_params(cfg, QUANT, jax.random.PRNGKey(3))
    eng = Engine(cfg, QUANT, params, max_len=64)
    r1 = eng.generate([1, 2, 3, 4, 5], max_new_tokens=8)
    r2 = eng.generate([1, 2, 3, 4, 5], max_new_tokens=8)
    assert r1.tokens == r2.tokens
    assert len(r1.tokens) >= 1
    assert r1.prompt_len == 5


def test_engine_all_logits_shape():
    cfg = tiny_mla_cfg()
    params = init_synthetic_params(cfg, QUANT, jax.random.PRNGKey(4))
    eng = Engine(cfg, QUANT, params, max_len=256)
    logits = eng.forward_all_logits(list(range(10)))
    assert logits.shape == (10, cfg.vocab_size)


def test_layer_specs_hybrid_pattern():
    cfg = preset_config("qwen3-coder-next")
    specs = layer_specs(cfg)
    assert sum(s.attn_kind == "linear_attention" for s in specs) == 36
    assert sum(s.attn_kind == "gqa" for s in specs) == 12
    assert all(s.mlp_kind == "moe" for s in specs)


def test_chunked_prefill_matches_single_shot():
    """Prefill in 3 chunks with history buckets == one-shot prefill
    (the long-context path, reference model.py:2752 token chunking)."""
    cfg = tiny_hybrid_cfg()
    params = init_synthetic_params(cfg, QUANT, jax.random.PRNGKey(5))
    rng = np.random.default_rng(5)
    n = 24
    ids = rng.integers(0, cfg.vocab_size, size=n).astype(np.int32)

    # single shot
    cache = init_cache(cfg, QUANT, 1, 64)
    logits_a, cache_a = forward(
        params, jnp.asarray(ids[None]), jnp.asarray([n]), cache,
        cfg, QUANT, prefill=True,
    )

    # chunked: 8 + 8 (hist bucket 8) + 8 (hist bucket 16)
    cache = init_cache(cfg, QUANT, 1, 64)
    _, cache = forward(params, jnp.asarray(ids[None, :8]), jnp.asarray([8]),
                       cache, cfg, QUANT, prefill=True)
    _, cache = forward(params, jnp.asarray(ids[None, 8:16]), jnp.asarray([8]),
                       cache, cfg, QUANT, prefill=True, history=8)
    logits_b, cache_b = forward(params, jnp.asarray(ids[None, 16:24]),
                                jnp.asarray([8]), cache, cfg, QUANT,
                                prefill=True, history=16)
    np.testing.assert_allclose(np.asarray(logits_a), np.asarray(logits_b),
                               atol=5e-2, rtol=0.1)

    # decode continuation from both caches must agree
    tok = jnp.asarray([[7]], jnp.int32)
    da, _ = forward(params, tok, jnp.asarray([1]), cache_a, cfg, QUANT,
                    prefill=False)
    db, _ = forward(params, tok, jnp.asarray([1]), cache_b, cfg, QUANT,
                    prefill=False)
    np.testing.assert_allclose(np.asarray(da), np.asarray(db),
                               atol=5e-2, rtol=0.1)
