"""Quantized attention projections (QuantConfig.attention="int8"/"int4").

The reference's CPU decode store quantizes all non-MoE weights INT4 by
default (reference decode_setup.py:49); here the same policy is opt-in
per component. Checks: params carry QTensors, forward tracks the bf16
model closely, and generation runs end-to-end for all three attention
families.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from krasis_tpu.config import QuantConfig, preset_config
from krasis_tpu.models.model import make_forward_fns
from krasis_tpu.models.params import init_synthetic_params, pattern_info
from krasis_tpu.quant import QTensor
from krasis_tpu.runtime.kv_cache import init_cache


def _cfgs():
    return {
        "gqa": preset_config(
            "qwen3-moe",
            hidden_size=64, intermediate_size=128, moe_intermediate_size=32,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
            vocab_size=256, head_dim=16,
            n_routed_experts=8, num_experts_per_tok=2,
        ),
        "mla": preset_config(
            "deepseek-v2-lite",
            hidden_size=64, intermediate_size=128, moe_intermediate_size=32,
            num_hidden_layers=2, num_attention_heads=4,
            vocab_size=256, kv_lora_rank=32, qk_nope_head_dim=32,
            qk_rope_head_dim=16, v_head_dim=32, q_lora_rank=24,
            n_routed_experts=8, num_experts_per_tok=2,
            first_k_dense_replace=0,
        ),
        "hybrid": preset_config(
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
        ),
    }


QUANT_KEYS = {
    "gqa": ["q_proj", "k_proj", "v_proj", "o_proj"],
    "mla": ["q_a_proj", "q_b_proj", "kv_a_proj", "o_proj"],
    "hybrid": ["qkvz_proj", "ba_proj", "la_out_proj"],
}

# recurrent/latent-path projections keep an int8 floor under "int4"
# (DeltaNet decay gates and the MLA latent compound weight noise)
INT8_FLOOR = {"kv_a_proj", "qkvz_proj", "ba_proj", "la_out_proj"}


def _first_layer(params, cfg):
    if params["prefix_layers"]:
        return params["prefix_layers"][0]
    return params["pattern"][0]


@pytest.mark.parametrize("family", ["gqa", "mla", "hybrid"])
@pytest.mark.parametrize("mode", ["int8", "int4"])
def test_attention_quant_forward(family, mode):
    cfg = _cfgs()[family]
    base = QuantConfig(expert_bits=8, group_size=32, kv_cache_dtype="bf16",
                       shared_expert="bf16", dense_mlp="bf16", lm_head="bf16")
    qat = QuantConfig(expert_bits=8, group_size=32, kv_cache_dtype="bf16",
                      shared_expert="bf16", dense_mlp="bf16", lm_head="bf16",
                      attention=mode)

    # same rng key → identical pre-quantization weights
    p_bf = init_synthetic_params(cfg, base, jax.random.PRNGKey(7))
    p_q = init_synthetic_params(cfg, qat, jax.random.PRNGKey(7))

    lp = _first_layer(p_q, cfg)
    for k in QUANT_KEYS[family]:
        if k in lp:
            assert isinstance(lp[k], QTensor), f"{k} not quantized"
            want = 8 if (mode == "int8" or k in INT8_FLOOR) else 4
            assert lp[k].bits == want, (k, lp[k].bits, want)
    # w_kc/w_vc/norms/conv must stay dense
    for k in ("w_kc", "w_vc", "input_norm", "conv_w"):
        if k in lp:
            assert not isinstance(lp[k], QTensor)

    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 8)), jnp.int32)
    seq_lens = jnp.full((1,), 8, jnp.int32)

    prefill, decode, _ = make_forward_fns(cfg, base)
    ref, ref_cache = jax.jit(prefill)(
        p_bf, tokens, seq_lens, init_cache(cfg, base, 1, 32))
    out, cache = jax.jit(prefill)(
        p_q, tokens, seq_lens, init_cache(cfg, qat, 1, 32))

    ref, out = np.asarray(ref), np.asarray(out)
    assert np.all(np.isfinite(out))
    # quantized projections track bf16 within a few percent of the
    # logit scale (tiny model, gs=32)
    scale = np.abs(ref).max() + 1e-6
    tol = 0.08 if mode == "int8" else 0.35
    assert np.abs(out - ref).max() / scale < tol

    nxt = jnp.argmax(out, -1).astype(jnp.int32)[:, None]
    dec, _ = jax.jit(decode)(p_q, nxt, cache)
    assert np.all(np.isfinite(np.asarray(dec)))
