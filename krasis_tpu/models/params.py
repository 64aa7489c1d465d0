"""Parameter schema + synthetic initialization.

Parameters are plain nested dicts (pytrees) of jax Arrays / QTensors, one
dict per layer, so the whole model jits and shards uniformly. The schema
covers every architecture the reference supports (SURVEY §2.2):

* attention kinds: ``mla`` (DeepSeek/Kimi, optional q-LoRA), ``gqa``
  (Qwen3 / Qwen3-235B / GPT-OSS sliding+sinks; optional per-head output
  gate for Qwen3-Next), ``linear_attention`` (Gated DeltaNet);
* mlp kinds: ``moe`` (routed experts + optional (gated) shared expert +
  per-expert biases for GPT-OSS) and ``dense``.

``init_synthetic_params`` builds a full random-weight model directly in
quantized form — the TPU analog of the reference's xorshift fake-weight
benchmark graph (reference src/decode.rs:4480 fake_transposed_weight) —
so engines can be built and benchmarked from a config alone.
"""

from __future__ import annotations

from typing import Any, Dict, List, NamedTuple

import jax
import jax.numpy as jnp

from ..config import ModelConfig, QuantConfig
from ..quant import QTensor, quantize, random_qtensor


class LayerSpec(NamedTuple):
    """Static per-layer structure (not traced)."""
    attn_kind: str      # "mla" | "gqa" | "linear_attention"
    sliding: bool       # sliding-window attention (GPT-OSS)
    mlp_kind: str       # "moe" | "dense"


def layer_specs(cfg: ModelConfig) -> List[LayerSpec]:
    specs = []
    for i in range(cfg.num_hidden_layers):
        lt = cfg.layer_type(i)
        if lt == "linear_attention":
            attn = "linear_attention"
            sliding = False
        else:
            attn = cfg.attention_type
            sliding = lt == "sliding_attention"
        mlp = "moe" if cfg.layer_is_moe(i) else "dense"
        specs.append(LayerSpec(attn, sliding, mlp))
    return specs


def _maybe_quant(w: jax.Array, mode: str, group_size: int):
    if mode == "bf16":
        return w.astype(jnp.bfloat16)
    bits = {"int8": 8, "int4": 4}[mode]
    return quantize(w, bits=bits, group_size=group_size)


def init_synthetic_params(
    cfg: ModelConfig,
    quant: QuantConfig,
    key: jax.Array,
    dtype=jnp.bfloat16,
) -> Dict[str, Any]:
    """Random parameters with the exact production layout/dtypes."""
    H = cfg.hidden_size
    gs = quant.group_size
    keys = iter(jax.random.split(key, 16 + 8 * cfg.num_hidden_layers))

    def rnd(shape, scale=0.02, dt=dtype):
        return (jax.random.normal(next(keys), shape, jnp.float32) * scale).astype(dt)

    params: Dict[str, Any] = {
        "embed": rnd((cfg.vocab_size, H)),
        "final_norm": jnp.zeros((H,), dtype) if cfg.norm_plus_one else jnp.ones((H,), dtype),
        "lm_head": _maybe_quant(
            rnd((H, cfg.vocab_size), dt=jnp.float32), quant.lm_head, gs
        ),
        "layers": [],
    }

    ones = lambda n: (jnp.zeros if cfg.norm_plus_one else jnp.ones)((n,), dtype)

    for i, spec in enumerate(layer_specs(cfg)):
        lp: Dict[str, Any] = {"input_norm": ones(H), "post_norm": ones(H)}

        if spec.attn_kind == "gqa":
            d = cfg.qk_head_dim
            hq, hkv = cfg.num_attention_heads, cfg.num_key_value_heads
            gated = cfg.model_type in ("qwen3_next", "qwen3_5_moe_text")
            lp["q_proj"] = rnd((H, hq * d * (2 if gated else 1)))
            lp["k_proj"] = rnd((H, hkv * d))
            lp["v_proj"] = rnd((H, hkv * d))
            lp["o_proj"] = rnd((hq * d, H))
            if cfg.attention_bias:
                lp["q_bias"] = jnp.zeros((hq * d * (2 if gated else 1),), dtype)
                lp["k_bias"] = jnp.zeros((hkv * d,), dtype)
                lp["v_bias"] = jnp.zeros((hkv * d,), dtype)
                lp["o_bias"] = jnp.zeros((H,), dtype)
            if cfg.qk_norm:
                lp["q_norm"] = ones(d)
                lp["k_norm"] = ones(d)
            if cfg.model_type == "gpt_oss":
                lp["sinks"] = jnp.zeros((hq,), jnp.float32)
        elif spec.attn_kind == "mla":
            hq = cfg.num_attention_heads
            dn, dr = cfg.qk_nope_head_dim, cfg.qk_rope_head_dim
            L, dv = cfg.kv_lora_rank, cfg.v_head_dim
            if cfg.q_lora_rank:
                lp["q_a_proj"] = rnd((H, cfg.q_lora_rank))
                lp["q_a_norm"] = jnp.ones((cfg.q_lora_rank,), dtype)
                lp["q_b_proj"] = rnd((cfg.q_lora_rank, hq * (dn + dr)))
            else:
                lp["q_proj"] = rnd((H, hq * (dn + dr)))
            lp["kv_a_proj"] = rnd((H, L + dr))
            lp["kv_a_norm"] = jnp.ones((L,), dtype)
            lp["w_kc"] = rnd((hq, dn, L))
            lp["w_vc"] = rnd((hq, L, dv))
            lp["o_proj"] = rnd((hq * dv, H))
        else:  # linear_attention
            hk, hv = cfg.linear_num_key_heads, cfg.linear_num_value_heads
            dk, dv = cfg.linear_key_head_dim, cfg.linear_value_head_dim
            key_dim, value_dim = hk * dk, hv * dv
            conv_dim = 2 * key_dim + value_dim
            lp["qkvz_proj"] = rnd((H, 2 * key_dim + 2 * value_dim))
            lp["ba_proj"] = rnd((H, 2 * hv))
            lp["conv_w"] = rnd((conv_dim, cfg.linear_conv_kernel_dim), scale=0.2)
            lp["dt_bias"] = jnp.ones((hv,), jnp.float32)
            lp["a_log"] = jnp.zeros((hv,), jnp.float32)
            lp["la_norm"] = jnp.ones((dv,), dtype)  # gated norm: plain weight
            lp["la_out_proj"] = rnd((value_dim, H))

        if spec.mlp_kind == "moe":
            E, I = cfg.n_routed_experts, cfg.moe_intermediate_size
            lp["gate_w"] = rnd((H, E), dt=jnp.float32)
            if cfg.has_router_bias:
                lp["gate_bias"] = jnp.zeros((E,), jnp.float32)
            k13, k2 = jax.random.split(next(keys))
            lp["w13"] = random_qtensor(k13, (E, H, 2 * I), quant.expert_bits, gs)
            lp["w2"] = random_qtensor(k2, (E, I, H), quant.expert_bits, gs)
            if cfg.model_type == "gpt_oss":
                lp["w13_bias"] = jnp.zeros((E, 2 * I), jnp.float32)
                lp["w2_bias"] = jnp.zeros((E, H), jnp.float32)
            if cfg.n_shared_experts > 0:
                Is = cfg.shared_expert_intermediate_size or (
                    cfg.moe_intermediate_size * cfg.n_shared_experts
                )
                lp["shared_w13"] = _maybe_quant(
                    rnd((H, 2 * Is), dt=jnp.float32), quant.shared_expert, gs
                )
                lp["shared_w2"] = _maybe_quant(
                    rnd((Is, H), dt=jnp.float32), quant.shared_expert, gs
                )
                if cfg.model_type in ("qwen3_next", "qwen3_5_moe_text"):
                    lp["shared_gate_w"] = rnd((H, 1))
        else:
            I = cfg.intermediate_size
            lp["mlp_w13"] = _maybe_quant(rnd((H, 2 * I), dt=jnp.float32), quant.dense_mlp, gs)
            lp["mlp_w2"] = _maybe_quant(rnd((I, H), dt=jnp.float32), quant.dense_mlp, gs)

        params["layers"].append(lp)
    return params


def param_bytes(params) -> int:
    """Total parameter bytes (for budget reporting)."""
    leaves = jax.tree_util.tree_leaves(params)
    return sum(x.size * x.dtype.itemsize for x in leaves)
