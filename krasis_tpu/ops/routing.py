"""MoE router: scoring, top-k selection, and weight normalization.

Reproduces every routing variant the reference supports
(reference python/krasis/layer.py:526-560, src/decode.rs:4088
moe_route_score_topk, src/moe.rs:3050-3295 forward_moe_routed):

* softmax scoring (DeepSeek V2, Qwen3) — topk over softmax probs;
* sigmoid scoring + e_score_correction_bias (DeepSeek V3 / Kimi):
  selection uses ``sigmoid(logits) + bias`` but the combine weights are the
  *unbiased* sigmoid scores;
* group-limited routing (DeepSeek V3 ``noaux_tc``): experts are grouped,
  only the top ``topk_group`` groups (by sum of their top-2 scores) are
  eligible;
* norm_topk_prob: renormalize the selected weights to sum to 1;
* GPT-OSS: topk over raw logits, then softmax over just the k logits;
* routed_scaling_factor applied to final weights.

Router matmul runs in float32 (routing is precision-critical; the
reference keeps gate weights FP32, decode.rs:181-190).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..config import ModelConfig


class RoutingResult(NamedTuple):
    topk_idx: jax.Array      # [T, k] int32
    topk_weights: jax.Array  # [T, k] float32


def compute_routing(
    x: jax.Array,                    # [T, H]
    gate_w: jax.Array,               # [H, E] (stored transposed for x @ w)
    cfg: ModelConfig,
    correction_bias: Optional[jax.Array] = None,  # [E] f32 (DeepSeek V3)
    logit_bias: Optional[jax.Array] = None,       # [E] f32 (GPT-OSS router.bias)
) -> RoutingResult:
    # Router matmul in true f32 (HIGHEST): routing is precision-critical and
    # tiny; the reference keeps gate weights FP32 (decode.rs:181-190).
    logits = jnp.dot(
        x.astype(jnp.float32), gate_w.astype(jnp.float32),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )  # [T, E]
    if logit_bias is not None:
        logits = logits + logit_bias.astype(jnp.float32)
    k = cfg.num_experts_per_tok
    E = cfg.n_routed_experts

    if cfg.scoring_func == "sigmoid":
        scores = jax.nn.sigmoid(logits)
    elif cfg.moe_router_softmax_after_topk:
        scores = logits  # GPT-OSS: select on raw logits, softmax after topk
    else:
        scores = jax.nn.softmax(logits, axis=-1)

    select = scores
    if correction_bias is not None:
        select = scores + correction_bias.astype(jnp.float32)

    if cfg.n_group > 1 and cfg.topk_group > 0:
        # Group-limited: score each group by the sum of its top-2 experts,
        # keep only experts in the top `topk_group` groups.
        T = select.shape[0]
        grouped = select.reshape(T, cfg.n_group, E // cfg.n_group)
        top2 = jax.lax.top_k(grouped, 2)[0].sum(axis=-1)          # [T, G]
        _, top_groups = jax.lax.top_k(top2, cfg.topk_group)        # [T, tg]
        group_mask = (
            jax.nn.one_hot(top_groups, cfg.n_group, dtype=jnp.float32).sum(axis=1) > 0
        )
        expert_mask = jnp.repeat(group_mask, E // cfg.n_group, axis=-1)
        # HF zero-fills masked experts (not -inf): with sigmoid+bias scores
        # that can go negative this changes edge-case selections — match it
        # (HF DeepseekV3TopkRouter.get_topk_indices masked_fill 0.0).
        select = jnp.where(expert_mask, select, 0.0)

    _, topk_idx = jax.lax.top_k(select, k)
    topk_idx = topk_idx.astype(jnp.int32)

    if cfg.moe_router_softmax_after_topk:
        topk_logits = jnp.take_along_axis(logits, topk_idx, axis=-1)
        weights = jax.nn.softmax(topk_logits, axis=-1)
    else:
        # Combine weights come from the UNBIASED scores.
        weights = jnp.take_along_axis(scores, topk_idx, axis=-1)
        if cfg.norm_topk_prob:
            weights = weights / (weights.sum(axis=-1, keepdims=True) + 1e-20)

    weights = weights * cfg.routed_scaling_factor
    return RoutingResult(topk_idx, weights.astype(jnp.float32))
