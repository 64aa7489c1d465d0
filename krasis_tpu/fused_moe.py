"""Standalone fused-MoE wrapper for embedding krasis-tpu in other stacks.

Parity with the reference's minimal wrapper + SGLang bridge
(reference python/krasis/fused_moe.py:24 KrasisFusedMoE,
sglang_bridge.py:36 KrasisMoEWrapper): an external framework hands over
hidden states + routing results (or raw router logits) and gets the
routed-expert output back, with expert-ID masking for experts the host
framework computes elsewhere (mask = -1) and layer-offset support for
pipeline-parallel hosts.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .config import ModelConfig, QuantConfig
from .ops.moe import moe_forward
from .ops.routing import compute_routing
from .quant import QTensor, quantize


class KrasisTpuMoE:
    """One MoE layer's routed experts, callable from any JAX program."""

    def __init__(
        self,
        w13,                     # [E, H, 2I] array or QTensor
        w2,                      # [E, I, H]
        num_experts_per_tok: int,
        expert_bits: int = 0,    # quantize on ingest when > 0
        group_size: int = 128,
        swiglu_limit: float = 0.0,
        gpt_oss: bool = False,
    ):
        if expert_bits and not isinstance(w13, QTensor):
            w13 = quantize(jnp.asarray(w13), expert_bits, group_size)
            w2 = quantize(jnp.asarray(w2), expert_bits, group_size)
        self.w13, self.w2 = w13, w2
        self.top_k = num_experts_per_tok
        self.swiglu_limit = swiglu_limit
        self.gpt_oss = gpt_oss

    def __call__(
        self,
        hidden: jax.Array,               # [T, H]
        topk_idx: jax.Array,             # [T, k] int32; -1 = handled elsewhere
        topk_weights: jax.Array,         # [T, k] f32
    ) -> jax.Array:
        # Masked experts (-1) contribute zero: clamp the index, zero the
        # weight (reference sglang_bridge expert-ID masking).
        masked = topk_idx < 0
        idx = jnp.where(masked, 0, topk_idx)
        wts = jnp.where(masked, 0.0, topk_weights)
        return moe_forward(
            hidden, self.w13, self.w2, idx.astype(jnp.int32), wts,
            swiglu_limit=self.swiglu_limit, gpt_oss=self.gpt_oss,
        )

    def forward_routed(
        self, hidden: jax.Array, gate_w: jax.Array, cfg: ModelConfig,
        correction_bias: Optional[jax.Array] = None,
    ) -> jax.Array:
        """Fused routing + experts (reference moe.rs forward_moe_routed)."""
        r = compute_routing(hidden, gate_w, cfg, correction_bias)
        return self(hidden, r.topk_idx, r.topk_weights)
