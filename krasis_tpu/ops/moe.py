"""MoE expert forward: routed top-k expert MLPs + shared expert.

The TPU-native re-design of the reference's expert engine
(reference src/moe.rs moe_forward_unified / flattened dispatch,
python/krasis/gpu_prefill.py fused_marlin_moe calls). Instead of the
reference's per-core rayon fan-out / Marlin GPU kernels, tokens are
sorted by expert and run through grouped (ragged) GEMMs that keep the
MXU busy on one expert's contiguous token block at a time.

Two reference paths (both XLA-composable; the Pallas grouped kernel in
ops/moe_pallas.py replaces the hot path on TPU):

* ``moe_forward_ragged`` — sort (token, expert) pairs by expert,
  ``jax.lax.ragged_dot`` over dequantized expert stacks. Best when most
  experts are hit (prefill).
* ``moe_forward_gathered`` — gather just the selected experts' quantized
  weights and run per-token small matmuls. Reads only the needed expert
  bytes (decode: k of E experts), the bandwidth-optimal access pattern.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..quant import QTensor, dequantize
from .activations import swiglu
from .qmm import linear, Weight


def _deq_stack(w, dtype):
    """Dequantize an expert stack [E, K, N] (QTensor or plain array).

    Large stacks dequantize expert-by-expert (lax.map): whole-stack
    dequant materializes an f32 [E, K/gs, gs, N] broadcast temp —
    3.9 GB/layer for GPT-OSS-20B's 32×2880×5760 stack, the allocation
    that kept that model from fitting residently on one 16 GiB chip
    (benchmarks/suite_logs/gptoss20b-q4-fit16.log). Mapping bounds the
    transient to one expert (~63 MB) while the bf16 output stack is the
    only full-size buffer; this path only serves stacks the Pallas
    kernels reject (e.g. biased GPT-OSS experts), so throughput of the
    sequential map is acceptable where correctness-of-fit matters."""
    if isinstance(w, QTensor):
        E = w.q.shape[0] if w.q.ndim >= 3 else 0
        if E > 8:
            def one(args):
                q_e, s_e = args
                return dequantize(
                    QTensor(q=q_e, scales=s_e, bits=w.bits,
                            group_size=w.group_size), dtype=dtype)
            return jax.lax.map(one, (w.q, w.scales))
        return dequantize(w, dtype=dtype)
    return w.astype(dtype)


def moe_forward_ragged(
    x: jax.Array,            # [T, H]
    w13,                     # QTensor/array [E, H, 2I]
    w2,                      # QTensor/array [E, I, H]
    topk_idx: jax.Array,     # [T, k] int32
    topk_weights: jax.Array, # [T, k] f32
    swiglu_limit: float = 0.0,
    gpt_oss: bool = False,
    w13_bias: Optional[jax.Array] = None,  # [E, 2I] (GPT-OSS)
    w2_bias: Optional[jax.Array] = None,   # [E, H]
    precision=None,
) -> jax.Array:
    T, H = x.shape
    k = topk_idx.shape[-1]
    E = w13.shape[0] if not isinstance(w13, QTensor) else w13.q.shape[0]

    flat_expert = topk_idx.reshape(-1)                       # [T*k]
    order = jnp.argsort(flat_expert)                         # stable
    x_rep = jnp.repeat(x, k, axis=0)                         # [T*k, H]
    x_sorted = jnp.take(x_rep, order, axis=0)
    group_sizes = jnp.bincount(flat_expert, length=E).astype(jnp.int32)

    w13_d = _deq_stack(w13, x.dtype)
    w2_d = _deq_stack(w2, x.dtype)

    h = jax.lax.ragged_dot(
        x_sorted, w13_d, group_sizes, precision=precision, preferred_element_type=jnp.float32
    ).astype(x.dtype)
    if w13_bias is not None:
        h = h + jnp.take(w13_bias, jnp.take(flat_expert, order), axis=0).astype(h.dtype)
    a = swiglu(h, swiglu_limit=swiglu_limit, gpt_oss=gpt_oss)
    out_sorted = jax.lax.ragged_dot(
        a, w2_d, group_sizes, precision=precision, preferred_element_type=jnp.float32
    )
    if w2_bias is not None:
        out_sorted = out_sorted + jnp.take(
            w2_bias, jnp.take(flat_expert, order), axis=0
        ).astype(out_sorted.dtype)

    # Unsort and combine with routing weights.
    out_rep = jnp.zeros_like(out_sorted).at[order].set(out_sorted)
    out = (out_rep.reshape(T, k, H) * topk_weights[..., None]).sum(axis=1)
    return out.astype(x.dtype)


def _gather_weight(w, idx: jax.Array):
    """Gather expert slices [T, k, ...] from an expert stack, keeping
    quantized storage quantized (so HBM reads only touch selected experts)."""
    if isinstance(w, QTensor):
        return QTensor(
            q=jnp.take(w.q, idx, axis=0),
            scales=jnp.take(w.scales, idx, axis=0),
            bits=w.bits,
            group_size=w.group_size,
        )
    return jnp.take(w, idx, axis=0)


def moe_forward_gathered(
    x: jax.Array,
    w13,
    w2,
    topk_idx: jax.Array,
    topk_weights: jax.Array,
    swiglu_limit: float = 0.0,
    gpt_oss: bool = False,
    w13_bias: Optional[jax.Array] = None,
    w2_bias: Optional[jax.Array] = None,
    precision=None,
) -> jax.Array:
    T, H = x.shape
    w13_g = _deq_stack(_gather_weight(w13, topk_idx), x.dtype)   # [T,k,H,2I]
    w2_g = _deq_stack(_gather_weight(w2, topk_idx), x.dtype)     # [T,k,I,H]

    h = jnp.einsum("th,tkhi->tki", x, w13_g, precision=precision, preferred_element_type=jnp.float32)
    h = h.astype(x.dtype)
    if w13_bias is not None:
        h = h + jnp.take(w13_bias, topk_idx, axis=0).astype(h.dtype)
    a = swiglu(h, swiglu_limit=swiglu_limit, gpt_oss=gpt_oss)
    out = jnp.einsum("tki,tkih->tkh", a, w2_g, precision=precision, preferred_element_type=jnp.float32)
    if w2_bias is not None:
        out = out + jnp.take(w2_bias, topk_idx, axis=0).astype(out.dtype)
    out = (out * topk_weights[..., None].astype(out.dtype)).sum(axis=1)
    return out.astype(x.dtype)


def _slice_layer(w, layer_idx):
    """Materialize one layer from a pattern-stacked weight (XLA fallback
    paths only — the Pallas kernels index the stack in-kernel)."""
    if layer_idx is None:
        return w
    if isinstance(w, QTensor):
        if w.q.ndim != 4:
            return w
        return QTensor(
            q=jax.lax.dynamic_index_in_dim(w.q, layer_idx, 0, keepdims=False),
            scales=jax.lax.dynamic_index_in_dim(
                w.scales, layer_idx, 0, keepdims=False),
            bits=w.bits, group_size=w.group_size,
        )
    if w is not None and getattr(w, "ndim", 0) >= 1 and w.ndim == 4:
        return jax.lax.dynamic_index_in_dim(w, layer_idx, 0, keepdims=False)
    return w




def use_grouped_path(T: int, k: int, E: int) -> bool:
    """Dispatch predicate: grouped (prefill) kernel vs gathered (decode).

    Decode regime = few tokens: the gathered kernels read each selected
    expert exactly once per (token, expert) pick. The grouped (prefill)
    kernel reads every expert ONCE but pads each hit expert to a full
    token tile — catastrophic at T≈1 (measured 3× decode-step blowup on
    QCN when this keyed off E instead of T).

    Crossover measured on v5e (V2-Lite E=64 k=6, batched-scheduler
    steady decode, benchmarks/probe_grouped_decode.py): at T=8 slots the
    grouped kernel wins 477 vs 312 tok/s (T·k=48 ≈ 0.75·E — most experts
    are hit anyway, so one pass over the expert stack beats re-reading
    per pick); at T=4 (T·k=24) gathered wins 255 vs 193. Threshold set
    at T·k ≥ 0.75·E. Pinned by tests/test_moe_dispatch.py."""
    return 4 * T * k >= 3 * E or T >= 64


def moe_forward(
    x: jax.Array,
    w13,
    w2,
    topk_idx: jax.Array,
    topk_weights: jax.Array,
    swiglu_limit: float = 0.0,
    gpt_oss: bool = False,
    w13_bias: Optional[jax.Array] = None,
    w2_bias: Optional[jax.Array] = None,
    precision=None,
    layer_idx=None,
    pick_valid: Optional[jax.Array] = None,
    activation: str = "bf16",
) -> jax.Array:
    """Routed MoE forward; picks the dispatch strategy by batch size
    (the TPU analog of the reference's prefill/decode threshold switch,
    reference python/krasis/layer.py:668-673). With pattern-stacked
    weights ([L, E, ...]) pass `layer_idx`; the Pallas paths index the
    stack in-kernel (no per-layer weight copy).

    `pick_valid` [T, k] marks this EP shard's local picks (see
    parallel/ep.py); invalid picks carry zero routing weight and a
    clamped local expert id, so every path is correct without it — the
    Pallas paths additionally use it to skip the remote picks' compute
    and HBM traffic."""
    T = x.shape[0]
    k = topk_idx.shape[-1]
    E = w13.q.shape[-3] if isinstance(w13, QTensor) else w13.shape[-3]
    kwargs = dict(
        swiglu_limit=swiglu_limit, gpt_oss=gpt_oss,
        w13_bias=w13_bias, w2_bias=w2_bias, precision=precision,
    )
    if use_grouped_path(T, k, E):
        from . import gmm_pallas, moe_pallas as mp

        if (
            w13_bias is None and w2_bias is None
            and gmm_pallas.available()
            and isinstance(w13, QTensor) and isinstance(w2, QTensor)
            and mp.gathered_qmm_supported(w13)
            and mp.gathered_qmm_supported(w2)
        ):
            # The grouped regime stays bf16 regardless of
            # expert_activation: the W4A8 grouped kernel
            # (gmm_pallas.gmm_a8) MEASURED SLOWER both in prefill
            # (6,280 vs 8,930 tok/s V2-Lite@2048) and in 16-slot
            # batched decode (783 vs 820 steady tok/s) — the
            # per-K-group int8 dot decomposition underutilizes the MXU
            # against one full-K bf16 dot. int8 pays only in the
            # gathered regime, where the unpack (not the MXU) binds.
            # The kernel remains available for A/B via
            # moe_prefill_pallas(activation="int8").
            return gmm_pallas.moe_prefill_pallas(
                x, w13, w2, topk_idx, topk_weights,
                swiglu_limit=swiglu_limit, gpt_oss=gpt_oss,
                layer_idx=layer_idx, pick_valid=pick_valid,
                interpret=mp.interpret_mode(),
            )
        return moe_forward_ragged(
            x, _slice_layer(w13, layer_idx), _slice_layer(w2, layer_idx),
            topk_idx, topk_weights, **kwargs)
    from . import moe_pallas  # deferred: keeps CPU-only paths pallas-free

    if w13_bias is None and w2_bias is None and moe_pallas.available():
        if activation == "int8":
            if moe_pallas.w4a8_supported(x, w13, w2):
                return moe_pallas.moe_gathered_w4a8_pallas(
                    x, w13, w2, topk_idx, topk_weights,
                    swiglu_limit=swiglu_limit, gpt_oss=gpt_oss,
                    layer_idx=layer_idx,
                    interpret=moe_pallas.interpret_mode(),
                )
            if (
                isinstance(w13, QTensor) and isinstance(w2, QTensor)
                and moe_pallas.gathered_qmm_a8_supported(w13)
                and moe_pallas.gathered_qmm_a8_supported(w2)
            ):
                # experts too big for the fused single-pick kernel
                # (e.g. V2-Lite 4.3 MB/pick): W4A8 through the N-tiled
                # kernels instead
                return moe_pallas.moe_gathered_tiled(
                    x, w13, w2, topk_idx, topk_weights,
                    swiglu_limit=swiglu_limit, gpt_oss=gpt_oss,
                    layer_idx=layer_idx, pick_valid=pick_valid,
                    interpret=moe_pallas.interpret_mode(),
                    activation="int8",
                )
        if moe_pallas.supported(x, w13, w2):
            return moe_pallas.moe_gathered_pallas(
                x, w13, w2, topk_idx, topk_weights,
                swiglu_limit=swiglu_limit, gpt_oss=gpt_oss,
                layer_idx=layer_idx,
                interpret=moe_pallas.interpret_mode(),
            )
        if (
            isinstance(w13, QTensor) and isinstance(w2, QTensor)
            and moe_pallas.gathered_qmm_supported(w13)
            and moe_pallas.gathered_qmm_supported(w2)
        ):
            return moe_pallas.moe_gathered_tiled(
                x, w13, w2, topk_idx, topk_weights,
                swiglu_limit=swiglu_limit, gpt_oss=gpt_oss,
                layer_idx=layer_idx, pick_valid=pick_valid,
                interpret=moe_pallas.interpret_mode(),
            )
    return moe_forward_gathered(
        x, _slice_layer(w13, layer_idx), _slice_layer(w2, layer_idx),
        topk_idx, topk_weights, **kwargs)


def mlp_forward(
    x: jax.Array,
    w13: Weight,              # [(L,) H, 2I]
    w2: Weight,               # [(L,) I, H]
    swiglu_limit: float = 0.0,
    gpt_oss: bool = False,
    layer_idx=None,
) -> jax.Array:
    """Dense MLP / shared expert: swiglu(x @ w13) @ w2."""
    h = linear(x, w13, layer_idx=layer_idx)
    a = swiglu(h, swiglu_limit=swiglu_limit, gpt_oss=gpt_oss)
    return linear(a, w2, layer_idx=layer_idx)
