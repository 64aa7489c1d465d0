"""Full-model forward: prefill and decode step functions.

TPU-native unification of the reference's split engines: where krasis runs
prefill on GPU Marlin kernels and decode in a Rust CPU graph
(reference python/krasis/model.py:2167 forward, src/decode.rs:2690
decode_step), here ONE jitted function family serves both — prefill is the
large-batch path, decode the batch=B single-token path — over the same
quantized weights in HBM (SURVEY §7 architecture stance).

Layer graph (reference python/krasis/layer.py):
    h += attn(rms_norm(h));  h += mlp(rms_norm(h))
with attn ∈ {MLA absorbed, GQA (qk-norm / gated / sinks / sliding),
Gated DeltaNet} and mlp ∈ {routed MoE + shared expert, dense MLP}.

Variable lengths are handled with masks over statically-shaped caches;
padded query positions are masked out of attention-cache validity and of
the DeltaNet recurrence (β=0, g=0 ⇒ state unchanged).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from ..config import ModelConfig, QuantConfig
from ..ops.attention import attend, build_mask, mla_absorbed_attention
from ..ops.deltanet import (
    DeltaNetDims,
    causal_conv,
    fix_qkvz_ordering,
    gated_delta_rule_chunked,
    gated_delta_rule_recurrent,
)
from ..ops.moe import mlp_forward, moe_forward
from ..quant import QTensor
from ..ops.norm import gated_rms_norm, rms_norm
from ..ops.qmm import linear
from ..ops.routing import compute_routing
from ..ops.rope import apply_rope, rope_cos_sin, yarn_softmax_scale
from ..ops import flash_attention as fa
from .params import layer_specs, pattern_info


def _attend_dispatch(
    q, kk, vv, q_off, kv_len, scale, window=0, sinks=None
):
    """Pick flash kernel (TPU, prefill-scale) or XLA masked attention.

    q [B,Sq,H,D]; kk/vv [B,Skv,Hkv,D*] with kv positions = arange(Skv).
    """
    B, Sq = q.shape[:2]
    if fa.available() and Sq >= 128:
        return fa.flash_attention(
            q, kk, vv, q_off, kv_len, scale, window=window, sinks=sinks
        )
    positions = q_off[:, None] + jnp.arange(Sq)[None, :]
    mask = build_mask(positions, jnp.arange(kk.shape[1]), kv_len, window=window)
    return attend(q, kk, vv, mask, scale, sinks=sinks)


def _gqa_attention(
    lp: Dict[str, Any],
    lc: Dict[str, Any],
    x: jax.Array,          # [B, S, H] normed input
    positions: jax.Array,  # [B, S]
    kv_len: jax.Array,     # [B] total valid tokens incl. this call's
    cfg: ModelConfig,
    spec,
    prefill: bool,
    history: int = 0,
    lidx=None,             # traced layer index when lc leaves are stacked
) -> Tuple[jax.Array, Dict[str, Any]]:
    B, S, H = x.shape
    d = cfg.qk_head_dim
    hq, hkv = cfg.num_attention_heads, cfg.num_key_value_heads
    gated = cfg.model_type in ("qwen3_next", "qwen3_5_moe_text")

    q = linear(x, lp["q_proj"], layer_idx=lp.get("_layer_idx"))
    if "q_bias" in lp:
        q = q + lp["q_bias"].astype(q.dtype)
    if gated:
        q = q.reshape(B, S, hq, 2 * d)
        q, gate = q[..., :d], q[..., d:]
        gate = gate.reshape(B, S, hq * d)
    else:
        q = q.reshape(B, S, hq, d)
        gate = None
    k = linear(x, lp["k_proj"], layer_idx=lp.get("_layer_idx"))
    v = linear(x, lp["v_proj"], layer_idx=lp.get("_layer_idx"))
    if "k_bias" in lp:
        k = k + lp["k_bias"].astype(k.dtype)
        v = v + lp["v_bias"].astype(v.dtype)
    k = k.reshape(B, S, hkv, d)
    v = v.reshape(B, S, hkv, d)

    if cfg.qk_norm:
        q = rms_norm(q, lp["q_norm"], cfg.rms_norm_eps, plus_one=cfg.norm_plus_one)
        k = rms_norm(k, lp["k_norm"], cfg.rms_norm_eps, plus_one=cfg.norm_plus_one)

    rot = int(d * cfg.partial_rotary_factor)
    cos, sin = rope_cos_sin(positions, rot, cfg.rope_theta, cfg.rope_scaling)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)

    # Cache is kernel-layout [B, Hkv, S, Dp] with the minor dim
    # lane-padded (runtime/kv_cache.py); scatter the chunk's K/V in.
    # In decode the PATTERN cache arrives STACKED [L, B, Hkv, S, Dp] with
    # `lidx` traced: scattering/attending on the whole stack keeps XLA
    # from materializing a per-layer cache slice every step (the scan
    # must never dynamic-slice a stacked cache — profiled ~6 ms/tok).
    kdt = lc["k"].dtype
    Dp = lc["k"].shape[-1]
    pad = ((0, 0), (0, 0), (0, 0), (0, Dp - d))
    bidx = jnp.arange(B)[:, None]
    if lidx is None:
        new_k = lc["k"].at[bidx, :, positions].set(jnp.pad(k, pad).astype(kdt))
        new_v = lc["v"].at[bidx, :, positions].set(jnp.pad(v, pad).astype(kdt))
    else:
        new_k = lc["k"].at[lidx, bidx, :, positions].set(
            jnp.pad(k, pad).astype(kdt))
        new_v = lc["v"].at[lidx, bidx, :, positions].set(
            jnp.pad(v, pad).astype(kdt))
    new_lc = {"k": new_k, "v": new_v}

    window = cfg.sliding_window if spec.sliding else 0
    q_off = positions[:, 0]
    scale = d ** -0.5
    if not prefill and fa.decode_available():
        # Decode straight over the fp8 cache: only kv_len-bounded blocks
        # are fetched, nothing is upcast outside the kernel.
        out = fa.decode_attention(
            jnp.pad(q, pad), new_k, new_v, kv_len, scale,
            window=window, sinks=lp.get("sinks"), layer=lidx,
        )[..., :d]
    elif prefill and history == 0:
        # First-chunk prefill: attend within the freshly projected
        # chunk (cache holds nothing older); avoids reading the cache.
        out = _attend_dispatch(
            q, k, v, q_off, kv_len, scale, window=window,
            sinks=lp.get("sinks"),
        )
    elif prefill and fa.available() and S >= 128:
        # Chunked prefill: flash over the fp8 cache prefix IN PLACE
        # (kernel layout + in-kernel upcast — no bf16 copy of history).
        out = fa.flash_attention(
            jnp.pad(q, pad), new_k[:, :, : history + S],
            new_v[:, :, : history + S], q_off, kv_len, scale,
            window=window, sinks=lp.get("sinks"), kv_layout="bhsd",
        )[..., :d]
    else:
        # XLA fallback (CPU tests / tiny chunks / decode w/o Pallas):
        # transpose the needed prefix back to [B, S, Hkv, D].
        kl, vl = new_k, new_v
        if lidx is not None:
            kl = jax.lax.dynamic_index_in_dim(kl, lidx, 0, keepdims=False)
            vl = jax.lax.dynamic_index_in_dim(vl, lidx, 0, keepdims=False)
        upto = history + S if prefill else kl.shape[2]
        kk = kl[:, :, :upto, :d].transpose(0, 2, 1, 3).astype(q.dtype)
        vv = vl[:, :, :upto, :d].transpose(0, 2, 1, 3).astype(q.dtype)
        out = _attend_dispatch(
            q, kk, vv, q_off, kv_len, scale, window=window,
            sinks=lp.get("sinks"),
        )
    out = out.reshape(B, S, hq * d)
    if gate is not None:
        out = out * jax.nn.sigmoid(gate.astype(jnp.float32)).astype(out.dtype)
    o = linear(out, lp["o_proj"], layer_idx=lp.get("_layer_idx"))
    if "o_bias" in lp:
        o = o + lp["o_bias"].astype(o.dtype)
    return o, new_lc


def _mla_attention(
    lp, lc, x, positions, kv_len, cfg: ModelConfig, prefill: bool,
    history: int = 0, lidx=None,
) -> Tuple[jax.Array, Dict[str, Any]]:
    B, S, H = x.shape
    hq = cfg.num_attention_heads
    dn, dr = cfg.qk_nope_head_dim, cfg.qk_rope_head_dim
    L = cfg.kv_lora_rank

    if "q_a_proj" in lp:
        qa = rms_norm(linear(x, lp["q_a_proj"], layer_idx=lp.get("_layer_idx")), lp["q_a_norm"], cfg.rms_norm_eps)
        q = linear(qa, lp["q_b_proj"], layer_idx=lp.get("_layer_idx"))
    else:
        q = linear(x, lp["q_proj"], layer_idx=lp.get("_layer_idx"))
    q = q.reshape(B, S, hq, dn + dr)
    q_nope, q_pe = q[..., :dn], q[..., dn:]

    kv_a = linear(x, lp["kv_a_proj"], layer_idx=lp.get("_layer_idx"))  # [B, S, L + dr]
    ckv = rms_norm(kv_a[..., :L], lp["kv_a_norm"], cfg.rms_norm_eps)
    kpe = kv_a[..., L:]

    cos, sin = rope_cos_sin(positions, dr, cfg.rope_theta, cfg.rope_scaling)
    # DeepSeek checkpoints store rope dims pair-interleaved (HF modeling
    # de-interleaves before rotation).
    q_pe = apply_rope(q_pe, cos, sin, interleaved=True)
    kpe = apply_rope(kpe[:, :, None, :], cos, sin, interleaved=True)[:, :, 0, :]

    kv_row = jnp.concatenate([ckv, kpe], axis=-1)   # [B, S, L + dr]
    # Cache is kernel-layout [B, 1, S, Dp], Dp = lane_pad(L + dr);
    # stacked [L, B, 1, S, Dp] with traced `lidx` in decode (see
    # _gqa_attention layout comment).
    kdt = lc["kv"].dtype
    Dp = lc["kv"].shape[-1]
    rpad = ((0, 0), (0, 0), (0, Dp - (L + dr)))
    bidx = jnp.arange(B)[:, None]
    row = jnp.pad(kv_row, rpad)[:, :, None, :].astype(kdt)
    if lidx is None:
        new_kv = lc["kv"].at[bidx, :, positions].set(row)
    else:
        new_kv = lc["kv"].at[lidx, bidx, :, positions].set(row)
    new_lc = {"kv": new_kv}

    scale = yarn_softmax_scale((dn + dr) ** -0.5, cfg.rope_scaling)

    # Absorbed MQA form: q_eff = q_nope @ w_kc joins q_pe against the
    # single-"head" [ckv ; kpe] key and ckv value (attention.py docstring).
    q_eff = jnp.einsum(
        "bshd,hdl->bshl", q_nope.astype(jnp.float32),
        lp["w_kc"].astype(jnp.float32),
    ).astype(x.dtype)
    q_cat = jnp.concatenate([q_eff, q_pe.astype(x.dtype)], axis=-1)
    q_off = positions[:, 0]
    qpad = ((0, 0), (0, 0), (0, 0), (0, Dp - (L + dr)))

    if not prefill and fa.decode_available():
        # Decode reads the fp8 cache directly: blocks past kv_len are
        # never fetched, V is the latent prefix of K — no full-cache
        # astype, step cost scales with kv_len not the cache bucket
        # (reference attention.py:320-337 used-pages-only read).
        ctx = fa.decode_attention(
            jnp.pad(q_cat, qpad), new_kv, None, kv_len, scale,
            v_from_k=True, v_dim=L, layer=lidx,
        )
    elif prefill and history == 0:
        k_cat = kv_row[:, :, None, :]
        ctx = _attend_dispatch(
            q_cat, k_cat, k_cat[..., :L], q_off, kv_len, scale
        )
    elif prefill and fa.available() and S >= 128:
        # Chunked prefill: flash straight over the fp8 cache prefix in
        # kernel layout — no bf16 history copy, V = latent prefix of K.
        ctx = fa.flash_attention(
            jnp.pad(q_cat, qpad), new_kv[:, :, : history + S], None,
            q_off, kv_len, scale, v_from_k=True, v_dim=L,
            kv_layout="bhsd",
        )
    else:
        kvl = new_kv
        if lidx is not None:
            kvl = jax.lax.dynamic_index_in_dim(kvl, lidx, 0, keepdims=False)
        upto = history + S if prefill else kvl.shape[2]
        att = kvl[:, 0, :upto, : L + dr].astype(x.dtype)
        k_cat = att[:, :, None, :]
        ctx = _attend_dispatch(q_cat, k_cat, k_cat[..., :L], q_off, kv_len, scale)
    out = jnp.einsum(
        "bshl,hlv->bshv", ctx.astype(jnp.float32),
        lp["w_vc"].astype(jnp.float32),
    ).astype(x.dtype)  # [B, S, hq, dv]
    return linear(out.reshape(B, S, -1), lp["o_proj"],
                  layer_idx=lp.get("_layer_idx")), new_lc


def _la_attention(
    lp, lc, x, valid: jax.Array, cfg: ModelConfig, prefill: bool,
    spec: bool = False,
) -> Tuple[jax.Array, Dict[str, Any]]:
    """Gated DeltaNet layer. `valid` [B,S] masks padded query positions.

    `spec=True` (speculative verify step, models/mtp.py /
    models/spec_ngram.py): outputs are computed as usual, but the
    recurrent state and conv window are NOT advanced — the layer stashes
    the small per-token replay inputs (post-conv k/v, decay, beta, and
    the raw conv inputs) in the returned cache instead. Once the verify
    step knows each row's committed token count, `la_spec_commit`
    replays exactly that prefix onto the state (bit-identical to having
    decoded those tokens one at a time — rejected drafts never touch
    the recurrence, the invariant KV models get for free from length
    masking)."""
    B, S, H = x.shape
    dims = DeltaNetDims(
        cfg.linear_num_key_heads, cfg.linear_num_value_heads,
        cfg.linear_key_head_dim, cfg.linear_value_head_dim,
        cfg.linear_conv_kernel_dim,
    )
    qkvz = linear(x, lp["qkvz_proj"], layer_idx=lp.get("_layer_idx"))
    ba = linear(x, lp["ba_proj"], layer_idx=lp.get("_layer_idx"))
    q, k, v, z, b, a = fix_qkvz_ordering(qkvz, ba, dims)

    mixed = jnp.concatenate(
        [q.reshape(B, S, -1), k.reshape(B, S, -1), v.reshape(B, S, -1)], axis=-1
    )
    # Zero padded inputs so they don't pollute the conv window.
    mixed = jnp.where(valid[..., None], mixed, 0)
    conv_out, _ = causal_conv(mixed, lp["conv_w"], lc["conv"])
    Kc = dims.conv_kernel
    if not spec:
        # New conv state = last K-1 *valid* inputs per row
        # (right-padding aware).
        hist = jnp.concatenate(
            [lc["conv"].astype(mixed.dtype), mixed], axis=1)
        n_valid = valid.sum(axis=-1)  # [B]
        def take_window(row_hist, n):
            return jax.lax.dynamic_slice_in_dim(row_hist, n, Kc - 1, axis=0)
        new_conv = jax.vmap(take_window)(hist, n_valid).astype(
            lc["conv"].dtype)

    kd, vd = dims.key_dim, dims.value_dim
    qc = conv_out[..., :kd].reshape(B, S, dims.num_k_heads, dims.head_k_dim)
    kc = conv_out[..., kd : 2 * kd].reshape(B, S, dims.num_k_heads, dims.head_k_dim)
    vc = conv_out[..., 2 * kd :].reshape(B, S, dims.num_v_heads, dims.head_v_dim)

    beta = jax.nn.sigmoid(b.astype(jnp.float32))
    g = -jnp.exp(lp["a_log"]) * jax.nn.softplus(a.astype(jnp.float32) + lp["dt_bias"])
    # Padded tokens must not advance the recurrence: β=0 (no write), g=0 (no decay).
    beta = jnp.where(valid[..., None], beta, 0.0)
    g = jnp.where(valid[..., None], g, 0.0)

    if prefill:
        import os

        fast = fa.available() and not os.environ.get("KRASIS_TPU_LA_F32")
        core, new_state = gated_delta_rule_chunked(
            qc, kc, vc, g, beta, lc["state"], fast=fast
        )
    else:
        core, new_state = gated_delta_rule_recurrent(
            qc, kc, vc, g, beta, lc["state"]
        )

    core = gated_rms_norm(
        core.astype(x.dtype), z, lp["la_norm"], cfg.rms_norm_eps, plus_one=False
    )
    out = linear(core.reshape(B, S, -1), lp["la_out_proj"],
                 layer_idx=lp.get("_layer_idx"))
    if spec:
        # State/conv stay at the pre-window values; la_spec_commit
        # advances them by each row's committed prefix after the verify.
        return out, {
            "state": lc["state"], "conv": lc["conv"],
            "p_k": kc, "p_v": vc, "p_g": g, "p_b": beta, "p_x": mixed,
        }
    return out, {"state": new_state, "conv": new_conv}


def la_spec_commit(cache: Dict[str, Any], ncommit: jax.Array) -> Dict[str, Any]:
    """Advance every DeltaNet layer's state/conv by each row's committed
    token count after a speculative verify step (see _la_attention
    spec=True). `ncommit` [B] ∈ [1, S]. Returns the cache with the
    replay stash (p_*) consumed — same tree structure as a non-spec
    cache, so the spec scan carry stays static. No-op for caches without
    DeltaNet layers."""
    from ..ops.deltanet import delta_state_update

    def commit_lc(lc):
        if "p_k" not in lc:
            return lc
        state, px = lc["state"], lc["p_x"]
        # leading dims incl. batch: (B,) or (reps, B) pattern stacking
        lead = state.shape[:-3]
        S = px.shape[-2]
        nc = jnp.broadcast_to(ncommit, lead).reshape(-1)
        # collapse any leading pattern-rep dims into the batch dim;
        # flat(t, nd) returns an nd-dim array keeping the last nd-1 dims
        flat = lambda t, nd: t.reshape((-1,) + t.shape[t.ndim - (nd - 1):])
        mask = jnp.arange(S)[None, :] < nc[:, None]          # [N, S]
        g = jnp.where(mask[..., None], flat(lc["p_g"], 3), 0.0)
        b = jnp.where(mask[..., None], flat(lc["p_b"], 3), 0.0)
        new_state = delta_state_update(
            flat(lc["p_k"], 4), flat(lc["p_v"], 4), g, b, flat(state, 4)
        ).reshape(state.shape)
        # conv window: last K-1 inputs ending at the committed prefix —
        # identical op order to the non-spec path (concat → slice → cast)
        conv = lc["conv"]
        Kc1 = conv.shape[-2]
        hist = jnp.concatenate(
            [flat(conv, 3).astype(px.dtype), flat(px, 3)], axis=1)
        def take_window(row_hist, n):
            return jax.lax.dynamic_slice_in_dim(row_hist, n, Kc1, axis=0)
        new_conv = jax.vmap(take_window)(hist, nc).astype(
            conv.dtype).reshape(conv.shape)
        return {"state": new_state, "conv": new_conv}

    return {
        "prefix_layers": [commit_lc(lc) for lc in cache["prefix_layers"]],
        "pattern": [commit_lc(lc) for lc in cache["pattern"]],
        "length": cache["length"],
    }


def _offload_moe(offload, x2d: jax.Array, topk_idx: jax.Array,
                 topk_weights: jax.Array, layer: jax.Array) -> jax.Array:
    """Routed-expert sublayer computed on the HOST against RAM-resident
    weights (offload.HostExpertStore) via pure_callback — the offload
    tier's decode path (the reference's CPU-expert regime, src/moe.rs;
    see krasis_tpu/offload.py). Ships [T,H] bf16 down, [T,H] f32 back;
    expert weights never touch HBM."""
    import numpy as np

    T, H = x2d.shape

    def host(layer_, x_, idx_, w_):
        return offload.forward(
            int(layer_), np.asarray(x_), np.asarray(idx_), np.asarray(w_)
        ).astype(np.float32)

    out = jax.pure_callback(
        host, jax.ShapeDtypeStruct((T, H), jnp.float32),
        layer, x2d, topk_idx, topk_weights,
    )
    return out.astype(x2d.dtype)


def _mlp(lp, x2d: jax.Array, cfg: ModelConfig, spec, mesh=None,
         activation: str = "bf16", sp_axis=None, ep_axis=None,
         offload=None, prefill: bool = True) -> jax.Array:
    gpt_oss = cfg.model_type == "gpt_oss"

    if sp_axis is not None:
        # Sequence-parallel prefill (parallel/sp.py): activations arrive
        # REPLICATED; this shard computes the MLP — where prefill FLOPs
        # live — for its token slice only, then all_gathers the outputs.
        # Routing is per-token, so it moves inside the slice.
        n = jax.lax.axis_size(sp_axis)
        rows = x2d.shape[0]
        if n > 1 and rows % n == 0:
            r = jax.lax.axis_index(sp_axis)
            loc = jax.lax.dynamic_slice_in_dim(x2d, r * (rows // n),
                                               rows // n)
            out_loc = _mlp(lp, loc, cfg, spec, mesh=None,
                           activation=activation, sp_axis=None,
                           ep_axis=ep_axis, prefill=prefill)
            return jax.lax.all_gather(out_loc, sp_axis, axis=0, tiled=True)
        # fall through: tiny chunks that don't split run replicated

    if spec.mlp_kind == "dense":
        return mlp_forward(
            x2d, lp["mlp_w13"], lp["mlp_w2"],
            swiglu_limit=cfg.swiglu_limit, gpt_oss=gpt_oss,
            layer_idx=lp.get("_layer_idx"),
        )
    routing = compute_routing(
        x2d, lp["gate_w"], cfg, lp.get("gate_bias"),
        logit_bias=lp.get("gate_logit_bias"),
    )
    if offload is not None and "w13" not in lp:
        # Host-RAM experts (offload tier): routing/shared expert stay on
        # device; the routed sublayer runs on the host — except picks
        # that hit the HBM hot-expert cache (offload.build_hot_params,
        # the reference's HCS split: GPU-hot + CPU-cold in parallel,
        # gpu_prefill.py:3198).
        idx, wts = routing.topk_idx, routing.topk_weights
        hot_out = 0.0
        if "hot_w13" in lp:
            remap = lp["hot_remap"]            # [E] (rep-sliced)
            hot_local = jnp.take(remap, idx, axis=0)
            hot_valid = hot_local >= 0
            hot_out = moe_forward(
                x2d, lp["hot_w13"], lp["hot_w2"],
                jnp.where(hot_valid, hot_local, 0),
                jnp.where(hot_valid, wts, 0.0),
                swiglu_limit=cfg.swiglu_limit, gpt_oss=gpt_oss,
                w13_bias=lp.get("hot_w13_bias"),
                w2_bias=lp.get("hot_w2_bias"),
                layer_idx=lp.get("_layer_idx"), pick_valid=hot_valid,
            )
            idx = jnp.where(hot_valid, -1, idx)
            wts = jnp.where(hot_valid, 0.0, wts)
        out = hot_out + _offload_moe(offload, x2d, idx, wts,
                                     lp["_abs_layer"])
        return _mlp_shared(lp, x2d, cfg, gpt_oss, out)
    # Folded shared experts (models/params.fold_shared_experts): the
    # stack carries n_virt extra always-picked virtual experts beyond
    # cfg.n_routed_experts — detected STATICALLY from the stack shape.
    # Taken in EVERY decode graph on the unsharded path (the decision
    # keys on `prefill`, which is static per compiled graph, NOT on T:
    # a T-dependent rule made the spec verify step — T=k+1 — and the
    # vanilla step — T=1 — compute shared with different kernels, which
    # broke greedy spec exactness on near-tie logits). moe_forward still
    # picks grouped vs gathered for the extended picks by T; both
    # kernels read the same virtual-expert bytes. Prefill and mesh
    # paths keep the dense shared matmul below — computing from the
    # SAME quantized values the virtual experts are sliced from.
    w13_stack = lp.get("w13")
    E_stack = (w13_stack.q.shape[-3] if isinstance(w13_stack, QTensor)
               else (w13_stack.shape[-3] if w13_stack is not None else 0))
    n_virt = E_stack - cfg.n_routed_experts if w13_stack is not None else 0
    if (n_virt > 0 and not prefill and mesh is None and ep_axis is None
            and not gpt_oss):
        T = x2d.shape[0]
        sh_idx = jnp.broadcast_to(
            jnp.arange(cfg.n_routed_experts, E_stack, dtype=jnp.int32),
            (T, n_virt))
        if "shared_gate_w" in lp:
            sg = jax.nn.sigmoid(
                linear(x2d, lp["shared_gate_w"]).astype(jnp.float32))
            sh_wts = jnp.broadcast_to(sg, (T, n_virt))
        else:
            sh_wts = jnp.ones((T, n_virt), routing.topk_weights.dtype)
        idx = jnp.concatenate([routing.topk_idx, sh_idx], axis=1)
        wts = jnp.concatenate(
            [routing.topk_weights, sh_wts.astype(routing.topk_weights.dtype)],
            axis=1)
        return moe_forward(
            x2d, lp["w13"], lp["w2"], idx, wts,
            swiglu_limit=cfg.swiglu_limit, gpt_oss=gpt_oss,
            layer_idx=lp.get("_layer_idx"), activation=activation,
        )

    from ..parallel.ep import (
        ep_supported, moe_forward_ep, moe_forward_ep_local,
    )

    if ep_axis is not None:
        # Ambient-shard_map EP (parallel/sp.py sp×ep composition): the
        # expert leaves arriving here are already THIS shard's slice.
        return _mlp_shared(lp, x2d, cfg, gpt_oss, moe_forward_ep_local(
            x2d, lp["w13"], lp["w2"], routing.topk_idx,
            routing.topk_weights, axis=ep_axis,
            swiglu_limit=cfg.swiglu_limit, gpt_oss=gpt_oss,
            w13_bias=lp.get("w13_bias"), w2_bias=lp.get("w2_bias"),
            layer_idx=lp.get("_layer_idx"), activation=activation,
        ))
    if ep_supported(mesh, lp["w13"], lp["w2"]):
        # Explicit EP: shard_map over the expert axis so the Pallas
        # kernels run on each shard's local expert slice (GSPMD cannot
        # partition their scalar-prefetch index maps).
        out = moe_forward_ep(
            x2d, lp["w13"], lp["w2"], routing.topk_idx, routing.topk_weights,
            mesh=mesh, swiglu_limit=cfg.swiglu_limit, gpt_oss=gpt_oss,
            w13_bias=lp.get("w13_bias"), w2_bias=lp.get("w2_bias"),
            layer_idx=lp.get("_layer_idx"), activation=activation,
        )
    else:
        out = moe_forward(
            x2d, lp["w13"], lp["w2"], routing.topk_idx, routing.topk_weights,
            swiglu_limit=cfg.swiglu_limit, gpt_oss=gpt_oss,
            w13_bias=lp.get("w13_bias"), w2_bias=lp.get("w2_bias"),
            layer_idx=lp.get("_layer_idx"), activation=activation,
        )
    return _mlp_shared(lp, x2d, cfg, gpt_oss, out)


def _mlp_shared(lp, x2d, cfg, gpt_oss, out):
    """Add the (replicated) shared-expert contribution to a routed-MoE
    output."""
    if "shared_w13" in lp:
        shared = mlp_forward(x2d, lp["shared_w13"], lp["shared_w2"],
                             layer_idx=lp.get("_layer_idx"))
        if "shared_gate_w" in lp:
            sg = jax.nn.sigmoid(
                linear(x2d, lp["shared_gate_w"]).astype(jnp.float32)
            )
            shared = shared * sg.astype(shared.dtype)
        out = out + shared
    return out


def forward(
    params: Dict[str, Any],
    tokens: jax.Array,     # [B, S] int32
    seq_lens: jax.Array,   # [B] valid new tokens per row (<= S)
    cache: Dict[str, Any],
    cfg: ModelConfig,
    quant: QuantConfig,
    prefill: bool,
    return_all_logits: bool = False,
    history: int = 0,
    mesh=None,
    sp_axis=None,
    ep_axis=None,
    return_hidden: bool = False,
    spec_la: bool = False,
    offload=None,
) -> Tuple[jax.Array, Dict[str, Any]]:
    """One forward pass over `tokens`, updating `cache`.

    `history` (static): cache-prefix bucket visible to this prefill chunk
    (0 = first chunk; attention reads cache[:, :history+S]).

    Returns (logits, new_cache). logits: [B, V] at each row's last valid
    token, or [B, S, V] when return_all_logits (perplexity path,
    reference model.py forward(..., return_all_logits=True)).
    With return_hidden, returns (logits, hidden, new_cache) where hidden
    is the final-norm output at ALL positions [B, S, H] — the MTP
    module's `previous_hidden_states` input (models/mtp.py).
    """
    B, S = tokens.shape
    length = cache["length"]                       # [B] tokens already cached
    positions = length[:, None] + jnp.arange(S)[None, :]
    valid = jnp.arange(S)[None, :] < seq_lens[:, None]
    kv_len = length + seq_lens

    x = jnp.take(params["embed"], tokens, axis=0)  # [B, S, H] bf16
    specs = layer_specs(cfg)
    info = pattern_info(cfg)

    layer_step = make_layer_step(
        cfg, prefill=prefill, history=history, mesh=mesh,
        positions=positions, valid=valid, kv_len=kv_len,
        # prefill stays bf16: the grouped W4A8 kernel (gmm_pallas.gmm_a8)
        # MEASURED SLOWER there — 6,280 vs 8,930 tok/s V2-Lite@2048 —
        # because the per-K-group int8 dot decomposition (16× [128,gs]
        # matmuls per tile) underutilizes the MXU against one full-K
        # bf16 dot; int8's 2× peak doesn't survive the split. The
        # gathered decode regime keeps int8 (there the unpack, not the
        # MXU, is the bottleneck).
        activation=(quant.expert_activation if not prefill else "bf16"),
        sp_axis=sp_axis, ep_axis=ep_axis, spec_la=spec_la, offload=offload,
    )

    new_prefix = []
    for i, lp in enumerate(params["prefix_layers"]):
        if offload is not None:
            lp = {**lp, "_abs_layer": jnp.int32(i)}
        x, new_lc = layer_step(x, lp, cache["prefix_layers"][i], specs[i])
        new_prefix.append(new_lc)

    new_pattern = cache["pattern"]
    if info.reps:
        pat_specs = specs[info.prefix_n : info.prefix_n + info.period]
        x, new_pattern = run_pattern_scan(
            x, params["pattern"], cache["pattern"], pat_specs,
            info.reps, layer_step, prefill, prefix_n=info.prefix_n,
        )

    x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps, cfg.norm_plus_one)
    hidden = x  # [B, S, H] post-final-norm

    if not return_all_logits:
        idx = jnp.maximum(seq_lens - 1, 0)
        x = jnp.take_along_axis(x, idx[:, None, None], axis=1)[:, 0]  # [B, H]
    logits = linear(x, params["lm_head"], out_dtype=jnp.float32)

    new_cache = {
        "prefix_layers": new_prefix,
        "pattern": new_pattern,
        "length": kv_len,
    }
    if return_hidden:
        return logits, hidden, new_cache
    return logits, new_cache


def make_layer_step(
    cfg: ModelConfig, *, prefill: bool, history: int, mesh,
    positions: jax.Array, valid: jax.Array, kv_len: jax.Array,
    activation: str = "bf16", sp_axis=None, ep_axis=None,
    spec_la: bool = False, offload=None,
):
    """Build the per-layer step closure (norm → attention → norm → MLP).

    Factored out of `forward` so the pipeline-parallel path
    (parallel/pp.py) can run the identical layer computation inside its
    shard_map stage workers."""
    from ..timing import TIMING

    def layer_step(x, lp, lc, spec, lidx=None):
        if TIMING.diag:
            # reference KRASIS_DIAG: per-layer activation RMS is the main
            # numerical debugging signal (layer.py:618-652)
            jax.debug.print(
                "[diag] {kind} in_rms={r:.4f}",
                kind=spec.attn_kind,
                r=jnp.sqrt(jnp.mean(jnp.square(x.astype(jnp.float32)))),
            )
        normed = rms_norm(x, lp["input_norm"], cfg.rms_norm_eps, cfg.norm_plus_one)
        if spec.attn_kind == "gqa":
            attn_out, new_lc = _gqa_attention(
                lp, lc, normed, positions, kv_len, cfg, spec, prefill,
                history=history, lidx=lidx,
            )
        elif spec.attn_kind == "mla":
            attn_out, new_lc = _mla_attention(
                lp, lc, normed, positions, kv_len, cfg, prefill,
                history=history, lidx=lidx,
            )
        else:
            attn_out, new_lc = _la_attention(lp, lc, normed, valid, cfg,
                                             prefill, spec=spec_la)
        x = x + attn_out
        normed = rms_norm(x, lp["post_norm"], cfg.rms_norm_eps, cfg.norm_plus_one)
        B, S = x.shape[:2]
        mlp_out = _mlp(lp, normed.reshape(B * S, -1), cfg, spec, mesh=mesh,
                       activation=activation, sp_axis=sp_axis,
                       ep_axis=ep_axis, offload=offload, prefill=prefill)
        return x + mlp_out.reshape(B, S, -1), new_lc

    return layer_step


def run_pattern_scan(
    x: jax.Array,
    pattern_params,
    pattern_cache,
    pat_specs,
    reps: int,
    layer_step,
    prefill: bool,
    prefix_n: int = 0,
):
    """lax.scan over `reps` repetitions of the layer pattern.

    Factored out of `forward` for reuse by the pipeline-parallel stage
    workers (parallel/pp.py), which run it over their LOCAL slice of the
    rep-stacked parameters. Returns (x, new_pattern_cache)."""
    period = len(pat_specs)

    # Expert stacks stay WHOLE through the scan: the MoE kernels index
    # [L, E, ...] with the rep scalar in-kernel. Slicing them per rep
    # (dynamic-slice) copies ~the active expert bytes × layers × steps
    # — profiled as the decode bottleneck. Everything else (attention,
    # norms, gates — 100× smaller) is sliced per rep as before.
    STACKED_KEYS = ("w13", "w2", "hot_w13", "hot_w2")
    # KV cache leaves get the same treatment in DECODE: carried WHOLE
    # through the scan with the layer index resolved inside the
    # attention kernel — scanning over them (xs/ys) makes XLA
    # dynamic-slice + dynamic-update-slice the full per-layer cache
    # every token (~6 ms/tok at 32K, profiled). In prefill the copy
    # amortizes over the chunk, so the simple xs/ys form stays.
    KV_KEYS = ("k", "v", "kv")

    def make_lp(t, r):
        lp = {}
        for name, w in pattern_params[t].items():
            if name in STACKED_KEYS or isinstance(w, QTensor):
                # Expert stacks AND quantized projections stay WHOLE:
                # the MoE kernels and qmm_stacked_pallas index the rep
                # scalar in-kernel. XLA's fused dequant-matvec over a
                # dynamic-sliced quantized stack is VPU-capped — int8
                # attention measured NO faster than bf16 on QCN's LA
                # projections before this (benchmarks/decode_trace_qcn
                # .json); the kernel reads packed bytes at HBM rate.
                lp[name] = w
            else:
                lp[name] = jax.tree_util.tree_map(
                    lambda l: jax.lax.dynamic_index_in_dim(
                        l, r, 0, keepdims=False
                    ),
                    w,
                )
        lp["_layer_idx"] = r
        # absolute layer index (offload tier / diagnostics)
        lp["_abs_layer"] = prefix_n + r * period + t
        return lp

    if prefill:
        def scan_body(x, xs):
            r, lcs = xs
            new_lcs = []
            for t in range(period):
                x, nlc = layer_step(x, make_lp(t, r), lcs[t], pat_specs[t])
                new_lcs.append(nlc)
            return x, tuple(new_lcs)

        x, new_pattern = jax.lax.scan(
            scan_body, x,
            (jnp.arange(reps), tuple(pattern_cache)),
        )
        return x, list(new_pattern)

    kv_stacks = [
        {k: v for k, v in lc.items() if k in KV_KEYS}
        for lc in pattern_cache
    ]
    other = tuple(
        {k: v for k, v in lc.items() if k not in KV_KEYS}
        for lc in pattern_cache
    )

    def scan_body(carry, xs):
        x, kvs = carry
        r, lcs = xs
        new_kvs, new_lcs = [], []
        for t in range(period):
            lc = {**lcs[t], **kvs[t]}
            x, nlc = layer_step(
                x, make_lp(t, r), lc, pat_specs[t], lidx=r
            )
            new_kvs.append(
                {k: v for k, v in nlc.items() if k in KV_KEYS})
            new_lcs.append(
                {k: v for k, v in nlc.items() if k not in KV_KEYS})
        return (x, tuple(new_kvs)), tuple(new_lcs)

    (x, kv_final), new_other = jax.lax.scan(
        scan_body, (x, tuple(kv_stacks)),
        (jnp.arange(reps), other),
    )
    return x, [{**new_other[t], **kv_final[t]} for t in range(period)]


def make_forward_fns(cfg: ModelConfig, quant: QuantConfig, mesh=None,
                     offload=None):
    """(prefill_fn, decode_fn) closures ready for jax.jit. Pass `mesh`
    to run MoE layers through the explicit shard_map EP path; `offload`
    (offload.HostExpertStore) to run routed experts on the host."""

    def prefill_fn(params, tokens, seq_lens, cache):
        return forward(params, tokens, seq_lens, cache, cfg, quant,
                       prefill=True, mesh=mesh, offload=offload)

    def decode_fn(params, tokens, cache):
        seq_lens = jnp.ones((tokens.shape[0],), jnp.int32)
        return forward(params, tokens, seq_lens, cache, cfg, quant,
                       prefill=False, mesh=mesh, offload=offload)

    def prefill_all_logits_fn(params, tokens, seq_lens, cache):
        return forward(
            params, tokens, seq_lens, cache, cfg, quant,
            prefill=True, return_all_logits=True, mesh=mesh,
            offload=offload,
        )

    return prefill_fn, decode_fn, prefill_all_logits_fn


def make_chunk_prefill_fn(cfg: ModelConfig, quant: QuantConfig, history: int,
                          mesh=None, offload=None):
    """Prefill-continuation step seeing a `history`-bucket cache prefix."""

    def fn(params, tokens, seq_lens, cache):
        return forward(
            params, tokens, seq_lens, cache, cfg, quant,
            prefill=True, history=history, mesh=mesh, offload=offload,
        )

    return fn


def make_multi_decode_batched_fn(cfg: ModelConfig, quant: QuantConfig,
                                 steps: int, mesh=None, max_top_k: int = 64,
                                 top_logprobs: int = 0, offload=None,
                                 need_logprobs: bool = True):
    """Fused decode+sample block with PER-SLOT sampling params. One
    device call advances every slot by `steps` tokens (per-token
    dispatch costs a host↔device round trip per step — ~28 ms through a
    relay tunnel, which would cap throughput at ~35 tok/s/slot no matter
    the model; the analog of the reference's whole-decode-loop-in-one-
    Rust-call, decode.rs:3525 generate_batch).

    need_logprobs=False drops the per-step chosen-logprob math and
    returns zeros in the lps slot. Measured ≈free on V2-Lite (XLA fuses
    the log_softmax into the lm_head epilogue; an argmax-only probe's
    0.5 ms/tok delta traces to the whole sampling machinery, not this
    term) — kept because it is the OpenAI semantic: logprobs are
    per-request opt-in, and the scheduler flips to the full variant
    whenever an active request asked."""
    from ..ops.sampling import sample_batched

    def fn(params, tok, cache, key, seen, temp, top_p, pres, top_k):
        B = tok.shape[0]
        seq1 = jnp.ones((B,), jnp.int32)

        def body(carry, _):
            tok, cache, key, seen = carry
            logits, cache = forward(
                params, tok[:, None], seq1, cache, cfg, quant, prefill=False,
                mesh=mesh, offload=offload,
            )
            key, sk = jax.random.split(key)
            nxt = sample_batched(sk, logits, temp, top_p, pres, seen, top_k,
                                 max_top_k=max_top_k)
            if need_logprobs or top_logprobs > 0:
                # logprob of the chosen token under the RAW model
                # distribution (pre-temperature/penalty — the OpenAI
                # `logprobs` quantity)
                lsm = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
                lp = jnp.take_along_axis(
                    lsm, nxt[:, None].astype(jnp.int32), axis=-1)[:, 0]
            else:
                lp = jnp.zeros((B,), jnp.float32)
            if top_logprobs > 0:
                tv, ti = jax.lax.top_k(lsm, top_logprobs)   # [B, N]
            else:  # placeholder so the scan output structure is static
                tv = jnp.zeros((B, 1), jnp.float32)
                ti = jnp.zeros((B, 1), jnp.int32)
            seen = seen.at[jnp.arange(B), nxt].set(True)
            return (nxt, cache, key, seen), (nxt, lp, tv, ti)

        (tok, cache, key, seen), (toks, lps, tvs, tis) = jax.lax.scan(
            body, (tok, cache, key, seen), None, length=steps
        )
        # toks/lps: [steps, B]; tvs/tis: [steps, B, N] (N=1 dummies when
        # top_logprobs == 0)
        return toks, lps, (tvs, tis), cache, key, seen

    return fn


def make_forced_decode_fn(cfg: ModelConfig, quant: QuantConfig,
                          steps: int, mesh=None, offload=None):
    """Teacher-forced decode block for DECODE-PATH perplexity.

    Advances `steps` positions through the exact serving decode graph
    (one token per step: W4A8 grouped MoE when enabled, quantized
    attention projections, fp8 KV cache reads — everything the prefill
    all-logits path does NOT exercise), feeding FORCED tokens and
    returning log P(next forced token) per step. One device call per
    block via lax.scan. Quality-certification analog of the reference
    measuring PPL "through the production forward path"
    (reference perplexity/measure_ppl.py) — here applied to the decode
    engine specifically, because several quantization decisions (e.g.
    expert_activation=int8) only exist in decode.
    """

    def fn(params, toks, cache):
        # toks: [B, steps+1] — feed toks[:, t], score toks[:, t+1]
        B = toks.shape[0]
        seq1 = jnp.ones((B,), jnp.int32)

        def body(cache, xs):
            cur, nxt = xs
            logits, cache = forward(
                params, cur[:, None], seq1, cache, cfg, quant,
                prefill=False, mesh=mesh, offload=offload,
            )
            return cache, chosen_logprob(logits, nxt)

        xs = (toks[:, :-1].T, toks[:, 1:].T)     # [steps, B] each
        cache, lps = jax.lax.scan(body, cache, xs)
        return lps.T, cache                      # [B, steps]

    return fn


def chosen_logprob(logits: jax.Array, tok: jax.Array) -> jax.Array:
    """log P(tok) under log_softmax(logits): [B, V], [B] → [B] f32."""
    lsm = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return jnp.take_along_axis(lsm, tok[:, None].astype(jnp.int32),
                               axis=-1)[:, 0]


def static_max_top_k(sampling, V: int) -> int:
    """Static truncation bound for the fused decode+sample block.

    temperature == 0 is STATIC greedy: the sampled branch's result is
    discarded by the final `where`, so bounding it at 1 removes a
    full-vocab `lax.top_k` (a 102K-element sort on V2-Lite) from EVERY
    decode step — it measured as part of the 1.05 ms fixed per-step
    cost (benchmarks/decode_ablation.json). top_k <= 0 with a real
    temperature means un-truncated nucleus sampling and genuinely needs
    the full vocab."""
    if sampling.temperature <= 0.0:
        return 1
    return V if sampling.top_k <= 0 else min(sampling.top_k, V)


def make_multi_decode_fn(cfg: ModelConfig, quant: QuantConfig,
                         sampling, steps: int, mesh=None,
                         top_logprobs: int = 0, offload=None,
                         need_logprobs: bool = True):
    """Single-request fused decode+sample loop: the batched block fn
    with `sampling` broadcast to per-row arrays (one code path — a fix
    to the scan/cache threading cannot drift between engine and
    scheduler). `max_top_k` is bound to the request's static top_k so
    truncation is exact for any k."""
    mtk = static_max_top_k(sampling, cfg.vocab_size)
    inner = make_multi_decode_batched_fn(cfg, quant, steps, mesh=mesh,
                                         max_top_k=mtk,
                                         top_logprobs=top_logprobs,
                                         offload=offload,
                                         need_logprobs=need_logprobs)

    def fn(params, tok, cache, key, seen):
        B = tok.shape[0]
        full = lambda v: jnp.full((B,), v)
        return inner(
            params, tok, cache, key, seen,
            full(jnp.float32(sampling.temperature)),
            full(jnp.float32(sampling.top_p)),
            full(jnp.float32(sampling.presence_penalty)),
            full(jnp.int32(sampling.top_k)),
        )

    return fn
