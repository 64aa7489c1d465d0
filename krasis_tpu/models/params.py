"""Parameter schema + synthetic initialization.

Parameters are nested dicts (pytrees) of jax Arrays / QTensors in a
**pattern-stacked** layout: the layer stack is decomposed into a small
unrolled ``prefix`` (e.g. DeepSeek's first dense layer) plus a repeating
``pattern`` of layer kinds (QCN: [LA, LA, LA, GQA] × 12); parameters for
each pattern position are stacked along a leading ``reps`` axis so the
model forward can ``lax.scan`` over repetitions. Compile time and HLO
size scale with the pattern period (1-4), not the layer count (27-94) —
the TPU-native answer to the reference's per-layer static graph
(reference src/decode.rs DecodeGraph builds 48+ explicit layers; XLA
would choke compiling that unrolled).

Schema covers every architecture the reference supports (SURVEY §2.2):
MLA (optional q-LoRA), GQA (qk-norm / gated / sinks / sliding), Gated
DeltaNet, routed MoE (+ shared expert, per-expert biases), dense MLP.

``init_synthetic_params`` builds a full random-weight model directly in
quantized stacked form — the analog of the reference's xorshift fake
weights (reference src/decode.rs:4480) — so engines can be built and
benchmarked from a config alone.
"""

from __future__ import annotations

from typing import Any, Dict, List, NamedTuple, Optional, Tuple

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


class PatternInfo(NamedTuple):
    prefix_n: int       # leading layers kept unrolled
    period: int         # layers per repeating block (0 when reps == 0)
    reps: int           # number of repetitions scanned

    @property
    def total(self) -> int:
        return self.prefix_n + self.period * self.reps


def pattern_info(cfg: ModelConfig) -> PatternInfo:
    """Smallest (prefix, period) so specs = prefix ++ pattern × reps."""
    specs = layer_specs(cfg)
    L = len(specs)
    best = PatternInfo(L, 0, 0)
    for prefix_n in range(0, min(L, 4) + 1):
        rest = L - prefix_n
        for period in range(1, rest + 1):
            if rest % period:
                continue
            reps = rest // period
            if reps < 2:
                continue
            pat = specs[prefix_n : prefix_n + period]
            if all(
                specs[prefix_n + r * period + t] == pat[t]
                for r in range(reps)
                for t in range(period)
            ):
                cand = PatternInfo(prefix_n, period, reps)
                if (cand.period, cand.prefix_n) < (
                    best.period if best.reps else L + 1, best.prefix_n
                ):
                    best = cand
                break  # smallest period for this prefix found
    if best.reps == 0:
        return PatternInfo(L, 0, 0)  # fully unrolled fallback
    return best


def pattern_layer_index(info: PatternInfo, t: int, r: int) -> int:
    """Global layer index of pattern position t at repetition r."""
    return info.prefix_n + r * info.period + t


def mtp_layer_spec(cfg: ModelConfig) -> LayerSpec:
    """Layer structure of the MTP (next-token-prediction) module.

    DeepSeek V3 / Kimi K2 ship it as one more full transformer layer
    (MLA attention + MoE MLP) at index num_hidden_layers, wrapped by
    enorm/hnorm/eh_proj and its own head norm."""
    return LayerSpec(
        cfg.attention_type, False,
        "moe" if cfg.layer_is_moe(cfg.num_hidden_layers) else "dense",
    )


# --------------------------------------------------------------------------
# Synthetic init
# --------------------------------------------------------------------------

def _maybe_quant(w: jax.Array, mode: str, group_size: int):
    if mode == "bf16":
        return w.astype(jnp.bfloat16)
    bits = {"int8": 8, "int4": 4}[mode]
    return quantize(w, bits=bits, group_size=group_size)


def _init_layer(
    cfg: ModelConfig,
    quant: QuantConfig,
    spec: LayerSpec,
    key: jax.Array,
    stack_n: Optional[int] = None,
    dtype=jnp.bfloat16,
    skip_experts: bool = False,
) -> Dict[str, Any]:
    """One layer's params; with stack_n, leaves get a leading reps dim."""
    H = cfg.hidden_size
    gs = quant.group_size
    lead: Tuple[int, ...] = (stack_n,) if stack_n else ()
    keys = iter(jax.random.split(key, 24))

    def rnd(shape, scale=0.02, dt=dtype):
        return (
            jax.random.normal(next(keys), lead + shape, jnp.float32) * scale
        ).astype(dt)

    def ones(n):
        base = jnp.zeros if cfg.norm_plus_one else jnp.ones
        return base(lead + (n,), dtype)

    def plain_ones(n):
        return jnp.ones(lead + (n,), dtype)

    lp: Dict[str, Any] = {"input_norm": ones(H), "post_norm": ones(H)}

    def attn_w(shape, scale=0.02):
        # honors quant.attention ("bf16" default per the reference's Q4
        # quality config; "int8" matches the reference's CPU decode store,
        # which quantizes ALL non-MoE weights — decode_setup.py:49)
        return _maybe_quant(rnd(shape, scale, dt=jnp.float32),
                            quant.attention, gs)

    if spec.attn_kind == "gqa":
        d = cfg.qk_head_dim
        hq, hkv = cfg.num_attention_heads, cfg.num_key_value_heads
        gated = cfg.model_type in ("qwen3_next", "qwen3_5_moe_text")
        lp["q_proj"] = attn_w((H, hq * d * (2 if gated else 1)))
        lp["k_proj"] = attn_w((H, hkv * d))
        lp["v_proj"] = attn_w((H, hkv * d))
        lp["o_proj"] = attn_w((hq * d, H))
        if cfg.attention_bias:
            lp["q_bias"] = jnp.zeros(lead + (hq * d * (2 if gated else 1),), dtype)
            lp["k_bias"] = jnp.zeros(lead + (hkv * d,), dtype)
            lp["v_bias"] = jnp.zeros(lead + (hkv * d,), dtype)
            lp["o_bias"] = jnp.zeros(lead + (H,), dtype)
        if cfg.qk_norm:
            lp["q_norm"] = ones(d)
            lp["k_norm"] = ones(d)
        if cfg.model_type == "gpt_oss":
            lp["sinks"] = jnp.zeros(lead + (hq,), jnp.float32)
    elif spec.attn_kind == "mla":
        hq = cfg.num_attention_heads
        dn, dr = cfg.qk_nope_head_dim, cfg.qk_rope_head_dim
        L, dv = cfg.kv_lora_rank, cfg.v_head_dim
        if cfg.q_lora_rank:
            lp["q_a_proj"] = attn_w((H, cfg.q_lora_rank))
            lp["q_a_norm"] = plain_ones(cfg.q_lora_rank)
            lp["q_b_proj"] = attn_w((cfg.q_lora_rank, hq * (dn + dr)))
        else:
            lp["q_proj"] = attn_w((H, hq * (dn + dr)))
        # latent projection is quality-critical (feeds the compressed KV
        # the whole MLA path runs on): cap at int8 under attention="int4"
        lp["kv_a_proj"] = _maybe_quant(
            rnd((H, L + dr), dt=jnp.float32),
            "int8" if quant.attention == "int4" else quant.attention, gs)
        lp["kv_a_norm"] = plain_ones(L)
        lp["w_kc"] = rnd((hq, dn, L))
        lp["w_vc"] = rnd((hq, L, dv))
        lp["o_proj"] = attn_w((hq * dv, H))
    else:  # linear_attention
        hk, hv = cfg.linear_num_key_heads, cfg.linear_num_value_heads
        dk, dv = cfg.linear_key_head_dim, cfg.linear_value_head_dim
        key_dim, value_dim = hk * dk, hv * dv
        conv_dim = 2 * key_dim + value_dim
        # DeltaNet's recurrent dynamics amplify weight noise (decay gates
        # compound over the sequence): int8 floor under attention="int4"
        la_mode = "int8" if quant.attention == "int4" else quant.attention

        def la_w(shape):
            return _maybe_quant(rnd(shape, dt=jnp.float32), la_mode, gs)

        lp["qkvz_proj"] = la_w((H, 2 * key_dim + 2 * value_dim))
        lp["ba_proj"] = la_w((H, 2 * hv))
        lp["conv_w"] = rnd((conv_dim, cfg.linear_conv_kernel_dim), scale=0.2)
        lp["dt_bias"] = jnp.ones(lead + (hv,), jnp.float32)
        lp["a_log"] = jnp.zeros(lead + (hv,), jnp.float32)
        lp["la_norm"] = jnp.ones(lead + (dv,), dtype)  # gated norm: plain weight
        lp["la_out_proj"] = la_w((value_dim, H))

    if spec.mlp_kind == "moe":
        E, I = cfg.n_routed_experts, cfg.moe_intermediate_size
        lp["gate_w"] = rnd((H, E), dt=jnp.float32)
        if cfg.has_router_bias:
            lp["gate_bias"] = jnp.zeros(lead + (E,), jnp.float32)
        if cfg.model_type == "gpt_oss":
            lp["gate_logit_bias"] = jnp.zeros(lead + (E,), jnp.float32)
        shared_src = None
        Is = 0
        if cfg.n_shared_experts > 0:
            Is = cfg.shared_expert_intermediate_size or (
                cfg.moe_intermediate_size * cfg.n_shared_experts
            )
            shared_src = (rnd((H, 2 * Is), dt=jnp.float32),
                          rnd((Is, H), dt=jnp.float32))
            lp["shared_w13"] = _maybe_quant(
                shared_src[0], quant.shared_expert, gs)
            lp["shared_w2"] = _maybe_quant(
                shared_src[1], quant.shared_expert, gs)
            if cfg.model_type in ("qwen3_next", "qwen3_5_moe_text"):
                lp["shared_gate_w"] = rnd((H, 1))
        # Creation-time shared-expert fold (see fold_shared_experts):
        # generate the stack at E+n_virt and write the virtual experts
        # via a donated in-place set — the post-hoc concat path doubles
        # a multi-GB stack transiently, which OOMs full-size models.
        n_virt = 0
        if (shared_src is not None and quant.fold_shared_decode
                and not skip_experts and cfg.model_type != "gpt_oss"
                and quant.expert_bits in (4, 8) and Is % I == 0 and Is
                and not (quant.expert_bits == 4 and I % 2)):
            n_virt = Is // I
        if not skip_experts:
            k13, k2 = jax.random.split(next(keys))
            lp["w13"] = random_qtensor(
                k13, lead + (E + n_virt, H, 2 * I), quant.expert_bits, gs)
            lp["w2"] = random_qtensor(
                k2, lead + (E + n_virt, I, H), quant.expert_bits, gs)
            if n_virt and I % lp["w2"].group_size == 0:
                # ONE quantization of the shared source at expert bits
                # with the stack's group sizes; the dense prefill leaves
                # and the virtual experts slice the SAME arrays
                sh13 = quantize(shared_src[0], quant.expert_bits, gs)
                sh2 = quantize(shared_src[1], quant.expert_bits,
                               group_size=lp["w2"].group_size)
                lp["shared_w13"], lp["shared_w2"] = sh13, sh2
                v13, v2 = virtual_expert_slices(sh13, sh2, I)
                lp["w13"] = _write_virtual_experts(lp["w13"], v13, E)
                lp["w2"] = _write_virtual_experts(lp["w2"], v2, E)
            elif n_virt:
                # alignment impossible: drop back to the unfolded stack
                lp["w13"] = random_qtensor(
                    k13, lead + (E, H, 2 * I), quant.expert_bits, gs)
                lp["w2"] = random_qtensor(
                    k2, lead + (E, I, H), quant.expert_bits, gs)
            if cfg.model_type == "gpt_oss":
                lp["w13_bias"] = jnp.zeros(lead + (E, 2 * I), jnp.float32)
                lp["w2_bias"] = jnp.zeros(lead + (E, H), jnp.float32)
    else:
        I = cfg.intermediate_size
        lp["mlp_w13"] = _maybe_quant(rnd((H, 2 * I), dt=jnp.float32), quant.dense_mlp, gs)
        lp["mlp_w2"] = _maybe_quant(rnd((I, H), dt=jnp.float32), quant.dense_mlp, gs)
    return lp


def init_synthetic_params(
    cfg: ModelConfig,
    quant: QuantConfig,
    key: jax.Array,
    dtype=jnp.bfloat16,
    skip_experts: bool = False,
) -> Dict[str, Any]:
    """Random parameters in the production (pattern-stacked) layout.

    skip_experts: omit the routed w13/w2 stacks (host-RAM offload tier —
    models whose experts cannot fit HBM at all; offload.py holds them)."""
    specs = layer_specs(cfg)
    info = pattern_info(cfg)
    H = cfg.hidden_size
    keys = iter(jax.random.split(key, 8 + info.prefix_n + max(info.period, 0)))

    def rnd(shape, scale=0.02, dt=dtype):
        return (jax.random.normal(next(keys), shape, jnp.float32) * scale).astype(dt)

    params: Dict[str, Any] = {
        "embed": rnd((cfg.vocab_size, H)),
        "final_norm": (
            jnp.zeros((H,), dtype) if cfg.norm_plus_one else jnp.ones((H,), dtype)
        ),
        "lm_head": _maybe_quant(
            rnd((H, cfg.vocab_size), dt=jnp.float32), quant.lm_head, quant.group_size
        ),
        "prefix_layers": [
            _init_layer(cfg, quant, specs[i], next(keys), dtype=dtype,
                        skip_experts=skip_experts)
            for i in range(info.prefix_n)
        ],
        "pattern": [
            _init_layer(
                cfg, quant, specs[info.prefix_n + t], next(keys),
                stack_n=info.reps, dtype=dtype,
                skip_experts=skip_experts,
            )
            for t in range(info.period)
        ],
    }
    if cfg.num_nextn_predict_layers > 0:
        # MTP module (depth 1): embedding and head are shared with the
        # main model (DeepSeek V3 ties layers.61.embed_tokens /
        # shared_head.head to them).
        k1, k2 = jax.random.split(jax.random.fold_in(key, 0x317))
        one = jnp.zeros((H,), dtype) if cfg.norm_plus_one else jnp.ones((H,), dtype)
        params["mtp"] = {
            "enorm": one,
            "hnorm": one,
            "eh_proj": _maybe_quant(
                (jax.random.normal(k1, (2 * H, H), jnp.float32) * 0.02),
                quant.attention, quant.group_size,
            ),
            "final_norm": one,
            "layer": _init_layer(cfg, quant, mtp_layer_spec(cfg), k2,
                                 dtype=dtype),
        }
    return params


def virtual_expert_slices(sh13: QTensor, sh2: QTensor, I: int):
    """Shared-expert QTensors → virtual-expert stacks [..., n_virt, ...]
    as BIT-EXACT slices (quant.slice_n / slice_k): the folded decode
    path and the dense prefill path must compute from identical values
    (see fold_shared_experts)."""
    from ..quant import slice_k, slice_n

    Is = sh2.scales.shape[-2] * sh2.group_size
    n_virt = Is // I
    v13p, v2p = [], []
    for j in range(n_virt):
        g = slice_n(sh13, j * I, I)
        u = slice_n(sh13, Is + j * I, I)
        v13p.append(QTensor(
            jnp.concatenate([g.q, u.q], axis=-1),
            jnp.concatenate([g.scales, u.scales], axis=-1),
            sh13.bits, sh13.group_size))
        v2p.append(slice_k(sh2, j * I, I))

    def st(parts):
        return QTensor(
            jnp.stack([p.q for p in parts], axis=-3),
            jnp.stack([p.scales for p in parts], axis=-3),
            parts[0].bits, parts[0].group_size)

    return st(v13p), st(v2p)


def _write_virtual_experts(stack: QTensor, virt: QTensor, E: int) -> QTensor:
    """Write virtual experts into stack rows [E:] via a DONATED in-place
    set — a post-hoc concat would transiently double a multi-GB stack."""
    def setter(a, b):
        return a.at[..., E:, :, :].set(b)

    jset = jax.jit(setter, donate_argnums=(0,))
    return QTensor(jset(stack.q, virt.q), jset(stack.scales, virt.scales),
                   stack.bits, stack.group_size)


def fold_shared_experts(params: Dict[str, Any], cfg: ModelConfig,
                        quant: QuantConfig) -> Dict[str, Any]:
    """Append the shared expert(s) to each MoE stack as always-picked
    VIRTUAL routed experts (decode fast path).

    Why: at decode the shared expert is a T=1 int8 matvec through its
    own kernel launches — measured 2.07 ms/step of V2-Lite's 7.3 ms
    (benchmarks/decode_ablation.json), at ~half the effective bandwidth
    of the gathered MoE kernel. SwiGLU factors exactly over I-sized
    column blocks: with Is = n_virt·I,
        swiglu(x·W13)·W2 = Σ_j swiglu(x·W13_j)·W2_j ,
    so the shared computation IS n_virt routed-expert computations with
    weight 1.0 (or the per-token sigmoid shared gate). Folding them into
    the stack lets ONE gathered kernel read routed+shared weights per
    layer — including the W4A8 int8×int8 path.

    The dense `shared_w13`/`shared_w2` leaves are KEPT for prefill
    (large T computes shared as one MXU matmul) — and, crucially, they
    are REPLACED with the SAME expert-bits quantization the virtual
    experts are sliced from: both paths compute from bit-identical
    values, so spec-decode exactness (grouped verify vs gathered
    vanilla) and prefill/decode consistency survive the fold. The
    slices themselves are bit-exact relayouts (quant.slice_n /
    slice_k — per-column scales make column slices trivially exact;
    packed-int4 K-slices re-pair nibbles). Quality: shared moves from
    its int8 default to expert_bits — certified in the quality matrix
    (benchmarks/quality/QUALITY.md runs folded engines).

    No-ops (returns params unchanged leaves) for layers with per-expert
    biases (GPT-OSS), Is not a multiple of I, non-4/8-bit stacks, or
    missing stacks (offload tier). Do NOT apply to mesh-sharded params:
    E+n_virt breaks the ep-axis divisibility (Engine/BatchScheduler
    only fold when mesh is None). init_synthetic_params folds at
    CREATION time instead (this post-hoc concat doubles a multi-GB
    stack transiently).
    """
    from ..quant import dequantize

    if cfg.n_shared_experts <= 0:
        return params
    I = cfg.moe_intermediate_size

    def fold_layer(lp):
        if ("w13" not in lp or "shared_w13" not in lp
                or "w13_bias" in lp):
            return lp
        w13, w2 = lp["w13"], lp["w2"]
        if isinstance(w13, QTensor) and w13.bits not in (4, 8):
            # synthetic bits-16 layout: no exact requant form to append
            return lp
        E_cur = w13.q.shape[-3] if isinstance(w13, QTensor) else w13.shape[-3]
        if E_cur != cfg.n_routed_experts:
            return lp  # already folded (idempotent re-entry)
        sw13, sw2 = lp["shared_w13"], lp["shared_w2"]
        sh13_shape = sw13.shape if not isinstance(sw13, QTensor) else (
            sw13.scales.shape[:-2] + (
                sw13.q.shape[-2] * (2 if sw13.bits == 4 else 1),
                sw13.q.shape[-1]))
        Is = sh13_shape[-1] // 2
        if Is % I or Is == 0 or (I % 2 and isinstance(w13, QTensor)
                                 and w13.bits == 4):
            return lp
        lead = sh13_shape[:-2]
        out = dict(lp)

        if isinstance(w13, QTensor):
            def rep_f32(w, r):
                if isinstance(w, QTensor):
                    wr = QTensor(w.q[r] if lead else w.q,
                                 w.scales[r] if lead else w.scales,
                                 w.bits, w.group_size)
                    return dequantize(wr, dtype=jnp.float32)
                return jnp.asarray(w[r] if lead else w, jnp.float32)

            def requant(w, gs_target):
                """Shared leaf at expert bits + stack group size (the
                ONE quantization both paths will share). Per-rep to
                bound the f32 dequant transient."""
                if (isinstance(w, QTensor) and w.bits == w13.bits
                        and w.group_size == gs_target):
                    return w
                reps = lead[0] if lead else 1
                parts = [quantize(rep_f32(w, r), bits=w13.bits,
                                  group_size=gs_target)
                         for r in range(reps)]
                if lead:
                    return QTensor(
                        jnp.stack([p.q for p in parts]),
                        jnp.stack([p.scales for p in parts]),
                        w13.bits, parts[0].group_size)
                return parts[0]

            if I % w2.group_size:
                return lp          # K-slice/group alignment impossible
            sh13 = requant(sw13, w13.group_size)
            sh2 = requant(sw2, w2.group_size)
            out["shared_w13"], out["shared_w2"] = sh13, sh2
            v13, v2 = virtual_expert_slices(sh13, sh2, I)
            out["w13"] = QTensor(
                jnp.concatenate([w13.q, v13.q], axis=-3),
                jnp.concatenate([w13.scales, v13.scales], axis=-3),
                w13.bits, w13.group_size)
            out["w2"] = QTensor(
                jnp.concatenate([w2.q, v2.q], axis=-3),
                jnp.concatenate([w2.scales, v2.scales], axis=-3),
                w2.bits, w2.group_size)
        else:
            # full-precision array stacks: slices are exact by nature.
            # The shared leaves may still be QTensors (shared_expert
            # defaults to int8 even when expert_bits=16) — dequantize
            # them first; appending f32 values to an f32 stack keeps the
            # fold exact for the stack while the dense prefill leaves
            # keep their own quantization (both paths were already at
            # different precisions in this configuration).
            n_virt = Is // I
            H = sh13_shape[-2]
            s13 = (dequantize(sw13, dtype=w13.dtype)
                   if isinstance(sw13, QTensor) else jnp.asarray(sw13, w13.dtype))
            s2 = (dequantize(sw2, dtype=w13.dtype)
                  if isinstance(sw2, QTensor) else jnp.asarray(sw2, w13.dtype))
            gate = s13[..., :, :Is].reshape(*lead, H, n_virt, I)
            up = s13[..., :, Is:].reshape(*lead, H, n_virt, I)
            v13 = jnp.moveaxis(jnp.concatenate([gate, up], axis=-1), -2, -3)
            v2 = s2.reshape(*lead, n_virt, I, s2.shape[-1])
            out["w13"] = jnp.concatenate([w13, v13], axis=-3)
            out["w2"] = jnp.concatenate([w2, v2], axis=-3)
        return out

    new = dict(params)
    new["prefix_layers"] = [fold_layer(lp) for lp in params["prefix_layers"]]
    new["pattern"] = [fold_layer(lp) for lp in params["pattern"]]
    if "mtp" in params:
        mtp = dict(params["mtp"])
        mtp["layer"] = fold_layer(params["mtp"]["layer"])
        new["mtp"] = mtp
    return new


def stack_layer_list(layers: List[Dict[str, Any]], cfg: ModelConfig):
    """Stack a list of same-structure per-layer dicts into pattern layout
    (used by the checkpoint loader; host-side, placement happens later)."""
    import numpy as np

    info = pattern_info(cfg)
    prefix = layers[: info.prefix_n]
    pattern = []
    for t in range(info.period):
        group = [layers[pattern_layer_index(info, t, r)] for r in range(info.reps)]
        pattern.append(
            jax.tree_util.tree_map(lambda *xs: np.stack(xs), *group)
        )
    return {"prefix_layers": prefix, "pattern": pattern}


def param_bytes(params) -> int:
    """Total parameter bytes (for budget reporting)."""
    leaves = jax.tree_util.tree_leaves(params)
    return sum(x.size * x.dtype.itemsize for x in leaves)
