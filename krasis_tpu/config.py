"""Model / quantization configuration.

Parses HuggingFace ``config.json`` files for every architecture family the
reference engine supports (see /root/reference/python/krasis/config.py:291-437
for the behaviour this reproduces):

* DeepSeek V2/V3 family — MLA attention (``kv_lora_rank`` present), optional
  q-LoRA, shared experts, softmax or sigmoid routing with optional
  ``e_score_correction_bias`` and ``routed_scaling_factor``.
* Kimi K2.5 — config nested under ``text_config``; sigmoid routing.
* DeepSeek-VL2 — config nested under ``language_config``; fields inferred
  from weight shapes when missing.
* Qwen3 / Qwen3-235B — GQA with per-head QK-norm, ``num_experts`` naming.
* Qwen3-Next / Qwen3.5 / Qwen3-Coder-Next — hybrid models mixing Gated
  DeltaNet linear-attention layers with full-attention layers
  (``full_attention_interval``), ``(1+w)·x`` RMSNorm convention.
* GPT-OSS — ``num_local_experts`` naming, explicit ``layer_types`` with
  sliding-window attention, MXFP4 pre-quantized experts, SwiGLU clamping
  (``swiglu_limit``), attention bias, topk-then-softmax routing.

This module is pure Python (no jax import) so it can be used by tooling
(launcher, budget calculator) without initializing a TPU backend.
"""

from __future__ import annotations

import json
import os
import struct
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple


# --------------------------------------------------------------------------
# Quantization config
# --------------------------------------------------------------------------

@dataclass
class QuantConfig:
    """Per-component quantization policy.

    Mirrors the reference's component split (reference config.py:202-213):
    embedding, kv_b/w_kc/w_vc, layernorms and router gates always stay BF16
    (quality-critical and/or tiny); attention DEFAULTS to BF16 (the
    reference's Q4 quality config keeps GPU attention BF16 after INT8 hurt
    PPL) but "int8"/"int4" are supported for the attention/DeltaNet
    projections — the reference's own CPU decode store quantizes ALL
    non-MoE weights INT4 by default (reference decode_setup.py:49), and on
    hybrid models the DeltaNet in/out projections dominate decode HBM
    traffic (QCN: ~2.4 GB/token at BF16); experts are the big win and go
    INT4 or INT8; lm_head / shared expert / dense MLP default to INT8.
    """

    expert_bits: int = 4            # 4 or 8 — routed expert weights
    # "int8" = W4A8 decode MoE: activations quantized per (row, K-group)
    # to int8, int8×int8 MXU grouped dots, through the fused single-pick
    # kernel (small experts) or the N-tiled kernels (V2-Lite-scale).
    # DEFAULT since round 4: quality-certified at +0.013% decode-path
    # PPL (benchmarks/quality/QUALITY.md) and measured +5% V2-Lite
    # single-stream decode (tiled) / +17% (fused, round-2). The grouped
    # (prefill / many-slot) regime ignores it — bf16 is faster there.
    expert_activation: str = "int8"  # "bf16" | "int8"
    lm_head: str = "int8"           # "bf16" | "int8"
    attention: str = "bf16"         # "bf16" | "int8" | "int4" (projections)
    shared_expert: str = "int8"     # "bf16" | "int8"
    dense_mlp: str = "int8"         # "bf16" | "int8"
    group_size: int = 128           # quantization group size along K
    # Fold shared experts into the decode MoE stack as always-picked
    # virtual experts (models/params.fold_shared_experts): one gathered
    # kernel reads routed+shared weights per layer — measured 2.07 ms of
    # a 7.3 ms V2-Lite decode step spent in the standalone shared-expert
    # matvecs (benchmarks/decode_ablation.json). Applied by Engine /
    # BatchScheduler on the unsharded path only; quality-certified in
    # benchmarks/quality/QUALITY.md (the matrix runs folded engines).
    fold_shared_decode: bool = True
    # "auto" resolves per engine (runtime/kv_cache.resolve_kv_quant):
    # bf16 when the full cache fits the HBM budget — on v5e the fp8
    # cache decodes ~2.5x SLOWER than bf16 (the VPU fp8->bf16 upcast
    # runs ~1 elem/lane/cycle; measured 10.2 vs 4.1 ms per 32K MLA
    # decode step), so fp8 only pays when capacity binds, the same
    # trade the reference makes with its FP8 KV option.
    kv_cache_dtype: str = "auto"    # "auto" | "fp8" (e4m3) | "bf16"

    def component_bits(self, component: str) -> int:
        """Bit width for a named component ('expert', 'lm_head', ...)."""
        if component == "expert":
            return self.expert_bits
        mode = getattr(self, component)
        return {"bf16": 16, "int8": 8, "int4": 4}[mode]


# --------------------------------------------------------------------------
# Model config
# --------------------------------------------------------------------------

@dataclass
class ModelConfig:
    """Parsed model architecture description (one per checkpoint)."""

    model_path: str
    model_type: str
    hidden_size: int
    intermediate_size: int          # dense-MLP intermediate (first_k_dense layers)
    moe_intermediate_size: int      # per-routed-expert intermediate
    num_hidden_layers: int
    num_attention_heads: int
    num_key_value_heads: int
    vocab_size: int

    # --- MLA (DeepSeek/Kimi) — all None for GQA models ---
    q_lora_rank: Optional[int] = None
    kv_lora_rank: Optional[int] = None
    qk_nope_head_dim: Optional[int] = None
    qk_rope_head_dim: Optional[int] = None
    v_head_dim: Optional[int] = None

    # --- GQA ---
    head_dim: Optional[int] = None          # per-head dim (e.g. 128 for Qwen3)
    qk_norm: bool = False                   # per-head RMSNorm on Q/K (Qwen3)
    attention_bias: bool = False
    sliding_window: int = 0                 # GPT-OSS sliding_attention layers

    # --- Hybrid linear attention (Gated DeltaNet) ---
    full_attention_interval: int = 0        # 0 = all full attention
    layer_types: Optional[List[str]] = None # per-layer: "full_attention" | "linear_attention" | "sliding_attention"
    linear_conv_kernel_dim: int = 4
    linear_key_head_dim: int = 128
    linear_num_key_heads: int = 16
    linear_value_head_dim: int = 128
    linear_num_value_heads: int = 32

    # --- MoE ---
    n_routed_experts: int = 0
    num_experts_per_tok: int = 0
    n_shared_experts: int = 0
    shared_expert_intermediate_size: int = 0
    first_k_dense_replace: int = 0
    routed_scaling_factor: float = 1.0
    scoring_func: str = "softmax"           # "softmax" | "sigmoid"
    topk_method: str = "greedy"             # "greedy" | "noaux_tc"
    n_group: int = 0                        # group-limited routing (DeepSeek V3)
    topk_group: int = 0
    norm_topk_prob: bool = False
    has_router_bias: bool = False           # e_score_correction_bias present
    # GPT-OSS routing: select on RAW logits, softmax over the selected top-k
    # AFTER selection (reference moe.rs forward_moe_routed GPT-OSS branch).
    moe_router_softmax_after_topk: bool = False

    # --- Norm / activation ---
    rms_norm_eps: float = 1e-6
    hidden_act: str = "silu"
    norm_plus_one: bool = False             # Qwen3-Next RMSNorm computes (1+w)·x
    swiglu_limit: float = 0.0               # GPT-OSS clamp on SwiGLU
    expert_quant_method: str = ""           # "mxfp4" for GPT-OSS

    # --- RoPE ---
    rope_theta: float = 10000.0
    rope_scaling: Dict[str, Any] = field(default_factory=dict)
    max_position_embeddings: int = 131072
    partial_rotary_factor: float = 1.0      # GLM-4.7: 0.5

    # --- Multi-token prediction (DeepSeek V3/R1, Kimi K2) ---
    # Number of MTP modules shipped in the checkpoint (layer indices
    # num_hidden_layers..+n-1). Enables self-speculative decoding: the MTP
    # head drafts token t+2 while the main model verifies — a capability
    # the reference engine does not have.
    num_nextn_predict_layers: int = 0

    # --- Misc ---
    tie_word_embeddings: bool = False
    bos_token_id: int = 0
    eos_token_id: int = 0
    extra_stop_token_ids: Tuple[int, ...] = ()
    layers_prefix: str = "model"            # tensor name prefix in safetensors

    # ------------------------------------------------------------------
    # Derived properties
    # ------------------------------------------------------------------

    @property
    def attention_type(self) -> str:
        return "mla" if self.kv_lora_rank is not None else "gqa"

    @property
    def is_hybrid(self) -> bool:
        lt = self.layer_types or []
        return any(t == "linear_attention" for t in lt)

    @property
    def is_moe(self) -> bool:
        return self.n_routed_experts > 0

    @property
    def qk_head_dim(self) -> int:
        """Full query/key head dim (nope+rope for MLA, head_dim for GQA)."""
        if self.attention_type == "mla":
            return self.qk_nope_head_dim + self.qk_rope_head_dim
        return self.head_dim or (self.hidden_size // self.num_attention_heads)

    def layer_type(self, layer_idx: int) -> str:
        """Attention type for a layer: full_attention / linear_attention / sliding_attention."""
        if self.layer_types is not None:
            return self.layer_types[layer_idx]
        return "full_attention"

    def layer_is_moe(self, layer_idx: int) -> bool:
        return self.is_moe and layer_idx >= self.first_k_dense_replace

    @property
    def num_moe_layers(self) -> int:
        return sum(self.layer_is_moe(i) for i in range(self.num_hidden_layers))

    # ------------------------------------------------------------------
    # Parsing
    # ------------------------------------------------------------------

    @classmethod
    def from_model_path(cls, model_path: str) -> "ModelConfig":
        cfg_file = os.path.join(model_path, "config.json")
        if model_path.endswith(".gguf") or not os.path.exists(cfg_file):
            # GGUF checkpoint: synthesize the config from its metadata
            # (reference gguf.rs metadata → config path).
            from .utils.gguf_source import GgufCheckpoint

            ck = GgufCheckpoint(model_path)
            try:
                raw = ck.to_config_dict()
            finally:
                ck.close()
            cfg = cls.from_dict(raw, model_path="")
            cfg.model_path = model_path
            return cfg
        with open(cfg_file) as f:
            raw = json.load(f)
        return cls.from_dict(raw, model_path=model_path)

    @classmethod
    def from_dict(cls, raw: Dict[str, Any], model_path: str = "") -> "ModelConfig":
        # Nested configs: Kimi K2.5 uses text_config, DeepSeek-VL2 language_config.
        cfg = raw.get("text_config", raw.get("language_config", raw))

        if model_path:
            cfg = _infer_missing_from_weights(model_path, cfg)

        arch = cfg.get("model_type", "")
        is_mla = "kv_lora_rank" in cfg

        # first_k_dense_replace (DeepSeek) vs decoder_sparse_step (Qwen3-MoE).
        if "first_k_dense_replace" in cfg:
            first_k_dense = cfg["first_k_dense_replace"]
        elif "decoder_sparse_step" in cfg:
            step = cfg["decoder_sparse_step"]
            first_k_dense = 0 if step <= 1 else step
        else:
            first_k_dense = 0

        num_layers = cfg["num_hidden_layers"]

        # Hybrid layer types: explicit array (GPT-OSS) or computed from
        # full_attention_interval (Qwen3-Next: every Nth layer is full attn).
        full_interval = cfg.get("full_attention_interval", 0)
        layer_types = cfg.get("layer_types")
        if layer_types is None and full_interval > 0:
            layer_types = [
                "full_attention" if (i + 1) % full_interval == 0 else "linear_attention"
                for i in range(num_layers)
            ]

        # Expert-count field naming differs per family.
        n_experts = cfg.get(
            "n_routed_experts", cfg.get("num_experts", cfg.get("num_local_experts", 0))
        )
        experts_per_tok = cfg.get("num_experts_per_tok", cfg.get("experts_per_token", 0))
        moe_inter = cfg.get("moe_intermediate_size", cfg.get("intermediate_size", 0))

        # Shared experts: explicit count or inferred from a Qwen3-Next-style
        # shared_expert_intermediate_size.
        n_shared = cfg.get("n_shared_experts", 0)
        shared_inter = cfg.get("shared_expert_intermediate_size", 0)
        if n_shared == 0 and shared_inter > 0:
            n_shared = 1

        # RoPE params may be nested (Qwen3.5 rope_parameters).
        rope_params = cfg.get("rope_parameters") or {}
        rope_theta = cfg.get("rope_theta", rope_params.get("rope_theta", 10000.0))
        partial_rotary = cfg.get(
            "partial_rotary_factor", rope_params.get("partial_rotary_factor", 1.0)
        )

        # tie_word_embeddings: may live at top level; if absent anywhere,
        # presence of an lm_head weight in the index implies untied.
        tie_default = True
        if (
            "tie_word_embeddings" not in cfg
            and "tie_word_embeddings" not in raw
            and model_path
        ):
            index = _read_index(model_path)
            if index and any("lm_head.weight" in k for k in index):
                tie_default = False
        tie = cfg.get("tie_word_embeddings", raw.get("tie_word_embeddings", tie_default))

        # Qwen3-Next-style norms compute (1 + w) * x with w stored near 0.
        norm_plus_one = arch in ("qwen3_next", "qwen3_5_moe_text")

        quant_method = (cfg.get("quantization_config") or {}).get("quant_method", "")

        eos_raw = raw.get("eos_token_id", cfg.get("eos_token_id", 0))
        if isinstance(eos_raw, list):
            eos = eos_raw[0] if eos_raw else 0
            extra_stops = tuple(eos_raw[1:])
        else:
            eos, extra_stops = eos_raw, ()

        return cls(
            model_path=model_path,
            model_type=arch,
            hidden_size=cfg["hidden_size"],
            intermediate_size=cfg.get("intermediate_size", moe_inter),
            moe_intermediate_size=moe_inter,
            num_hidden_layers=num_layers,
            num_attention_heads=cfg["num_attention_heads"],
            num_key_value_heads=cfg.get("num_key_value_heads", cfg["num_attention_heads"]),
            vocab_size=cfg["vocab_size"],
            q_lora_rank=cfg.get("q_lora_rank") if is_mla else None,
            kv_lora_rank=cfg.get("kv_lora_rank") if is_mla else None,
            qk_nope_head_dim=cfg.get("qk_nope_head_dim") if is_mla else None,
            qk_rope_head_dim=cfg.get("qk_rope_head_dim") if is_mla else None,
            v_head_dim=cfg.get("v_head_dim") if is_mla else None,
            head_dim=cfg.get("head_dim") if not is_mla else None,
            qk_norm=cfg.get(
                "use_qk_norm",
                arch.startswith("qwen3") or arch in ("qwen3_5_moe_text",),
            ),
            attention_bias=cfg.get("attention_bias", False),
            sliding_window=cfg.get("sliding_window", 0) or 0,
            full_attention_interval=full_interval,
            layer_types=layer_types,
            linear_conv_kernel_dim=cfg.get("linear_conv_kernel_dim", 4),
            linear_key_head_dim=cfg.get("linear_key_head_dim", 128),
            linear_num_key_heads=cfg.get("linear_num_key_heads", 16),
            linear_value_head_dim=cfg.get("linear_value_head_dim", 128),
            linear_num_value_heads=cfg.get("linear_num_value_heads", 32),
            n_routed_experts=n_experts,
            num_experts_per_tok=experts_per_tok,
            n_shared_experts=n_shared,
            shared_expert_intermediate_size=shared_inter,
            first_k_dense_replace=first_k_dense,
            routed_scaling_factor=cfg.get("routed_scaling_factor", 1.0),
            scoring_func=cfg.get("scoring_func", "softmax"),
            topk_method=cfg.get("topk_method", "greedy"),
            n_group=cfg.get("n_group", 0) or 0,
            topk_group=cfg.get("topk_group", 0) or 0,
            # Qwen3.5 renormalizes top-k softmax weights even though its
            # config.json omits norm_topk_prob (hardcoded in HF modeling code).
            norm_topk_prob=cfg.get("norm_topk_prob", arch == "qwen3_5_moe_text"),
            moe_router_softmax_after_topk=arch == "gpt_oss",
            rms_norm_eps=cfg.get("rms_norm_eps", 1e-6),
            hidden_act=cfg.get("hidden_act", "silu"),
            norm_plus_one=norm_plus_one,
            swiglu_limit=cfg.get("swiglu_limit", 0.0) or 0.0,
            expert_quant_method=quant_method,
            rope_theta=rope_theta,
            rope_scaling=cfg.get("rope_scaling") or {},
            max_position_embeddings=cfg.get("max_position_embeddings", 131072),
            partial_rotary_factor=partial_rotary,
            num_nextn_predict_layers=cfg.get("num_nextn_predict_layers", 0),
            tie_word_embeddings=tie,
            bos_token_id=raw.get("bos_token_id", cfg.get("bos_token_id", 0)) or 0,
            eos_token_id=eos,
            extra_stop_token_ids=extra_stops,
            layers_prefix=_detect_layers_prefix(model_path) if model_path else "model",
        )


# --------------------------------------------------------------------------
# Safetensors-index helpers (pure stdlib; full reader lives in utils/)
# --------------------------------------------------------------------------

def _read_index(model_path: str) -> Dict[str, str]:
    """Return tensor-name → shard-file map from model.safetensors.index.json."""
    path = os.path.join(model_path, "model.safetensors.index.json")
    if not os.path.exists(path):
        single = os.path.join(model_path, "model.safetensors")
        if os.path.exists(single):
            # Single-file checkpoint: synthesize an index from its header.
            names = _read_safetensors_header(single).keys()
            return {n: "model.safetensors" for n in names if n != "__metadata__"}
        return {}
    with open(path) as f:
        return json.load(f).get("weight_map", {})


def _read_safetensors_header(path: str) -> Dict[str, Any]:
    with open(path, "rb") as f:
        (hlen,) = struct.unpack("<Q", f.read(8))
        return json.loads(f.read(hlen))


def _detect_layers_prefix(model_path: str) -> str:
    """Find the tensor-name prefix before '.layers.' (handles VL wrappers)."""
    index = _read_index(model_path)
    for key in index:
        pos = key.find(".layers.")
        if pos > 0 and ("self_attn" in key or "linear_attn" in key):
            return key[:pos]
    return "model"


def _infer_missing_from_weights(model_path: str, cfg: Dict[str, Any]) -> Dict[str, Any]:
    """Infer layer count / MLA dims from weight shapes for incomplete configs.

    DeepSeek-VL2-style checkpoints ship a language_config missing
    num_hidden_layers and the MLA dims; both are recoverable from tensor
    shapes in the safetensors headers.
    """
    have_basics = "num_hidden_layers" in cfg and "num_attention_heads" in cfg
    if have_basics and "kv_lora_rank" in cfg:
        return cfg

    index = _read_index(model_path)
    if not index:
        return cfg

    prefix = _detect_layers_prefix(model_path)
    cfg = dict(cfg)

    if "num_hidden_layers" not in cfg:
        layer_ids = set()
        marker = f"{prefix}.layers."
        for k in index:
            if k.startswith(marker):
                try:
                    layer_ids.add(int(k[len(marker):].split(".")[0]))
                except ValueError:
                    pass
        if layer_ids:
            cfg["num_hidden_layers"] = max(layer_ids) + 1

    kv_a_key = f"{prefix}.layers.0.self_attn.kv_a_proj_with_mqa.weight"
    if kv_a_key in index and "kv_lora_rank" not in cfg:
        header_cache: Dict[str, Dict[str, Any]] = {}

        def shape_of(name: str) -> Optional[List[int]]:
            shard = index.get(name)
            if not shard:
                return None
            if shard not in header_cache:
                header_cache[shard] = _read_safetensors_header(
                    os.path.join(model_path, shard)
                )
            info = header_cache[shard].get(name)
            return info["shape"] if info else None

        ln = shape_of(f"{prefix}.layers.0.self_attn.kv_a_layernorm.weight")
        kv_a = shape_of(kv_a_key)
        kv_b = shape_of(f"{prefix}.layers.0.self_attn.kv_b_proj.weight")
        o = shape_of(f"{prefix}.layers.0.self_attn.o_proj.weight")
        q = shape_of(f"{prefix}.layers.0.self_attn.q_proj.weight")
        if ln and kv_a and kv_b and o and q:
            kv_lora_rank = ln[0]
            rope_dim = kv_a[0] - kv_lora_rank
            total_v, total_kv_b, total_q = o[1], kv_b[0], q[0]
            for v_head in (128, 64, 96, 256):
                if total_v % v_head:
                    continue
                n_heads = total_v // v_head
                if total_kv_b % n_heads:
                    continue
                nope = total_kv_b // n_heads - v_head
                if nope > 0 and total_q == n_heads * (nope + rope_dim):
                    cfg.setdefault("kv_lora_rank", kv_lora_rank)
                    cfg.setdefault("qk_nope_head_dim", nope)
                    cfg.setdefault("qk_rope_head_dim", rope_dim)
                    cfg.setdefault("v_head_dim", v_head)
                    cfg.setdefault("num_attention_heads", n_heads)
                    cfg.setdefault("num_key_value_heads", n_heads)
                    break
    return cfg


# --------------------------------------------------------------------------
# Reference architecture presets (for synthetic models, tests, benchmarks)
# --------------------------------------------------------------------------

def preset_config(name: str, **overrides: Any) -> ModelConfig:
    """Built-in architecture descriptions for the reference's model zoo.

    These match the public config.json files of the models the reference
    supports (README.md:67-83) and let us build synthetic-weight engines
    for benchmarking without checkpoints on disk — the TPU analog of the
    reference's ``bench_decode_synthetic`` (decode.rs:4618).
    """
    presets: Dict[str, Dict[str, Any]] = {
        # DeepSeek V2-Lite: 16B total / 2.4B active, MLA, 64+2 experts top-6.
        "deepseek-v2-lite": dict(
            model_type="deepseek_v2",
            hidden_size=2048, intermediate_size=10944, moe_intermediate_size=1408,
            num_hidden_layers=27, num_attention_heads=16, num_key_value_heads=16,
            vocab_size=102400,
            kv_lora_rank=512, qk_nope_head_dim=128, qk_rope_head_dim=64,
            v_head_dim=128, q_lora_rank=None,
            n_routed_experts=64, num_experts_per_tok=6, n_shared_experts=2,
            first_k_dense_replace=1, routed_scaling_factor=1.0,
            scoring_func="softmax", norm_topk_prob=False,
            rms_norm_eps=1e-6, rope_theta=10000.0,
            rope_scaling=dict(
                type="yarn", factor=40.0, original_max_position_embeddings=4096,
                beta_fast=32, beta_slow=1, mscale=0.707, mscale_all_dim=0.707,
            ),
            max_position_embeddings=163840,
        ),
        # Qwen3-30B-A3B-style GQA MoE (also the shape of Qwen3-235B scaled down).
        "qwen3-moe": dict(
            model_type="qwen3_moe",
            hidden_size=2048, intermediate_size=6144, moe_intermediate_size=768,
            num_hidden_layers=48, num_attention_heads=32, num_key_value_heads=4,
            vocab_size=151936, head_dim=128, qk_norm=True,
            n_routed_experts=128, num_experts_per_tok=8,
            norm_topk_prob=True, rms_norm_eps=1e-6, rope_theta=1000000.0,
        ),
        # Qwen3-235B-A22B: GQA, 128 experts top-8.
        "qwen3-235b": dict(
            model_type="qwen3_moe",
            hidden_size=4096, intermediate_size=12288, moe_intermediate_size=1536,
            num_hidden_layers=94, num_attention_heads=64, num_key_value_heads=4,
            vocab_size=151936, head_dim=128, qk_norm=True,
            n_routed_experts=128, num_experts_per_tok=8,
            norm_topk_prob=True, rms_norm_eps=1e-6, rope_theta=1000000.0,
        ),
        # Qwen3-Coder-Next-80B (QCN): hybrid 36 DeltaNet + 12 GQA, 512 experts.
        "qwen3-coder-next": dict(
            model_type="qwen3_next",
            hidden_size=2048, intermediate_size=5120, moe_intermediate_size=512,
            num_hidden_layers=48, num_attention_heads=16, num_key_value_heads=2,
            vocab_size=151936, head_dim=256, qk_norm=True, norm_plus_one=True,
            full_attention_interval=4,
            layer_types=[
                "full_attention" if (i + 1) % 4 == 0 else "linear_attention"
                for i in range(48)
            ],
            linear_conv_kernel_dim=4, linear_key_head_dim=128,
            linear_num_key_heads=16, linear_value_head_dim=128,
            linear_num_value_heads=32,
            n_routed_experts=512, num_experts_per_tok=10, n_shared_experts=1,
            shared_expert_intermediate_size=512,
            norm_topk_prob=True, rms_norm_eps=1e-6, rope_theta=10000000.0,
            partial_rotary_factor=0.25,
        ),
        # Qwen3.5-35B-A3B: hybrid 30 DeltaNet + 10 GQA, 256 experts top-8
        # (reference README.md:72 "256 routed, top-8, Hybrid (30 linear +
        # 10 GQA)"); QCN-family layer shapes at 40 layers.
        # CONFIRMED by the reference: num_hidden_layers=40, 256 experts,
        # top-8, hybrid 3:1 ratio. ASSUMED (extrapolated from the QCN
        # preset, no config.json available): hidden_size, head counts,
        # head_dim, moe_intermediate_size, rope_theta, DeltaNet dims —
        # verify against the real Qwen3.5-35B-A3B config.json when one is
        # available before trusting synthetic numbers as model-exact.
        "qwen3.5-35b": dict(
            model_type="qwen3_5_moe_text",
            hidden_size=2048, intermediate_size=5120, moe_intermediate_size=512,
            num_hidden_layers=40, num_attention_heads=16, num_key_value_heads=2,
            vocab_size=151936, head_dim=256, qk_norm=True, norm_plus_one=True,
            full_attention_interval=4,
            layer_types=[
                "full_attention" if (i + 1) % 4 == 0 else "linear_attention"
                for i in range(40)
            ],
            linear_conv_kernel_dim=4, linear_key_head_dim=128,
            linear_num_key_heads=16, linear_value_head_dim=128,
            linear_num_value_heads=32,
            n_routed_experts=256, num_experts_per_tok=8, n_shared_experts=1,
            shared_expert_intermediate_size=512,
            norm_topk_prob=True, rms_norm_eps=1e-6, rope_theta=10000000.0,
            partial_rotary_factor=0.25,
        ),
        # GPT-OSS-120B: 128 experts top-4, alternating sliding(128)/full GQA
        # with learned attention sinks, biased projections, clamped
        # gate*sigmoid(gate*α)*(up+1) activation (reference moe.rs:268-287,
        # weights/mod.rs:4682-4738 handles this family's MXFP4 checkpoints).
        "gpt-oss-120b": dict(
            model_type="gpt_oss",
            hidden_size=2880, intermediate_size=2880, moe_intermediate_size=2880,
            num_hidden_layers=36, num_attention_heads=64, num_key_value_heads=8,
            vocab_size=201088, head_dim=64, qk_norm=False,
            attention_bias=True, sliding_window=128,
            layer_types=[
                "sliding_attention" if i % 2 == 0 else "full_attention"
                for i in range(36)
            ],
            n_routed_experts=128, num_experts_per_tok=4,
            moe_router_softmax_after_topk=True,
            swiglu_limit=7.0, rms_norm_eps=1e-5, rope_theta=150000.0,
            rope_scaling=dict(
                rope_type="yarn", factor=32.0,
                original_max_position_embeddings=4096,
                beta_fast=32.0, beta_slow=1.0,
            ),
            max_position_embeddings=131072,
        ),
    }
    # Qwen3.5 architecture scaled to one 16GB chip (64 of 256 experts):
    # same hidden/attention/DeltaNet shapes so per-layer latency is
    # representative; expert count is what multi-chip EP adds back.
    presets["qwen35-1chip"] = dict(
        presets["qwen3.5-35b"],
        n_routed_experts=64, num_experts_per_tok=8,
    )
    # GPT-OSS-20B: same family at 24 layers / 32 experts — fits one chip.
    presets["gpt-oss-20b"] = dict(
        presets["gpt-oss-120b"],
        num_hidden_layers=24, n_routed_experts=32,
        layer_types=[
            "sliding_attention" if i % 2 == 0 else "full_attention"
            for i in range(24)
        ],
    )
    # QCN architecture scaled to one 16GB chip (64 of 512 experts): same
    # hidden/attention/DeltaNet shapes, so per-layer latency is
    # representative; expert count is what multi-chip EP adds back.
    presets["qcn-1chip"] = dict(
        presets["qwen3-coder-next"],
        n_routed_experts=64, num_experts_per_tok=10,
    )
    if name not in presets:
        raise KeyError(f"unknown preset '{name}'; have {sorted(presets)}")
    kw = dict(presets[name])
    kw.update(overrides)
    kw.setdefault("model_path", f"synthetic://{name}")
    return ModelConfig(**kw)


# --------------------------------------------------------------------------
# Pipeline-parallel partition helpers (reference config.py:529-581)
# --------------------------------------------------------------------------

def compute_pp_partition(num_layers: int, pp_size: int) -> List[int]:
    """Split `num_layers` into pp_size near-equal contiguous stages
    (reference compute_pp_partition). The reference deprecates PP in favor
    of EP in practice (launcher.py:971); these helpers keep config parity
    for PP-style layer-stage sharding."""
    base = num_layers // pp_size
    rem = num_layers % pp_size
    return [base + (1 if i < rem else 0) for i in range(pp_size)]


def build_pp_ranks(partition: List[int]) -> List[Tuple[int, int]]:
    """[(start_layer, end_layer)) per stage from a partition list
    (reference build_pp_ranks)."""
    ranks = []
    start = 0
    for n in partition:
        ranks.append((start, start + n))
        start += n
    return ranks
