"""Checkpoint loading: safetensors/GGUF → quantized param pytree.

The TPU analog of the reference's weight store
(reference src/weights/mod.rs:1181 load_from_hf, :3251 load_from_gguf):
streams tensors shard-by-shard, quantizes experts group-wise to
INT4/INT8, and persists the quantized result in a versioned on-disk cache
keyed by a config hash so later loads are a straight mmap read
(reference "KRAS" cache, mod.rs:857-894). Non-expert weights follow the
QuantConfig component policy (attention BF16, shared/dense/lm_head INT8
by default — ADVANCED.md:30-47 precision map).

Tensor-name schema covers DeepSeek V2/V3 (MLA, optional q-LoRA, shared
experts), Qwen3/Qwen3-235B (GQA + qk-norm), Qwen3-Next/QCN/Qwen3.5
(hybrid DeltaNet + gated attention + gated shared expert), Kimi K2.5 and
VL wrappers (prefix detection), and GPT-OSS (fused expert tensors,
sinks, biases).
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Any, Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp
from ml_dtypes import bfloat16, float8_e4m3fn

from ..config import ModelConfig, QuantConfig
from ..quant import QTensor, pack_int4_np, quantize_host, quantize_np
from ..utils.safetensors_io import ShardedSafetensors
from .params import layer_specs, stack_layer_list

CACHE_VERSION = 2


def _checkpoint_fingerprint(model_path: str) -> str:
    """Cheap content fingerprint: (name, size, mtime) of every weight /
    index file, so replacing checkpoint files in place invalidates the
    quantized cache (reference keys its KRAS cache on source bytes too)."""
    entries = []
    if os.path.isdir(model_path):
        for f in sorted(os.listdir(model_path)):
            if f.endswith((".safetensors", ".gguf", ".json")):
                st = os.stat(os.path.join(model_path, f))
                entries.append((f, st.st_size, int(st.st_mtime)))
    elif os.path.exists(model_path):
        st = os.stat(model_path)
        entries.append((os.path.basename(model_path), st.st_size,
                        int(st.st_mtime)))
    return json.dumps(entries)


def _cache_dir(cfg: ModelConfig, quant: QuantConfig) -> str:
    base = os.environ.get(
        "KRASIS_TPU_HOME", os.path.expanduser("~/.krasis_tpu")
    )
    # Every QuantConfig field participates: any precision-policy change
    # must miss the cache (stale INT8-attention weights served under a
    # BF16-attention config would silently change numerics).
    tag = json.dumps(
        [CACHE_VERSION, sorted(vars(quant).items(), key=str)],
        sort_keys=True, default=str,
    )
    h = hashlib.sha256(
        (tag + cfg.model_path + str(cfg.num_hidden_layers)
         + _checkpoint_fingerprint(cfg.model_path)).encode()
    ).hexdigest()[:16]
    name = os.path.basename(os.path.normpath(cfg.model_path)) or "model"
    return os.path.join(base, "cache", f"{name}-{h}")


def _to_host(a: np.ndarray, dtype=jnp.bfloat16) -> np.ndarray:
    if dtype == jnp.float32 or dtype == np.float32:
        np_dt = np.float32
    else:
        np_dt = bfloat16
    return np.ascontiguousarray(np.asarray(a).astype(np_dt))


def _qt_host(qt: QTensor) -> QTensor:
    return QTensor(
        q=np.ascontiguousarray(np.asarray(qt.q)),
        scales=np.ascontiguousarray(np.asarray(qt.scales).astype(bfloat16)),
        bits=qt.bits, group_size=qt.group_size,
    )


class WeightLoader:
    """Streams a checkpoint into the params pytree (~one tensor of
    transient host RAM at a time, reference weight_loader.py:102)."""

    def __init__(self, cfg: ModelConfig, quant: QuantConfig, dtype=jnp.bfloat16):
        self.cfg = cfg
        self.quant = quant
        self.dtype = dtype           # storage dtype for non-quantized weights
        self._np_dtype = bfloat16 if dtype == jnp.bfloat16 else np.float32
        if cfg.model_path.endswith(".gguf") or (
            os.path.isdir(cfg.model_path)
            and not os.path.exists(os.path.join(cfg.model_path, "config.json"))
            and any(f.endswith(".gguf") for f in os.listdir(cfg.model_path))
        ):
            from ..utils.gguf_source import GgufCheckpoint

            self.st = GgufCheckpoint(cfg.model_path)
            self.prefix = "model"
        else:
            self.st = ShardedSafetensors(cfg.model_path)
            self.prefix = cfg.layers_prefix

    # -- helpers ------------------------------------------------------------

    def _has(self, name: str) -> bool:
        """Tensor present, either raw or as a prequantized variant."""
        if name in self.st:
            return True
        return name.endswith(".weight") and (
            name[: -len(".weight")] + ".weight_packed" in self.st
        )

    @property
    def _ct_group_size(self) -> int:
        """compressed-tensors group size from config.json's
        quantization_config (default 128)."""
        if not hasattr(self, "_ct_gs"):
            gs = 128
            try:
                with open(os.path.join(self.cfg.model_path,
                                       "config.json")) as f:
                    qc = json.load(f).get("quantization_config", {})
                for grp in qc.get("config_groups", {}).values():
                    gs = int(grp.get("weights", {}).get("group_size", gs))
                    break
            except (OSError, ValueError):
                pass
            self._ct_gs = gs
        return self._ct_gs

    def _get(self, name: str, required: bool = True) -> Optional[np.ndarray]:
        """Fetch a tensor, transparently dequantizing prequantized input
        formats (reference src/weights/mod.rs:4675-4738):

        * FP8 block-quant (DeepSeek V3 official): fp8 `weight` +
          `weight_scale_inv` per 128x128 block;
        * compressed-tensors pack-quantized INT4: `weight_packed` int32 +
          `weight_scale` per input group.

        The dequantized f32 then flows through the normal requantize-to-
        cache path (same as the MXFP4 route)."""
        if name in self.st:
            t = self.st.tensor(name)
            if (np.dtype(t.dtype) == np.dtype(float8_e4m3fn)
                    and f"{name}_scale_inv" in self.st):
                from ..quant import dequant_fp8_block_np

                return dequant_fp8_block_np(
                    t, self.st.tensor(f"{name}_scale_inv"))
            return t
        if name.endswith(".weight"):
            base = name[: -len(".weight")]
            if f"{base}.weight_packed" in self.st:
                from ..quant import dequant_compressed_int4_np

                return dequant_compressed_int4_np(
                    np.asarray(self.st.tensor(f"{base}.weight_packed")),
                    np.asarray(self.st.tensor(f"{base}.weight_scale")),
                    self._ct_group_size,
                )
        if required:
            raise KeyError(f"missing tensor {name}")
        return None

    def _linear(self, name: str, mode: str) -> Any:
        """Load a [out, in] checkpoint matrix as math-orientation [in, out],
        quantized per `mode` ('bf16' | 'int8' | 'int4')."""
        w = np.asarray(self._get(name), dtype=np.float32).T  # [K, N]
        if mode == "bf16":
            return np.ascontiguousarray(w.astype(self._np_dtype))
        bits = {"int8": 8, "int4": 4}[mode]
        return _qt_host(quantize_host(w, bits=bits, group_size=self.quant.group_size))

    def _norm(self, name: str) -> np.ndarray:
        return _to_host(self._get(name), self.dtype)

    # -- main ---------------------------------------------------------------

    def load(self) -> Dict[str, Any]:
        cfg, q = self.cfg, self.quant
        P = self.prefix
        params: Dict[str, Any] = self.load_head()
        layers = [
            self._load_layer(i, spec) for i, spec in enumerate(layer_specs(cfg))
        ]
        params.update(stack_layer_list(layers, cfg))
        if self.has_mtp():
            params["mtp"] = self._load_mtp()
        return params

    def has_mtp(self) -> bool:
        """Checkpoint ships an MTP module (DeepSeek V3/Kimi layer at index
        num_hidden_layers with enorm/hnorm/eh_proj + shared head)."""
        cfg = self.cfg
        return cfg.num_nextn_predict_layers > 0 and self._has(
            f"{self.prefix}.layers.{cfg.num_hidden_layers}.eh_proj.weight"
        )

    def _load_mtp(self, expert_sink=None) -> Dict[str, Any]:
        """MTP module weights (models/mtp.py). The wrapped decoder layer
        reuses the normal layer schema at index num_hidden_layers; the
        module's embed_tokens copy is skipped (tied to the main one)."""
        from .params import mtp_layer_spec

        cfg, q = self.cfg, self.quant
        L = f"{self.prefix}.layers.{cfg.num_hidden_layers}"
        mtp: Dict[str, Any] = {
            "enorm": self._norm(f"{L}.enorm.weight"),
            "hnorm": self._norm(f"{L}.hnorm.weight"),
            "eh_proj": self._linear(f"{L}.eh_proj.weight", q.attention),
            "final_norm": self._norm(f"{L}.shared_head.norm.weight"),
            "layer": self._load_layer(
                cfg.num_hidden_layers, mtp_layer_spec(cfg),
                expert_sink=expert_sink,
            ),
        }
        head = f"{L}.shared_head.head.weight"
        if self._has(head):
            mtp["head"] = self._linear(head, q.lm_head)
        return mtp

    def load_head(self) -> Dict[str, Any]:
        """embed / final_norm / lm_head (host arrays)."""
        cfg, q = self.cfg, self.quant
        P = self.prefix
        params: Dict[str, Any] = {
            "embed": _to_host(self._get(f"{P}.embed_tokens.weight"), self.dtype),
            "final_norm": self._norm(f"{P}.norm.weight"),
        }
        if cfg.tie_word_embeddings:
            params["lm_head"] = np.ascontiguousarray(
                np.asarray(self._get(f"{P}.embed_tokens.weight"))
                .astype(self._np_dtype).T
            )
        else:
            lm_name = "lm_head.weight"
            if not self._has(lm_name):
                lm_name = f"{P}.lm_head.weight"
            params["lm_head"] = self._linear(lm_name, q.lm_head)
        return params

    def _load_layer(self, i: int, spec, expert_sink=None) -> Dict[str, Any]:
        cfg, q = self.cfg, self.quant
        L = f"{self.prefix}.layers.{i}"
        lp: Dict[str, Any] = {
            "input_norm": self._norm(f"{L}.input_layernorm.weight"),
            "post_norm": self._norm(f"{L}.post_attention_layernorm.weight"),
        }
        att = q.attention  # bf16 per policy

        if spec.attn_kind == "gqa":
            A = f"{L}.self_attn"
            lp["q_proj"] = self._linear(f"{A}.q_proj.weight", att)
            lp["k_proj"] = self._linear(f"{A}.k_proj.weight", att)
            lp["v_proj"] = self._linear(f"{A}.v_proj.weight", att)
            lp["o_proj"] = self._linear(f"{A}.o_proj.weight", att)
            for pn, key in [("q_bias", "q_proj.bias"), ("k_bias", "k_proj.bias"),
                            ("v_bias", "v_proj.bias"), ("o_bias", "o_proj.bias")]:
                t = self._get(f"{A}.{key}", required=False)
                if t is not None:
                    lp[pn] = _to_host(t)
            if cfg.qk_norm:
                lp["q_norm"] = self._norm(f"{A}.q_norm.weight")
                lp["k_norm"] = self._norm(f"{A}.k_norm.weight")
            sinks = self._get(f"{A}.sinks", required=False)
            if sinks is not None:
                lp["sinks"] = np.asarray(sinks, np.float32)
        elif spec.attn_kind == "mla":
            A = f"{L}.self_attn"
            if cfg.q_lora_rank:
                lp["q_a_proj"] = self._linear(f"{A}.q_a_proj.weight", att)
                lp["q_a_norm"] = self._norm(f"{A}.q_a_layernorm.weight")
                lp["q_b_proj"] = self._linear(f"{A}.q_b_proj.weight", att)
            else:
                lp["q_proj"] = self._linear(f"{A}.q_proj.weight", att)
            lp["kv_a_proj"] = self._linear(
                f"{A}.kv_a_proj_with_mqa.weight",
                "int8" if att == "int4" else att)  # latent proj: int8 floor
            lp["kv_a_norm"] = self._norm(f"{A}.kv_a_layernorm.weight")
            # kv_b_proj [(hq*(dn+dv)), L] → absorbed split (always BF16:
            # quality-critical, reference keeps kv_b BF16).
            kv_b = np.asarray(self._get(f"{A}.kv_b_proj.weight"), np.float32)
            hq, dn, dv = cfg.num_attention_heads, cfg.qk_nope_head_dim, cfg.v_head_dim
            Lr = cfg.kv_lora_rank
            kv_b = kv_b.reshape(hq, dn + dv, Lr)
            lp["w_kc"] = np.ascontiguousarray(
                kv_b[:, :dn, :].astype(self._np_dtype))                 # [hq, dn, L]
            lp["w_vc"] = np.ascontiguousarray(
                kv_b[:, dn:, :].transpose(0, 2, 1).astype(self._np_dtype)  # [hq, L, dv]
            )
            lp["o_proj"] = self._linear(f"{A}.o_proj.weight", att)
        else:  # linear attention (Gated DeltaNet)
            A = f"{L}.linear_attn"
            # recurrent path: int8 floor under attention="int4" (decay
            # gates compound weight noise over the sequence)
            la_mode = "int8" if att == "int4" else att
            lp["qkvz_proj"] = self._linear(f"{A}.in_proj_qkvz.weight", la_mode)
            lp["ba_proj"] = self._linear(f"{A}.in_proj_ba.weight", la_mode)
            conv = np.asarray(self._get(f"{A}.conv1d.weight"), np.float32)  # [C,1,K]
            lp["conv_w"] = np.ascontiguousarray(conv[:, 0, :].astype(self._np_dtype))
            lp["dt_bias"] = np.asarray(self._get(f"{A}.dt_bias"), np.float32)
            lp["a_log"] = np.asarray(self._get(f"{A}.A_log"), np.float32)
            lp["la_norm"] = self._norm(f"{A}.norm.weight")
            lp["la_out_proj"] = self._linear(f"{A}.out_proj.weight", la_mode)

        if spec.mlp_kind == "moe":
            lp.update(self._load_moe(i, expert_sink=expert_sink))
        else:
            M = f"{L}.mlp"
            lp["mlp_w13"] = self._fused_w13(
                f"{M}.gate_proj.weight", f"{M}.up_proj.weight", q.dense_mlp
            )
            lp["mlp_w2"] = self._linear(f"{M}.down_proj.weight", q.dense_mlp)
        return lp

    def _fused_w13(self, gate_name: str, up_name: str, mode: str) -> Any:
        gate = np.asarray(self._get(gate_name), np.float32).T  # [H, I]
        up = np.asarray(self._get(up_name), np.float32).T
        w13 = np.concatenate([gate, up], axis=-1)              # [H, 2I]
        if mode == "bf16":
            return np.ascontiguousarray(w13.astype(self._np_dtype))
        bits = {"int8": 8, "int4": 4}[mode]
        return _qt_host(quantize_host(w13, bits=bits, group_size=self.quant.group_size))

    def _iter_experts(self, i: int):
        """Yield (e, w13_e [H, 2I] f32, w2_e [I, H] f32) one expert at a
        time — never a whole layer stack (reference mod.rs:1181 streams +
        quantizes per expert). Handles per-expert tensors, GPT-OSS fused
        bf16, and MXFP4 prequantized blocks."""
        cfg = self.cfg
        M = f"{self.prefix}.layers.{i}.mlp"
        E, I = cfg.n_routed_experts, cfg.moe_intermediate_size

        if f"{M}.experts.gate_up_proj_blocks" in self.st:
            # GPT-OSS MXFP4 prequantized (reference mod.rs:4682): dequant
            # e2m1 blocks + e8m0 scales per expert, requantize downstream.
            from ..quant import dequant_mxfp4_np

            gu_b = self._get(f"{M}.experts.gate_up_proj_blocks")
            gu_s = self._get(f"{M}.experts.gate_up_proj_scales")
            dn_b = self._get(f"{M}.experts.down_proj_blocks")
            dn_s = self._get(f"{M}.experts.down_proj_scales")
            for e in range(E):
                gu = dequant_mxfp4_np(
                    np.asarray(gu_b[e]), np.asarray(gu_s[e])).T  # [H, 2I]
                gate, up = gu[..., ::2], gu[..., 1::2]
                w13_e = np.concatenate([gate, up], axis=-1)
                w2_e = dequant_mxfp4_np(
                    np.asarray(dn_b[e]), np.asarray(dn_s[e])).T   # [I, H]
                yield e, w13_e, w2_e
            return

        if f"{M}.experts.gate_up_proj" in self.st:   # GPT-OSS fused bf16
            gu = self._get(f"{M}.experts.gate_up_proj")   # mmap [E, H, 2I]
            dn = self._get(f"{M}.experts.down_proj")      # mmap [E, I, H]
            for e in range(E):
                gu_e = np.asarray(gu[e], np.float32)
                gate, up = gu_e[..., ::2], gu_e[..., 1::2]
                yield e, np.concatenate([gate, up], axis=-1), np.asarray(
                    dn[e], np.float32)
            return

        H = cfg.hidden_size
        for e in range(E):
            Ex = f"{M}.experts.{e}"
            w13_e = np.empty((H, 2 * I), np.float32)
            w13_e[:, :I] = np.asarray(
                self._get(f"{Ex}.gate_proj.weight"), np.float32).T
            w13_e[:, I:] = np.asarray(
                self._get(f"{Ex}.up_proj.weight"), np.float32).T
            w2_e = np.asarray(
                self._get(f"{Ex}.down_proj.weight"), np.float32).T
            yield e, w13_e, w2_e

    def _load_moe(self, i: int, expert_sink=None) -> Dict[str, Any]:
        """MoE layer leaves. With `expert_sink(e, w13_e, w2_e)` the routed
        expert stacks are STREAMED to the sink (cache build path: bounded
        host RSS) instead of materialized; otherwise they are stacked in
        host memory (direct-load path for small models/tests)."""
        cfg, q = self.cfg, self.quant
        L = f"{self.prefix}.layers.{i}"
        M = f"{L}.mlp"
        lp: Dict[str, Any] = {}
        gate_name = f"{M}.gate.weight"
        if not self._has(gate_name):
            gate_name = f"{M}.router.weight"  # GPT-OSS naming
        lp["gate_w"] = np.ascontiguousarray(
            np.asarray(self._get(gate_name), np.float32).T
        )
        bias = self._get(f"{M}.gate.e_score_correction_bias", required=False)
        if bias is not None:
            lp["gate_bias"] = np.asarray(bias, np.float32)
        rbias = self._get(f"{M}.router.bias", required=False)
        if rbias is not None:  # GPT-OSS: bias inside the routed logits
            lp["gate_logit_bias"] = np.asarray(rbias, np.float32)

        # per-expert biases (GPT-OSS): gate/up interleaved → de-interleave
        gub = self._get(f"{M}.experts.gate_up_proj_bias", required=False)
        dnb = self._get(f"{M}.experts.down_proj_bias", required=False)
        if gub is not None:
            gub = np.asarray(gub, np.float32)
            lp["w13_bias"] = np.concatenate(
                [gub[..., ::2], gub[..., 1::2]], axis=-1)
        if dnb is not None:
            lp["w2_bias"] = np.asarray(dnb, np.float32)

        E = cfg.n_routed_experts
        H, I = cfg.hidden_size, cfg.moe_intermediate_size
        gs = q.group_size
        bits = q.expert_bits

        if expert_sink is not None and bits in (4, 8):
            for e, w13_e, w2_e in self._iter_experts(i):
                expert_sink(e, w13_e, w2_e)
        elif bits == 16:  # full-precision experts (parity tests)
            w13_np = np.empty((E, H, 2 * I), self._np_dtype)
            w2_np = np.empty((E, I, H), self._np_dtype)
            for e, w13_e, w2_e in self._iter_experts(i):
                w13_np[e] = w13_e
                w2_np[e] = w2_e
            lp["w13"] = w13_np
            lp["w2"] = w2_np
        else:
            from ..quant import pick_group_size

            gs13 = pick_group_size(H, gs)
            gs2 = pick_group_size(I, gs)
            r13 = H // 2 if bits == 4 else H
            r2 = I // 2 if bits == 4 else I
            q13 = np.empty((E, r13, 2 * I), np.int8)
            s13 = np.empty((E, H // gs13, 2 * I), bfloat16)
            q2 = np.empty((E, r2, H), np.int8)
            s2 = np.empty((E, I // gs2, H), bfloat16)
            for e, w13_e, w2_e in self._iter_experts(i):
                qt = quantize_host(w13_e, bits=bits, group_size=gs)
                q13[e], s13[e] = qt.q, qt.scales
                qt = quantize_host(w2_e, bits=bits, group_size=gs)
                q2[e], s2[e] = qt.q, qt.scales
            lp["w13"] = QTensor(q13, s13, bits, gs13)
            lp["w2"] = QTensor(q2, s2, bits, gs2)

        # Shared expert(s): Qwen3-Next `shared_expert`, DeepSeek `shared_experts`.
        for sh in (f"{M}.shared_expert", f"{M}.shared_experts"):
            if self._has(f"{sh}.gate_proj.weight"):
                lp["shared_w13"] = self._fused_w13(
                    f"{sh}.gate_proj.weight", f"{sh}.up_proj.weight",
                    q.shared_expert,
                )
                lp["shared_w2"] = self._linear(
                    f"{sh}.down_proj.weight", q.shared_expert)
                break
        sg = self._get(f"{M}.shared_expert_gate.weight", required=False)
        if sg is not None:
            lp["shared_gate_w"] = np.ascontiguousarray(
                np.asarray(sg, np.float32).T.astype(self._np_dtype))
        return lp


def _dest(info, i: int):
    """(kind, group, index-prefix) for global layer i in pattern layout."""
    if i < info.prefix_n:
        return "prefix", i, None
    t = (i - info.prefix_n) % info.period
    r = (i - info.prefix_n) // info.period
    return "pattern", t, r


def build_cache(cfg: ModelConfig, quant: QuantConfig, cache_path: str,
                dtype=jnp.bfloat16):
    """Stream a checkpoint into the mmap cache (models/weight_cache.py).

    Peak host RSS is bounded by ~2 expert tensors: stacked expert regions
    are allocated once and written expert-by-expert through the native
    quantizer; everything else is small per-layer leaves
    (reference src/weights/mod.rs:1181 streaming build)."""
    from ..quant import pick_group_size
    from .params import pattern_info
    from .weight_cache import CacheWriter

    wl = WeightLoader(cfg, quant, dtype=dtype)
    cw = CacheWriter(cache_path)
    try:
        info = pattern_info(cfg)
        for k, v in wl.load_head().items():
            cw.add_leaf(f"head/{k}", "head", v)

        H, I = cfg.hidden_size, cfg.moe_intermediate_size
        E = cfg.n_routed_experts
        bits, gs = quant.expert_bits, quant.group_size

        def put_stacked(key, group, r, reps, leaf):
            """Small per-layer leaf into its [reps, ...] stacked region."""
            if isinstance(leaf, QTensor):
                if f"{key}.q" not in cw.index:
                    cw.alloc(f"{key}.q", group, (reps,) + leaf.q.shape,
                             np.int8, bits=leaf.bits,
                             group_size=leaf.group_size)
                    cw.alloc(f"{key}.scales", group,
                             (reps,) + leaf.scales.shape, bfloat16,
                             bits=leaf.bits, group_size=leaf.group_size)
                cw.write_at(f"{key}.q", (r,), np.asarray(leaf.q))
                cw.write_at(f"{key}.scales", (r,), np.asarray(leaf.scales))
            else:
                arr = np.asarray(leaf)
                if key not in cw.index:
                    cw.alloc(key, group, (reps,) + arr.shape, arr.dtype)
                cw.write_at(key, (r,), arr)

        for i, spec in enumerate(layer_specs(cfg)):
            kind, t, r = _dest(info, i)
            group = f"{kind}_{t:02d}"
            base = f"{kind}/{t}"
            stream = spec.mlp_kind == "moe" and bits in (4, 8)

            sink = None
            if stream:
                gs13, gs2 = pick_group_size(H, gs), pick_group_size(I, gs)
                r13 = H // 2 if bits == 4 else H
                r2 = I // 2 if bits == 4 else I
                lead = () if r is None else (info.reps,)
                for key, qshape, sshape, g in (
                    (f"{base}/w13", (E, r13, 2 * I), (E, H // gs13, 2 * I), gs13),
                    (f"{base}/w2", (E, r2, H), (E, I // gs2, H), gs2),
                ):
                    if f"{key}.q" not in cw.index:
                        cw.alloc_qtensor(key, group, lead + qshape,
                                         lead + sshape, bits, g)

                def sink(e, w13_e, w2_e, _base=base, _r=r):
                    idx = (e,) if _r is None else (_r, e)
                    qt = quantize_host(w13_e, bits=bits, group_size=gs)
                    cw.write_at(f"{_base}/w13.q", idx, qt.q)
                    cw.write_at(f"{_base}/w13.scales", idx, qt.scales)
                    qt = quantize_host(w2_e, bits=bits, group_size=gs)
                    cw.write_at(f"{_base}/w2.q", idx, qt.q)
                    cw.write_at(f"{_base}/w2.scales", idx, qt.scales)

            lp = wl._load_layer(i, spec, expert_sink=sink)
            for name, leaf in lp.items():
                key = f"{base}/{name}"
                if r is None:
                    if f"{key}.q" not in cw.index and key not in cw.index:
                        cw.add_leaf(key, group, leaf)
                else:
                    put_stacked(key, group, r, info.reps, leaf)

        if wl.has_mtp():
            from .params import mtp_layer_spec

            spec = mtp_layer_spec(cfg)
            sink = None
            if spec.mlp_kind == "moe" and bits in (4, 8):
                gs13, gs2 = pick_group_size(H, gs), pick_group_size(I, gs)
                r13 = H // 2 if bits == 4 else H
                r2 = I // 2 if bits == 4 else I
                cw.alloc_qtensor("mtp/layer/w13", "mtp", (E, r13, 2 * I),
                                 (E, H // gs13, 2 * I), bits, gs13)
                cw.alloc_qtensor("mtp/layer/w2", "mtp", (E, r2, H),
                                 (E, I // gs2, H), bits, gs2)

                def sink(e, w13_e, w2_e):
                    qt = quantize_host(w13_e, bits=bits, group_size=gs)
                    cw.write_at("mtp/layer/w13.q", (e,), qt.q)
                    cw.write_at("mtp/layer/w13.scales", (e,), qt.scales)
                    qt = quantize_host(w2_e, bits=bits, group_size=gs)
                    cw.write_at("mtp/layer/w2.q", (e,), qt.q)
                    cw.write_at("mtp/layer/w2.scales", (e,), qt.scales)

            mtp = wl._load_mtp(expert_sink=sink)
            layer = mtp.pop("layer")
            for name, leaf in mtp.items():
                cw.add_leaf(f"mtp/{name}", "mtp", leaf)
            for name, leaf in layer.items():
                key = f"mtp/layer/{name}"
                if f"{key}.q" not in cw.index and key not in cw.index:
                    cw.add_leaf(key, "mtp", leaf)
        cw.finalize(n_prefix=info.prefix_n, n_pattern=max(info.period, 0))
    except BaseException:
        cw.abort()
        raise


def place_params(params: Dict[str, Any], cfg: ModelConfig,
                 mesh=None) -> Dict[str, Any]:
    """Host (possibly memmap-backed) pytree → device arrays.

    With a mesh, every leaf is device_put DIRECTLY to its mesh placement
    (experts sharded over ep) — no full replica ever lands on one chip,
    so models larger than a single chip's HBM can load."""
    if mesh is not None:
        from ..parallel.mesh import shard_params

        return shard_params(params, cfg, mesh)
    return jax.tree_util.tree_map(lambda l: jnp.asarray(np.asarray(l)), params)


def _host_pytree(
    cfg: ModelConfig, quant: QuantConfig, dtype=jnp.bfloat16,
    use_cache: bool = True,
) -> Dict[str, Any]:
    """Host-side (mmap-backed when cached) parameter pytree, building the
    weight cache under the build lock if needed."""
    from .weight_cache import BuildLock, CacheReader

    d = _cache_dir(cfg, quant)
    if use_cache and dtype == jnp.bfloat16:
        if not os.path.exists(os.path.join(d, "meta.json")):
            os.makedirs(os.path.dirname(d), exist_ok=True)
            lock = BuildLock(d)
            state = lock.acquire()
            if state == "acquired":
                try:
                    if not os.path.exists(os.path.join(d, "meta.json")):
                        build_cache(cfg, quant, d, dtype=dtype)
                finally:
                    lock.release()
        return CacheReader(d).as_pytree()
    return WeightLoader(cfg, quant, dtype=dtype).load()


def load_params(
    cfg: ModelConfig, quant: QuantConfig, dtype=jnp.bfloat16,
    use_cache: bool = True, mesh=None,
) -> Dict[str, Any]:
    """Load (and quantize) a checkpoint into device memory, going through
    the versioned mmap weight cache when possible. Concurrent starts
    serialize on a build lock (losers wait for the winner's cache).

    The shared-expert fold (params.fold_shared_experts) is applied HERE,
    host-side on the CPU backend, before any leaf lands in HBM: the
    post-hoc device fold concatenates a second copy of every expert
    stack, transiently doubling multi-GB stacks — fine for tiny synthetic
    params, an OOM risk for full-size checkpoints. Engine's own fold call
    then no-ops (idempotent by stack shape)."""
    host = _host_pytree(cfg, quant, dtype=dtype, use_cache=use_cache)
    if quant.fold_shared_decode and mesh is None and cfg.n_shared_experts > 0:
        from .params import fold_shared_experts

        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            host = fold_shared_experts(host, cfg, quant)
        # back to numpy so place_params controls device placement
        host = jax.tree_util.tree_map(np.asarray, host)
    return place_params(host, cfg, mesh)


def load_params_offload(cfg: ModelConfig, quant: QuantConfig,
                        dtype=jnp.bfloat16, use_cache: bool = True):
    """Load for the host-RAM expert offload tier (krasis_tpu/offload):
    non-expert weights go to the device; routed experts stay HOST-side,
    pointed at IN PLACE in the mmap weight cache — the OS page cache is
    the expert store, no second RAM copy (the reference's mmap'd CPU
    decode cache philosophy, src/weights/mod.rs:955-1135 + decode.rs
    consolidate_weights_mmap). Returns (device_params, HostExpertStore).
    """
    from ..offload import store_from_params

    host = _host_pytree(cfg, quant, dtype=dtype, use_cache=use_cache)
    stripped, store = store_from_params(cfg, quant, host)
    if "mtp" in stripped and "w13" in stripped["mtp"].get("layer", {}):
        # MTP module experts: host-resident at index num_hidden_layers
        mtp_layer = dict(stripped["mtp"]["layer"])
        w13, w2 = mtp_layer.pop("w13"), mtp_layer.pop("w2")
        store.add_layer(
            cfg.num_hidden_layers, np.asarray(w13.q), np.asarray(w13.scales),
            np.asarray(w2.q), np.asarray(w2.scales),
        )
        stripped = dict(stripped)
        stripped["mtp"] = dict(stripped["mtp"], layer=mtp_layer)
    return place_params(stripped, cfg, mesh=None), store
