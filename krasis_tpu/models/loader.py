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
from ml_dtypes import bfloat16

from ..config import ModelConfig, QuantConfig
from ..quant import QTensor, pack_int4_np, quantize_host, quantize_np
from ..utils.safetensors_io import ShardedSafetensors
from .params import layer_specs, stack_layer_list

CACHE_VERSION = 1


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


def _to_jnp(a: np.ndarray, dtype=jnp.bfloat16) -> jax.Array:
    np_dt = bfloat16 if dtype == jnp.bfloat16 else np.float32
    return jnp.asarray(np.asarray(a).astype(np_dt))


def _qt_to_device(qt: QTensor) -> QTensor:
    return QTensor(
        q=jnp.asarray(np.asarray(qt.q)),
        scales=jnp.asarray(np.asarray(qt.scales).astype(bfloat16)),
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

    def _get(self, name: str, required: bool = True) -> Optional[np.ndarray]:
        if name not in self.st:
            if required:
                raise KeyError(f"missing tensor {name}")
            return None
        return self.st.tensor(name)

    def _linear(self, name: str, mode: str) -> Any:
        """Load a [out, in] checkpoint matrix as math-orientation [in, out],
        quantized per `mode` ('bf16' | 'int8' | 'int4')."""
        w = np.asarray(self._get(name), dtype=np.float32).T  # [K, N]
        if mode == "bf16":
            return jnp.asarray(w.astype(self._np_dtype))
        bits = {"int8": 8, "int4": 4}[mode]
        return _qt_to_device(quantize_host(w, bits=bits, group_size=self.quant.group_size))

    def _norm(self, name: str) -> jax.Array:
        return _to_jnp(self._get(name), self.dtype)

    # -- main ---------------------------------------------------------------

    def load(self) -> Dict[str, Any]:
        cfg, q = self.cfg, self.quant
        P = self.prefix
        params: Dict[str, Any] = {
            "embed": _to_jnp(self._get(f"{P}.embed_tokens.weight"), self.dtype),
            "final_norm": self._norm(f"{P}.norm.weight"),
        }
        if cfg.tie_word_embeddings:
            params["lm_head"] = jnp.asarray(
                np.asarray(self._get(f"{P}.embed_tokens.weight")).astype(self._np_dtype).T
            )
        else:
            lm_name = "lm_head.weight"
            if lm_name not in self.st:
                lm_name = f"{P}.lm_head.weight"
            params["lm_head"] = self._linear(lm_name, q.lm_head)

        layers = [
            self._load_layer(i, spec) for i, spec in enumerate(layer_specs(cfg))
        ]
        params.update(stack_layer_list(layers, cfg))
        return params

    def _load_layer(self, i: int, spec) -> Dict[str, Any]:
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
                    lp[pn] = _to_jnp(t)
            if cfg.qk_norm:
                lp["q_norm"] = self._norm(f"{A}.q_norm.weight")
                lp["k_norm"] = self._norm(f"{A}.k_norm.weight")
            sinks = self._get(f"{A}.sinks", required=False)
            if sinks is not None:
                lp["sinks"] = _to_jnp(sinks, jnp.float32)
        elif spec.attn_kind == "mla":
            A = f"{L}.self_attn"
            if cfg.q_lora_rank:
                lp["q_a_proj"] = self._linear(f"{A}.q_a_proj.weight", att)
                lp["q_a_norm"] = self._norm(f"{A}.q_a_layernorm.weight")
                lp["q_b_proj"] = self._linear(f"{A}.q_b_proj.weight", att)
            else:
                lp["q_proj"] = self._linear(f"{A}.q_proj.weight", att)
            lp["kv_a_proj"] = self._linear(f"{A}.kv_a_proj_with_mqa.weight", att)
            lp["kv_a_norm"] = self._norm(f"{A}.kv_a_layernorm.weight")
            # kv_b_proj [(hq*(dn+dv)), L] → absorbed split (always BF16:
            # quality-critical, reference keeps kv_b BF16).
            kv_b = np.asarray(self._get(f"{A}.kv_b_proj.weight"), np.float32)
            hq, dn, dv = cfg.num_attention_heads, cfg.qk_nope_head_dim, cfg.v_head_dim
            Lr = cfg.kv_lora_rank
            kv_b = kv_b.reshape(hq, dn + dv, Lr)
            lp["w_kc"] = jnp.asarray(kv_b[:, :dn, :].astype(self._np_dtype))     # [hq, dn, L]
            lp["w_vc"] = jnp.asarray(
                kv_b[:, dn:, :].transpose(0, 2, 1).astype(self._np_dtype)        # [hq, L, dv]
            )
            lp["o_proj"] = self._linear(f"{A}.o_proj.weight", att)
        else:  # linear attention (Gated DeltaNet)
            A = f"{L}.linear_attn"
            lp["qkvz_proj"] = self._linear(f"{A}.in_proj_qkvz.weight", att)
            lp["ba_proj"] = self._linear(f"{A}.in_proj_ba.weight", att)
            conv = np.asarray(self._get(f"{A}.conv1d.weight"), np.float32)  # [C,1,K]
            lp["conv_w"] = jnp.asarray(conv[:, 0, :].astype(self._np_dtype))
            lp["dt_bias"] = _to_jnp(self._get(f"{A}.dt_bias"), jnp.float32)
            lp["a_log"] = _to_jnp(self._get(f"{A}.A_log"), jnp.float32)
            lp["la_norm"] = self._norm(f"{A}.norm.weight")
            lp["la_out_proj"] = self._linear(f"{A}.out_proj.weight", att)

        if spec.mlp_kind == "moe":
            lp.update(self._load_moe(i))
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
            return jnp.asarray(w13.astype(self._np_dtype))
        bits = {"int8": 8, "int4": 4}[mode]
        return _qt_to_device(quantize_host(w13, bits=bits, group_size=self.quant.group_size))

    def _load_moe(self, i: int) -> Dict[str, Any]:
        cfg, q = self.cfg, self.quant
        L = f"{self.prefix}.layers.{i}"
        M = f"{L}.mlp"
        lp: Dict[str, Any] = {}
        gate_name = f"{M}.gate.weight"
        if gate_name not in self.st:
            gate_name = f"{M}.router.weight"  # GPT-OSS naming
        lp["gate_w"] = jnp.asarray(
            np.asarray(self._get(gate_name), np.float32).T
        )
        bias = self._get(f"{M}.gate.e_score_correction_bias", required=False)
        if bias is not None:
            lp["gate_bias"] = _to_jnp(bias, jnp.float32)
        rbias = self._get(f"{M}.router.bias", required=False)
        if rbias is not None:  # GPT-OSS: bias inside the routed logits
            lp["gate_logit_bias"] = _to_jnp(rbias, jnp.float32)

        E = cfg.n_routed_experts
        H, I = cfg.hidden_size, cfg.moe_intermediate_size
        gs = q.group_size
        bits = q.expert_bits

        mxfp4 = f"{M}.experts.gate_up_proj_blocks" in self.st
        if mxfp4:
            # GPT-OSS MXFP4 prequantized experts (reference mod.rs:4682):
            # dequant e2m1 blocks + e8m0 scales, then requantize into the
            # uniform TPU cache format.
            from ..quant import dequant_mxfp4_np

            def deq(name):
                b = np.asarray(self._get(f"{M}.experts.{name}_blocks"))
                sc = np.asarray(self._get(f"{M}.experts.{name}_scales"))
                return dequant_mxfp4_np(b, sc).transpose(0, 2, 1)  # [E, in, out]

            gu = deq("gate_up_proj")                    # [E, H, 2I] interleaved
            gate, up = gu[..., ::2], gu[..., 1::2]
            w13_np = np.concatenate([gate, up], axis=-1)
            w2_np = deq("down_proj")                    # [E, I, H]
            for bias_name, pn in [("gate_up_proj_bias", "w13_bias"),
                                  ("down_proj_bias", "w2_bias")]:
                t = self._get(f"{M}.experts.{bias_name}", required=False)
                if t is not None:
                    t = np.asarray(t, np.float32)
                    if pn == "w13_bias":
                        t = np.concatenate([t[..., ::2], t[..., 1::2]], axis=-1)
                    lp[pn] = jnp.asarray(t)
            lp["w13"] = _qt_to_device(quantize_host(w13_np, bits=bits, group_size=gs))
            lp["w2"] = _qt_to_device(quantize_host(w2_np, bits=bits, group_size=gs))
            for sh in (f"{M}.shared_expert", f"{M}.shared_experts"):
                if f"{sh}.gate_proj.weight" in self.st:
                    lp["shared_w13"] = self._fused_w13(
                        f"{sh}.gate_proj.weight", f"{sh}.up_proj.weight",
                        q.shared_expert,
                    )
                    lp["shared_w2"] = self._linear(
                        f"{sh}.down_proj.weight", q.shared_expert
                    )
                    break
            return lp

        fused = f"{M}.experts.gate_up_proj" in self.st  # GPT-OSS fused layout
        if fused:
            gu = np.asarray(self._get(f"{M}.experts.gate_up_proj"), np.float32)
            dn = np.asarray(self._get(f"{M}.experts.down_proj"), np.float32)
            # GPT-OSS interleaves gate/up along the last dim: de-interleave.
            gate, up = gu[..., ::2], gu[..., 1::2]
            w13_np = np.concatenate([gate, up], axis=-1)       # [E, H, 2I]
            w2_np = dn                                          # [E, I, H]
            gub = self._get(f"{M}.experts.gate_up_proj_bias", required=False)
            dnb = self._get(f"{M}.experts.down_proj_bias", required=False)
            if gub is not None:
                gub = np.asarray(gub, np.float32)
                lp["w13_bias"] = jnp.asarray(
                    np.concatenate([gub[..., ::2], gub[..., 1::2]], axis=-1)
                )
            if dnb is not None:
                lp["w2_bias"] = jnp.asarray(np.asarray(dnb, np.float32))
        else:
            w13_np = np.empty((E, H, 2 * I), np.float32)
            w2_np = np.empty((E, I, H), np.float32)
            for e in range(E):
                Ex = f"{M}.experts.{e}"
                w13_np[e, :, :I] = np.asarray(
                    self._get(f"{Ex}.gate_proj.weight"), np.float32
                ).T
                w13_np[e, :, I:] = np.asarray(
                    self._get(f"{Ex}.up_proj.weight"), np.float32
                ).T
                w2_np[e] = np.asarray(self._get(f"{Ex}.down_proj.weight"), np.float32).T

        if bits == 16:  # full-precision experts (parity tests / small models)
            lp["w13"] = jnp.asarray(w13_np.astype(self._np_dtype))
            lp["w2"] = jnp.asarray(w2_np.astype(self._np_dtype))
        else:
            lp["w13"] = _qt_to_device(quantize_host(w13_np, bits=bits, group_size=gs))
            lp["w2"] = _qt_to_device(quantize_host(w2_np, bits=bits, group_size=gs))

        # Shared expert(s): Qwen3-Next `shared_expert`, DeepSeek `shared_experts`.
        for sh in (f"{M}.shared_expert", f"{M}.shared_experts"):
            if f"{sh}.gate_proj.weight" in self.st:
                lp["shared_w13"] = self._fused_w13(
                    f"{sh}.gate_proj.weight", f"{sh}.up_proj.weight", q.shared_expert
                )
                lp["shared_w2"] = self._linear(f"{sh}.down_proj.weight", q.shared_expert)
                break
        sg = self._get(f"{M}.shared_expert_gate.weight", required=False)
        if sg is not None:
            lp["shared_gate_w"] = jnp.asarray(np.asarray(sg, np.float32).T.astype(self._np_dtype))
        return lp


def _save_cache(d: str, params: Dict[str, Any]):
    """Persist quantized params: one pickle per top-level entry
    (versioned dir name carries the config hash — reference "KRAS" cache,
    mod.rs:857-894). Arrays are stored as numpy so reloads skip both the
    checkpoint parse and the quantization pass."""
    import pickle

    os.makedirs(d, exist_ok=True)
    tmp = d + ".tmp"
    os.makedirs(tmp, exist_ok=True)

    def to_host(tree):
        return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)

    entries = {"embed": params["embed"], "final_norm": params["final_norm"],
               "lm_head": params["lm_head"],
               "prefix_layers": params["prefix_layers"]}
    for name, sub in entries.items():
        with open(os.path.join(tmp, f"{name}.pkl"), "wb") as f:
            pickle.dump(to_host(sub), f, protocol=4)
    for t, lp in enumerate(params["pattern"]):
        with open(os.path.join(tmp, f"pattern_{t}.pkl"), "wb") as f:
            pickle.dump(to_host(lp), f, protocol=4)
    with open(os.path.join(tmp, "meta.json"), "w") as f:
        json.dump({"version": CACHE_VERSION,
                   "n_pattern": len(params["pattern"])}, f)
    # atomic-ish publish
    if os.path.exists(d):
        import shutil

        shutil.rmtree(d)
    os.replace(tmp, d)


def _load_cache(d: str) -> Optional[Dict[str, Any]]:
    import pickle

    meta_path = os.path.join(d, "meta.json")
    if not os.path.exists(meta_path):
        return None
    try:
        with open(meta_path) as f:
            meta = json.load(f)
        if meta.get("version") != CACHE_VERSION:
            return None

        def to_device(tree):
            return jax.tree_util.tree_map(lambda x: jnp.asarray(x), tree)

        params: Dict[str, Any] = {}
        for name in ("embed", "final_norm", "lm_head", "prefix_layers"):
            with open(os.path.join(d, f"{name}.pkl"), "rb") as f:
                params[name] = to_device(pickle.load(f))
        params["pattern"] = []
        for t in range(meta["n_pattern"]):
            with open(os.path.join(d, f"pattern_{t}.pkl"), "rb") as f:
                params["pattern"].append(to_device(pickle.load(f)))
        return params
    except Exception:
        return None


def load_params(
    cfg: ModelConfig, quant: QuantConfig, dtype=jnp.bfloat16,
    use_cache: bool = True,
) -> Dict[str, Any]:
    """Load (and quantize) a checkpoint into device memory, going through
    the versioned quantized-weight disk cache when possible."""
    d = _cache_dir(cfg, quant)
    if use_cache and dtype == jnp.bfloat16:
        cached = _load_cache(d)
        if cached is not None:
            return cached
    params = WeightLoader(cfg, quant, dtype=dtype).load()
    if use_cache and dtype == jnp.bfloat16:
        try:
            _save_cache(d, params)
        except OSError:
            pass
    return params
