"""Slot-based KV / recurrent-state cache (pattern-stacked layout).

TPU-native replacement for the reference's paged KV pool
(reference python/krasis/kv_cache.py — 16-token pages, free-list alloc):
XLA wants static shapes, so the cache is a dense per-slot buffer
``[num_slots, max_len, ...]`` with a per-slot valid length; variable
sequence length is handled by masking in attention rather than page
tables. Slot = one concurrent sequence (continuous batching assigns
sequences to free slots).

Layout mirrors the params pattern layout (models/params.py): an unrolled
``prefix_layers`` list plus ``pattern`` entries whose leaves carry a
leading ``reps`` dim, so the model's lax.scan slices one layer's cache
per repetition.

Storage formats per layer kind (KERNEL layout — the decode flash kernel
DMAs ``[BK, D]`` row blocks straight out of these buffers, so they are
stored pre-transposed with the minor dim padded to a lane multiple;
zero pad lanes don't change attention scores):
* GQA: K/V ``[B, Hkv, S, pad128(D)]`` in fp8 e4m3 or bf16 (fp8 halves
  HBM traffic and capacity — same trade as the reference's FP8 KV,
  attention.py:320);
* MLA: one fused ``kv = [ckv ; kpe ; 0-pad] [B, 1, S, pad128(L + Dr)]``
  buffer (576→640 B/token/layer at fp8 — the MLA memory win; fused so
  decode reads a single buffer with V as the latent prefix of K);
* linear attention: recurrent state ``[B, Hv, dk, dv]`` f32 + causal-conv
  window ``[B, K-1, conv_dim]`` — O(1) per sequence, no KV.
"""

from __future__ import annotations

import os
from dataclasses import replace
from typing import Any, Dict

import jax.numpy as jnp

from ..config import ModelConfig, QuantConfig
from ..models.params import LayerSpec, layer_specs, pattern_info

# "auto" kv dtype: bf16 caches up to this many bytes, fp8 beyond.
DEFAULT_KV_BUDGET = 4 << 30


def kv_dtype(quant: QuantConfig):
    return jnp.float8_e4m3fn if quant.kv_cache_dtype == "fp8" else jnp.bfloat16


def kv_bytes_per_token(cfg: ModelConfig, dtype_bytes: int = 2) -> int:
    """KV bytes per cached token across all layers (lane-padded)."""
    total = 0
    for spec in layer_specs(cfg):
        if spec.attn_kind == "gqa":
            total += 2 * cfg.num_key_value_heads * lane_pad(cfg.qk_head_dim)
        elif spec.attn_kind == "mla":
            total += lane_pad(cfg.kv_lora_rank + cfg.qk_rope_head_dim)
    return total * dtype_bytes


def resolve_kv_quant(cfg: ModelConfig, quant: QuantConfig,
                     batch: int, max_len: int) -> QuantConfig:
    """Resolve kv_cache_dtype == "auto" to a concrete dtype.

    bf16 when the full-size cache fits the budget (KRASIS_TPU_KV_BYTES,
    default 4 GiB), else fp8. fp8 halves capacity but decodes ~2.5x
    slower on this TPU generation (per-block VPU upcast, see
    ops/flash_attention._decode_kernel), so it is only worth paying for
    when HBM capacity is the binding constraint — mirroring when the
    reference's FP8-KV option matters (reference kv_cache.py fp8_e4m3).
    """
    if quant.kv_cache_dtype != "auto":
        return quant
    budget = int(os.environ.get("KRASIS_TPU_KV_BYTES", DEFAULT_KV_BUDGET))
    need = batch * max_len * kv_bytes_per_token(cfg, 2)
    return replace(quant, kv_cache_dtype="bf16" if need <= budget else "fp8")


def lane_pad(d: int) -> int:
    """Minor-dim size padded to the TPU lane count (Mosaic DMA slices
    must be 128-aligned on the last dim)."""
    return -(-d // 128) * 128


def _layer_cache(
    cfg: ModelConfig, quant: QuantConfig, spec: LayerSpec,
    batch: int, max_len: int, lead=(),
) -> Dict[str, Any]:
    kdt = kv_dtype(quant)
    if spec.attn_kind == "gqa":
        d = lane_pad(cfg.qk_head_dim)
        hkv = cfg.num_key_value_heads
        return {
            "k": jnp.zeros(lead + (batch, hkv, max_len, d), kdt),
            "v": jnp.zeros(lead + (batch, hkv, max_len, d), kdt),
        }
    if spec.attn_kind == "mla":
        # single [ckv ; kpe] buffer: the latent VALUE is a prefix of the
        # KEY, so decode attention fetches one buffer (ops/flash_attention
        # v_from_k) — half the HBM reads of separate ckv/kpe tensors
        return {
            "kv": jnp.zeros(
                lead + (batch, 1, max_len,
                        lane_pad(cfg.kv_lora_rank + cfg.qk_rope_head_dim)),
                kdt,
            ),
        }
    hk, hv = cfg.linear_num_key_heads, cfg.linear_num_value_heads
    dk, dv = cfg.linear_key_head_dim, cfg.linear_value_head_dim
    conv_dim = 2 * hk * dk + hv * dv
    return {
        "state": jnp.zeros(lead + (batch, hv, dk, dv), jnp.float32),
        "conv": jnp.zeros(
            lead + (batch, cfg.linear_conv_kernel_dim - 1, conv_dim), jnp.bfloat16
        ),
    }


def init_cache(
    cfg: ModelConfig,
    quant: QuantConfig,
    batch: int,
    max_len: int,
) -> Dict[str, Any]:
    """Zero-initialized cache pytree for `batch` slots of `max_len` tokens."""
    quant = resolve_kv_quant(cfg, quant, batch, max_len)
    specs = layer_specs(cfg)
    info = pattern_info(cfg)
    return {
        "prefix_layers": [
            _layer_cache(cfg, quant, specs[i], batch, max_len)
            for i in range(info.prefix_n)
        ],
        "pattern": [
            _layer_cache(
                cfg, quant, specs[info.prefix_n + t], batch, max_len,
                lead=(info.reps,),
            )
            for t in range(info.period)
        ],
        "length": jnp.zeros((batch,), jnp.int32),
    }


def init_mtp_cache(
    cfg: ModelConfig,
    quant: QuantConfig,
    batch: int,
    max_len: int,
) -> Dict[str, Any]:
    """KV cache for the MTP (speculative-draft) module: one extra layer
    with its own valid length (it trails the main cache by one position
    until the first sampled token arrives — see models/mtp.py)."""
    from ..models.params import mtp_layer_spec

    quant = resolve_kv_quant(cfg, quant, batch, max_len)
    return {
        "layer": _layer_cache(cfg, quant, mtp_layer_spec(cfg), batch, max_len),
        "length": jnp.zeros((batch,), jnp.int32),
    }


def cache_bytes(cache) -> int:
    import jax
    return sum(x.size * x.dtype.itemsize for x in jax.tree_util.tree_leaves(cache))
