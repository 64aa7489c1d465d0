"""Dense/masked multi-head attention primitives (GQA + MLA absorbed form).

TPU-first re-design of the reference's attention stack
(reference python/krasis/attention.py — FlashInfer paged GQA/MLA):
instead of paged gather kernels, the KV cache is a statically-shaped
per-slot buffer and attention runs as masked dense attention over it
(masking handles variable lengths, causal structure, and sliding
windows). Softmax in float32. A Pallas flash-attention kernel later
replaces the XLA path for long contexts; semantics here are the
reference for it.

MLA runs in the *absorbed* form for both prefill and decode: queries are
projected through w_kc into the compressed-KV latent space so attention
operates MQA-style over the 512-dim latent + 64-dim rope key
(reference attention.py:275 einsum absorption), which keeps the KV cache
at 576 B/token/layer at FP8.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def build_mask(
    q_pos: jax.Array,       # [B, Sq] int32 absolute positions of queries
    kv_pos: jax.Array,      # [Skv] or [B, Skv] absolute positions of keys
    kv_len: jax.Array,      # [B] valid kv length (entries >= kv_len are junk)
    window: int = 0,        # sliding window size (0 = full causal)
) -> jax.Array:
    """Boolean [B, Sq, Skv] mask: True = attend."""
    if kv_pos.ndim == 1:
        kv_pos = kv_pos[None, :]
    qp = q_pos[:, :, None]
    kp = kv_pos[:, None, :]
    mask = kp <= qp
    mask &= kp[..., :] < kv_len[:, None, None]
    if window > 0:
        mask &= kp > qp - window
    return mask


def attend(
    q: jax.Array,          # [B, Sq, Hq, Dk]
    k: jax.Array,          # [B, Skv, Hkv, Dk]
    v: jax.Array,          # [B, Skv, Hkv, Dv]
    mask: jax.Array,       # [B, Sq, Skv] bool
    scale: float,
    sinks: Optional[jax.Array] = None,  # [Hq] attention-sink logits (GPT-OSS)
    precision=None,
) -> jax.Array:
    """Masked attention with GQA head broadcasting. Returns [B, Sq, Hq, Dv]."""
    B, Sq, Hq, Dk = q.shape
    Hkv = k.shape[2]
    groups = Hq // Hkv

    qf = q.astype(jnp.float32).reshape(B, Sq, Hkv, groups, Dk)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)

    scores = jnp.einsum("bqhgd,bkhd->bhgqk", qf, kf, precision=precision) * scale
    scores = jnp.where(mask[:, None, None, :, :], scores, NEG_INF)
    if sinks is not None:
        # GPT-OSS: a learned per-head "sink" logit joins the softmax but
        # contributes no value — implemented via logsumexp correction.
        sink = sinks.astype(jnp.float32).reshape(1, Hkv, groups, 1, 1)
        m = jnp.maximum(jnp.max(scores, axis=-1, keepdims=True), sink)
        e = jnp.exp(scores - m)
        denom = e.sum(axis=-1, keepdims=True) + jnp.exp(sink - m)
        p = e / denom
    else:
        p = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhgqk,bkhd->bqhgd", p, vf, precision=precision)
    return out.reshape(B, Sq, Hq, -1).astype(q.dtype)


def mla_absorbed_attention(
    q_nope: jax.Array,     # [B, Sq, H, Dn]
    q_pe: jax.Array,       # [B, Sq, H, Dr]  (rope already applied)
    ckv: jax.Array,        # [B, Skv, L]     compressed latent KV (post-norm)
    kpe: jax.Array,        # [B, Skv, Dr]    rope key (already roped)
    w_kc: jax.Array,       # [H, Dn, L]      from kv_b_proj (K-side)
    w_vc: jax.Array,       # [H, L, Dv]      from kv_b_proj (V-side)
    mask: jax.Array,       # [B, Sq, Skv]
    scale: float,
    precision=None,
) -> jax.Array:
    """Absorbed MLA attention. Returns [B, Sq, H, Dv]."""
    # Absorb: q_eff[b,s,h,L] = q_nope @ w_kc  (reference attention.py:275).
    q_eff = jnp.einsum(
        "bshd,hdl->bshl", q_nope.astype(jnp.float32), w_kc.astype(jnp.float32),
        precision=precision,
    )
    ckvf = ckv.astype(jnp.float32)
    scores = jnp.einsum("bshl,bkl->bhsk", q_eff, ckvf, precision=precision)
    scores += jnp.einsum(
        "bshr,bkr->bhsk", q_pe.astype(jnp.float32), kpe.astype(jnp.float32),
        precision=precision,
    )
    scores = scores * scale
    scores = jnp.where(mask[:, None, :, :], scores, NEG_INF)
    p = jax.nn.softmax(scores, axis=-1)
    ctx = jnp.einsum("bhsk,bkl->bshl", p, ckvf, precision=precision)           # [B,Sq,H,L]
    out = jnp.einsum("bshl,hlv->bshv", ctx, w_vc.astype(jnp.float32), precision=precision)
    return out.astype(q_nope.dtype)
