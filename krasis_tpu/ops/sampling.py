"""Token sampling: greedy / temperature / top-k / top-p / presence penalty.

Functional JAX port of the reference's sampler semantics
(reference src/decode.rs:3718-3811 sample_from_logits, python/krasis/sampler.py):
presence penalty subtracts a constant from logits of already-seen tokens,
then temperature scaling, then top-k truncation, then nucleus (top-p)
truncation over the sorted distribution, then categorical sampling.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class SamplingParams(NamedTuple):
    temperature: float = 0.6
    top_k: int = 20
    top_p: float = 0.95
    presence_penalty: float = 0.0


def sample(
    key: jax.Array,
    logits: jax.Array,                  # [B, V] f32
    params: SamplingParams,
    seen_mask: Optional[jax.Array] = None,  # [B, V] bool: token already emitted
) -> jax.Array:
    """Returns sampled token ids [B] int32."""
    logits = logits.astype(jnp.float32)
    if params.presence_penalty != 0.0 and seen_mask is not None:
        logits = logits - params.presence_penalty * seen_mask.astype(jnp.float32)
    if params.temperature <= 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits = logits / params.temperature

    V = logits.shape[-1]
    k = min(params.top_k, V) if params.top_k > 0 else V
    vals, idx = jax.lax.top_k(logits, k)            # sorted desc
    probs = jax.nn.softmax(vals, axis=-1)
    if params.top_p < 1.0:
        cum = jnp.cumsum(probs, axis=-1)
        # keep tokens while cumulative prob (exclusive) < top_p
        keep = (cum - probs) < params.top_p
        vals = jnp.where(keep, vals, -jnp.inf)
    choice = jax.random.categorical(key, vals, axis=-1)   # index into top-k
    return jnp.take_along_axis(idx, choice[..., None], axis=-1)[..., 0].astype(jnp.int32)


def sample_batched(
    key: jax.Array,
    logits: jax.Array,                 # [B, V] f32
    temperature: jax.Array,            # [B] f32 (0 = greedy per row)
    top_p: jax.Array,                  # [B] f32
    presence_penalty: jax.Array,       # [B] f32
    seen_mask: jax.Array,              # [B, V] bool
    top_k: Optional[jax.Array] = None, # [B] int32 per-row (<=0 = off)
    max_top_k: int = 64,               # static truncation bound
) -> jax.Array:
    """Per-row sampling parameters in ONE traced program — the batched
    scheduler samples every slot per step without per-slot dispatches
    (each eager dispatch costs a host round trip). Per-row ``top_k`` is
    applied as a rank mask inside the static ``max_top_k`` truncation so
    every slot gets its requested distribution."""
    logits = logits.astype(jnp.float32)
    logits = logits - presence_penalty[:, None] * seen_mask.astype(jnp.float32)

    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)

    kk = min(max_top_k, logits.shape[-1])
    t = jnp.maximum(temperature, 1e-6)[:, None]
    vals, idx = jax.lax.top_k(logits / t, kk)
    if top_k is not None:
        ranks = jnp.arange(kk)[None, :]
        per_row = jnp.where(top_k <= 0, kk, jnp.minimum(top_k, kk))[:, None]
        vals = jnp.where(ranks < per_row, vals, -jnp.inf)
    probs = jax.nn.softmax(vals, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    keep = (cum - probs) < top_p[:, None]
    vals = jnp.where(keep, vals, -jnp.inf)
    choice = jax.random.categorical(key, vals, axis=-1)
    sampled = jnp.take_along_axis(idx, choice[:, None], axis=-1)[:, 0].astype(jnp.int32)

    return jnp.where(temperature <= 0.0, greedy, sampled)
