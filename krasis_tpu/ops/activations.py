"""MLP activations: SwiGLU and the GPT-OSS clamped variant.

GPT-OSS activation (reference src/moe.rs:268-287):
``gate·sigmoid(1.702·gate)·(up + 1)`` with gate clamped to (-inf, limit]
and up clamped to [-limit, limit] (swiglu_limit, typically 7.0).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def swiglu(h: jax.Array, swiglu_limit: float = 0.0, gpt_oss: bool = False) -> jax.Array:
    """h = [..., 2I] with gate in the first half, up in the second."""
    gate, up = jnp.split(h, 2, axis=-1)
    g = gate.astype(jnp.float32)
    u = up.astype(jnp.float32)
    if gpt_oss:
        lim = swiglu_limit
        g = jnp.minimum(g, lim)
        u = jnp.clip(u, -lim, lim)
        out = g * jax.nn.sigmoid(1.702 * g) * (u + 1.0)
    else:
        out = g * jax.nn.sigmoid(g) * u
    return out.astype(h.dtype)
