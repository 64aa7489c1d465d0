"""RMSNorm variants.

Covers the reference's norm conventions (reference python/krasis/config.py:344-348,
src/decode.rs:1199 fused_add_rmsnorm):

* standard RMSNorm: ``w * x / rms(x)``
* Qwen3-Next convention: ``(1 + w) * x / rms(x)`` (weights stored near 0)
* fused residual-add + norm, returning both the normed value and the new
  residual — the layer-graph building block.

All reductions in float32 regardless of input dtype.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rms_norm(
    x: jax.Array,
    w: jax.Array,
    eps: float = 1e-6,
    plus_one: bool = False,
) -> jax.Array:
    """RMSNorm along the last axis; returns x.dtype."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    normed = xf * jax.lax.rsqrt(var + eps)
    wf = w.astype(jnp.float32)
    if plus_one:
        wf = wf + 1.0
    return (normed * wf).astype(x.dtype)


def add_rms_norm(
    x: jax.Array,
    residual: jax.Array | None,
    w: jax.Array,
    eps: float = 1e-6,
    plus_one: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Fused residual add + RMSNorm.

    Returns ``(normed, new_residual)`` where ``new_residual = x + residual``
    (or just ``x`` when residual is None, i.e. the first layer).
    """
    if residual is not None:
        x = x + residual
    return rms_norm(x, w, eps=eps, plus_one=plus_one), x


def gated_rms_norm(
    x: jax.Array,
    gate: jax.Array,
    w: jax.Array,
    eps: float = 1e-6,
    plus_one: bool = True,
) -> jax.Array:
    """Gated RMSNorm used by Gated DeltaNet output (Qwen3-Next):
    ``rmsnorm(x) * silu(gate)``. Norm is per-head (over the last axis).
    """
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    normed = xf * jax.lax.rsqrt(var + eps)
    wf = w.astype(jnp.float32)
    if plus_one:
        wf = wf + 1.0
    g = gate.astype(jnp.float32)
    out = normed * wf * (g * jax.nn.sigmoid(g))
    return out.astype(x.dtype)
