"""Rotary position embeddings: standard NEOX, partial-rotary, and YaRN.

Reproduces the reference's RoPE behaviours (reference python/krasis/attention.py
YaRN handling, src/decode.rs GQA/MLA rope paths):

* NEOX half-rotation for GQA models (Qwen3 family), optionally applied to
  only the first ``rot_dim`` dims (partial rotary — QCN uses 0.25 of
  head_dim 256, GLM-4.7 uses 0.5).
* Interleaved storage for DeepSeek MLA rope dims: checkpoint weights store
  pair-interleaved values, which must be de-interleaved before the
  half-rotation (matches HF modeling_deepseek's reshape-transpose).
* YaRN NTK-by-parts scaling with mscale attention-temperature correction
  (DeepSeek V2/V3 long context).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def yarn_get_mscale(scale: float, mscale: float) -> float:
    if scale <= 1.0:
        return 1.0
    return 0.1 * mscale * math.log(scale) + 1.0


def compute_inv_freq(
    rot_dim: int,
    rope_theta: float,
    rope_scaling: Dict[str, Any] | None,
) -> Tuple[np.ndarray, float]:
    """Return (inv_freq[rot_dim/2] float32, mscale for cos/sin).

    Implements YaRN NTK-by-parts when rope_scaling.type == 'yarn'
    (linear ramp between beta_fast / beta_slow corrected dims).
    """
    half = rot_dim // 2
    inv_freq = 1.0 / (rope_theta ** (np.arange(0, half, dtype=np.float64) * 2 / rot_dim))
    mscale = 1.0
    rs = rope_scaling or {}
    rtype = rs.get("type", rs.get("rope_type", ""))
    if rtype == "yarn":
        factor = float(rs.get("factor", 1.0))
        orig_max = float(rs.get("original_max_position_embeddings", 4096))
        beta_fast = float(rs.get("beta_fast", 32))
        beta_slow = float(rs.get("beta_slow", 1))

        def find_correction_dim(num_rot: float) -> float:
            return (
                rot_dim
                * math.log(orig_max / (num_rot * 2 * math.pi))
                / (2 * math.log(rope_theta))
            )

        low = math.floor(find_correction_dim(beta_fast))
        high = math.ceil(find_correction_dim(beta_slow))
        low, high = max(low, 0), min(high, half - 1)
        if low == high:
            high += 0.001  # avoid zero division
        ramp = (np.arange(half, dtype=np.float64) - low) / (high - low)
        ramp = np.clip(ramp, 0.0, 1.0)
        inv_freq_extrap = inv_freq
        inv_freq_interp = inv_freq / factor
        # ramp=0 → extrapolation (high freq kept), ramp=1 → interpolation.
        inv_freq = inv_freq_extrap * (1 - ramp) + inv_freq_interp * ramp
        m = float(rs.get("mscale", 1.0))
        m_all = float(rs.get("mscale_all_dim", 0.0))
        if m_all:
            mscale = yarn_get_mscale(factor, m) / yarn_get_mscale(factor, m_all)
        else:
            mscale = yarn_get_mscale(factor, m)
    elif rtype == "linear":
        inv_freq = inv_freq / float(rs.get("factor", 1.0))
    return inv_freq.astype(np.float32), float(mscale)


def rope_cos_sin(
    positions: jax.Array,
    rot_dim: int,
    rope_theta: float,
    rope_scaling: Dict[str, Any] | None = None,
) -> Tuple[jax.Array, jax.Array]:
    """cos/sin tables for integer positions [...]: each [..., rot_dim/2] f32."""
    inv_freq, mscale = compute_inv_freq(rot_dim, rope_theta, rope_scaling)
    freqs = positions.astype(jnp.float32)[..., None] * jnp.asarray(inv_freq)
    return jnp.cos(freqs) * mscale, jnp.sin(freqs) * mscale


def apply_rope(
    x: jax.Array,
    cos: jax.Array,
    sin: jax.Array,
    interleaved: bool = False,
) -> jax.Array:
    """Apply half-rotation RoPE to the LAST ``2 * cos.shape[-1]`` dims of x.

    x: [..., H, D] (heads before the feature dim); cos/sin broadcastable to
    [..., 1, rot/2] — callers pass [..., rot/2] tables and we insert the
    head axis. Dims beyond rot_dim pass through (partial rotary).
    interleaved=True de-interleaves pairs first (DeepSeek MLA rope weights).
    """
    rot = 2 * cos.shape[-1]
    d = x.shape[-1]
    x_rot, x_pass = x[..., :rot], x[..., rot:]
    xf = x_rot.astype(jnp.float32)
    if interleaved:
        # [..., rot] stored as (x0,y0,x1,y1,...) → (x0..x_{r/2-1}, y0..)
        shape = xf.shape[:-1] + (rot // 2, 2)
        pairs = xf.reshape(shape)
        xf = jnp.concatenate([pairs[..., 0], pairs[..., 1]], axis=-1)
    x1, x2 = xf[..., : rot // 2], xf[..., rot // 2 :]
    c = cos[..., None, :] if cos.ndim < x.ndim else cos
    s = sin[..., None, :] if sin.ndim < x.ndim else sin
    o1 = x1 * c - x2 * s
    o2 = x2 * c + x1 * s
    out = jnp.concatenate([o1, o2], axis=-1).astype(x.dtype)
    if d > rot:
        out = jnp.concatenate([out, x_pass], axis=-1)
    return out


def yarn_softmax_scale(
    base_scale: float, rope_scaling: Dict[str, Any] | None
) -> float:
    """Attention softmax scale with YaRN mscale_all_dim correction
    (HF modeling_deepseek: scale *= mscale(factor, mscale_all_dim)^2)."""
    rs = rope_scaling or {}
    if rs.get("type", rs.get("rope_type", "")) == "yarn":
        m_all = float(rs.get("mscale_all_dim", 0.0))
        if m_all:
            m = yarn_get_mscale(float(rs.get("factor", 1.0)), m_all)
            return base_scale * m * m
    return base_scale
