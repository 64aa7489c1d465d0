"""Gated DeltaNet (hybrid linear attention) — Qwen3-Next / QCN / Qwen3.5.

TPU-native implementation of the reference's linear-attention layer
(reference python/krasis/linear_attention.py, src/decode.rs:1293 recurrent
AVX2 path). Semantics verified against the public HF Qwen3-Next modeling
code (torch_recurrent_gated_delta_rule / torch_chunk_gated_delta_rule):

* fused QKVZ / BA projections with per-key-head-group interleaved layout
  (fix_qkvz_ordering);
* causal depthwise conv (kernel 4, no bias) + SiLU over concat(q,k,v);
* beta = sigmoid(b); per-head log-decay g = -exp(A_log)·softplus(a+dt_bias);
* L2-normalized q/k (eps 1e-6), query scaled by dk^-0.5;
* recurrent state S[h, dk, dv]: S ← S·e^g + k⊗((v − S᙭k)·β), o = S᙭q;
* chunked parallel prefill form (chunk 64) using unit-lower-triangular
  solves instead of the reference's nilpotent-correction loop
  (linear_attention.py:645-654 notes the same trick) — maps to batched
  small triangular solves + MXU matmuls, scanned across chunks.

All state math in float32. State per layer: [B, Hv, dk, dv] (~1 MB/head
group) + conv window [B, K-1, conv_dim] — no KV cache (the O(1)-state
property that makes hybrid models long-context-cheap, SURVEY §5).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

# State math runs in true f32: linear-attention recurrences compound error
# across thousands of steps (reference uses f32 AVX2 throughout).
_P = jax.lax.Precision.HIGHEST


class DeltaNetDims(NamedTuple):
    num_k_heads: int
    num_v_heads: int
    head_k_dim: int
    head_v_dim: int
    conv_kernel: int

    @property
    def key_dim(self) -> int:
        return self.num_k_heads * self.head_k_dim

    @property
    def value_dim(self) -> int:
        return self.num_v_heads * self.head_v_dim

    @property
    def conv_dim(self) -> int:
        return 2 * self.key_dim + self.value_dim


def fix_qkvz_ordering(
    qkvz: jax.Array,  # [B, S, 2*key_dim + 2*value_dim] (interleaved by k-head)
    ba: jax.Array,    # [B, S, 2*num_v_heads]
    dims: DeltaNetDims,
) -> Tuple[jax.Array, ...]:
    """Un-interleave the fused projections (HF fix_query_key_value_ordering).

    Per key-head group the layout is [q(dk), k(dk), v(r·dv), z(r·dv)] with
    r = num_v_heads / num_k_heads; ba is [b(r), a(r)] per group.
    Returns q,k [B,S,Hk,dk]; v,z [B,S,Hv,dv]; b,a [B,S,Hv].
    """
    B, S, _ = qkvz.shape
    hk, hv = dims.num_k_heads, dims.num_v_heads
    dk, dv = dims.head_k_dim, dims.head_v_dim
    r = hv // hk
    grouped = qkvz.reshape(B, S, hk, 2 * dk + 2 * r * dv)
    q = grouped[..., :dk]
    k = grouped[..., dk : 2 * dk]
    v = grouped[..., 2 * dk : 2 * dk + r * dv].reshape(B, S, hv, dv)
    z = grouped[..., 2 * dk + r * dv :].reshape(B, S, hv, dv)
    ba_g = ba.reshape(B, S, hk, 2 * r)
    b = ba_g[..., :r].reshape(B, S, hv)
    a = ba_g[..., r:].reshape(B, S, hv)
    return q, k, v, z, b, a


def causal_conv(
    x: jax.Array,            # [B, S, C]
    conv_w: jax.Array,       # [C, K] depthwise kernel
    conv_state: jax.Array,   # [B, K-1, C] previous inputs (zeros at start)
) -> Tuple[jax.Array, jax.Array]:
    """Depthwise causal conv1d + SiLU. Returns (y [B,S,C], new_state)."""
    B, S, C = x.shape
    K = conv_w.shape[-1]
    xf = jnp.concatenate([conv_state.astype(x.dtype), x], axis=1)  # [B, S+K-1, C]
    w = conv_w.astype(jnp.float32)
    y = jnp.zeros((B, S, C), jnp.float32)
    for j in range(K):
        y = y + xf[:, j : j + S, :].astype(jnp.float32) * w[:, j]
    y = jax.nn.silu(y)
    new_state = xf[:, S:, :]  # last K-1 inputs
    return y.astype(x.dtype), new_state


def l2norm(x: jax.Array, eps: float = 1e-6) -> jax.Array:
    return x * jax.lax.rsqrt((x * x).sum(axis=-1, keepdims=True) + eps)


def _prep(q, k, v, g, beta, num_v_heads):
    """Common pre-processing: f32, L2 norm, scale, GQA head repeat."""
    q = l2norm(q.astype(jnp.float32))
    k = l2norm(k.astype(jnp.float32))
    v = v.astype(jnp.float32)
    r = num_v_heads // q.shape[2]
    if r > 1:
        q = jnp.repeat(q, r, axis=2)
        k = jnp.repeat(k, r, axis=2)
    q = q * (q.shape[-1] ** -0.5)
    return q, k, v, g.astype(jnp.float32), beta.astype(jnp.float32)


def gated_delta_rule_recurrent(
    q: jax.Array,      # [B, S, Hk, dk]
    k: jax.Array,      # [B, S, Hk, dk]
    v: jax.Array,      # [B, S, Hv, dv]
    g: jax.Array,      # [B, S, Hv] log-decay
    beta: jax.Array,   # [B, S, Hv]
    state: jax.Array,  # [B, Hv, dk, dv] f32
) -> Tuple[jax.Array, jax.Array]:
    """Token-by-token recurrence (decode path; also the chunked-form oracle)."""
    Hv = state.shape[1]
    q, k, v, g, beta = _prep(q, k, v, g, beta, Hv)

    def step(S, inp):
        q_t, k_t, v_t, g_t, b_t = inp  # [B,H,d*] / [B,H]
        S = S * jnp.exp(g_t)[..., None, None]
        kv_mem = jnp.einsum("bhkv,bhk->bhv", S, k_t, precision=_P)
        delta = (v_t - kv_mem) * b_t[..., None]
        S = S + jnp.einsum("bhk,bhv->bhkv", k_t, delta, precision=_P)
        o_t = jnp.einsum("bhkv,bhk->bhv", S, q_t, precision=_P)
        return S, o_t

    xs = tuple(jnp.moveaxis(t, 1, 0) for t in (q, k, v, g, beta))
    state, out = jax.lax.scan(step, state, xs)
    return jnp.moveaxis(out, 0, 1), state  # [B, S, Hv, dv], final state


def delta_state_update(
    k: jax.Array,      # [B, S, Hk, dk]
    v: jax.Array,      # [B, S, Hv, dv]
    g: jax.Array,      # [B, S, Hv] log-decay (0 at masked positions)
    beta: jax.Array,   # [B, S, Hv] (0 at masked positions)
    state: jax.Array,  # [B, Hv, dk, dv] f32
) -> jax.Array:
    """State-only recurrence (no outputs) — the speculative-decoding
    rollback path (models/model.py la_spec_commit): replay a verify
    window's committed prefix onto the pre-window state. Positions with
    beta=0, g=0 are exact no-ops (S·e^0 = S, k⊗0 = 0), so masking the
    rejected tail per row advances each row's state by exactly its
    committed token count, bit-identical to having decoded those tokens
    one at a time."""
    Hv = state.shape[1]
    _, k, v, g, beta = _prep(k, k, v, g, beta, Hv)

    def step(S, inp):
        k_t, v_t, g_t, b_t = inp
        S = S * jnp.exp(g_t)[..., None, None]
        kv_mem = jnp.einsum("bhkv,bhk->bhv", S, k_t, precision=_P)
        delta = (v_t - kv_mem) * b_t[..., None]
        S = S + jnp.einsum("bhk,bhv->bhkv", k_t, delta, precision=_P)
        return S, None

    xs = tuple(jnp.moveaxis(t, 1, 0) for t in (k, v, g, beta))
    state, _ = jax.lax.scan(step, state, xs)
    return state


def gated_delta_rule_chunked(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    g: jax.Array,
    beta: jax.Array,
    state: jax.Array,
    chunk_size: int = 64,
    fast: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Chunked parallel form (prefill path). Matches the recurrent oracle.

    fast=True runs the large matmuls with bf16 inputs + f32 accumulation
    (the production trade used by fla's Triton kernels); decay/solve/state
    math stays f32. Default keeps everything f32-HIGHEST for the oracle
    tests."""
    B, S, _, dk = q.shape
    Hv, dv = state.shape[1], state.shape[3]
    q, k, v, g, beta = _prep(q, k, v, g, beta, Hv)

    cs = chunk_size
    pad = (-S) % cs
    if pad:
        padf = lambda t: jnp.pad(t, [(0, 0), (0, pad)] + [(0, 0)] * (t.ndim - 2))
        q, k, v, g, beta = map(padf, (q, k, v, g, beta))
    nc = (S + pad) // cs

    # → [B, H, nc, cs, d]
    tr = lambda t: t.reshape(B, nc, cs, Hv, -1).transpose(0, 3, 1, 2, 4)
    q_, k_, v_ = tr(q), tr(k), tr(v)
    g_ = g.reshape(B, nc, cs, Hv).transpose(0, 3, 1, 2)       # [B,H,nc,cs]
    beta_ = beta.reshape(B, nc, cs, Hv).transpose(0, 3, 1, 2)

    mm_prec = None if fast else _P
    mm_cast = (lambda t: t.astype(jnp.bfloat16)) if fast else (lambda t: t)

    g_ = jnp.cumsum(g_, axis=-1)
    # decay[i,j] = exp(g_i - g_j) for i >= j else 0
    ii = jax.lax.broadcasted_iota(jnp.int32, (cs, cs), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (cs, cs), 1)
    low = ii >= jj
    decay = jnp.where(low, jnp.exp(g_[..., :, None] - g_[..., None, :]), 0.0)

    k_beta = k_ * beta_[..., None]
    v_beta = v_ * beta_[..., None]

    # T = I + strict_lower((k_beta @ k^T) * decay); the reference's in-chunk
    # nilpotent-correction loop is T^{-1} applied — done as triangular solves.
    kk = jnp.einsum(
        "bhnik,bhnjk->bhnij", mm_cast(k_beta), mm_cast(k_),
        precision=mm_prec, preferred_element_type=jnp.float32,
    ) * decay
    strict = ii > jj
    T = jnp.where(strict, kk, 0.0) + jnp.eye(cs, dtype=jnp.float32)
    v_new_all = jax.scipy.linalg.solve_triangular(
        T, v_beta, lower=True, unit_diagonal=True
    )
    k_cumdecay = jax.scipy.linalg.solve_triangular(
        T, k_beta * jnp.exp(g_)[..., None], lower=True, unit_diagonal=True
    )

    attn_local = jnp.einsum(
        "bhnik,bhnjk->bhnij", mm_cast(q_), mm_cast(k_),
        precision=mm_prec, preferred_element_type=jnp.float32,
    ) * decay

    def chunk_step(Sstate, inp):
        q_i, k_i, vn_i, kc_i, al_i, g_i = inp
        v_prime = jnp.einsum(
            "bhik,bhkv->bhiv", mm_cast(kc_i), mm_cast(Sstate),
            precision=mm_prec, preferred_element_type=jnp.float32,
        )
        v_corr = vn_i - v_prime
        attn_inter = jnp.einsum(
            "bhik,bhkv->bhiv",
            mm_cast(q_i * jnp.exp(g_i)[..., None]), mm_cast(Sstate),
            precision=mm_prec, preferred_element_type=jnp.float32,
        )
        out_i = attn_inter + jnp.einsum(
            "bhij,bhjv->bhiv", mm_cast(al_i), mm_cast(v_corr),
            precision=mm_prec, preferred_element_type=jnp.float32,
        )
        g_last = g_i[..., -1]
        Sstate = Sstate * jnp.exp(g_last)[..., None, None] + jnp.einsum(
            "bhik,bhiv->bhkv",
            mm_cast(k_i * jnp.exp(g_last[..., None] - g_i)[..., None]),
            mm_cast(v_corr),
            precision=mm_prec, preferred_element_type=jnp.float32,
        )
        return Sstate, out_i

    xs = tuple(
        jnp.moveaxis(t, 2, 0)
        for t in (q_, k_, v_new_all, k_cumdecay, attn_local, g_)
    )
    state, out = jax.lax.scan(chunk_step, state, xs)
    out = jnp.moveaxis(out, 0, 2)                              # [B,H,nc,cs,dv]
    out = out.transpose(0, 2, 3, 1, 4).reshape(B, S + pad, Hv, dv)
    return out[:, :S], state
