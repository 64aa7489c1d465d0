"""Pallas TPU flash attention (causal, GQA/MQA, masked, windowed, sinks).

Replaces the XLA masked-dense attention for prefill: online-softmax over
KV blocks so memory is O(BQ·BK) instead of O(Sq·Skv) — the role
FlashInfer plays for the reference (reference python/krasis/attention.py)
re-built as a TPU kernel. One kernel covers:

* GQA (q heads grouped over kv heads via the k/v index maps),
* MLA absorbed form (Hkv=1, D=latent+rope, Dv=latent — MQA-style),
* per-row valid KV lengths, absolute query position offsets (chunked
  prefill against a cache prefix), sliding windows (GPT-OSS), and
  attention-sink logits.

Grid (B, Hq, nq, nk) — the innermost kv dimension iterates sequentially
on TPU, carrying (m, l, acc) in VMEM scratch; fully-masked kv blocks are
skipped via pl.when.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BQ = 512
DEFAULT_BK = 512
NEG_INF = -1e30


def available() -> bool:
    if os.environ.get("KRASIS_TPU_NO_PALLAS"):
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _kernel(
    # scalar prefetch
    q_off_ref, kv_len_ref, sink_ref,
    # inputs
    q_ref, k_ref, v_ref,
    # output
    o_ref,
    # scratch
    m_ref, l_ref, acc_ref,
    *, scale: float, window: int, BQ: int, BK: int, use_sink: bool,
):
    b = pl.program_id(0)
    h = pl.program_id(1)
    i = pl.program_id(2)
    kb = pl.program_id(3)
    nk = pl.num_programs(3)

    q_off = q_off_ref[b]
    kv_len = kv_len_ref[b]

    qp = q_off + i * BQ + jax.lax.broadcasted_iota(jnp.int32, (BQ, 1), 0)
    kp = kb * BK + jax.lax.broadcasted_iota(jnp.int32, (1, BK), 1)

    @pl.when(kb == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # block visible iff any (kv <= q_max) and (kv < kv_len) [and window]
    q_max = q_off + i * BQ + BQ - 1
    blk_lo = kb * BK
    visible = (blk_lo <= q_max) & (blk_lo < kv_len)
    if window > 0:
        q_min = q_off + i * BQ
        visible &= (blk_lo + BK - 1) > (q_min - window)

    @pl.when(visible)
    def _step():
        q = q_ref[0, 0].astype(jnp.float32) * scale          # [BQ, D]
        k = k_ref[0, 0].astype(jnp.float32)                  # [BK, D]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                    # [BQ, BK]
        mask = (kp <= qp) & (kp < kv_len)
        if window > 0:
            mask &= kp > qp - window
        s = jnp.where(mask, s, NEG_INF)

        m_prev = m_ref[:]                                    # [BQ, 1]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        # guard fully-masked rows (m_new = -inf): keep exp finite
        m_safe = jnp.where(m_new <= NEG_INF / 2, 0.0, m_new)
        p = jnp.exp(s - m_safe)
        p = jnp.where(mask, p, 0.0)
        alpha = jnp.where(
            m_prev <= NEG_INF / 2, 0.0, jnp.exp(m_prev - m_safe)
        )
        l_ref[:] = l_ref[:] * alpha + p.sum(axis=-1, keepdims=True)
        v = v_ref[0, 0].astype(jnp.float32)                  # [BK, Dv]
        acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_ref[:] = m_new

    @pl.when(kb == nk - 1)
    def _finalize():
        l = l_ref[:]
        if use_sink:
            sink = sink_ref[h]
            m = m_ref[:]
            m_safe = jnp.where(m <= NEG_INF / 2, 0.0, m)
            l = l + jnp.exp(sink - m_safe)
        denom = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0] = (acc_ref[:] / denom).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "window", "block_q", "block_k", "interpret"),
)
def flash_attention(
    q: jax.Array,            # [B, Sq, Hq, D]
    k: jax.Array,            # [B, Skv, Hkv, D]
    v: jax.Array,            # [B, Skv, Hkv, Dv]
    q_offset: jax.Array,     # [B] absolute position of q[:,0]
    kv_len: jax.Array,       # [B] valid kv entries
    scale: float,
    window: int = 0,
    sinks: Optional[jax.Array] = None,   # [Hq]
    block_q: int = DEFAULT_BQ,
    block_k: int = DEFAULT_BK,
    interpret: bool = False,
) -> jax.Array:
    B, Sq, Hq, D = q.shape
    Skv, Hkv = k.shape[1], k.shape[2]
    Dv = v.shape[-1]
    G = Hq // Hkv

    BQ = min(block_q, max(8, Sq))
    BK = min(block_k, Skv)
    pq = (-Sq) % BQ
    pk = (-Skv) % BK
    qt = jnp.pad(q, ((0, 0), (0, pq), (0, 0), (0, 0))).transpose(0, 2, 1, 3)
    kt = jnp.pad(k, ((0, 0), (0, pk), (0, 0), (0, 0))).transpose(0, 2, 1, 3)
    vt = jnp.pad(v, ((0, 0), (0, pk), (0, 0), (0, 0))).transpose(0, 2, 1, 3)
    nq = (Sq + pq) // BQ
    nk = (Skv + pk) // BK

    use_sink = sinks is not None
    sink_in = (
        sinks.astype(jnp.float32)
        if use_sink else jnp.zeros((Hq,), jnp.float32)
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B, Hq, nq, nk),
        in_specs=[
            pl.BlockSpec((1, 1, BQ, D),
                         lambda b, h, i, j, qo, kl, sk: (b, h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, BK, D),
                         lambda b, h, i, j, qo, kl, sk: (b, h // G, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, BK, Dv),
                         lambda b, h, i, j, qo, kl, sk: (b, h // G, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, BQ, Dv), lambda b, h, i, j, qo, kl, sk: (b, h, i, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((BQ, 1), jnp.float32),
            pltpu.VMEM((BQ, 1), jnp.float32),
            pltpu.VMEM((BQ, Dv), jnp.float32),
        ],
    )

    out = pl.pallas_call(
        functools.partial(
            _kernel, scale=scale, window=window, BQ=BQ, BK=BK,
            use_sink=use_sink,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hq, Sq + pq, Dv), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * Hq * (Sq + pq) * (Skv + pk) * (D + Dv) // 2,
            bytes_accessed=2 * B * (Hq * Sq * D + Hkv * Skv * (D + Dv)),
            transcendentals=B * Hq * Sq * Skv,
        ),
        interpret=interpret,
    )(q_offset.astype(jnp.int32), kv_len.astype(jnp.int32), sink_in,
      qt, kt, vt)

    return out.transpose(0, 2, 1, 3)[:, :Sq]
