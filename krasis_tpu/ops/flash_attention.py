"""Pallas TPU flash attention (causal, GQA/MQA, masked, windowed, sinks).

Replaces the XLA masked-dense attention for prefill AND decode: online-
softmax over KV blocks so memory is O(BQ·BK) instead of O(Sq·Skv) — the
role FlashInfer plays for the reference (reference
python/krasis/attention.py) re-built as a TPU kernel. One kernel covers:

* GQA (q heads grouped over kv heads via the k/v index maps),
* MLA absorbed form (Hkv=1, D=latent+rope, Dv=latent — MQA-style),
* per-row valid KV lengths, absolute query position offsets (chunked
  prefill against a cache prefix), sliding windows (GPT-OSS), and
  attention-sink logits,
* decode directly over the FP8 KV cache: K/V arrive in storage dtype and
  upcast per block IN the kernel, so no bf16 copy of the cache is ever
  materialized (the reference reads only used pages and upcasts those,
  attention.py:320-337 — here the same effect via block skipping),
* MLA's V = prefix-of-K optimization (``v_from_k``): the latent value is
  the first Dv lanes of the [ckv ; kpe] key buffer, so decode fetches ONE
  buffer instead of two.

Grid (B, Hq, nq, nk) — the innermost kv dimension iterates sequentially
on TPU, carrying (m, l, acc) in VMEM scratch. Blocks outside the needed
range (beyond kv_len, beyond the causal frontier, or before a sliding
window) are skipped: their compute is pl.when-gated off AND their k/v
index maps are clamped to the nearest needed block, so the pipeline
re-DMAs nothing for them — decode cost scales with kv_len, not with the
cache bucket size.
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
    if os.environ.get("KRASIS_TPU_PALLAS_INTERPRET"):
        return True
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def decode_available() -> bool:
    """Gate for the decode flash path (KRASIS_TPU_NO_DECODE_FA disables
    it, falling back to XLA masked attention — A/B lever)."""
    if os.environ.get("KRASIS_TPU_NO_DECODE_FA"):
        return False
    return available()


def interpret_mode() -> bool:
    return bool(os.environ.get("KRASIS_TPU_PALLAS_INTERPRET"))


def _kernel(
    # scalar prefetch
    q_off_ref, kv_len_ref, sink_ref, layer_ref,
    # inputs
    q_ref, k_ref, v_ref,
    # output
    o_ref,
    # scratch
    m_ref, l_ref, acc_ref,
    *, scale: float, window: int, BQ: int, BK: int, use_sink: bool,
    v_from_k: bool, Dv: int,
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
        # bf16 dot inputs + f32 accumulation: f32 MXU matmuls cost ~6x
        # bf16 passes; softmax stats stay f32.
        q = q_ref[0, 0].astype(jnp.bfloat16)                 # [BQ, D]
        k = k_ref[0, 0].astype(jnp.bfloat16)                 # [BK, D]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale                                            # [BQ, BK]
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
        if v_from_k:
            v = k_ref[0, 0][:, :Dv].astype(jnp.bfloat16)     # [BK, Dv]
        else:
            v = v_ref[0, 0].astype(jnp.bfloat16)             # [BK, Dv]
        acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
            p.astype(jnp.bfloat16), v, (((1,), (0,)), ((), ())),
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
    static_argnames=(
        "scale", "window", "block_q", "block_k", "v_from_k", "v_dim",
        "out_dtype", "interpret", "kv_layout",
    ),
)
def flash_attention(
    q: jax.Array,            # [B, Sq, Hq, D]
    k: jax.Array,            # [B, Skv, Hkv, D] — any dtype (fp8 KV ok)
    v: Optional[jax.Array],  # [B, Skv, Hkv, Dv], or None with v_from_k
    q_offset: jax.Array,     # [B] absolute position of q[:,0]
    kv_len: jax.Array,       # [B] valid kv entries
    scale: float,
    window: int = 0,
    sinks: Optional[jax.Array] = None,   # [Hq]
    block_q: int = DEFAULT_BQ,
    block_k: int = DEFAULT_BK,
    v_from_k: bool = False,
    v_dim: Optional[int] = None,         # Dv when v_from_k (prefix of D)
    out_dtype=None,
    interpret: Optional[bool] = None,
    kv_layout: str = "bshd",  # "bhsd": k/v already [B, Hkv, S, D] (cache)
    layer: Optional[jax.Array] = None,  # with 5D [L,B,Hkv,S,D] bhsd stacks
) -> jax.Array:
    if interpret is None:
        # match the decode kernel: KRASIS_TPU_PALLAS_INTERPRET runs the
        # real kernel in interpret mode on CPU (dryrun/CI path)
        interpret = interpret_mode()
    B, Sq, Hq, D = q.shape
    stacked = k.ndim == 5
    if stacked:
        assert kv_layout == "bhsd" and layer is not None
        Hkv, Skv = k.shape[2], k.shape[3]
    elif kv_layout == "bhsd":
        Hkv, Skv = k.shape[1], k.shape[2]
    else:
        Skv, Hkv = k.shape[1], k.shape[2]
    layer = (jnp.zeros((1,), jnp.int32) if layer is None
             else jnp.asarray(layer, jnp.int32).reshape(1))
    Dv = v_dim if v_from_k else v.shape[-1]
    G = Hq // Hkv
    odt = out_dtype or q.dtype

    BQ = min(block_q, max(8, Sq))
    BK = min(block_k, Skv)
    if Skv % BK:
        import math
        BK = math.gcd(Skv, BK)
    pq = (-Sq) % BQ
    pk = (-Skv) % BK
    qt = jnp.pad(q, ((0, 0), (0, pq), (0, 0), (0, 0))).transpose(0, 2, 1, 3)
    lead = ((0, 0),) if stacked else ()
    if kv_layout == "bhsd":
        # cache layout: no transpose, no copy (chunked prefill reads the
        # fp8 cache in place; pk is 0 for bucket-sized caches)
        kt = jnp.pad(k, lead + ((0, 0), (0, 0), (0, pk), (0, 0)))
    else:
        kt = jnp.pad(k, ((0, 0), (0, pk), (0, 0), (0, 0))).transpose(0, 2, 1, 3)
    kv_lead = (None,) if stacked else ()
    if v_from_k:
        # dummy stand-in: the kernel slices V out of the K block
        vt = jnp.zeros((1,) * len(kv_lead) + (1, 1, 1, 1), k.dtype)
        v_block = kv_lead + (1, 1, 1, 1)
        v_idx = lambda b, h, i, j, qo, kl, sk, li: (0,) * (4 + len(kv_lead))
    else:
        if kv_layout == "bhsd":
            vt = jnp.pad(v, lead + ((0, 0), (0, 0), (0, pk), (0, 0)))
        else:
            vt = jnp.pad(v, ((0, 0), (0, pk), (0, 0), (0, 0))).transpose(0, 2, 1, 3)
        v_block = kv_lead + (1, 1, BK, Dv)
        v_idx = None  # set below with clamping
    nq = (Sq + pq) // BQ
    nk = (Skv + pk) // BK

    # Clamp out-of-range kv block indices to the nearest needed block:
    # consecutive skipped grid steps then hit the same index and the
    # pipeline fetches nothing (same trick as ops/gmm_pallas.py).
    def kv_block_idx(b, i, j, qo, kl):
        q_lo = qo[b] + i * BQ
        kmax = jnp.minimum(kl[b], q_lo + BQ) - 1   # last needed kv position
        jmax = jnp.maximum(kmax, 0) // BK
        jj = jnp.minimum(j, jmax)
        if window > 0:
            jmin = jnp.minimum(jnp.maximum(q_lo - window + 1, 0) // BK, jmax)
            jj = jnp.maximum(jj, jmin)
        return jj

    def _lead_idx(li):
        return (li[0],) if stacked else ()

    def k_idx(b, h, i, j, qo, kl, sk, li):
        return _lead_idx(li) + (b, h // G, kv_block_idx(b, i, j, qo, kl), 0)

    if v_idx is None:
        def v_idx(b, h, i, j, qo, kl, sk, li):
            return _lead_idx(li) + (b, h // G, kv_block_idx(b, i, j, qo, kl), 0)

    use_sink = sinks is not None
    sink_in = (
        sinks.astype(jnp.float32)
        if use_sink else jnp.zeros((Hq,), jnp.float32)
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(B, Hq, nq, nk),
        in_specs=[
            pl.BlockSpec((1, 1, BQ, D),
                         lambda b, h, i, j, qo, kl, sk, li: (b, h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(kv_lead + (1, 1, BK, D), k_idx,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(v_block, v_idx, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, BQ, Dv), lambda b, h, i, j, qo, kl, sk, li: (b, h, i, 0),
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
            use_sink=use_sink, v_from_k=v_from_k, Dv=Dv,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hq, Sq + pq, Dv), odt),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * Hq * (Sq + pq) * (Skv + pk) * (D + Dv) // 2,
            bytes_accessed=2 * B * (Hq * Sq * D + Hkv * Skv * (D + Dv)),
            transcendentals=B * Hq * Sq * Skv,
        ),
        interpret=interpret,
    )(q_offset.astype(jnp.int32), kv_len.astype(jnp.int32), sink_in,
      layer, qt, kt, vt)

    return out.transpose(0, 2, 1, 3)[:, :Sq]


def _decode_kernel(
    # scalar prefetch
    kv_len_ref, layer_ref,
    # inputs
    q_ref, k_hbm, v_hbm, sink_ref,
    # output
    o_ref,
    # scratch
    k_buf, v_buf, k_sem, v_sem,
    *, scale: float, window: int, BK: int, use_sink: bool,
    v_from_k: bool, Dv: int, G: int, NBUF: int, Sq: int,
):
    """Decode attention with an IN-KERNEL multi-buffered DMA loop.

    The kv loop is a `fori_loop` whose trip count is ceil(kv_len / BK) —
    data-dependent, so a 2K-history request in a 64K cache bucket runs 4
    iterations, not 128 grid steps. NBUF VMEM slots keep NBUF-1 block
    copies in flight at once: a single HBM→VMEM DMA stream is latency-
    bound (~4.5 µs per block observed through this chip), so overlapping
    several multiplies effective bandwidth — double-buffering alone left
    decode attention at ~73 GB/s.

    Sq > 1 (speculative-decode verify step): the Sq query tokens of a
    slot sit at positions kv_len-Sq .. kv_len-1; their G group rows are
    stacked into one [Sq*G, D] dot, and causal masking is per row group
    (query s may only see kv positions <= kv_len - Sq + s).
    """
    b = pl.program_id(0)
    h = pl.program_id(1)
    li = layer_ref[0]
    kv_len = kv_len_ref[b]
    nblk = jax.lax.div(kv_len + BK - 1, BK)
    j0 = jnp.int32(0)
    if window > 0:
        j0 = jnp.maximum(kv_len - Sq + 1 - window, 0) // BK
    # query-row absolute positions: row r belongs to query s = r // G at
    # position kv_len - Sq + s
    row_pos = (kv_len - Sq
               + jax.lax.broadcasted_iota(jnp.int32, (Sq * G, 1), 0) // G)

    q = q_ref[0, 0].astype(jnp.bfloat16)                      # [Sq*G, D]

    def k_copy(j, slot):
        return pltpu.make_async_copy(
            k_hbm.at[li, b, h, pl.ds(j * BK, BK), :], k_buf.at[slot],
            k_sem.at[slot],
        )

    def v_copy(j, slot):
        return pltpu.make_async_copy(
            v_hbm.at[li, b, h, pl.ds(j * BK, BK), :], v_buf.at[slot],
            v_sem.at[slot],
        )

    # Fill the pipeline: NBUF-1 copies in flight before the first wait.
    for d in range(NBUF - 1):
        @pl.when(j0 + d < nblk)
        def _prime(d=d):
            k_copy(j0 + d, d).start()
            if not v_from_k:
                v_copy(j0 + d, d).start()

    def body(j, carry):
        m_prev, l_prev, acc = carry
        slot = jax.lax.rem(j - j0, NBUF)

        # Issue block j+NBUF-1 into the slot freed by iteration j-1.
        @pl.when(j + NBUF - 1 < nblk)
        def _prefetch():
            nxt = jax.lax.rem(j - j0 + NBUF - 1, NBUF)
            k_copy(j + NBUF - 1, nxt).start()
            if not v_from_k:
                v_copy(j + NBUF - 1, nxt).start()

        k_copy(j, slot).wait()
        # bf16 dot inputs, f32 accumulation (f32 MXU passes cost ~6x)
        k = k_buf[slot].astype(jnp.bfloat16)                  # [BK, D]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale                                             # [Sq*G, BK]
        kp = j * BK + jax.lax.broadcasted_iota(jnp.int32, (1, BK), 1)
        mask = kp <= row_pos                                  # causal, per row
        if window > 0:
            mask &= kp > row_pos - window
        s = jnp.where(mask, s, NEG_INF)

        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        m_safe = jnp.where(m_new <= NEG_INF / 2, 0.0, m_new)
        p = jnp.where(mask, jnp.exp(s - m_safe), 0.0)
        alpha = jnp.where(m_prev <= NEG_INF / 2, 0.0, jnp.exp(m_prev - m_safe))
        l_new = l_prev * alpha + p.sum(axis=-1, keepdims=True)
        if v_from_k:
            v = k_buf[slot][:, :Dv].astype(jnp.bfloat16)
        else:
            v_copy(j, slot).wait()
            v = v_buf[slot].astype(jnp.bfloat16)
        acc = acc * alpha + jax.lax.dot_general(
            p.astype(jnp.bfloat16), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return m_new, l_new, acc

    m0 = jnp.full((Sq * G, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((Sq * G, 1), jnp.float32)
    a0 = jnp.zeros((Sq * G, Dv), jnp.float32)
    m, l, acc = jax.lax.fori_loop(j0, nblk, body, (m0, l0, a0))

    if use_sink:
        sink = sink_ref[0, 0].reshape(-1, 1).astype(jnp.float32)  # [Sq*G, 1]
        m_safe = jnp.where(m <= NEG_INF / 2, 0.0, m)
        l = l + jnp.exp(sink - m_safe)
    denom = jnp.where(l == 0.0, 1.0, l)
    o_ref[0, 0] = (acc / denom).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "scale", "window", "v_from_k", "v_dim", "block_k", "interpret",
        "num_buffers",
    ),
)
def decode_attention(
    q: jax.Array,            # [B, Sq, Hq, D] (Sq=1 decode; small Sq for
                             #  speculative verify steps)
    k_cache: jax.Array,      # [B, Hkv, S, D] or [L, B, Hkv, S, D] stacked
    v_cache: Optional[jax.Array],
    kv_len: jax.Array,       # [B] valid entries INCLUDING this step's
    scale: float,
    window: int = 0,
    sinks: Optional[jax.Array] = None,
    v_from_k: bool = False,
    v_dim: Optional[int] = None,
    block_k: int = DEFAULT_BK,
    interpret: Optional[bool] = None,
    layer: Optional[jax.Array] = None,  # scalar layer index into a 5D stack
    num_buffers: Optional[int] = None,
) -> jax.Array:
    """Single-token attention straight over the (fp8) KV cache.

    The cache arrives already in the kernel layout ``[B, Hkv, S, D]``
    (runtime/kv_cache.py stores it that way) so NO copy, pad, transpose
    or upcast of the cache happens outside the kernel — the old
    ``[B, S, Hkv, D]`` layout forced a full-cache pad+transpose per step.
    A pattern-STACKED cache ``[L, B, Hkv, S, D]`` is read directly with
    the layer index resolved IN the kernel (scalar prefetch): the model's
    layer scan must never dynamic-slice a stacked cache — XLA materializes
    the 10s-of-MB layer slice per step (profiled at ~6 ms/tok at 32K).
    On real TPU hardware the in-kernel DMA requires ``D % 128 == 0``
    (Mosaic tiling); the cache pads its minor dim to a lane multiple and
    callers pad q with zero lanes to match (zero lanes don't change the
    scores).

    Decode-specialized grid (B, Hkv): the G group-query heads of one
    kv head are the ROWS of a single [G, D] x [D, BK] dot, so every KV
    block is fetched exactly once per step (the 4D prefill grid would
    refetch it per q head — 16x the HBM reads on MLA). The kv loop is a
    data-dependent fori_loop over ceil(kv_len/BK) blocks, so step cost
    scales with kv_len, not the cache bucket. Returns [B, 1, Hq, Dv] in
    q.dtype.
    """
    if interpret is None:
        interpret = interpret_mode()
    B, Sq, Hq, D = q.shape
    if k_cache.ndim == 4:
        k_cache = k_cache[None]
        if v_cache is not None:
            v_cache = v_cache[None]
    if layer is None:
        layer = jnp.zeros((1,), jnp.int32)
    else:
        layer = jnp.asarray(layer, jnp.int32).reshape(1)
    Hkv, S = k_cache.shape[2], k_cache.shape[3]
    G = Hq // Hkv
    Dv = v_dim if v_from_k else v_cache.shape[-1]

    if num_buffers is None:
        num_buffers = int(os.environ.get("KRASIS_TPU_DECODE_NBUF", "4"))
    block_k = int(os.environ.get("KRASIS_TPU_DECODE_BK", str(block_k)))
    BK = min(block_k, S)
    if S % BK:
        import math
        BK = math.gcd(S, BK)
    NBUF = max(2, min(num_buffers, 8))
    if not interpret and D % 128:
        raise ValueError(
            f"decode_attention on TPU needs lane-padded D (got {D}); "
            "pad the cache minor dim to a multiple of 128"
        )
    # [B, Sq, Hq, D] → [B, Hkv, Sq*G, D]: the Sq query tokens' group rows
    # stack into one dot per kv head (row r ↔ query s = r // G).
    qg = (q.reshape(B, Sq, Hkv, G, D)
          .transpose(0, 2, 1, 3, 4).reshape(B, Hkv, Sq * G, D))
    # The kernel DMAs [BK, D] rows itself, so the cache stays in HBM
    # (ANY) and only kv_len-bounded blocks ever move.
    kt = k_cache
    if v_from_k:
        vt = jnp.zeros((1, 1, 1, BK, 1), k_cache.dtype)
    else:
        vt = v_cache

    use_sink = sinks is not None
    sink_in = (
        sinks.astype(jnp.float32).reshape(Hkv, G)
        if use_sink else jnp.zeros((Hkv, G), jnp.float32)
    )
    sink_in = jnp.tile(sink_in, (1, Sq))[:, None, :]  # [Hkv, 1, Sq*G]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, Hkv),
        in_specs=[
            pl.BlockSpec((1, 1, Sq * G, D), lambda b, h, kl, li: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 1, Sq * G), lambda b, h, kl, li: (h, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, Sq * G, Dv), lambda b, h, kl, li: (b, h, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((NBUF, BK, D), k_cache.dtype),
            pltpu.VMEM((NBUF, BK, 1 if v_from_k else Dv),
                       k_cache.dtype),
            pltpu.SemaphoreType.DMA((NBUF,)),
            pltpu.SemaphoreType.DMA((NBUF,)),
        ],
    )

    out = pl.pallas_call(
        functools.partial(
            _decode_kernel, scale=scale, window=window, BK=BK,
            use_sink=use_sink, v_from_k=v_from_k, Dv=Dv, G=G, NBUF=NBUF,
            Sq=Sq,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hkv, Sq * G, Dv), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * Hq * Sq * S * (D + Dv) // 2,
            bytes_accessed=B * Hkv * S * (D + (0 if v_from_k else Dv))
            + B * Hq * Sq * (D + Dv) * 4,
            transcendentals=B * Hq * Sq * S,
        ),
        interpret=interpret,
    )(kv_len.astype(jnp.int32), layer, qg, kt, vt, sink_in)

    return (out.reshape(B, Hkv, Sq, G, Dv)
            .transpose(0, 2, 1, 3, 4).reshape(B, Sq, Hq, Dv))
