"""Attention primitive tests: masked GQA vs torch SDPA; MLA absorbed vs
decompressed oracle (reference's test_attn_verify.py / test_gqa_compare.py
analog)."""

import numpy as np
import jax
import jax.numpy as jnp

HI = jax.lax.Precision.HIGHEST
import torch

from krasis_tpu.ops.attention import attend, build_mask, mla_absorbed_attention


def test_gqa_attend_matches_torch_sdpa():
    B, Sq, Hq, Hkv, D = 2, 5, 8, 2, 16
    rng = np.random.default_rng(0)
    q = rng.normal(size=(B, Sq, Hq, D)).astype(np.float32)
    k = rng.normal(size=(B, Sq, Hkv, D)).astype(np.float32)
    v = rng.normal(size=(B, Sq, Hkv, D)).astype(np.float32)
    scale = D ** -0.5

    q_pos = jnp.broadcast_to(jnp.arange(Sq), (B, Sq))
    kv_pos = jnp.arange(Sq)
    kv_len = jnp.full((B,), Sq)
    mask = build_mask(q_pos, kv_pos, kv_len)
    got = attend(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), mask, scale, precision=HI)

    qt = torch.tensor(q).permute(0, 2, 1, 3)
    kt = torch.tensor(k).permute(0, 2, 1, 3)
    vt = torch.tensor(v).permute(0, 2, 1, 3)
    want = torch.nn.functional.scaled_dot_product_attention(
        qt, kt, vt, is_causal=True, enable_gqa=True
    ).permute(0, 2, 1, 3)
    np.testing.assert_allclose(got, want.numpy(), rtol=1e-4, atol=1e-4)


def test_attend_respects_kv_len_and_window():
    B, S, H, D = 1, 8, 1, 8
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(B, 1, H, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, S, H, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, S, H, D)).astype(np.float32))
    # decode at position 5 with kv_len 6 (entries 6,7 junk)
    q_pos = jnp.full((B, 1), 5)
    mask = build_mask(q_pos, jnp.arange(S), jnp.asarray([6]))
    out_full = attend(q, k, v, mask, 1.0, precision=HI)
    # corrupting the junk slots must not change the output
    k2 = k.at[:, 6:].set(999.0)
    v2 = v.at[:, 6:].set(-999.0)
    out2 = attend(q, k2, v2, mask, 1.0, precision=HI)
    np.testing.assert_allclose(out_full, out2, rtol=1e-6)

    # sliding window of 3: only positions 3,4,5 visible
    mask_w = build_mask(q_pos, jnp.arange(S), jnp.asarray([6]), window=3)
    np.testing.assert_array_equal(
        np.asarray(mask_w)[0, 0], [False, False, False, True, True, True, False, False]
    )


def test_attention_sinks_reduce_weights():
    """GPT-OSS sink: adds exp(sink) to the softmax denominator only."""
    B, S, H, D = 1, 4, 2, 8
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.normal(size=(B, 1, H, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, S, H, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, S, H, D)).astype(np.float32))
    mask = build_mask(jnp.full((B, 1), S - 1), jnp.arange(S), jnp.asarray([S]))
    out_nosink = attend(q, k, v, mask, 1.0, precision=HI)
    sinks = jnp.full((H,), -1e9, jnp.float32)  # sink ≈ 0 contribution
    out_sink0 = attend(q, k, v, mask, 1.0, sinks=sinks, precision=HI)
    np.testing.assert_allclose(out_nosink, out_sink0, rtol=1e-5, atol=1e-6)
    # a huge sink drives all outputs toward zero
    out_big = attend(q, k, v, mask, 1.0, sinks=jnp.full((H,), 50.0), precision=HI)
    assert np.abs(np.asarray(out_big)).max() < 1e-6


def test_mla_absorbed_matches_decompressed():
    """Absorbed MLA == standard MHA over decompressed K/V (per-head rope key
    shared across heads), the identity the reference relies on
    (reference python/krasis/attention.py:275 w_kc absorption)."""
    B, S, H = 1, 6, 4
    L, Dn, Dr, Dv = 32, 16, 8, 16
    rng = np.random.default_rng(3)
    q_nope = rng.normal(size=(B, S, H, Dn)).astype(np.float32)
    q_pe = rng.normal(size=(B, S, H, Dr)).astype(np.float32)
    ckv = rng.normal(size=(B, S, L)).astype(np.float32)
    kpe = rng.normal(size=(B, S, Dr)).astype(np.float32)
    w_kc = rng.normal(size=(H, Dn, L)).astype(np.float32) * 0.2
    w_vc = rng.normal(size=(H, L, Dv)).astype(np.float32) * 0.2
    scale = (Dn + Dr) ** -0.5

    q_pos = jnp.broadcast_to(jnp.arange(S), (B, S))
    mask = build_mask(q_pos, jnp.arange(S), jnp.asarray([S]))
    got = mla_absorbed_attention(
        *map(jnp.asarray, (q_nope, q_pe, ckv, kpe, w_kc, w_vc)),
        mask=mask, scale=scale, precision=HI,
    )

    # decompressed oracle: k = [ckv @ w_kc^T per head ; kpe], v = ckv @ w_vc
    k_full = np.einsum("bsl,hdl->bshd", ckv, w_kc)          # [B,S,H,Dn]
    k_full = np.concatenate(
        [k_full, np.broadcast_to(kpe[:, :, None, :], (B, S, H, Dr))], axis=-1
    )
    v_full = np.einsum("bsl,hlv->bshv", ckv, w_vc)
    q_full = np.concatenate([q_nope, q_pe], axis=-1)
    scores = np.einsum("bshd,bthd->bhst", q_full, k_full) * scale
    causal = np.tril(np.ones((S, S), bool))
    scores = np.where(causal, scores, -1e30)
    p = np.exp(scores - scores.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    want = np.einsum("bhst,bthv->bshv", p, v_full)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# Decode flash kernel (interpret mode): fp8 cache, kv_len bounding, v_from_k
# ---------------------------------------------------------------------------

def _decode_oracle(q, k, v, kv_len, scale, window=0, sinks=None):
    """XLA masked attention at the decode position (kv_len-1)."""
    B = q.shape[0]
    q_pos = (kv_len - 1)[:, None]
    mask = build_mask(q_pos, jnp.arange(k.shape[1]), kv_len, window=window)
    return attend(q, k, v, mask, scale, sinks=sinks, precision=HI)


def test_decode_attention_fp8_gqa():
    from krasis_tpu.ops.flash_attention import decode_attention

    B, S, Hq, Hkv, D = 2, 640, 4, 2, 64
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.normal(size=(B, 1, Hq, D)).astype(np.float32) * 0.3
                    ).astype(jnp.bfloat16)
    kf = rng.normal(size=(B, S, Hkv, D)).astype(np.float32) * 0.3
    vf = rng.normal(size=(B, S, Hkv, D)).astype(np.float32) * 0.3
    k8 = jnp.asarray(kf).astype(jnp.float8_e4m3fn)
    v8 = jnp.asarray(vf).astype(jnp.float8_e4m3fn)
    kv_len = jnp.asarray([600, 130])
    scale = D ** -0.5

    got = decode_attention(
        q, k8.transpose(0, 2, 1, 3), v8.transpose(0, 2, 1, 3),
        kv_len, scale, block_k=128, interpret=True,
    )
    want = _decode_oracle(
        q.astype(jnp.float32), k8.astype(jnp.float32),
        v8.astype(jnp.float32), kv_len, scale)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=2e-2, atol=2e-2,
    )


def test_decode_attention_mla_v_from_k():
    from krasis_tpu.ops.flash_attention import decode_attention

    B, S, Hq, L, dr = 2, 384, 4, 64, 16
    rng = np.random.default_rng(4)
    q = jnp.asarray(
        rng.normal(size=(B, 1, Hq, L + dr)).astype(np.float32) * 0.3
    ).astype(jnp.bfloat16)
    kv = jnp.asarray(
        rng.normal(size=(B, S, L + dr)).astype(np.float32) * 0.3
    ).astype(jnp.float8_e4m3fn)
    kv_len = jnp.asarray([300, 64])
    scale = (L + dr) ** -0.5

    import os
    os.environ["KRASIS_TPU_PALLAS_INTERPRET"] = "1"
    try:
        got = decode_attention(
            q, kv[:, None], None, kv_len, scale,
            v_from_k=True, v_dim=L, block_k=128)
    finally:
        del os.environ["KRASIS_TPU_PALLAS_INTERPRET"]
    kfull = kv.astype(jnp.float32)[:, :, None, :]
    want = _decode_oracle(
        q.astype(jnp.float32), kfull, kfull[..., :L], kv_len, scale)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=2e-2, atol=2e-2,
    )


def test_decode_attention_window_and_sinks():
    from krasis_tpu.ops.flash_attention import decode_attention

    B, S, Hq, Hkv, D = 1, 256, 2, 1, 32
    rng = np.random.default_rng(5)
    q = jnp.asarray(rng.normal(size=(B, 1, Hq, D)).astype(np.float32) * 0.3)
    k = jnp.asarray(rng.normal(size=(B, S, Hkv, D)).astype(np.float32) * 0.3)
    v = jnp.asarray(rng.normal(size=(B, S, Hkv, D)).astype(np.float32) * 0.3)
    kv_len = jnp.asarray([200])
    sinks = jnp.asarray(rng.normal(size=(Hq,)).astype(np.float32))
    scale = D ** -0.5

    got = decode_attention(
        q, k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3),
        kv_len, scale, window=64, sinks=sinks,
        block_k=64, interpret=True,
    )
    want = _decode_oracle(q, k, v, kv_len, scale, window=64, sinks=sinks)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=2e-2, atol=2e-2,
    )


def test_flash_attention_bhsd_layout_matches_bshd():
    """Chunked prefill reads the cache in kernel layout [B,Hkv,S,D]:
    same numbers as the standard [B,S,Hkv,D] path (fp8 storage dtype)."""
    from krasis_tpu.ops.flash_attention import flash_attention

    B, Sq, Skv, Hq, Hkv, D = 2, 128, 256, 4, 2, 64
    rng = np.random.default_rng(7)
    q = jnp.asarray(rng.normal(size=(B, Sq, Hq, D)).astype(np.float32) * 0.3
                    ).astype(jnp.bfloat16)
    kf = rng.normal(size=(B, Skv, Hkv, D)).astype(np.float32) * 0.3
    vf = rng.normal(size=(B, Skv, Hkv, D)).astype(np.float32) * 0.3
    k8 = jnp.asarray(kf).astype(jnp.float8_e4m3fn)
    v8 = jnp.asarray(vf).astype(jnp.float8_e4m3fn)
    q_off = jnp.asarray([128, 64])
    kv_len = jnp.asarray([200, 130])
    scale = D ** -0.5

    ref = flash_attention(
        q, k8, v8, q_off, kv_len, scale, block_q=64, block_k=64,
        interpret=True,
    )
    got = flash_attention(
        q, k8.transpose(0, 2, 1, 3), v8.transpose(0, 2, 1, 3),
        q_off, kv_len, scale, block_q=64, block_k=64,
        interpret=True, kv_layout="bhsd",
    )
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        rtol=1e-5, atol=1e-5,
    )


def test_decode_attention_stacked_layer_index():
    """5D [L,B,Hkv,S,D] stacked cache + traced layer index == slicing the
    layer out first (the decode scan carries the stack whole)."""
    from krasis_tpu.ops.flash_attention import decode_attention

    L_layers, B, S, Hq, Hkv, D = 3, 2, 256, 4, 2, 64
    rng = np.random.default_rng(11)
    q = jnp.asarray(rng.normal(size=(B, 1, Hq, D)).astype(np.float32) * 0.3)
    ks = jnp.asarray(
        rng.normal(size=(L_layers, B, Hkv, S, D)).astype(np.float32) * 0.3
    ).astype(jnp.float8_e4m3fn)
    vs = jnp.asarray(
        rng.normal(size=(L_layers, B, Hkv, S, D)).astype(np.float32) * 0.3
    ).astype(jnp.float8_e4m3fn)
    kv_len = jnp.asarray([200, 64])
    scale = D ** -0.5

    for li in range(L_layers):
        got = decode_attention(
            q, ks, vs, kv_len, scale, block_k=128, interpret=True,
            layer=jnp.int32(li),
        )
        want = decode_attention(
            q, ks[li], vs[li], kv_len, scale, block_k=128, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            rtol=1e-5, atol=1e-5,
        )


def test_decode_attention_sq2_verify_step():
    """Sq=2 (speculative verify step): per-query causal limits — query s
    at position kv_len-2+s — must match the XLA oracle at both rows."""
    from krasis_tpu.ops.flash_attention import decode_attention

    B, S, Hq, Hkv, D, Sq = 2, 256, 4, 2, 64, 2
    rng = np.random.default_rng(12)
    q = jnp.asarray(rng.normal(size=(B, Sq, Hq, D)).astype(np.float32) * 0.3)
    k = jnp.asarray(rng.normal(size=(B, S, Hkv, D)).astype(np.float32) * 0.3)
    v = jnp.asarray(rng.normal(size=(B, S, Hkv, D)).astype(np.float32) * 0.3)
    kv_len = jnp.asarray([200, 66])
    scale = D ** -0.5

    got = decode_attention(
        q, k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3),
        kv_len, scale, block_k=64, interpret=True,
    )
    q_pos = jnp.stack([kv_len - 2, kv_len - 1], axis=1)      # [B, 2]
    mask = build_mask(q_pos, jnp.arange(S), kv_len)
    want = attend(q, k, v, mask, scale, precision=HI)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=2e-2, atol=2e-2,
    )


def test_decode_attention_sq2_window_and_sinks():
    from krasis_tpu.ops.flash_attention import decode_attention

    B, S, Hq, Hkv, D, Sq = 1, 256, 2, 1, 32, 2
    rng = np.random.default_rng(13)
    q = jnp.asarray(rng.normal(size=(B, Sq, Hq, D)).astype(np.float32) * 0.3)
    k = jnp.asarray(rng.normal(size=(B, S, Hkv, D)).astype(np.float32) * 0.3)
    v = jnp.asarray(rng.normal(size=(B, S, Hkv, D)).astype(np.float32) * 0.3)
    kv_len = jnp.asarray([180])
    sinks = jnp.asarray(rng.normal(size=(Hq,)).astype(np.float32))
    scale = D ** -0.5

    got = decode_attention(
        q, k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3),
        kv_len, scale, window=64, sinks=sinks, block_k=64, interpret=True,
    )
    q_pos = jnp.stack([kv_len - 2, kv_len - 1], axis=1)
    mask = build_mask(q_pos, jnp.arange(S), kv_len, window=64)
    want = attend(q, k, v, mask, scale, sinks=sinks, precision=HI)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=2e-2, atol=2e-2,
    )
