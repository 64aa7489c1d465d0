"""Pallas kernel tests (interpret mode on CPU; compiled on TPU).

Each kernel is pinned against its XLA reference implementation — the
same reference-vs-optimized strategy as the reference's kernel unit
tests (reference src/moe.rs:3298 quantize→forward vs scalar)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from krasis_tpu.ops.qmm import qmm_ref
from krasis_tpu.ops.qmm_pallas import qmm_pallas
from krasis_tpu.quant import quantize


@pytest.mark.parametrize("bits", [4, 8])
@pytest.mark.parametrize("T,K,N", [(1, 256, 256), (8, 512, 384), (17, 256, 128)])
def test_qmm_pallas_matches_ref(bits, T, K, N):
    key = jax.random.PRNGKey(0)
    kx, kw = jax.random.split(key)
    w = jax.random.normal(kw, (K, N), jnp.float32) * 0.05
    qt = quantize(w, bits=bits, group_size=128)
    x = jax.random.normal(kx, (T, K), jnp.float32) * 0.5

    want = qmm_ref(x.astype(jnp.bfloat16), qt, out_dtype=jnp.float32)
    got = qmm_pallas(x, qt, out_dtype=jnp.float32, interpret=True)
    assert got.shape == (T, N)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-2, atol=2e-2
    )


@pytest.mark.parametrize("bits", [4, 8])
@pytest.mark.parametrize("layer", [0, 2])
def test_qmm_stacked_pallas_matches_ref(bits, layer):
    """Layer-stacked qmm (decode attention projections): in-kernel layer
    index == slicing then dequantizing."""
    from krasis_tpu.ops.qmm_pallas import qmm_stacked_pallas
    from krasis_tpu.quant import QTensor

    L, T, K, N = 3, 2, 256, 384
    key = jax.random.PRNGKey(1)
    kx, kw = jax.random.split(key)
    w = jax.random.normal(kw, (L, K, N), jnp.float32) * 0.05
    qts = [quantize(w[i], bits=bits, group_size=128) for i in range(L)]
    qt = QTensor(jnp.stack([q.q for q in qts]),
                 jnp.stack([q.scales for q in qts]), bits, 128)
    x = jax.random.normal(kx, (T, K), jnp.float32) * 0.5

    want = qmm_ref(x.astype(jnp.bfloat16), qts[layer],
                   out_dtype=jnp.float32)
    got = qmm_stacked_pallas(x, qt, layer, out_dtype=jnp.float32,
                             interpret=True)
    assert got.shape == (T, N)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-2, atol=2e-2
    )


from krasis_tpu.ops.moe import moe_forward_gathered
from krasis_tpu.ops.moe_pallas import moe_gathered_pallas
from krasis_tpu.quant import random_qtensor

HI = jax.lax.Precision.HIGHEST


@pytest.mark.parametrize("bits", [4, 8])
def test_moe_gathered_pallas_matches_ref(bits):
    E, H, I, T, k = 8, 256, 128, 2, 3
    key = jax.random.PRNGKey(1)
    k13, k2, kx, ki, kw = jax.random.split(key, 5)
    # keep weight magnitude ~0.25 so intermediates stay O(1): the paths
    # differ only in bf16 rounding points, which atol can then bound
    mag = 0.03 if bits == 4 else 0.002
    w13 = random_qtensor(k13, (E, H, 2 * I), bits, group_size=128, scale_mag=mag)
    w2 = random_qtensor(k2, (E, I, H), bits, group_size=128, scale_mag=mag)
    x = jax.random.normal(kx, (T, H), jnp.float32) * 0.5
    idx = jax.random.randint(ki, (T, k), 0, E, dtype=jnp.int32)
    wts = jax.random.uniform(kw, (T, k), jnp.float32, 0.1, 1.0)

    want = moe_forward_gathered(
        x.astype(jnp.bfloat16), w13, w2, idx, wts, precision=HI
    )
    got = moe_gathered_pallas(x, w13, w2, idx, wts, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=3e-2, atol=3e-2,
    )


@pytest.mark.parametrize("bits", [4, 8])
def test_moe_gathered_w4a8_matches_ref(bits):
    """W4A8 opt-in kernel: int8 activations add bounded rounding noise
    over the W4A16 reference (group-wise scales keep it ≲2% of max)."""
    from krasis_tpu.ops.moe_pallas import moe_gathered_w4a8_pallas

    E, H, I, T, k = 8, 256, 128, 4, 3
    key = jax.random.PRNGKey(3)
    k13, k2, kx, ki, kw = jax.random.split(key, 5)
    mag = 0.03 if bits == 4 else 0.002
    w13 = random_qtensor(k13, (E, H, 2 * I), bits, group_size=128, scale_mag=mag)
    w2 = random_qtensor(k2, (E, I, H), bits, group_size=128, scale_mag=mag)
    x = jax.random.normal(kx, (T, H), jnp.float32) * 0.5
    idx = jax.random.randint(ki, (T, k), 0, E, dtype=jnp.int32)
    wts = jax.random.uniform(kw, (T, k), jnp.float32, 0.1, 1.0)

    want = np.asarray(moe_forward_gathered(
        x.astype(jnp.bfloat16), w13, w2, idx, wts, precision=HI
    ), np.float32)
    got = np.asarray(moe_gathered_w4a8_pallas(
        x.astype(jnp.bfloat16), w13, w2, idx, wts, interpret=True
    ), np.float32)
    scale = np.abs(want).max() + 1e-9
    assert np.abs(got - want).max() / scale < 0.03
    # and it must be a close direction match, not just small-magnitude
    c = np.corrcoef(got.ravel(), want.ravel())[0, 1]
    assert c > 0.995


@pytest.mark.parametrize("bits", [4, 8])
def test_moe_gathered_tiled_a8_matches_ref(bits):
    """W4A8 through the N-TILED gathered kernels (experts too large for
    the fused single-pick kernel — V2-Lite's 4.3 MB/pick case): int8
    activations, per-K-group int8×int8 dots per N-tile. Also exercises
    pick_valid skipping (the EP contract)."""
    from krasis_tpu.ops.moe_pallas import (
        gathered_qmm_a8_supported, moe_gathered_tiled)

    E, H, I, T, k = 8, 256, 128, 4, 3
    key = jax.random.PRNGKey(5)
    k13, k2, kx, ki, kw = jax.random.split(key, 5)
    mag = 0.03 if bits == 4 else 0.002
    w13 = random_qtensor(k13, (E, H, 2 * I), bits, group_size=128, scale_mag=mag)
    w2 = random_qtensor(k2, (E, I, H), bits, group_size=128, scale_mag=mag)
    assert gathered_qmm_a8_supported(w13) and gathered_qmm_a8_supported(w2)
    x = jax.random.normal(kx, (T, H), jnp.float32) * 0.5
    idx = jax.random.randint(ki, (T, k), 0, E, dtype=jnp.int32)
    wts = jax.random.uniform(kw, (T, k), jnp.float32, 0.1, 1.0)

    want = np.asarray(moe_forward_gathered(
        x.astype(jnp.bfloat16), w13, w2, idx, wts, precision=HI
    ), np.float32)
    got = np.asarray(moe_gathered_tiled(
        x.astype(jnp.bfloat16), w13, w2, idx, wts, interpret=True,
        activation="int8",
    ), np.float32)
    scale = np.abs(want).max() + 1e-9
    assert np.abs(got - want).max() / scale < 0.03
    c = np.corrcoef(got.ravel(), want.ravel())[0, 1]
    assert c > 0.995

    # masked picks contribute nothing (EP skip contract)
    pv = jnp.ones((T, k), bool).at[1, 0].set(False)
    wts0 = wts.at[1, 0].set(0.0)
    want_m = np.asarray(moe_forward_gathered(
        x.astype(jnp.bfloat16), w13, w2, idx, wts0, precision=HI
    ), np.float32)
    got_m = np.asarray(moe_gathered_tiled(
        x.astype(jnp.bfloat16), w13, w2, idx, wts0, interpret=True,
        activation="int8", pick_valid=pv,
    ), np.float32)
    assert np.abs(got_m - want_m).max() / scale < 0.03


@pytest.mark.parametrize("bits", [4, 8])
def test_gmm_a8_prefill_matches_ref(bits):
    """W4A8 through the GROUPED prefill kernel (gmm_pallas.gmm_a8):
    int8 activations + per-K-group int8×int8 tile dots, same tile
    plan/skip semantics as the bf16 gmm — vs the XLA reference within
    activation-rounding tolerance. Also pins EP pick_valid skipping."""
    from krasis_tpu.ops.gmm_pallas import gmm_a8_supported, moe_prefill_pallas

    E, H, I, T, k = 8, 256, 128, 48, 3     # T*k > 0.75E: grouped regime
    key = jax.random.PRNGKey(9)
    k13, k2, kx, ki, kw = jax.random.split(key, 5)
    mag = 0.03 if bits == 4 else 0.002
    w13 = random_qtensor(k13, (E, H, 2 * I), bits, group_size=128, scale_mag=mag)
    w2 = random_qtensor(k2, (E, I, H), bits, group_size=128, scale_mag=mag)
    assert gmm_a8_supported(w13) and gmm_a8_supported(w2)
    x = jax.random.normal(kx, (T, H), jnp.float32) * 0.5
    idx = jax.random.randint(ki, (T, k), 0, E, dtype=jnp.int32)
    wts = jax.random.uniform(kw, (T, k), jnp.float32, 0.1, 1.0)

    want = np.asarray(moe_forward_gathered(
        x.astype(jnp.bfloat16), w13, w2, idx, wts, precision=HI
    ), np.float32)
    got = np.asarray(moe_prefill_pallas(
        x.astype(jnp.bfloat16), w13, w2, idx, wts, interpret=True,
        activation="int8",
    ), np.float32)
    scale = np.abs(want).max() + 1e-9
    assert np.abs(got - want).max() / scale < 0.03
    assert np.corrcoef(got.ravel(), want.ravel())[0, 1] > 0.995

    pv = jnp.ones((T, k), bool).at[2, 1].set(False)
    wts0 = wts.at[2, 1].set(0.0)
    want_m = np.asarray(moe_forward_gathered(
        x.astype(jnp.bfloat16), w13, w2, idx, wts0, precision=HI
    ), np.float32)
    got_m = np.asarray(moe_prefill_pallas(
        x.astype(jnp.bfloat16), w13, w2, idx, wts0, interpret=True,
        activation="int8", pick_valid=pv,
    ), np.float32)
    assert np.abs(got_m - want_m).max() / scale < 0.03


def test_w4a8_through_model_forward():
    """expert_activation='int8' threads from QuantConfig through the
    decode forward (kernel choice + numerics sanity vs bf16 run)."""
    from krasis_tpu.config import QuantConfig, preset_config
    from krasis_tpu.models.params import init_synthetic_params
    from krasis_tpu.models.model import make_forward_fns
    from krasis_tpu.runtime.kv_cache import init_cache
    import os

    cfg = preset_config(
        "qwen3-moe",
        hidden_size=128, intermediate_size=256, moe_intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        vocab_size=512, head_dim=32,
        n_routed_experts=8, num_experts_per_tok=2,
    )
    os.environ["KRASIS_TPU_PALLAS_INTERPRET"] = "1"
    try:
        outs = {}
        for act in ("bf16", "int8"):
            quant = QuantConfig(expert_bits=4, group_size=128,
                                kv_cache_dtype="bf16",
                                expert_activation=act)
            params = init_synthetic_params(cfg, quant, jax.random.PRNGKey(0))
            cache = init_cache(cfg, quant, batch=1, max_len=64)
            prefill_fn, decode_fn, _ = make_forward_fns(cfg, quant)
            toks = jnp.arange(1, 9, dtype=jnp.int32)[None, :]
            logits, cache = prefill_fn(params, toks, jnp.asarray([8]), cache)
            nxt = jnp.argmax(logits, -1).astype(jnp.int32)[:, None]
            logits2, _ = decode_fn(params, nxt, cache)
            outs[act] = np.asarray(logits2, np.float32)
        # prefill identical (W4A8 is decode-only), decode close but not
        # necessarily identical
        d = np.abs(outs["int8"] - outs["bf16"]).max()
        s = np.abs(outs["bf16"]).max() + 1e-9
        assert d / s < 0.05, d / s
    finally:
        os.environ.pop("KRASIS_TPU_PALLAS_INTERPRET", None)


def test_moe_gathered_pallas_gptoss_activation():
    E, H, I, T, k = 4, 128, 128, 1, 2
    key = jax.random.PRNGKey(2)
    k13, k2, kx, ki, kw = jax.random.split(key, 5)
    w13 = random_qtensor(k13, (E, H, 2 * I), 4, group_size=128, scale_mag=0.03)
    w2 = random_qtensor(k2, (E, I, H), 4, group_size=128, scale_mag=0.03)
    x = jax.random.normal(kx, (T, H), jnp.float32)
    idx = jax.random.randint(ki, (T, k), 0, E, dtype=jnp.int32)
    wts = jnp.ones((T, k), jnp.float32)

    want = moe_forward_gathered(
        x.astype(jnp.bfloat16), w13, w2, idx, wts,
        swiglu_limit=7.0, gpt_oss=True, precision=HI,
    )
    got = moe_gathered_pallas(
        x, w13, w2, idx, wts, swiglu_limit=7.0, gpt_oss=True, interpret=True
    )
    # kernel applies the activation on f32 h; the reference rounds h to
    # bf16 first — allow that one-rounding difference
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=3e-2, atol=5e-2,
    )


from krasis_tpu.ops.attention import attend, build_mask, mla_absorbed_attention
from krasis_tpu.ops.flash_attention import flash_attention


def _flash_vs_ref(B, Sq, Skv, Hq, Hkv, D, Dv, q_off, kv_len, window=0,
                  sinks=None, BQ=64, BK=64, seed=0):
    key = jax.random.PRNGKey(seed)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, Sq, Hq, D), jnp.float32)
    k = jax.random.normal(kk, (B, Skv, Hkv, D), jnp.float32)
    v = jax.random.normal(kv, (B, Skv, Hkv, Dv), jnp.float32)
    scale = D ** -0.5
    q_off_a = jnp.asarray(q_off, jnp.int32)
    kv_len_a = jnp.asarray(kv_len, jnp.int32)

    q_pos = q_off_a[:, None] + jnp.arange(Sq)[None, :]
    mask = build_mask(q_pos, jnp.arange(Skv), kv_len_a, window=window)
    want = attend(q, k, v, mask, scale, sinks=sinks, precision=HI)
    got = flash_attention(
        q, k, v, q_off_a, kv_len_a, scale, window=window, sinks=sinks,
        block_q=BQ, block_k=BK, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=2e-2, atol=2e-2,
    )


def test_flash_causal_basic():
    _flash_vs_ref(1, 128, 128, 4, 4, 64, 64, [0], [128])


def test_flash_gqa_groups():
    _flash_vs_ref(2, 128, 128, 8, 2, 64, 64, [0, 0], [128, 100])


def test_flash_offset_and_kvlen():
    # chunked-prefill style: q starts at position 64 against 256-slot cache
    _flash_vs_ref(1, 64, 256, 4, 2, 64, 64, [64], [128])


def test_flash_ragged_blocks():
    _flash_vs_ref(1, 100, 200, 4, 4, 64, 64, [0], [100], BQ=64, BK=64)


def test_flash_sliding_window():
    _flash_vs_ref(1, 128, 128, 4, 4, 64, 64, [0], [128], window=32)


def test_flash_sinks():
    sinks = jnp.asarray(np.linspace(-1, 1, 4), jnp.float32)
    _flash_vs_ref(1, 64, 64, 4, 4, 64, 64, [0], [64], sinks=sinks)


def test_flash_mla_shape():
    # MLA absorbed: MQA with D=96 latent+rope, Dv=64 latent
    _flash_vs_ref(1, 64, 128, 4, 1, 128, 64, [32], [96])


from krasis_tpu.ops.moe_pallas import gathered_qmm_pallas, moe_gathered_tiled


def test_gathered_qmm_pallas_matches_gather():
    E, K, N, P = 4, 256, 512, 5
    key = jax.random.PRNGKey(3)
    kw, kx, ke = jax.random.split(key, 3)
    w = random_qtensor(kw, (E, K, N), 4, group_size=128)
    x = jax.random.normal(kx, (P, K), jnp.float32) * 0.5
    eids = jax.random.randint(ke, (P,), 0, E, dtype=jnp.int32)
    got = gathered_qmm_pallas(x, w, eids, interpret=True)
    from krasis_tpu.quant import dequantize
    wd = dequantize(w, dtype=jnp.bfloat16)
    want = jnp.einsum("pk,pkn->pn", x.astype(jnp.bfloat16),
                      jnp.take(wd, eids, axis=0), precision=HI,
                      preferred_element_type=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-2, atol=3e-2)


def test_moe_gathered_tiled_matches_ref():
    E, H, I, T, k = 6, 256, 256, 2, 3
    key = jax.random.PRNGKey(4)
    k13, k2, kx, ki, kw = jax.random.split(key, 5)
    w13 = random_qtensor(k13, (E, H, 2 * I), 4, group_size=128)
    w2 = random_qtensor(k2, (E, I, H), 4, group_size=128)
    x = jax.random.normal(kx, (T, H), jnp.float32) * 0.5
    idx = jax.random.randint(ki, (T, k), 0, E, dtype=jnp.int32)
    wts = jax.random.uniform(kw, (T, k), jnp.float32, 0.1, 1.0)
    want = moe_forward_gathered(x.astype(jnp.bfloat16), w13, w2, idx, wts,
                                precision=HI)
    got = moe_gathered_tiled(x, w13, w2, idx, wts, interpret=True)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=3e-2, atol=3e-2)


from krasis_tpu.ops.gmm_pallas import gmm, moe_prefill_pallas, _plan_tiles


def test_gmm_plan_tiles():
    idx = jnp.asarray([[0, 2], [2, 1], [2, 0]], jnp.int32)  # T=3, k=2
    dest, tile_e, tile_valid, order, n_tiles = _plan_tiles(idx, 3, 2, 4)
    # groups: e0:2, e1:1, e2:3 → padded to 128 each → offsets 0,128,256
    assert int(dest.max()) < n_tiles * 128
    d = np.asarray(dest)
    assert len(set(d.tolist())) == 6  # unique scatter positions
    # 3 hit experts → 3 valid tiles, rest skipped
    assert int(np.asarray(tile_valid).sum()) == 3

    # EP trash group: mark one pick remote — it must scatter out of bounds
    # (dropped) and not occupy a group slot
    pv = jnp.asarray([[True, True], [True, False], [True, True]])
    dest2, _, tv2, _, nt2 = _plan_tiles(idx, 3, 2, 4, pick_valid=pv)
    assert int(np.asarray(dest2).max()) >= nt2 * 128  # trash past spare tile
    # expert 1's only pick was remote → only experts 0 and 2 have tiles
    assert int(np.asarray(tv2).sum()) == 2


def test_moe_prefill_pallas_matches_ref():
    E, H, I, T, k = 8, 256, 128, 12, 2
    key = jax.random.PRNGKey(5)
    k13, k2, kx, ki, kw = jax.random.split(key, 5)
    w13 = random_qtensor(k13, (E, H, 2 * I), 4, group_size=128)
    w2 = random_qtensor(k2, (E, I, H), 4, group_size=128)
    x = jax.random.normal(kx, (T, H), jnp.float32) * 0.5
    idx = jax.random.randint(ki, (T, k), 0, E, dtype=jnp.int32)
    wts = jax.random.uniform(kw, (T, k), jnp.float32, 0.1, 1.0)
    want = moe_forward_gathered(x.astype(jnp.bfloat16), w13, w2, idx, wts,
                                precision=HI)
    got = moe_prefill_pallas(x, w13, w2, idx, wts, interpret=True)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=3e-2, atol=3e-2)
