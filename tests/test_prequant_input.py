"""Prequantized checkpoint inputs: FP8 block-quant (DeepSeek V3 official)
and compressed-tensors pack-quantized INT4 load through the same
requantize-at-load path as plain checkpoints
(reference src/weights/mod.rs:4675-4738)."""

import json
import os
import shutil

import numpy as np
import torch

torch.set_grad_enabled(False)
torch.manual_seed(0)

import jax
import pytest
from ml_dtypes import float8_e4m3fn

from krasis_tpu.config import ModelConfig, QuantConfig
from krasis_tpu.models.loader import load_params
from krasis_tpu.quant import (
    dequant_compressed_int4_np,
    dequant_fp8_block_np,
)
from krasis_tpu.utils.safetensors_io import ShardedSafetensors, write_safetensors


def _tiny_ckpt(tmp_path):
    from transformers import Qwen3MoeConfig, Qwen3MoeForCausalLM

    cfg_hf = Qwen3MoeConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        moe_intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        num_experts=4, num_experts_per_tok=2, decoder_sparse_step=1,
        norm_topk_prob=True, mlp_only_layers=[], tie_word_embeddings=False,
    )
    model = Qwen3MoeForCausalLM(cfg_hf).eval()
    ckpt = str(tmp_path / "base")
    model.save_pretrained(ckpt, safe_serialization=True)
    return ckpt


def _convertible(name):
    return name.endswith(".weight") and (
        ".experts." in name or ".q_proj." in name or ".down_proj." in name
        or ".gate_proj." in name or ".up_proj." in name
    )


def _fp8_encode(w, block=128):
    out_d, in_d = w.shape
    nb0 = -(-out_d // block)
    nb1 = -(-in_d // block)
    scale_inv = np.zeros((nb0, nb1), np.float32)
    w8 = np.zeros_like(w, dtype=float8_e4m3fn)
    for i in range(nb0):
        for j in range(nb1):
            blk = w[i * block:(i + 1) * block, j * block:(j + 1) * block]
            s = float(np.abs(blk).max()) / 448.0 or 1.0
            scale_inv[i, j] = s
            w8[i * block:(i + 1) * block, j * block:(j + 1) * block] = (
                (blk / s).astype(float8_e4m3fn))
    return w8, scale_inv


def _ct_int4_encode(w, gs=32):
    out_d, in_d = w.shape
    g = w.reshape(out_d, in_d // gs, gs)
    scale = (np.abs(g).max(-1) / 7.0).astype(np.float32)
    scale = np.where(scale == 0, 1.0, scale)
    q = np.clip(np.rint(g / scale[..., None]), -8, 7).astype(np.int8)
    q = q.reshape(out_d, in_d)
    packed = np.zeros((out_d, in_d // 8), np.uint32)
    for i in range(8):
        packed |= (q[:, i::8].astype(np.uint32) & 0xF) << (4 * i)
    return packed.astype(np.int32), scale.astype(np.float16)


def _rebuild(src, dst, encode, extra_cfg=None):
    os.makedirs(dst, exist_ok=True)
    for f in os.listdir(src):
        if not f.endswith(".safetensors"):
            shutil.copy(os.path.join(src, f), os.path.join(dst, f))
    if extra_cfg:
        with open(os.path.join(dst, "config.json")) as f:
            c = json.load(f)
        c.update(extra_cfg)
        with open(os.path.join(dst, "config.json"), "w") as f:
            json.dump(c, f)
    st = ShardedSafetensors(src)
    quant_t, ref_t = {}, {}
    for name in st.weight_map:
        t = np.asarray(st.tensor(name))
        if _convertible(name) and t.ndim == 2:
            qts, ref = encode(name, t.astype(np.float32))
            quant_t.update(qts)
            ref_t[name] = ref
        else:
            quant_t[name] = t
            ref_t[name] = t
    write_safetensors(os.path.join(dst, "model.safetensors"), quant_t)
    refdir = dst + "_ref"
    os.makedirs(refdir, exist_ok=True)
    for f in os.listdir(src):
        if not f.endswith(".safetensors"):
            shutil.copy(os.path.join(src, f), os.path.join(refdir, f))
    write_safetensors(os.path.join(refdir, "model.safetensors"), ref_t)
    return dst, refdir


def _compare_loads(a_dir, b_dir, tmp_path, monkeypatch):
    monkeypatch.setenv("KRASIS_TPU_HOME", str(tmp_path / "home"))
    quant = QuantConfig(expert_bits=4, group_size=32)
    pa = load_params(ModelConfig.from_model_path(a_dir), quant, use_cache=False)
    pb = load_params(ModelConfig.from_model_path(b_dir), quant, use_cache=False)
    la = jax.tree_util.tree_leaves(pa)
    lb = jax.tree_util.tree_leaves(pb)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_fp8_block_checkpoint_loads(tmp_path, monkeypatch):
    base = _tiny_ckpt(tmp_path)

    def enc(name, w):
        w8, sinv = _fp8_encode(w)
        ref = dequant_fp8_block_np(w8, sinv)
        return {name: w8, f"{name}_scale_inv": sinv}, ref.astype(np.float32)

    qdir, refdir = _rebuild(base, str(tmp_path / "fp8"), enc)
    _compare_loads(qdir, refdir, tmp_path, monkeypatch)


def test_compressed_tensors_int4_checkpoint_loads(tmp_path, monkeypatch):
    base = _tiny_ckpt(tmp_path)

    def enc(name, w):
        packed, scale = _ct_int4_encode(w, gs=32)
        ref = dequant_compressed_int4_np(packed, scale, 32)
        base_name = name[: -len(".weight")]
        return {
            f"{base_name}.weight_packed": packed,
            f"{base_name}.weight_scale": scale,
        }, ref.astype(np.float32)

    qcfg = {"quantization_config": {
        "format": "pack-quantized",
        "config_groups": {"group_0": {"weights": {
            "num_bits": 4, "group_size": 32, "symmetric": True}}},
    }}
    qdir, refdir = _rebuild(base, str(tmp_path / "ct4"), enc, extra_cfg=qcfg)
    _compare_loads(qdir, refdir, tmp_path, monkeypatch)


def test_dequant_helpers_roundtrip():
    rng = np.random.default_rng(0)
    w = rng.normal(size=(8, 64)).astype(np.float32)
    w8, sinv = _fp8_encode(w, block=128)
    got = dequant_fp8_block_np(w8, sinv, block=128)
    # e4m3 has 3 mantissa bits: near the block max (scaled to 448) the
    # quantization step is 32, i.e. abs error up to max/28.
    np.testing.assert_allclose(got, w, atol=np.abs(w).max() / 24)

    packed, scale = _ct_int4_encode(w, gs=32)
    got = dequant_compressed_int4_np(packed, scale, 32)
    np.testing.assert_allclose(got, w, atol=np.abs(w).max() / 6)
