"""Quantized-weight disk cache: cache == direct quantization
(reference tests/test_cache_vs_direct.py)."""

import os
import tempfile

import numpy as np
import torch

torch.set_grad_enabled(False)
torch.manual_seed(0)

import jax

from krasis_tpu.config import ModelConfig, QuantConfig
from krasis_tpu.models.loader import load_params


def test_cache_roundtrip_equals_direct(tmp_path, monkeypatch):
    from transformers import Qwen3MoeConfig, Qwen3MoeForCausalLM

    monkeypatch.setenv("KRASIS_TPU_HOME", str(tmp_path / "home"))
    cfg_hf = Qwen3MoeConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        moe_intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        num_experts=4, num_experts_per_tok=2, decoder_sparse_step=1,
        norm_topk_prob=True, mlp_only_layers=[], tie_word_embeddings=False,
    )
    model = Qwen3MoeForCausalLM(cfg_hf).eval()
    ckpt = str(tmp_path / "ckpt")
    model.save_pretrained(ckpt, safe_serialization=True)

    cfg = ModelConfig.from_model_path(ckpt)
    quant = QuantConfig(expert_bits=4, group_size=32)

    direct = load_params(cfg, quant, use_cache=False)
    cached_write = load_params(cfg, quant, use_cache=True)   # builds cache
    cached_read = load_params(cfg, quant, use_cache=True)    # reads cache

    home = tmp_path / "home" / "cache"
    assert home.exists() and any(home.iterdir())

    flat_a = jax.tree_util.tree_leaves(direct)
    flat_b = jax.tree_util.tree_leaves(cached_read)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
