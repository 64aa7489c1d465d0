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


def test_cache_is_mmap_with_partial_expert_reads(tmp_path, monkeypatch):
    """v2 cache: leaves are memmap views; a single expert slice can be
    read without touching the rest (reference mod.rs:955-1135 partial
    layer reads)."""
    from transformers import Qwen3MoeConfig, Qwen3MoeForCausalLM
    from krasis_tpu.models.loader import _cache_dir, load_params
    from krasis_tpu.models.weight_cache import CacheReader

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
    params = load_params(cfg, quant, use_cache=True)   # builds v2 cache

    rd = CacheReader(_cache_dir(cfg, quant))
    w13 = rd.get_leaf("pattern/0/w13")
    assert isinstance(np.asarray(w13.q[0, 2]), np.ndarray)  # [rows, 2I] slice
    # memmap-backed, and equal to what was placed on device
    assert isinstance(w13.q, np.memmap)
    dev = params["pattern"][0]["w13"]
    np.testing.assert_array_equal(np.asarray(dev.q), np.asarray(w13.q))


def test_build_lock_stale_steal_and_wait(tmp_path):
    import os
    from krasis_tpu.models.weight_cache import BuildLock

    cache = str(tmp_path / "c")
    # stale lock (dead pid) is stolen
    with open(cache + ".lock", "w") as f:
        f.write("999999 0.0")
    lock = BuildLock(cache)
    assert lock.acquire() == "acquired"

    # second locker sees a live lock; once meta.json exists it returns built
    os.makedirs(cache, exist_ok=True)
    with open(os.path.join(cache, "meta.json"), "w") as f:
        f.write("{}")
    lock2 = BuildLock(cache)
    assert lock2.acquire(poll_s=0.05) == "built"
    lock.release()
    assert not os.path.exists(cache + ".lock")


def test_load_params_mesh_places_experts_sharded(tmp_path, monkeypatch):
    """load_params(mesh=...) device_puts expert stacks ep-sharded at load
    time — no full replica on one device."""
    from transformers import Qwen3MoeConfig, Qwen3MoeForCausalLM
    from krasis_tpu.models.loader import load_params
    from krasis_tpu.parallel.mesh import make_mesh

    monkeypatch.setenv("KRASIS_TPU_HOME", str(tmp_path / "home"))
    cfg_hf = Qwen3MoeConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        moe_intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        num_experts=8, num_experts_per_tok=2, decoder_sparse_step=1,
        norm_topk_prob=True, mlp_only_layers=[], tie_word_embeddings=False,
    )
    model = Qwen3MoeForCausalLM(cfg_hf).eval()
    ckpt = str(tmp_path / "ckpt")
    model.save_pretrained(ckpt, safe_serialization=True)

    cfg = ModelConfig.from_model_path(ckpt)
    quant = QuantConfig(expert_bits=4, group_size=32)
    mesh = make_mesh(8, dp=2)
    with mesh:
        params = load_params(cfg, quant, use_cache=True, mesh=mesh)
    w13 = params["pattern"][0]["w13"]
    # stacked [reps, E, rows, N] sharded over the expert dim
    shard_shape = w13.q.addressable_shards[0].data.shape
    assert shard_shape[1] == 8 // mesh.shape["ep"]
    # and equal to the unsharded load
    ref = load_params(cfg, quant, use_cache=True)
    np.testing.assert_array_equal(
        np.asarray(ref["pattern"][0]["w13"].q), np.asarray(w13.q))
