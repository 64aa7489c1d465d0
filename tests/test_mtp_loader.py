"""MTP checkpoint loading e2e: a tiny DeepSeek-V3-style safetensors dir
(MLA + MoE + the layer-N MTP module, tensor names per the official
DeepSeek V3 checkpoint layout) → models/loader (through the mmap weight
cache) → Engine → speculative greedy == vanilla greedy.
"""

import json
import os

import numpy as np
import pytest
import torch

torch.set_grad_enabled(False)

from krasis_tpu.config import ModelConfig, QuantConfig
from krasis_tpu.ops.sampling import SamplingParams

H, V = 64, 256
HQ, DN, DR, LR, DV = 4, 16, 8, 32, 16
E, TOPK, I_MOE, I_DENSE = 8, 2, 32, 128


def _mla_layer(g, pfx, tensors, moe: bool):
    def t(name, *shape):
        tensors[f"{pfx}.{name}"] = torch.tensor(
            g.normal(size=shape, scale=0.05).astype(np.float32))

    tensors[f"{pfx}.input_layernorm.weight"] = torch.ones(H)
    tensors[f"{pfx}.post_attention_layernorm.weight"] = torch.ones(H)
    t("self_attn.q_proj.weight", HQ * (DN + DR), H)
    t("self_attn.kv_a_proj_with_mqa.weight", LR + DR, H)
    tensors[f"{pfx}.self_attn.kv_a_layernorm.weight"] = torch.ones(LR)
    t("self_attn.kv_b_proj.weight", HQ * (DN + DV), LR)
    t("self_attn.o_proj.weight", H, HQ * DV)
    if moe:
        t("mlp.gate.weight", E, H)
        for e in range(E):
            t(f"mlp.experts.{e}.gate_proj.weight", I_MOE, H)
            t(f"mlp.experts.{e}.up_proj.weight", I_MOE, H)
            t(f"mlp.experts.{e}.down_proj.weight", H, I_MOE)
        t("mlp.shared_experts.gate_proj.weight", I_MOE, H)
        t("mlp.shared_experts.up_proj.weight", I_MOE, H)
        t("mlp.shared_experts.down_proj.weight", H, I_MOE)
    else:
        t("mlp.gate_proj.weight", I_DENSE, H)
        t("mlp.up_proj.weight", I_DENSE, H)
        t("mlp.down_proj.weight", H, I_DENSE)


@pytest.fixture(scope="module")
def v3_mtp_checkpoint(tmp_path_factory):
    from safetensors.torch import save_file

    tmp = str(tmp_path_factory.mktemp("v3mtp"))
    g = np.random.default_rng(21)
    tensors = {}

    def t(name, *shape):
        tensors[name] = torch.tensor(
            g.normal(size=shape, scale=0.05).astype(np.float32))

    t("model.embed_tokens.weight", V, H)
    tensors["model.norm.weight"] = torch.ones(H)
    t("lm_head.weight", V, H)
    _mla_layer(g, "model.layers.0", tensors, moe=False)
    _mla_layer(g, "model.layers.1", tensors, moe=True)
    # MTP module at index num_hidden_layers (DeepSeek V3 layer-61 layout)
    mtp = "model.layers.2"
    t(f"{mtp}.embed_tokens.weight", V, H)   # tied copy, loader skips it
    tensors[f"{mtp}.enorm.weight"] = torch.ones(H)
    tensors[f"{mtp}.hnorm.weight"] = torch.ones(H)
    t(f"{mtp}.eh_proj.weight", H, 2 * H)
    tensors[f"{mtp}.shared_head.norm.weight"] = torch.ones(H)
    t(f"{mtp}.shared_head.head.weight", V, H)
    _mla_layer(g, mtp, tensors, moe=True)

    save_file(tensors, os.path.join(tmp, "model.safetensors"))
    cfg = dict(
        model_type="deepseek_v2", hidden_size=H, intermediate_size=I_DENSE,
        moe_intermediate_size=I_MOE, num_hidden_layers=2,
        num_attention_heads=HQ, num_key_value_heads=HQ, vocab_size=V,
        kv_lora_rank=LR, qk_nope_head_dim=DN, qk_rope_head_dim=DR,
        v_head_dim=DV, n_routed_experts=E, num_experts_per_tok=TOPK,
        n_shared_experts=1, first_k_dense_replace=1,
        num_nextn_predict_layers=1, scoring_func="softmax",
        rms_norm_eps=1e-6, rope_theta=10000.0, tie_word_embeddings=False,
        eos_token_id=0,
    )
    with open(os.path.join(tmp, "config.json"), "w") as f:
        json.dump(cfg, f)
    return tmp


def test_mtp_loads_and_spec_matches_vanilla(v3_mtp_checkpoint, tmp_path,
                                            monkeypatch):
    from krasis_tpu.models.loader import load_params
    from krasis_tpu.runtime.engine import Engine

    monkeypatch.setenv("KRASIS_TPU_HOME", str(tmp_path))
    cfg = ModelConfig.from_model_path(v3_mtp_checkpoint)
    assert cfg.num_nextn_predict_layers == 1
    quant = QuantConfig(kv_cache_dtype="bf16")
    params = load_params(cfg, quant)          # builds + reads mmap cache
    assert "mtp" in params and "head" in params["mtp"]
    assert "w13" in params["mtp"]["layer"]     # MoE experts streamed in

    eng = Engine(cfg, quant, params, max_len=512)
    assert eng.spec_available
    prompt = [7, 3, 11, 5]
    eng.spec_available = False
    want = eng.generate(prompt, max_new_tokens=24,
                        sampling=SamplingParams(temperature=0.0),
                        stop_ids={-1})
    eng.spec_available = True
    got = eng.generate(prompt, max_new_tokens=24,
                       sampling=SamplingParams(temperature=0.0),
                       stop_ids={-1})
    assert got.tokens == want.tokens

    # cache reload path (second load_params hits the finalized cache)
    params2 = load_params(cfg, quant)
    assert "mtp" in params2
    eng2 = Engine(cfg, quant, params2, max_len=512)
    got2 = eng2.generate(prompt, max_new_tokens=24,
                         sampling=SamplingParams(temperature=0.0),
                         stop_ids={-1})
    assert got2.tokens == want.tokens
