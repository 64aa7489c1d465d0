"""Real-checkpoint end-to-end: tokenizer + safetensors + loader + engine + PPL.

VERDICT item 2 asks for a real model run; this machine has no checkpoint
on disk and no egress, so the closest honest equivalent is a REAL-FORMAT
pipeline built locally: a BPE tokenizer actually *trained* (tokenizers
lib) on the bundled benchmark corpus, saved with a chat template into a
tiny random Qwen3-MoE HF checkpoint (save_pretrained → config.json +
safetensors), then driven through the SAME code paths a user of a real
checkpoint hits: ModelConfig.from_model_path → models/loader.load_params
→ Engine.generate via runtime.Tokenizer.apply_chat_template → perplexity
on natural text, with the final PPL checked against the HF torch oracle
running the identical windowing (reference perplexity/measure_ppl.py) on
the same tokens. A loader/tokenizer/forward bug anywhere in the chain
moves the PPL.
"""

import json
import os

import numpy as np
import pytest
import torch

torch.set_grad_enabled(False)

import jax.numpy as jnp

from krasis_tpu.config import ModelConfig, QuantConfig

VOCAB = 2048

CHAT_TEMPLATE = (
    "{% for message in messages %}"
    "{{ '<|' + message['role'] + '|>' + message['content'] }}"
    "{% endfor %}"
    "{% if add_generation_prompt %}{{ '<|assistant|>' }}{% endif %}"
)


@pytest.fixture(scope="module")
def checkpoint(tmp_path_factory):
    """Train a real BPE tokenizer on the bundled corpus; save a tiny
    random Qwen3-MoE model + tokenizer as a real HF checkpoint dir."""
    from tokenizers import Tokenizer as RawTok
    from tokenizers.models import BPE
    from tokenizers.trainers import BpeTrainer
    from tokenizers.pre_tokenizers import ByteLevel
    from tokenizers.decoders import ByteLevel as ByteLevelDecoder
    from transformers import (PreTrainedTokenizerFast, Qwen3MoeConfig,
                              Qwen3MoeForCausalLM)

    from krasis_tpu.prompts import load_domain

    tmp = str(tmp_path_factory.mktemp("ckpt"))

    raw = RawTok(BPE(unk_token=None))
    raw.pre_tokenizer = ByteLevel(add_prefix_space=False)
    raw.decoder = ByteLevelDecoder()
    trainer = BpeTrainer(
        vocab_size=VOCAB - 4, show_progress=False,
        special_tokens=["<|endoftext|>", "<|user|>", "<|assistant|>",
                        "<|system|>"],
        initial_alphabet=ByteLevel.alphabet(),
    )
    text = load_domain("docs")[:300_000]
    raw.train_from_iterator(
        [text[i:i + 4096] for i in range(0, len(text), 4096)], trainer)

    tok = PreTrainedTokenizerFast(
        tokenizer_object=raw,
        eos_token="<|endoftext|>", pad_token="<|endoftext|>",
        chat_template=CHAT_TEMPLATE,
    )
    tok.save_pretrained(tmp)

    torch.manual_seed(0)
    hf_cfg = Qwen3MoeConfig(
        vocab_size=VOCAB, hidden_size=64, intermediate_size=128,
        moe_intermediate_size=32, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        num_experts=8, num_experts_per_tok=2, decoder_sparse_step=1,
        max_position_embeddings=4096,
        eos_token_id=tok.eos_token_id,
    )
    model = Qwen3MoeForCausalLM(hf_cfg).eval()
    model.save_pretrained(tmp, safe_serialization=True)
    return tmp, model


FP32_QUANT = QuantConfig(
    expert_bits=16, lm_head="bf16", attention="bf16",
    shared_expert="bf16", dense_mlp="bf16", kv_cache_dtype="bf16",
)


@pytest.fixture(scope="module")
def engine(checkpoint):
    from krasis_tpu.models.loader import load_params
    from krasis_tpu.runtime.engine import Engine

    path, _ = checkpoint
    cfg = ModelConfig.from_model_path(path)
    params = load_params(cfg, FP32_QUANT, dtype=jnp.float32)
    return Engine(cfg, FP32_QUANT, params, max_len=512)


def test_chat_generate_through_real_tokenizer(checkpoint, engine):
    """Chat-template prompt → engine.generate → decode round-trips."""
    from krasis_tpu.ops.sampling import SamplingParams
    from krasis_tpu.runtime.tokenizer import Tokenizer

    path, model = checkpoint
    tok = Tokenizer(path)
    ids = tok.apply_chat_template(
        [{"role": "user", "content": "Explain the os module."}])
    assert 0 < len(ids) < 64
    res = engine.generate(ids, max_new_tokens=8,
                          sampling=SamplingParams(temperature=0.0),
                          stop_ids={-1})
    assert len(res.tokens) == 8
    # greedy tokens must match the HF oracle's greedy continuation
    t = torch.tensor([ids])
    for want in res.tokens:
        nxt = model(input_ids=t).logits[0, -1].argmax().item()
        assert nxt == want
        t = torch.cat([t, torch.tensor([[nxt]])], dim=1)
    assert isinstance(tok.decode(res.tokens), str)


def test_perplexity_on_natural_text_matches_hf_oracle(checkpoint, engine):
    """PPL through our loader/forward/windowing == HF torch oracle PPL on
    the same real-tokenizer token stream (rel 1e-3)."""
    from krasis_tpu.perplexity import evaluate_perplexity
    from krasis_tpu.prompts import load_domain
    from krasis_tpu.runtime.tokenizer import Tokenizer

    path, model = checkpoint
    tok = Tokenizer(path)
    ids = tok.encode(load_domain("legal")[:4000])
    assert len(ids) > 300
    ids = ids[:512]

    got = evaluate_perplexity(engine, ids, window=128, stride=64,
                              log_every=0)

    total_nll, scored = 0.0, 0
    for begin in range(0, len(ids) - 1, 64):
        end = min(begin + 128, len(ids))
        if end - begin < 2:
            break
        t = torch.tensor(ids[begin:end])
        logits = model(input_ids=t[None]).logits[0].float()
        loss = torch.nn.functional.cross_entropy(
            logits[:-1], t[1:], reduction="none")
        sl = loss[0 if begin == 0 else 63:]
        total_nll += float(sl.sum())
        scored += int(sl.numel())
    want_ppl = float(np.exp(total_nll / scored))

    assert got["tokens_scored"] == scored
    assert got["ppl"] == pytest.approx(want_ppl, rel=1e-3)


def test_quantized_gguf_generation_matches_safetensors(tmp_path):
    """QUANTIZED GGUF serving e2e (reference runs GGUF-native serving:
    tests/test_gguf_native.py, src/gguf_kernels.rs:690): a Q4_K/Q8_0
    mixed checkpoint — experts Q4_K (K-quant superblocks), attention +
    embedding + lm_head Q8_0, norms/router F32 — loaded through
    gguf_source → loader → engine must greedy-generate exactly what a
    safetensors checkpoint holding the dequantized weights generates
    (both sides requantize identically, so post-requant the formats are
    bit-equal; any dequant/layout/requant bug diverges the tokens)."""
    import jax.numpy as jnp
    import torch
    from transformers import Qwen3MoeConfig, Qwen3MoeForCausalLM

    from test_gguf import (GGML_F32, GGML_Q4_K, GGML_Q8_0, encode_q4_k,
                           encode_q8_0, write_gguf)
    from krasis_tpu.ops.sampling import SamplingParams
    from krasis_tpu.utils.gguf import dequant_q4_k, dequant_q8_0

    torch.manual_seed(3)
    # dims chosen so every Q4_K tensor's innermost dim is a multiple of
    # the 256-element superblock
    hf_cfg = Qwen3MoeConfig(
        vocab_size=512, hidden_size=256, intermediate_size=512,
        moe_intermediate_size=256, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=64,
        num_experts=4, num_experts_per_tok=2, decoder_sparse_step=1,
        max_position_embeddings=4096,
    )
    model = Qwen3MoeForCausalLM(hf_cfg).eval()
    sd = {k: v.detach().numpy().astype(np.float32)
          for k, v in model.state_dict().items()}

    def enc(a, ttype):
        codec = {GGML_Q4_K: (encode_q4_k, dequant_q4_k),
                 GGML_Q8_0: (encode_q8_0, dequant_q8_0)}[ttype]
        raw = codec[0](a)
        deq = codec[1](np.frombuffer(raw, np.uint8)).reshape(a.shape)
        return raw, deq.astype(np.float32)

    tensors, deq_sd = [], dict(sd)
    def add(gname, hname, a, ttype):
        if ttype == GGML_F32:
            tensors.append((gname, a, GGML_F32, None))
        else:
            raw, deq = enc(a, ttype)
            tensors.append((gname, a, ttype, raw))
            if hname:
                deq_sd[hname] = deq

    add("token_embd.weight", "model.embed_tokens.weight",
        sd["model.embed_tokens.weight"], GGML_Q8_0)
    add("output.weight", "lm_head.weight", sd["lm_head.weight"], GGML_Q8_0)
    add("output_norm.weight", None, sd["model.norm.weight"], GGML_F32)
    for i in range(hf_cfg.num_hidden_layers):
        L = f"model.layers.{i}"
        for gsuf, hsuf, t in [
            ("attn_norm.weight", "input_layernorm.weight", GGML_F32),
            ("ffn_norm.weight", "post_attention_layernorm.weight", GGML_F32),
            ("attn_q.weight", "self_attn.q_proj.weight", GGML_Q8_0),
            ("attn_k.weight", "self_attn.k_proj.weight", GGML_Q8_0),
            ("attn_v.weight", "self_attn.v_proj.weight", GGML_Q8_0),
            ("attn_output.weight", "self_attn.o_proj.weight", GGML_Q8_0),
            ("attn_q_norm.weight", "self_attn.q_norm.weight", GGML_F32),
            ("attn_k_norm.weight", "self_attn.k_norm.weight", GGML_F32),
            ("ffn_gate_inp.weight", "mlp.gate.weight", GGML_F32),
        ]:
            add(f"blk.{i}.{gsuf}", f"{L}.{hsuf}", sd[f"{L}.{hsuf}"], t)
        for gsuf, proj in [("ffn_gate_exps.weight", "gate_proj"),
                           ("ffn_up_exps.weight", "up_proj"),
                           ("ffn_down_exps.weight", "down_proj")]:
            fused = np.stack([sd[f"{L}.mlp.experts.{e}.{proj}.weight"]
                              for e in range(hf_cfg.num_experts)])
            raw, deq = enc(fused, GGML_Q4_K)
            tensors.append((f"blk.{i}.{gsuf}", fused, GGML_Q4_K, raw))
            for e in range(hf_cfg.num_experts):
                deq_sd[f"{L}.mlp.experts.{e}.{proj}.weight"] = deq[e]

    gpath = tmp_path / "tiny-q4k.gguf"
    write_gguf(str(gpath), tensors, {
        "general.architecture": "qwen3moe",
        "qwen3moe.block_count": hf_cfg.num_hidden_layers,
        "qwen3moe.embedding_length": hf_cfg.hidden_size,
        "qwen3moe.attention.head_count": hf_cfg.num_attention_heads,
        "qwen3moe.attention.head_count_kv": hf_cfg.num_key_value_heads,
        "qwen3moe.attention.key_length": hf_cfg.head_dim,
        "qwen3moe.attention.layer_norm_rms_epsilon": hf_cfg.rms_norm_eps,
        "qwen3moe.feed_forward_length": hf_cfg.intermediate_size,
        "qwen3moe.expert_count": hf_cfg.num_experts,
        "qwen3moe.expert_used_count": hf_cfg.num_experts_per_tok,
        "qwen3moe.expert_feed_forward_length": hf_cfg.moe_intermediate_size,
        "qwen3moe.expert_weights_norm": bool(hf_cfg.norm_topk_prob),
        "qwen3moe.vocab_size": hf_cfg.vocab_size,
        "qwen3moe.rope.freq_base": float(hf_cfg.rope_theta),
        "qwen3moe.context_length": hf_cfg.max_position_embeddings,
    })

    # safetensors twin holding the DEQUANTIZED weights
    with torch.no_grad():
        model.load_state_dict({k: torch.from_numpy(v.copy())
                               for k, v in deq_sd.items()})
    stdir = tmp_path / "tiny-q4k-st"
    model.save_pretrained(str(stdir), safe_serialization=True)

    from krasis_tpu.models.loader import load_params
    from krasis_tpu.runtime.engine import Engine

    quant = QuantConfig(expert_bits=4, group_size=128,
                        kv_cache_dtype="bf16")
    engines = []
    for path in (str(gpath), str(stdir)):
        cfg = ModelConfig.from_model_path(path)
        assert cfg.n_routed_experts == hf_cfg.num_experts
        params = load_params(cfg, quant)
        engines.append(Engine(cfg, quant, params, max_len=256))

    greedy = SamplingParams(temperature=0.0)
    prompt = [5, 17, 101, 42, 300, 33, 7, 250]
    r_gguf = engines[0].generate(prompt, max_new_tokens=12,
                                 sampling=greedy, stop_ids={-1})
    r_st = engines[1].generate(prompt, max_new_tokens=12,
                               sampling=greedy, stop_ids={-1})
    assert r_gguf.tokens == r_st.tokens
    np.testing.assert_allclose(r_gguf.logprobs, r_st.logprobs, atol=1e-3)


def test_gguf_checkpoint_matches_safetensors(checkpoint, engine, tmp_path):
    from krasis_tpu.ops.sampling import SamplingParams
    """The SAME model served from a GGUF file must generate exactly what
    the safetensors checkpoint does (loader + config-synthesis e2e: the
    reference's load_from_gguf path, mod.rs:3251). Weights are written
    as F32 GGUF tensors under llama.cpp names, config comes only from
    GGUF metadata — no config.json."""
    from test_gguf import write_gguf, GGML_F32

    path, model = checkpoint
    sd = {k: v.detach().numpy().astype(np.float32)
          for k, v in model.state_dict().items()}
    hf_cfg = model.config

    tensors = [
        ("token_embd.weight", sd["model.embed_tokens.weight"], GGML_F32, None),
        ("output.weight", sd["lm_head.weight"], GGML_F32, None),
        ("output_norm.weight", sd["model.norm.weight"], GGML_F32, None),
    ]
    for i in range(hf_cfg.num_hidden_layers):
        L = f"model.layers.{i}"
        for gsuf, hsuf in [
            ("attn_norm.weight", "input_layernorm.weight"),
            ("ffn_norm.weight", "post_attention_layernorm.weight"),
            ("attn_q.weight", "self_attn.q_proj.weight"),
            ("attn_k.weight", "self_attn.k_proj.weight"),
            ("attn_v.weight", "self_attn.v_proj.weight"),
            ("attn_output.weight", "self_attn.o_proj.weight"),
            ("attn_q_norm.weight", "self_attn.q_norm.weight"),
            ("attn_k_norm.weight", "self_attn.k_norm.weight"),
            ("ffn_gate_inp.weight", "mlp.gate.weight"),
        ]:
            tensors.append((f"blk.{i}.{gsuf}", sd[f"{L}.{hsuf}"],
                            GGML_F32, None))
        for gsuf, proj in [("ffn_gate_exps.weight", "gate_proj"),
                           ("ffn_up_exps.weight", "up_proj"),
                           ("ffn_down_exps.weight", "down_proj")]:
            fused = np.stack([
                sd[f"{L}.mlp.experts.{e}.{proj}.weight"]
                for e in range(hf_cfg.num_experts)
            ])
            tensors.append((f"blk.{i}.{gsuf}", fused, GGML_F32, None))

    gpath = tmp_path / "tiny-e2e.gguf"
    write_gguf(str(gpath), tensors, {
        "general.architecture": "qwen3moe",
        "qwen3moe.block_count": hf_cfg.num_hidden_layers,
        "qwen3moe.embedding_length": hf_cfg.hidden_size,
        "qwen3moe.attention.head_count": hf_cfg.num_attention_heads,
        "qwen3moe.attention.head_count_kv": hf_cfg.num_key_value_heads,
        "qwen3moe.attention.key_length": hf_cfg.head_dim,
        "qwen3moe.attention.layer_norm_rms_epsilon": hf_cfg.rms_norm_eps,
        "qwen3moe.feed_forward_length": hf_cfg.intermediate_size,
        "qwen3moe.expert_count": hf_cfg.num_experts,
        "qwen3moe.expert_used_count": hf_cfg.num_experts_per_tok,
        "qwen3moe.expert_feed_forward_length": hf_cfg.moe_intermediate_size,
        "qwen3moe.expert_weights_norm": bool(hf_cfg.norm_topk_prob),
        "qwen3moe.vocab_size": hf_cfg.vocab_size,
        "qwen3moe.rope.freq_base": float(hf_cfg.rope_theta),
        "qwen3moe.context_length": hf_cfg.max_position_embeddings,
    })

    from krasis_tpu.models.loader import load_params
    from krasis_tpu.runtime.engine import Engine

    cfg2 = ModelConfig.from_model_path(str(gpath))
    assert cfg2.n_routed_experts == hf_cfg.num_experts
    assert cfg2.head_dim == hf_cfg.head_dim
    params2 = load_params(cfg2, FP32_QUANT, dtype=jnp.float32)
    eng2 = Engine(cfg2, FP32_QUANT, params2, max_len=512)

    greedy = SamplingParams(temperature=0.0)
    prompt = [5, 17, 101, 42, 900, 33, 7, 250]
    r1 = engine.generate(prompt, max_new_tokens=10, sampling=greedy,
                         stop_ids={-1})
    r2 = eng2.generate(prompt, max_new_tokens=10, sampling=greedy,
                       stop_ids={-1})
    assert r1.tokens == r2.tokens
    np.testing.assert_allclose(r1.logprobs, r2.logprobs, atol=1e-3)
