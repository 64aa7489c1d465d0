"""Shared-expert folding (models/params.fold_shared_experts + the
gathered-decode fold branch in models/model._mlp).

The fold is an EXACT decomposition at full precision — swiglu factors
over I-sized column blocks — so the bf16/16-bit engine must produce
bit-equal greedy tokens folded vs unfolded. At q4 the shared expert is
re-quantized to expert bits; decode logprobs must stay close. Prefill
is unaffected by construction (dense shared path): all-logits must be
bit-equal in every mode.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from krasis_tpu.config import QuantConfig
from krasis_tpu.models.params import fold_shared_experts, init_synthetic_params
from krasis_tpu.models.synthetic import tiny_config
from krasis_tpu.ops.sampling import SamplingParams
from krasis_tpu.runtime.engine import Engine

GREEDY = SamplingParams(temperature=0.0)

MLA_KW = dict(kv_lora_rank=64, q_lora_rank=None, qk_nope_head_dim=32,
              qk_rope_head_dim=16, v_head_dim=32)


def _cfg(shared=2, gate=False, **kw):
    name = "qwen3-coder-next" if gate else "deepseek-v2-lite"
    extra = dict(MLA_KW) if not gate else {}
    return tiny_config(
        name, n_shared_experts=shared,
        shared_expert_intermediate_size=shared * 32,
        moe_intermediate_size=32, **extra, **kw)


def _pair(cfg, quant_kw, seed=0, dequant=False):
    params = init_synthetic_params(
        cfg, QuantConfig(group_size=32, kv_cache_dtype="bf16", **quant_kw),
        jax.random.PRNGKey(seed))
    if dequant:
        params = _dequant_stacks(params)
    q_off = QuantConfig(group_size=32, kv_cache_dtype="bf16",
                        fold_shared_decode=False, **quant_kw)
    q_on = QuantConfig(group_size=32, kv_cache_dtype="bf16",
                       fold_shared_decode=True, **quant_kw)
    return (Engine(cfg, q_off, params, max_len=128),
            Engine(cfg, q_on, params, max_len=128))


def test_fold_shapes_and_idempotency():
    cfg = _cfg()
    quant = QuantConfig(expert_bits=4, group_size=32)
    params = init_synthetic_params(cfg, quant, jax.random.PRNGKey(0))
    E = cfg.n_routed_experts
    folded = fold_shared_experts(params, cfg, quant)
    for lp in folded["pattern"] + folded["prefix_layers"]:
        if "w13" in lp:
            assert lp["w13"].q.shape[-3] == E + 2
            assert lp["w2"].q.shape[-3] == E + 2
            assert "shared_w13" in lp          # prefill path keeps dense
    again = fold_shared_experts(folded, cfg, quant)
    for lp in again["pattern"]:
        if "w13" in lp:
            assert lp["w13"].q.shape[-3] == E + 2   # idempotent


def test_fold_noop_when_indivisible():
    cfg = _cfg(shared=1)
    # Is = 48 not a multiple of I=32 → fold must decline
    cfg.shared_expert_intermediate_size = 48
    quant = QuantConfig(expert_bits=4, group_size=16)
    params = init_synthetic_params(cfg, quant, jax.random.PRNGKey(0))
    folded = fold_shared_experts(params, cfg, quant)
    for lp in folded["pattern"]:
        if "w13" in lp:
            assert lp["w13"].q.shape[-3] == cfg.n_routed_experts


def _dequant_stacks(params):
    """QTensor expert stacks → bf16 arrays (the loader's full-precision
    form; synthetic init emits a bits-16 QTensor layout instead)."""
    from krasis_tpu.quant import QTensor, dequantize

    def conv(lp):
        lp = dict(lp)
        for k in ("w13", "w2"):
            if k in lp and isinstance(lp[k], QTensor):
                lp[k] = dequantize(lp[k], jnp.bfloat16)
        return lp

    out = dict(params)
    out["prefix_layers"] = [conv(lp) for lp in params["prefix_layers"]]
    out["pattern"] = [conv(lp) for lp in params["pattern"]]
    return out


@pytest.mark.parametrize("gate", [False, True])
def test_fold_exact_at_full_precision(gate):
    """bf16 array experts + bf16 shared: the fold is mathematically
    exact — greedy tokens and decode logprobs match the unfolded
    engine."""
    cfg = _cfg(gate=gate)
    off, on = _pair(cfg, dict(expert_bits=16, shared_expert="bf16"),
                    dequant=True)
    prompt = [3, 9, 27, 4, 11]
    a = off.generate(prompt, max_new_tokens=8, sampling=GREEDY,
                     stop_ids={-1})
    b = on.generate(prompt, max_new_tokens=8, sampling=GREEDY,
                    stop_ids={-1})
    assert a.tokens == b.tokens
    np.testing.assert_allclose(a.logprobs, b.logprobs, atol=2e-2)


def test_fold_close_at_q4_and_internally_consistent():
    """Folded q4: both decode (virtual experts) and prefill (dense
    int4 shared) compute from the SAME quantized values — slices are
    bit-exact relayouts — so the folded engine is internally consistent
    (spec-exactness depends on this); vs the unfolded engine the only
    difference is shared int8→int4."""
    from krasis_tpu.quant import dequantize

    cfg = _cfg()
    off, on = _pair(cfg, dict(expert_bits=4))
    # the virtual experts ARE the dense shared leaves, bit for bit
    for lp in on.params["pattern"]:
        if "w13" not in lp:
            continue
        E = cfg.n_routed_experts
        sh = np.asarray(dequantize(lp["shared_w13"], jnp.float32))
        Is = sh.shape[-1] // 2
        v13 = lp["w13"]
        v = np.asarray(dequantize(
            type(v13)(v13.q[..., E:, :, :], v13.scales[..., E:, :, :],
                      v13.bits, v13.group_size), jnp.float32))
        I = cfg.moe_intermediate_size
        for j in range(Is // I):
            np.testing.assert_array_equal(
                v[..., j, :, :I], sh[..., :, j * I:(j + 1) * I])
            np.testing.assert_array_equal(
                v[..., j, :, I:], sh[..., :, Is + j * I: Is + (j + 1) * I])
    ids = list(range(3, 60))
    # vs unfolded: close (shared int8 → int4)
    la = np.asarray(off.forward_all_logits(ids), np.float32)
    lb = np.asarray(on.forward_all_logits(ids), np.float32)
    assert np.abs(la - lb).max() < 1.5
    a = off.generate(ids[:8], max_new_tokens=12, sampling=GREEDY,
                     stop_ids={-1})
    b = on.generate(ids[:8], max_new_tokens=12, sampling=GREEDY,
                    stop_ids={-1})
    np.testing.assert_allclose(a.logprobs[:4], b.logprobs[:4], atol=0.4)


def test_fold_array_stack_with_quantized_shared():
    """Full-precision array expert stacks + quantized (default int8)
    shared leaves: the loader's expert_bits=16 form. Regression: the
    array branch used to jnp.asarray a QTensor and crash at Engine
    construction. The fold must apply (shared dequantized exactly into
    the stack) and match the unfolded engine closely."""
    cfg = _cfg()
    # shared_expert left at its 'int8' default — the crashing combo
    off, on = _pair(cfg, dict(expert_bits=16), dequant=True)
    E = cfg.n_routed_experts
    for lp in on.params["pattern"]:
        if "w13" in lp:
            assert lp["w13"].shape[-3] == E + 2   # fold applied
    prompt = [3, 9, 27, 4, 11]
    a = off.generate(prompt, max_new_tokens=8, sampling=GREEDY,
                     stop_ids={-1})
    b = on.generate(prompt, max_new_tokens=8, sampling=GREEDY,
                    stop_ids={-1})
    assert a.tokens == b.tokens
    np.testing.assert_allclose(a.logprobs, b.logprobs, atol=5e-2)


def test_loader_folds_host_side(tmp_path, monkeypatch):
    """load_params applies the shared-expert fold HOST-side before
    placement (the OOM-safe path): returned stacks already have E+n_virt
    experts, and Engine's post-hoc fold no-ops on them."""
    from transformers import DeepseekV2Config, DeepseekV2ForCausalLM

    from krasis_tpu.config import ModelConfig
    from krasis_tpu.models import loader as L

    hf = DeepseekV2Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        moe_intermediate_size=32, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=4,
        kv_lora_rank=32, q_lora_rank=None, qk_nope_head_dim=16,
        qk_rope_head_dim=8, v_head_dim=16,
        n_routed_experts=8, num_experts_per_tok=2, n_shared_experts=2,
        first_k_dense_replace=1, moe_layer_freq=1,
        topk_method="greedy", scoring_func="softmax",
        routed_scaling_factor=1.0, norm_topk_prob=False,
        aux_loss_alpha=0.0, seq_aux=False,
        tie_word_embeddings=False, rope_theta=10000.0,
        max_position_embeddings=512, attention_bias=False,
    )
    model = DeepseekV2ForCausalLM(hf).eval()
    ckpt = str(tmp_path / "ckpt")
    model.save_pretrained(ckpt, safe_serialization=True)

    mcfg = ModelConfig.from_model_path(ckpt)
    monkeypatch.setenv("KRASIS_TPU_HOME", str(tmp_path / "home"))
    quant = QuantConfig(expert_bits=4, group_size=32,
                        fold_shared_decode=True)
    params = L.load_params(mcfg, quant, use_cache=False)
    E = mcfg.n_routed_experts
    saw_moe = False
    for lp in params["pattern"] + params["prefix_layers"]:
        if "w13" in lp:
            saw_moe = True
            assert lp["w13"].q.shape[-3] == E + 2
    assert saw_moe


def test_scheduler_folds_consistently_with_engine():
    """Engine and BatchScheduler fold independently from the same raw
    params; their greedy streams must agree."""
    from krasis_tpu.runtime.scheduler import BatchScheduler

    cfg = _cfg()
    quant = QuantConfig(expert_bits=4, group_size=32, kv_cache_dtype="bf16")
    params = init_synthetic_params(cfg, quant, jax.random.PRNGKey(1))
    eng = Engine(cfg, quant, params, max_len=128)
    want = eng.generate([5, 6, 7], max_new_tokens=6, sampling=GREEDY,
                        stop_ids={-1}).tokens
    sched = BatchScheduler(cfg, quant, params, max_len=128, num_slots=2)
    try:
        req = sched.submit([5, 6, 7], max_new_tokens=6, sampling=GREEDY,
                           stop_ids={-1})
        toks = []
        while True:
            t = req.out_queue.get(timeout=600)
            if t is None:
                break
            toks.append(t)
    finally:
        sched.shutdown()
    assert toks == want
