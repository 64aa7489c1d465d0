"""Quality-certification machinery (krasis_tpu/quality.py).

The committed benchmarks/quality/QUALITY.md numbers come from the full
600-step trained checkpoint on the TPU; these tests pin the MACHINERY on
a fast 30-step build: the trained-checkpoint pipeline, the prefill-path
matrix + verdict logic, the teacher-forced decode-path evaluator (must
agree per-position with the prefill all-logits path), and spec-decode
exactness.
"""

import numpy as np
import pytest

from krasis_tpu.config import QuantConfig, preset_config


@pytest.fixture(scope="module")
def tiny_ckpt(tmp_path_factory):
    from krasis_tpu.quality import build_quality_checkpoint

    out = str(tmp_path_factory.mktemp("qck"))
    return build_quality_checkpoint(
        steps=30, hidden=128, layers=2, experts=4, top_k=2,
        moe_intermediate=64, batch=4, seq=128, out_dir=out, log_every=0)


def test_forced_decode_matches_prefill_logprobs():
    """Teacher-forced decode-path logprobs == prefill all-logits
    logprobs per position (synthetic model, bf16 tolerance). This is
    the correctness anchor for the decode-path PPL column."""
    import jax
    import jax.numpy as jnp

    from krasis_tpu.models.model import make_forced_decode_fn
    from krasis_tpu.models.synthetic import build_synthetic_engine, tiny_config
    from krasis_tpu.runtime.engine import pick_bucket

    cfg = tiny_config("qwen3-moe")
    quant = QuantConfig(expert_bits=4, group_size=32, kv_cache_dtype="bf16")
    eng = build_synthetic_engine(cfg, quant, max_len=256)

    rng = np.random.default_rng(0)
    ids = rng.integers(5, cfg.vocab_size - 5, size=192).tolist()

    logits = np.asarray(eng.forward_all_logits(ids), np.float32)
    lg = logits[:-1]
    m = lg.max(-1, keepdims=True)
    lsm = lg - m - np.log(np.exp(lg - m).sum(-1, keepdims=True))
    lp_pre = lsm[np.arange(len(ids) - 1), np.asarray(ids[1:])]

    steps = len(ids) - 2
    fn = jax.jit(make_forced_decode_fn(cfg, quant, steps))
    eng.reset(256)
    tokens = np.zeros((1, pick_bucket(1)), np.int32)
    tokens[0, 0] = ids[0]
    _, eng.cache = eng._prefill(
        eng.params, jnp.asarray(tokens), jnp.asarray([1], np.int32),
        eng.cache)
    toks = np.zeros((1, steps + 1), np.int32)
    toks[0] = ids[1:]
    lps, _ = fn(eng.params, jnp.asarray(toks), eng.cache)
    lp_dec = np.asarray(lps[0], np.float32)

    # same weights, same math modulo kernel split (flash prefill vs
    # step decode) and bf16 KV rounding
    np.testing.assert_allclose(lp_dec, lp_pre[1:], atol=0.15)
    assert np.abs(lp_dec - lp_pre[1:]).mean() < 0.01


def test_matrix_machinery_and_verdicts(tiny_ckpt):
    """bf16 baseline + q4 through the full matrix runner: structure,
    deltas, verdicts, decode-path column, spec exactness, markdown."""
    import os

    from krasis_tpu.quality import run_matrix, write_markdown

    res = run_matrix(tiny_ckpt, modes=("bf16", "q4"),
                     shapes=((128, 64),), max_tokens=3000,
                     group_size=32, spec_checks=True)
    b, q = res["modes"]["bf16"], res["modes"]["q4"]
    assert b["verdict"] == "baseline"
    assert q["verdict"] in ("accept", "REJECT")
    assert "delta_vs_bf16" in q["shapes"]["128/64"]
    # decode-path column present and carries its own delta
    assert "decode" in q and "delta_vs_bf16" in q["decode"]
    # a 30-step model still beats the random-guess ceiling (vocab 2048)
    assert b["shapes"]["128/64"]["ppl"] < 2048
    # q4 on a trained model is close to baseline, not garbage
    assert q["worst_delta"] < 0.30
    # CI machinery: paired bootstrap bounds present and ordered
    lo, hi = q["worst_ci95"]
    assert lo <= q["worst_delta"] <= hi
    assert "unpaired_noise_floor" in res
    assert res["spec"]["ngram"]["exact"] is True

    out = os.path.join(tiny_ckpt, "QUALITY.md")
    write_markdown([res], out)
    text = open(out).read()
    assert "decode-path" in text and "q4" in text and "CI" in text
