#!/usr/bin/env python
"""Decode roofline closure for V2-Lite Q4 on one chip (round-3 verdict
item 4): where do the milliseconds of a decode step go, what does the
relay dispatch cost, and what single-stream rate is achievable.

Three measurements:
  A. decode-block sweep — per-token wall time vs tokens-per-device-call
     (the ~28 ms relay dispatch amortizes as 1/block; the flat part of
     the curve is the on-chip step time);
  B. per-sublayer kernel table — KNOWN-BAD through the relay: queued
     dispatches drain at the tunnel's ~1-2 ms per-op floor, so these
     isolated numbers measure dispatch, not kernels (the 26-layer table
     summed to 121 ms against a 7.3 ms real step). Kept as the negative
     result; the usable attribution is probe_decode_ablate.py's engine
     ablation;
  C. attention-quant A/B — the same engine at attention=int8: the bf16
     attention projections are the single largest decode HBM term
     (~27 MB x 27 layers), so the delta bounds that term empirically.

Prints a bound table: measured step vs sum-of-parts vs HBM roofline.

Run: python benchmarks/probe_decode_profile.py [--out benchmarks/decode_profile.json]
"""
from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

BLOCKS = (8, 16, 32, 64, 128)
HBM_GBS = 700e9   # v5e effective HBM bandwidth (819 peak) for roofline rows


def timed(fn, *args, iters=16):
    import jax
    import jax.numpy as jnp

    out = fn(*args)
    jax.block_until_ready(out)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf.ravel()[:8]))   # force completion through relay
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def measure_decode(eng, block: int, runs: int, prompt, greedy):
    eng.decode_block = block
    n = 2 * block
    eng.generate(prompt, max_new_tokens=n, sampling=greedy, stop_ids={-1})
    xs = []
    for _ in range(runs):
        r = eng.generate(prompt, max_new_tokens=n, sampling=greedy,
                         stop_ids={-1})
        xs.append(r.decode_s / (len(r.tokens) - 1))
    return float(np.median(xs))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="benchmarks/decode_profile.json")
    ap.add_argument("--runs", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    assert jax.default_backend() == "tpu", jax.default_backend()

    from krasis_tpu.config import QuantConfig, preset_config
    from krasis_tpu.models.synthetic import build_synthetic_engine
    from krasis_tpu.ops.moe import moe_forward
    from krasis_tpu.ops.qmm import linear
    from krasis_tpu.ops.sampling import SamplingParams
    from krasis_tpu.quant import quantize

    cfg = preset_config("deepseek-v2-lite")
    H, I = cfg.hidden_size, cfg.moe_intermediate_size          # 2048, 1408
    V = cfg.vocab_size
    greedy = SamplingParams(temperature=0.0)
    rng = np.random.default_rng(0)
    prompt = rng.integers(100, V - 100, size=2048).tolist()

    report = {}

    # ---- B: kernel table (independent of the engine) -------------------
    key = jax.random.PRNGKey(0)
    w13 = quantize(jax.random.normal(key, (64, H, 2 * I), jnp.float32) * .05,
                   bits=4)
    w2 = quantize(jax.random.normal(key, (64, I, H), jnp.float32) * .05,
                  bits=4)
    x1 = jax.random.normal(key, (1, H), jnp.bfloat16)
    idx = jnp.asarray(rng.choice(64, size=(1, 6), replace=False).astype(np.int32))
    wts = jnp.full((1, 6), 1 / 6, jnp.float32)
    # weights as jit ARGUMENTS (closure constants ship with the remote
    # compile request → HTTP 413)
    t_moe = timed(jax.jit(moe_forward), x1, w13, w2, idx, wts)

    ish = cfg.n_shared_experts * I                             # 2816
    wsh13 = quantize(jax.random.normal(key, (H, 2 * ish), jnp.float32) * .05,
                     bits=8)
    wsh2 = quantize(jax.random.normal(key, (ish, H), jnp.float32) * .05,
                    bits=8)

    def shared(a, w13_, w2_):
        h = linear(a, w13_)
        g, u = h[:, :ish], h[:, ish:]
        return linear((g * jax.nn.sigmoid(g) * u).astype(a.dtype), w2_)

    t_shared = timed(jax.jit(shared), x1, wsh13, wsh2)

    whead = quantize(jax.random.normal(key, (H, V), jnp.float32) * .02,
                     bits=8)
    t_head = timed(jax.jit(linear), x1, whead)

    idense = cfg.intermediate_size                             # 10944
    wd13 = quantize(jax.random.normal(key, (H, 2 * idense), jnp.float32) * .05,
                    bits=8)
    wd2 = quantize(jax.random.normal(key, (idense, H), jnp.float32) * .05,
                   bits=8)

    def dense(a, w13_, w2_):
        h = linear(a, w13_)
        g, u = h[:, :idense], h[:, idense:]
        return linear((g * jax.nn.sigmoid(g) * u).astype(a.dtype), w2_)

    t_dense = timed(jax.jit(dense), x1, wd13, wd2)

    n_moe = cfg.num_hidden_layers - cfg.first_k_dense_replace  # 26
    kernel_ms = {
        "moe_routed_x26": round(t_moe * n_moe * 1e3, 3),
        "shared_expert_x26": round(t_shared * n_moe * 1e3, 3),
        "dense_mlp_x1": round(t_dense * 1e3, 3),
        "lm_head": round(t_head * 1e3, 3),
        "single_moe_layer_us": round(t_moe * 1e6, 1),
    }
    explained_ms = (t_moe * n_moe + t_shared * n_moe + t_dense + t_head) * 1e3
    report["kernels"] = kernel_ms
    print("[kernels]", json.dumps(kernel_ms), flush=True)

    # bytes model for the roofline row
    moe_bytes = 6 * ((H * I * 2 + I * H) // 2 + (H // 128) * 2 * I * 2
                     + (I // 128) * H * 2)
    attn_bytes = 2 * (H * (cfg.num_attention_heads
                           * (cfg.qk_nope_head_dim + cfg.qk_rope_head_dim))
                      + H * (cfg.kv_lora_rank + cfg.qk_rope_head_dim)
                      + 2 * cfg.num_attention_heads * cfg.qk_nope_head_dim
                      * cfg.kv_lora_rank
                      + cfg.num_attention_heads * cfg.v_head_dim * H)
    shared_bytes = H * 2 * ish + ish * H
    head_bytes = H * V
    total_bytes = (n_moe * (moe_bytes + shared_bytes)
                   + cfg.num_hidden_layers * attn_bytes
                   + head_bytes + H * idense * 3)
    report["hbm_model"] = {
        "per_step_bytes_mb": round(total_bytes / 1e6, 1),
        "attn_bf16_bytes_mb": round(
            cfg.num_hidden_layers * attn_bytes / 1e6, 1),
        "roofline_ms_at_700GBs": round(total_bytes / HBM_GBS * 1e3, 3),
    }

    # ---- A: engine + block sweep --------------------------------------
    for attn_mode in ("bf16", "int8"):
        quant = QuantConfig(expert_bits=4, group_size=128,
                            attention=attn_mode, kv_cache_dtype="bf16")
        t0 = time.time()
        eng = build_synthetic_engine(cfg, quant, max_len=4096)
        print(f"[engine attn={attn_mode}] built in {time.time() - t0:.0f}s",
              flush=True)
        sweep = {}
        for blk in BLOCKS:
            ms = measure_decode(eng, blk, args.runs, prompt, greedy) * 1e3
            sweep[str(blk)] = round(ms, 3)
            print(f"[sweep attn={attn_mode}] block={blk}: {ms:.2f} ms/tok "
                  f"({1e3 / ms:.1f} tok/s)", flush=True)
        report[f"block_sweep_ms_per_tok_attn_{attn_mode}"] = sweep
        del eng

    # ---- bound table ---------------------------------------------------
    best_bf16 = min(report["block_sweep_ms_per_tok_attn_bf16"].values())
    best_int8 = min(report["block_sweep_ms_per_tok_attn_int8"].values())
    # dispatch estimate: (ms at block 8) - (ms at block 128) ≈ 28/8 - 28/128
    s = report["block_sweep_ms_per_tok_attn_bf16"]
    dispatch_ms = (s["8"] - s["128"]) / (1 / 8 - 1 / 128)
    report["bounds"] = {
        "best_ms_per_tok_bf16_attn": round(best_bf16, 3),
        "best_ms_per_tok_int8_attn": round(best_int8, 3),
        "best_tok_s_bf16_attn": round(1e3 / best_bf16, 1),
        "best_tok_s_int8_attn": round(1e3 / best_int8, 1),
        "explained_by_kernels_ms": round(explained_ms, 3),
        "residual_attn_norms_scan_ms": round(best_bf16 - explained_ms
                                             - dispatch_ms / 128, 3),
        "per_call_dispatch_ms_est": round(dispatch_ms, 1),
        "attn_int8_saves_ms": round(best_bf16 - best_int8, 3),
    }
    print(json.dumps(report["bounds"], indent=2))
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print("wrote", args.out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
