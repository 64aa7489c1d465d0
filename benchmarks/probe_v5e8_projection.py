#!/usr/bin/env python
"""v5e-8 north-star projection for QCN-80B Q4 from ONE chip.

BASELINE.md:39 target: QCN-80B Q4 on v5e-8 — >3,324 tok/s prefill,
>15 tok/s/stream decode. No 8-chip hardware exists in this environment,
so this probe builds the projection the way a reader with 8 chips could
falsify in one run:

  measured on the real chip (this box):
    M1. full qcn-1chip engine prefill(2048) + single-stream decode
        (64 experts = exactly one v5e-8 shard of the 512, per-layer
        shapes identical to QCN-80B);
    M2. per-layer MoE kernel time at FULL load (top-10-of-64: every
        pick local — what the 1-chip engine pays) vs SHARD load
        (top-10-of-512 routing from the reference's shipped expert
        heatmap [/root/reference/tests/coder_next_heatmap.json, DATA
        not code], keeping only the hottest shard's picks via
        pick_valid — what one of 8 chips pays);

  modeled with stated assumptions (the falsifiable part):
    A1. prefill tokens are sequence-sharded 8-ways for the non-MoE
        sublayers (parallel/sp.py composition), so non-MoE time /= 8;
    A2. all_to_all dispatch+combine per MoE layer rides ICI at
        W_ICI effective per-chip bandwidth (table over 45/90/180 GB/s;
        v5e 2D-torus neighbors — pick the column that matches your
        fleet) and overlaps with expert compute (reported both
        overlapped and fully-serial);
    A3. decode is latency-bound on a2a: L_A2A per hop (table over
        2/5/10 us), 2 hops per MoE layer, non-MoE compute replicated.

The reference's own 2-GPU regression (BENCHMARKS.md:45-78, prefill
SLOWER on 2 GPUs) is the cautionary tale: the a2a term is printed
explicitly so a real 8-chip run can immediately see whether transport
or compute binds.

Run: python benchmarks/probe_v5e8_projection.py [--out benchmarks/v5e8_projection.json]
"""
from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

EP = 8
E_FULL, K_TOP = 512, 10
H, I_EXP = 2048, 512
N_LAYERS = 48
CHUNK = 2048
HEATMAP = "/root/reference/tests/coder_next_heatmap.json"


def load_heatmap() -> np.ndarray:
    """[48, 512] pick counts from the reference's shipped QCN heatmap."""
    with open(HEATMAP) as f:
        raw = json.load(f)
    hm = np.zeros((N_LAYERS, E_FULL), np.float64)
    for key, count in raw.items():
        layer, expert = map(int, key.split(","))
        if layer < N_LAYERS and expert < E_FULL:
            hm[layer, expert] = count
    return hm


def shard_stats(hm: np.ndarray) -> dict:
    """Per-shard pick shares under contiguous 64-expert slicing
    (parallel/ep.py layout)."""
    p = hm / np.maximum(hm.sum(axis=1, keepdims=True), 1)
    shares = p.reshape(N_LAYERS, EP, E_FULL // EP).sum(axis=2)  # [48, 8]
    return {
        "mean_share": float(shares.mean()),
        "hottest_share_mean": float(shares.max(axis=1).mean()),
        "hottest_share_p95": float(np.percentile(shares.max(axis=1), 95)),
        "imbalance_factor": float(shares.max(axis=1).mean() * EP),
        "per_layer_hottest": [round(float(s), 4) for s in shares.max(axis=1)],
    }


def sample_shard_picks(hm: np.ndarray, layer: int, shard: int, T: int,
                       rng) -> tuple:
    """[T, K] local ids + pick_valid for `shard` under full-shape
    top-10-of-512 routing with the heatmap's skew."""
    p = hm[layer] / hm[layer].sum()
    lo, hi = shard * (E_FULL // EP), (shard + 1) * (E_FULL // EP)
    idx = np.zeros((T, K_TOP), np.int32)
    valid = np.zeros((T, K_TOP), bool)
    for t in range(T):
        picks = rng.choice(E_FULL, size=K_TOP, replace=False, p=p)
        local = (picks >= lo) & (picks < hi)
        idx[t] = np.where(local, picks - lo, 0)
        valid[t] = local
    return idx, valid


def timed(fn, *args, iters=16) -> float:
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    # force real completion through the relay (allocation is lazy)
    import jax.numpy as jnp

    float(jnp.sum(out.ravel()[:8]))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="benchmarks/v5e8_projection.json")
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    assert jax.default_backend() == "tpu", jax.default_backend()

    from krasis_tpu.config import QuantConfig, preset_config
    from krasis_tpu.models.synthetic import build_synthetic_engine
    from krasis_tpu.ops.moe import moe_forward
    from krasis_tpu.ops.sampling import SamplingParams
    from krasis_tpu.quant import quantize

    hm = load_heatmap()
    stats = shard_stats(hm)
    print("[heatmap] hottest-shard mean share "
          f"{stats['hottest_share_mean']:.4f} (uniform = 0.125), "
          f"imbalance x{stats['imbalance_factor']:.2f}", flush=True)

    # ---- M1: full 1-chip engine (the per-shard expert count) ----------
    cfg = preset_config("qcn-1chip")
    quant = QuantConfig(expert_bits=4, group_size=128)
    t0 = time.time()
    eng = build_synthetic_engine(cfg, quant, max_len=4096)
    eng.decode_block = 32
    print(f"[engine] built in {time.time() - t0:.0f}s", flush=True)

    rng = np.random.default_rng(0)
    prompt = rng.integers(100, cfg.vocab_size - 100, size=CHUNK).tolist()
    greedy = SamplingParams(temperature=0.0)
    eng.generate(prompt, max_new_tokens=64, sampling=greedy, stop_ids={-1})
    pre, dec = [], []
    for _ in range(args.runs):
        r = eng.generate(prompt, max_new_tokens=64, sampling=greedy,
                         stop_ids={-1})
        pre.append(r.prefill_s)
        dec.append(64 / r.decode_tok_s)
    t_prefill_full = float(np.median(pre))          # s per 2048-chunk
    t_step_full = float(np.median(dec)) / 64        # s per decode token
    print(f"[engine] prefill {CHUNK / t_prefill_full:.0f} tok/s, "
          f"decode {1 / t_step_full:.1f} tok/s", flush=True)

    # ---- M2: per-layer MoE kernel, full vs shard load -----------------
    key = jax.random.PRNGKey(0)
    w13 = quantize(jax.random.normal(key, (E_FULL // EP, H, 2 * I_EXP),
                                     jnp.float32) * 0.05, bits=4)
    w2 = quantize(jax.random.normal(key, (E_FULL // EP, I_EXP, H),
                                    jnp.float32) * 0.05, bits=4)

    # weights as jit ARGUMENTS (closure constants ship with the remote
    # compile request → HTTP 413)
    def run_moe(x, w13_, w2_, idx, wts, pv=None):
        return moe_forward(x, w13_, w2_, idx, wts, pick_valid=pv)

    jrun = jax.jit(run_moe)
    jrun_pv = jax.jit(run_moe)

    results_kernel = {}
    # the hottest shard on an average layer binds the step time
    hot_layer = int(np.argmax(hm.max(axis=1) / hm.sum(axis=1)))
    shard_of = int(np.argmax(
        hm[hot_layer].reshape(EP, -1).sum(axis=1)))
    for name, T in (("prefill", CHUNK), ("decode", 1)):
        x = jax.random.normal(key, (T, H), jnp.bfloat16)
        # full local load: top-10-of-64 (what the 1-chip engine pays)
        idx_full = np.stack([rng.choice(E_FULL // EP, K_TOP, replace=False)
                             for _ in range(T)]).astype(np.int32)
        wts = jnp.full((T, K_TOP), 1.0 / K_TOP, jnp.float32)
        t_full = timed(jrun, x, w13, w2, jnp.asarray(idx_full), wts)
        # shard load: hottest shard's slice of top-10-of-512
        idx_s, valid = sample_shard_picks(hm, hot_layer, shard_of, T, rng)
        wts_s = jnp.where(jnp.asarray(valid), 1.0 / K_TOP, 0.0)
        t_shard = timed(jrun_pv, x, w13, w2, jnp.asarray(idx_s), wts_s,
                        jnp.asarray(valid))
        results_kernel[name] = {
            "layer_ms_full": round(t_full * 1e3, 3),
            "layer_ms_shard": round(t_shard * 1e3, 3),
            "local_picks_per_token": round(float(valid.sum() / max(T, 1)), 3),
        }
        print(f"[moe {name}] full {t_full * 1e3:.3f} ms/layer, "
              f"hot-shard {t_shard * 1e3:.3f} ms/layer "
              f"({valid.sum() / max(T, 1):.2f} local picks/tok)", flush=True)

    # ---- compose the projection ---------------------------------------
    t_moe_full_p = results_kernel["prefill"]["layer_ms_full"] / 1e3
    t_moe_shard_p = results_kernel["prefill"]["layer_ms_shard"] / 1e3
    t_moe_full_d = results_kernel["decode"]["layer_ms_full"] / 1e3
    t_moe_shard_d = results_kernel["decode"]["layer_ms_shard"] / 1e3

    t_nonmoe_prefill = max(t_prefill_full - N_LAYERS * t_moe_full_p, 0.0)
    t_nonmoe_step = max(t_step_full - N_LAYERS * t_moe_full_d, 0.0)

    # a2a bytes per chip per 2048-token chunk: each token's hidden goes
    # to its picked shards and back; expected distinct remote shards per
    # token with k=10 over 8 shards:
    distinct = EP * (1 - (1 - 1 / EP) ** K_TOP) * (EP - 1) / EP
    a2a_bytes_chunk = 2 * CHUNK * H * 2 * distinct * N_LAYERS  # send+recv
    projection = {}
    for w_ici in (45e9, 90e9, 180e9):
        t_a2a_prefill = a2a_bytes_chunk / w_ici
        t_moe_total = N_LAYERS * t_moe_shard_p
        t_chunk_overlap = (t_nonmoe_prefill / EP
                           + max(t_moe_total, t_a2a_prefill))
        t_chunk_serial = (t_nonmoe_prefill / EP + t_moe_total
                          + t_a2a_prefill)
        projection[f"prefill_W{int(w_ici / 1e9)}GBs"] = {
            "tok_s_overlapped": round(CHUNK / t_chunk_overlap, 0),
            "tok_s_serial": round(CHUNK / t_chunk_serial, 0),
            "a2a_ms_per_chunk": round(t_a2a_prefill * 1e3, 1),
        }
    for lat in (2e-6, 5e-6, 10e-6):
        t_step = (t_nonmoe_step + N_LAYERS * t_moe_shard_d
                  + 2 * N_LAYERS * lat)
        projection[f"decode_lat{int(lat * 1e6)}us"] = {
            "tok_s_per_stream": round(1 / t_step, 1),
            "a2a_ms_per_step": round(2 * N_LAYERS * lat * 1e3, 2),
        }

    out = {
        "target": {"prefill_tok_s": 3324, "decode_tok_s_stream": 14.93,
                   "source": "BASELINE.md:39 (reference 5900X+RTX5080)"},
        "measured_1chip": {
            "prefill_tok_s": round(CHUNK / t_prefill_full, 1),
            "decode_tok_s": round(1 / t_step_full, 2),
            "nonmoe_prefill_s_chunk": round(t_nonmoe_prefill, 4),
            "nonmoe_decode_ms_step": round(t_nonmoe_step * 1e3, 3),
        },
        "kernel": results_kernel,
        "heatmap": stats,
        "assumptions": {
            "sequence_shard_nonmoe_prefill": "sp=8 (parallel/sp.py)",
            "decode_nonmoe": "replicated (no TP term counted)",
            "a2a_distinct_remote_shards_per_token": round(distinct, 2),
            "heatmap_source": HEATMAP,
        },
        "projection_v5e8": projection,
    }
    print(json.dumps(out, indent=2))
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", args.out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
