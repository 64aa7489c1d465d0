#!/usr/bin/env python
"""v5e-8 north-star projection for QCN-80B Q4 from ONE chip.

BASELINE.md:39 target: QCN-80B Q4 on v5e-8 — >3,324 tok/s prefill,
>15 tok/s/stream decode. No 8-chip hardware exists in this environment,
so this probe builds the projection the way a reader with 8 chips could
falsify in one run:

  measured on the real chip (this box):
    M1. qcn-1chip engine (64 experts = exactly one v5e-8 shard of the
        512, per-layer shapes identical to QCN-80B) at k=10 — the full
        1-chip load — and at k=2 ≈ the hottest shard's expected local
        picks under full-shape top-10-of-512 routing (k_top × hottest
        shard share from the reference's shipped expert heatmap,
        /root/reference/tests/coder_next_heatmap.json — DATA, not
        code). Both END-TO-END engine timings; the per-pick MoE cost
        is their difference (t(k) = nonmoe + k·c). Isolated kernel
        timings through the relay measure its 1-2 ms dispatch floor,
        not kernel time, and are NOT used;

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
    (parallel/ep.py layout). Layers without recorded picks are dropped
    (the shipped heatmap only covers layers the capture run exercised)."""
    hm = hm[hm.sum(axis=1) > 0]
    p = hm / hm.sum(axis=1, keepdims=True)
    shares = p.reshape(len(hm), EP, E_FULL // EP).sum(axis=2)
    return {
        "mean_share": float(shares.mean()),
        "hottest_share_mean": float(shares.max(axis=1).mean()),
        "hottest_share_p95": float(np.percentile(shares.max(axis=1), 95)),
        "imbalance_factor": float(shares.max(axis=1).mean() * EP),
        "layers_with_data": int(len(shares)),
        "per_layer_hottest": [round(float(s), 4) for s in shares.max(axis=1)],
    }


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

    hm = load_heatmap()
    stats = shard_stats(hm)
    print("[heatmap] hottest-shard mean share "
          f"{stats['hottest_share_mean']:.4f} (uniform = 0.125), "
          f"imbalance x{stats['imbalance_factor']:.2f}", flush=True)

    # ---- measured: two engines, k=10 (the 1-chip full load) and k=2
    # (≈ the hottest shard's expected local picks/token under full-shape
    # top-10-of-512 routing: 10 × hottest-share ≈ 1.8 → 2, conservative).
    # Per-pick cost comes from the k-difference — END-TO-END engine
    # timings only: isolated kernel timings through the relay measure
    # the ~1-2 ms dispatch floor, not kernel time (probe_decode_profile
    # learned this the hard way).
    import gc

    from krasis_tpu.ops.sampling import SamplingParams

    greedy = SamplingParams(temperature=0.0)
    rng = np.random.default_rng(0)

    def measure_engine(k_top):
        cfg = preset_config("qcn-1chip", num_experts_per_tok=k_top)
        quant = QuantConfig(expert_bits=4, group_size=128)
        t0 = time.time()
        eng = build_synthetic_engine(cfg, quant, max_len=4096)
        eng.decode_block = 128
        prompt = rng.integers(100, cfg.vocab_size - 100, size=CHUNK).tolist()
        eng.generate(prompt, max_new_tokens=256, sampling=greedy,
                     stop_ids={-1})
        pre, dec = [], []
        for _ in range(args.runs):
            r = eng.generate(prompt, max_new_tokens=256, sampling=greedy,
                             stop_ids={-1})
            pre.append(r.prefill_s)
            dec.append(256 / r.decode_tok_s / 256)
        del eng
        gc.collect()
        t_p, t_d = float(np.median(pre)), float(np.median(dec))
        print(f"[engine k={k_top}] prefill {CHUNK / t_p:.0f} tok/s, "
              f"decode {1 / t_d:.1f} tok/s ({time.time() - t0:.0f}s)",
              flush=True)
        return t_p, t_d

    # 5-point fit (round-4 verdict item 9: the 2-point {2,10} fit assumed
    # linearity in between — measure it). Least squares t(k) = nonmoe + k·c
    # with per-point residuals reported so a reader can see the model error.
    K_GRID = [2, 4, 6, 8, 10]
    meas = {k: measure_engine(k) for k in K_GRID}
    ks = np.array(K_GRID, np.float64)
    tp = np.array([meas[k][0] for k in K_GRID])
    td = np.array([meas[k][1] for k in K_GRID])
    (c_p, nonmoe_p) = np.polyfit(ks, tp, 1)
    (c_d, nonmoe_d) = np.polyfit(ks, td, 1)
    c_p, c_d = max(c_p, 0.0), max(c_d, 0.0)
    nonmoe_p, nonmoe_d = max(nonmoe_p, 0.0), max(nonmoe_d, 0.0)
    res_p = tp - (nonmoe_p + c_p * ks)
    res_d = td - (nonmoe_d + c_d * ks)
    fit = {
        "k_grid": K_GRID,
        "prefill_s_chunk": [round(float(v), 4) for v in tp],
        "decode_s_step": [round(float(v), 5) for v in td],
        "residual_prefill_ms": [round(float(v) * 1e3, 2) for v in res_p],
        "residual_decode_ms": [round(float(v) * 1e3, 3) for v in res_d],
        "max_abs_residual_pct_prefill": round(
            float(np.abs(res_p / tp).max()) * 100, 2),
        "max_abs_residual_pct_decode": round(
            float(np.abs(res_d / td).max()) * 100, 2),
    }
    print(f"[fit] prefill residuals {fit['residual_prefill_ms']} ms, "
          f"decode residuals {fit['residual_decode_ms']} ms", flush=True)
    t10_p, t10_d = meas[10]
    t2_p, t2_d = meas[2]
    # PRIMARY decode projection uses the p95 hottest-shard share (the
    # straggler shard gates the step under synchronous EP): round-4 kept
    # p95 as a caveat column; it is the headline now, mean as secondary.
    k_hot = K_TOP * stats["hottest_share_p95"]
    k_hot_mean = K_TOP * stats["hottest_share_mean"]

    # a2a bytes per chip per 2048-token chunk (dispatch+combine)
    distinct = EP * (1 - (1 - 1 / EP) ** K_TOP) * (EP - 1) / EP
    a2a_bytes_chunk = 2 * CHUNK * H * 2 * distinct * N_LAYERS
    projection = {}
    for w_ici in (45e9, 90e9, 180e9):
        t_a2a = a2a_bytes_chunk / w_ici
        t_moe = nonmoe_p * 0 + k_hot * c_p  # shard MoE term per chunk
        t_chunk_overlap = nonmoe_p / EP + max(t_moe, t_a2a)
        t_chunk_serial = nonmoe_p / EP + t_moe + t_a2a
        projection[f"prefill_W{int(w_ici / 1e9)}GBs"] = {
            "tok_s_overlapped": round(CHUNK / t_chunk_overlap, 0),
            "tok_s_serial": round(CHUNK / t_chunk_serial, 0),
            "a2a_ms_per_chunk": round(t_a2a * 1e3, 1),
        }
    for lat in (2e-6, 5e-6, 10e-6):
        t_step = nonmoe_d + k_hot * c_d + 2 * N_LAYERS * lat
        t_step_mean = nonmoe_d + k_hot_mean * c_d + 2 * N_LAYERS * lat
        projection[f"decode_lat{int(lat * 1e6)}us"] = {
            "tok_s_per_stream": round(1 / t_step, 1),
            "tok_s_per_stream_meanload": round(1 / t_step_mean, 1),
            "a2a_ms_per_step": round(2 * N_LAYERS * lat * 1e3, 2),
        }

    out = {
        "target": {"prefill_tok_s": 3324, "decode_tok_s_stream": 14.93,
                   "source": "BASELINE.md:39 (reference 5900X+RTX5080)"},
        "measured_1chip": {
            "prefill_tok_s_k10": round(CHUNK / t10_p, 1),
            "decode_tok_s_k10": round(1 / t10_d, 2),
            "prefill_tok_s_k2": round(CHUNK / t2_p, 1),
            "decode_tok_s_k2": round(1 / t2_d, 2),
        },
        "pick_model": {
            "prefill_ms_per_pickcol_chunk": round(c_p * 1e3, 2),
            "decode_ms_per_pick": round(c_d * 1e3, 4),
            "nonmoe_prefill_s_chunk": round(nonmoe_p, 4),
            "nonmoe_decode_ms_step": round(nonmoe_d * 1e3, 3),
            "hot_shard_picks_per_token_p95": round(k_hot, 2),
            "hot_shard_picks_per_token_mean": round(k_hot_mean, 2),
        },
        "fit": fit,
        "heatmap": stats,
        "assumptions": {
            "shard_load_model": "t(k) linear in picks; hot shard sees "
                                "k_top x hottest-share local picks",
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
