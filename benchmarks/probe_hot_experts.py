#!/usr/bin/env python
"""On-chip probe: hot-expert HBM cache (HCS analog) measured benchmark.

Round-4 verdict item 5: `--hot-experts` ships with correctness tests
(tests/test_offload.py) and heatmap plumbing but no measured numbers —
the reference's HCS publishes benchmarks (reference
python/krasis/gpu_prefill.py:2742 _init_hot_cached_static,
tests/bench_hot_cached_static.py + result JSONs). This probe measures,
on the real chip, at hot budgets 0 / 25 / 50 / 75 % of the expert count:

  * hot-pick HIT RATE, two ways:
      - empirical: cold picks reaching the host during the measured
        decode (the store's heatmap only sees picks the device did NOT
        serve) vs total picks issued;
      - reference-routing: expected hit rate of the same budget under
        the reference's shipped QCN expert heatmap
        (/root/reference/tests/coder_next_heatmap.json — DATA, not code),
        i.e. what the budget buys on real-world routing skew.
  * host compute per token (store.host_time_s / tokens) — through the
    axon relay the end-to-end tok/s is RTT-bound (~28 ms per
    device->host fetch, every layer pays it regardless of budget), so
    the host seconds and cold bytes SAVED per token are the numbers
    that transfer to a local-PCIe deployment;
  * cold bytes read per token (picks x per-expert bytes);
  * end-to-end decode tok/s (relay-bound, reported for honesty).

V2-Lite Q4 synthetic store, segmented decode, greedy. Calibration:
64 decode tokens at budget 0 populate the store heatmap; every budget
pins its hot set from that SAME calibration (the production flow —
OffloadEngine.update_hot_cache re-pins without recompiling).

Usage: python benchmarks/probe_hot_experts.py [--out benchmarks/hot_experts.json]
"""
from __future__ import annotations

import argparse
import copy
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

REF_HEATMAP = "/root/reference/tests/coder_next_heatmap.json"


def ref_hit_rate(frac: float) -> float:
    """Expected hit rate of a top-`frac` hot budget under the reference's
    shipped QCN heatmap (per-layer hot sets, pick-weighted)."""
    try:
        with open(REF_HEATMAP) as f:
            raw = json.load(f)
    except OSError:
        return float("nan")
    layers: dict = {}
    for key, count in raw.items():
        layer, expert = map(int, key.split(","))
        layers.setdefault(layer, {})[expert] = count
    E = 512
    n_hot = int(round(frac * E))
    if n_hot == 0:
        return 0.0
    tot = hit = 0.0
    for hm in layers.values():
        counts = np.zeros(E)
        for e, c in hm.items():
            if e < E:
                counts[e] = c
        if counts.sum() == 0:
            continue
        hot = np.argsort(-counts)[:n_hot]
        tot += counts.sum()
        hit += counts[hot].sum()
    return float(hit / tot) if tot else float("nan")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="benchmarks/hot_experts.json")
    ap.add_argument("--decode", type=int, default=32)
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    import jax

    assert jax.default_backend() == "tpu", jax.default_backend()

    from krasis_tpu.config import QuantConfig, preset_config
    from krasis_tpu.models.params import init_synthetic_params
    from krasis_tpu.offload import build_synthetic_store
    from krasis_tpu.ops.sampling import SamplingParams
    from krasis_tpu.runtime.offload_engine import OffloadEngine

    cfg = preset_config("deepseek-v2-lite")
    quant = QuantConfig(expert_bits=4, group_size=128)
    E, k = cfg.n_routed_experts, cfg.num_experts_per_tok

    t0 = time.time()
    store = build_synthetic_store(cfg, quant, seed=1, fill="fast")
    base_params = init_synthetic_params(cfg, quant, jax.random.PRNGKey(0),
                                        skip_experts=True)
    print(f"[hot] store {store.nbytes()/2**30:.2f} GiB + device params in "
          f"{time.time()-t0:.0f}s (tier={store.native_tier()})", flush=True)

    rng = np.random.default_rng(0)
    prompt = rng.integers(100, cfg.vocab_size - 100, size=128).tolist()
    greedy = SamplingParams(temperature=0.0)

    # per-pick bytes (q4 packed + scales), w13 + w2 for ONE expert
    bytes_per_pick = sum(
        a.nbytes // store.E
        for a in store._layers[store.layers[0]][:4])

    def cold_picks(fn):
        """Run fn with cleared heatmap/counters; return (cold picks,
        host compute seconds) for the whole run."""
        store.heatmap.clear()
        store.host_calls = 0
        store.host_time_s = 0.0
        store.host_picks = 0
        fn()
        return (sum(int(h.sum()) for h in store.heatmap.values()),
                store.host_time_s)

    # ---- calibration at budget 0 (also the budget-0 measurement engine)
    results = {}
    calib_heatmap = None
    n_moe_layers = len(store.layers)
    for frac in (0.0, 0.25, 0.50, 0.75):
        n_hot = int(round(frac * E))
        # pin the hot set from the SAME calibration for every budget
        if calib_heatmap is not None:
            store.heatmap = {l: h.copy() for l, h in calib_heatmap.items()}
        t0 = time.time()
        eng = OffloadEngine(cfg, quant, copy.copy(base_params), store,
                            streaming=False, hot_experts=n_hot,
                            max_len=512)
        eng.generate(prompt, max_new_tokens=8, sampling=greedy,
                     stop_ids={-1})   # compile + warm
        print(f"[hot {n_hot}] engine up {time.time()-t0:.0f}s", flush=True)

        if frac == 0.0:
            # calibrate: 64 greedy tokens populate the heatmap
            store.heatmap.clear()
            eng.generate(prompt, max_new_tokens=64, sampling=greedy,
                         stop_ids={-1})
            calib_heatmap = {l: h.copy() for l, h in store.heatmap.items()}

        # Decode-only cold picks via a 1-token/N-token difference: the
        # segmented prefill also routes through the host, and greedy
        # decoding is deterministic, so the prefill term cancels exactly.
        c1, h1 = cold_picks(lambda: eng.generate(
            prompt, max_new_tokens=1, sampling=greedy, stop_ids={-1}))
        tok_s, host_ms, cold_picks_tok = [], [], []
        for _ in range(args.runs):
            def run():
                r = eng.generate(prompt, max_new_tokens=args.decode,
                                 sampling=greedy, stop_ids={-1})
                tok_s.append(r.decode_tok_s)
            cN, hN = cold_picks(run)
            host_ms.append((hN - h1) * 1e3 / (args.decode - 1))
            cold_picks_tok.append((cN - c1) / (args.decode - 1))
        hit = 1.0 - np.median(cold_picks_tok) / (k * n_moe_layers)
        results[f"hot_{int(frac*100)}pct"] = {
            "n_hot": n_hot,
            "hit_rate_empirical": round(float(hit), 4),
            "hit_rate_reference_heatmap": round(ref_hit_rate(frac), 4),
            "decode_tok_s_relay_bound": round(float(np.median(tok_s)), 3),
            "host_ms_per_token": round(float(np.median(host_ms)), 2),
            "cold_picks_per_token": round(float(np.median(cold_picks_tok)), 2),
            "cold_bytes_per_token_mb": round(
                float(np.median(cold_picks_tok)) * bytes_per_pick / 2**20, 2),
        }
        print(f"[hot {n_hot}] {results[f'hot_{int(frac*100)}pct']}",
              flush=True)
        del eng

    out = {
        "model": "deepseek-v2-lite q4 synthetic store",
        "protocol": {
            "decode_tokens": args.decode, "runs": args.runs,
            "prompt": 128, "segmented": True,
            "calibration": "64 greedy tokens at budget 0",
            "relay_note": "end-to-end tok/s is axon-relay RTT-bound "
                          "(~28 ms/fetch x n_moe_layers, budget-"
                          "independent); host_ms/cold_bytes per token "
                          "are the local-PCIe-transferable results",
        },
        "per_pick_bytes": int(bytes_per_pick),
        "results": results,
    }
    print(json.dumps(out, indent=2))
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", args.out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
