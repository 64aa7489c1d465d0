#!/usr/bin/env python
"""On-chip jax.profiler trace of the production decode block.

Round-4's engine ablation hit its noise floor (the inferred attention
term came out negative); this probe gets the decode attribution from
the DEVICE timeline instead: capture a profiler trace around a few
multi-token decode blocks, then bucket every XLA-op event on the TPU
lane by name into architectural categories (MoE kernel, attention,
matmuls, norms/elementwise, KV-cache updates, sampling, copies). The
gap between the module span and the op sum is the per-op dispatch /
scheduling overhead the relay hides from wall-clock methods.

Mirrors the reference's per-component decode accumulators
(reference src/decode.rs:1923-1946) at trace level.

Usage: python benchmarks/probe_decode_trace.py [--preset deepseek-v2-lite]
"""
from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
import tempfile

sys.path.insert(0, "/root/repo")

import jax
import numpy as np

assert jax.default_backend() == "tpu", jax.default_backend()

from krasis_tpu.config import QuantConfig, preset_config
from krasis_tpu.models.params import init_synthetic_params
from krasis_tpu.ops.sampling import SamplingParams
from krasis_tpu.runtime.engine import Engine

# name-substring → category, first match wins (order matters)
BUCKETS = [
    ("moe_kernel", ("gathered_qmm", "moe_", "gmm", "qmm")),
    ("attention", ("flash", "attention", "mla", "softmax")),
    ("matmul", ("dot", "convolution", "gemm", "matmul")),
    ("kv_cache", ("dynamic-update-slice", "dynamic_update_slice",
                  "scatter")),
    ("sampling", ("sort", "top-k", "topk", "argmax", "iota")),
    ("copy", ("copy", "bitcast", "transpose", "reshape")),
    ("elementwise", ("fusion", "fused", "add", "multiply", "rsqrt",
                     "tanh", "exp", "convert", "select", "compare",
                     "broadcast", "reduce", "slice", "concatenate",
                     "pad", "gather")),
]


def bucket_of(name: str) -> str:
    low = name.lower()
    for cat, pats in BUCKETS:
        if any(p in low for p in pats):
            return cat
    return "other"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="deepseek-v2-lite")
    ap.add_argument("--blocks", type=int, default=3)
    ap.add_argument("--ctx", type=int, default=1024)
    ap.add_argument("--out", default="/root/repo/benchmarks/decode_trace.json")
    args = ap.parse_args()

    cfg = preset_config(args.preset)
    quant = QuantConfig()
    params = init_synthetic_params(cfg, quant, jax.random.PRNGKey(0))
    eng = Engine(cfg, quant, params, max_len=4096)
    eng.decode_block = 128
    greedy = SamplingParams(temperature=0.0)
    rng = np.random.default_rng(0)
    prompt = rng.integers(100, cfg.vocab_size - 100, args.ctx).tolist()

    n_tok = args.blocks * eng.decode_block
    # warm the EXACT timed config
    r = eng.generate(prompt, max_new_tokens=n_tok, sampling=greedy,
                     stop_ids={-1})
    print(f"warm decode: {r.decode_tok_s:.1f} tok/s", flush=True)

    d = tempfile.mkdtemp(prefix="decode_trace_")
    with jax.profiler.trace(d):
        r = eng.generate(prompt, max_new_tokens=n_tok, sampling=greedy,
                         stop_ids={-1})
    decode_ms = r.decode_s * 1e3
    print(f"traced decode: {r.decode_tok_s:.1f} tok/s "
          f"({decode_ms:.1f} ms for {n_tok} tok)", flush=True)

    p = glob.glob(d + "/**/*.trace.json.gz", recursive=True)[0]
    tr = json.load(gzip.open(p))
    pids = {}
    tids = {}
    for ev in tr.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pids[ev["pid"]] = ev["args"]["name"]
        if ev.get("ph") == "M" and ev.get("name") == "thread_name":
            tids[(ev["pid"], ev["tid"])] = ev["args"]["name"]
    tpu_pid = [q for q, n in pids.items() if "TPU" in n][0]
    ops_tids = [t for (q, t), n in tids.items()
                if q == tpu_pid and n in ("XLA Ops", "Async XLA Ops")]
    mod_tid = [t for (q, t), n in tids.items()
               if q == tpu_pid and n == "XLA Modules"]

    # decode-block modules: the repeated largest module (multi-decode).
    mods = [e for e in tr["traceEvents"]
            if e.get("pid") == tpu_pid and e.get("tid") in mod_tid
            and e.get("ph") == "X"]
    by_name = {}
    for e in mods:
        by_name.setdefault(e["name"], []).append(e)
    # pick the module with the largest total duration (the decode block)
    blk_name, blk_evs = max(
        by_name.items(), key=lambda kv: sum(e["dur"] for e in kv[1]))
    spans = [(e["ts"], e["ts"] + e["dur"]) for e in blk_evs]
    total_mod_us = sum(e["dur"] for e in blk_evs)
    print(f"decode module: {blk_name} ×{len(blk_evs)} "
          f"({total_mod_us/1e3:.2f} ms total)", flush=True)

    cats = {}
    names = {}
    op_total = 0
    for e in tr["traceEvents"]:
        if (e.get("pid") != tpu_pid or e.get("tid") not in ops_tids
                or e.get("ph") != "X"):
            continue
        ts = e["ts"]
        if not any(s <= ts < t for s, t in spans):
            continue
        cat = bucket_of(e["name"])
        cats[cat] = cats.get(cat, 0) + e["dur"]
        names[e["name"]] = names.get(e["name"], 0) + e["dur"]
        op_total += e["dur"]

    n_blocks = len(blk_evs)
    per_tok = {k: round(v / 1e3 / n_blocks / eng.decode_block * 1e3, 2)
               for k, v in sorted(cats.items(), key=lambda kv: -kv[1])}
    print("\nper-token device time (µs):")
    for k, v in per_tok.items():
        print(f"  {k:12s} {v:8.1f}")
    gap = total_mod_us - op_total
    print(f"  {'module-gap':12s} {gap/n_blocks/eng.decode_block:8.1f}"
          "   (scheduling/dispatch inside module)")
    wall_gap_ms = decode_ms - total_mod_us / 1e3
    print(f"module total {total_mod_us/1e3:.1f} ms vs decode wall "
          f"{decode_ms:.1f} ms → outside-module {wall_gap_ms:.1f} ms "
          "(host, transfers, other modules)")

    print("\ntop ops:")
    top = sorted(names.items(), key=lambda kv: -kv[1])[:20]
    for n, v in top:
        print(f"  {v/1e3:8.2f} ms  {n}")

    # fusion provenance: dump whatever metadata the trace carries for
    # the top fusion events (args often hold the HLO long name / source)
    want = {n for n, _ in top if "fusion" in n or "broadcast" in n}
    seen_meta = set()
    print("\nfusion metadata:")
    for e in tr["traceEvents"]:
        if (e.get("pid") == tpu_pid and e.get("ph") == "X"
                and e.get("name") in want and e.get("name") not in seen_meta
                and e.get("args")):
            seen_meta.add(e["name"])
            a = e["args"]
            print(f"  {e['name']}: src={a.get('source', '?')}\n"
                  f"    {a.get('long_name', '')[:300]}")

    out = {
        "preset": args.preset, "ctx": args.ctx,
        "decode_block": eng.decode_block, "blocks": n_blocks,
        "decode_tok_s": round(r.decode_tok_s, 1),
        "decode_wall_ms": round(decode_ms, 1),
        "module_name": blk_name,
        "module_total_ms": round(total_mod_us / 1e3, 2),
        "per_token_us": per_tok,
        "module_gap_us_per_tok": round(
            gap / n_blocks / eng.decode_block, 1),
        "outside_module_ms": round(wall_gap_ms, 1),
        "top_ops_ms": {n: round(v / 1e3, 2) for n, v in top},
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"\nwrote {args.out}")


if __name__ == "__main__":
    main()
