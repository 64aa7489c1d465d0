#!/usr/bin/env python
"""On-chip probe: batched-decode saturation + per-stream latency SLOs.

Round-4 stopped the slots sweep at 48 (1,516 tok/s, +14% over 32) with
no saturation point and no latency distribution. This probe extends the
curve until aggregate flattens and reports per-stream service quality:
per-stream decode rate p50/p95 and inter-arrival gap p95 (tokens arrive
in decode_block bursts — the gap p95 IS the block latency a streaming
client sees).

V2-Lite Q4 synthetic, 512-token prompts, 128 decode tokens per stream,
scheduler decode_block 32.

Usage: python benchmarks/probe_slots_saturation.py [slots...]
"""
from __future__ import annotations

import json
import os
import sys
import threading
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax

assert jax.default_backend() == "tpu", jax.default_backend()

from krasis_tpu.config import QuantConfig, preset_config
from krasis_tpu.models.params import init_synthetic_params
from krasis_tpu.ops.sampling import SamplingParams
from krasis_tpu.runtime.scheduler import BatchScheduler

PROMPT_LEN = 512
DECODE = 128
# Some (slots, max_len) pairs reproducibly die with a TPU-backend
# INTERNAL error in the measured phase on the axon relay (warmup fine;
# grouped vs gathered MoE path makes no difference; churn innocent —
# each bisected 2026-08-21). Observed failures: 32@1024, 64@2048 — both
# max_len == 32*slots; 32@2048, 48@2048 pass. Relay error carries no HLO
# context. Filed in ROUND5_RESULTS; per-config override below works
# around it for the sweep.
MAX_LEN = int(os.environ.get("KRASIS_PROBE_MAXLEN", "2048"))
BLOCK = 32

cfg = preset_config("deepseek-v2-lite")
quant = QuantConfig(expert_bits=4, group_size=128)
t0 = time.time()
params = init_synthetic_params(cfg, quant, jax.random.PRNGKey(0))
print(f"params built {time.time()-t0:.1f}s", flush=True)

rng = np.random.default_rng(0)
results = {}
for slots in (int(a) for a in (sys.argv[1:]
                               or ["32", "48", "64", "96", "128"])):
    sched = BatchScheduler(cfg, quant, params, max_len=MAX_LEN,
                           num_slots=slots, decode_block=BLOCK)
    greedy = SamplingParams(temperature=0.0)

    prompts = [rng.integers(100, cfg.vocab_size - 100,
                            size=PROMPT_LEN).tolist()
               for _ in range(slots + 1)]

    def run_one(out, idx):
        req = sched.submit(prompts[idx], max_new_tokens=DECODE,
                           sampling=greedy, stop_ids={-1})
        times = []
        while True:
            t = req.out_queue.get(timeout=1200)
            if t is None:
                break
            times.append(time.time())
        out[idx] = times

    w = [None]
    run_one(w, 0)
    print(f"[slots={slots}] warmup done ({len(w[0])} toks)", flush=True)

    out = [None] * slots
    threads = [threading.Thread(target=run_one, args=(out, i))
               for i in range(slots)]
    t0 = time.time()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.time() - t0
    total = sum(len(o) for o in out)
    last_first = max(o[0] for o in out)
    steady = total - slots
    t_end = max(o[-1] for o in out)
    decode_rate = steady / (t_end - last_first) if steady else 0.0

    # per-stream SLOs (steady window: each stream from its first token)
    stream_rates = [(len(o) - 1) / (o[-1] - o[0])
                    for o in out if len(o) > 1 and o[-1] > o[0]]
    gaps = np.concatenate([np.diff(o) for o in out if len(o) > 1])
    gaps = gaps[gaps > 1e-4]       # drop intra-burst ~0 gaps
    sr = np.asarray(stream_rates)
    results[slots] = {
        "total_tok": total, "wall_s": round(wall, 2),
        "agg_tok_s": round(total / wall, 1),
        "steady_decode_tok_s": round(decode_rate, 1),
        "stream_tok_s_p50": round(float(np.percentile(sr, 50)), 2),
        "stream_tok_s_p05": round(float(np.percentile(sr, 5)), 2),
        "block_gap_ms_p50": round(float(np.percentile(gaps, 50)) * 1e3, 1),
        "block_gap_ms_p95": round(float(np.percentile(gaps, 95)) * 1e3, 1),
    }
    print(f"[slots={slots}] {results[slots]}", flush=True)
    sched.shutdown()

out_path = "/root/repo/benchmarks/slots_saturation.json"
# merge into any existing sweep results (the sweep runs in several
# invocations because of the (slots, max_len) relay issue above)
try:
    with open(out_path) as f:
        merged = json.load(f)
except OSError:
    merged = {}
merged.update({str(k): dict(v, max_len=MAX_LEN) for k, v in results.items()})
with open(out_path, "w") as f:
    json.dump(merged, f, indent=1)
print(json.dumps(results), flush=True)
