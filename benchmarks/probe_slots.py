#!/usr/bin/env python
"""On-chip probe: aggregate decode throughput vs continuous-batching slots.

The decode step is HBM-weight-bound: one weight stream serves every
slot, so aggregate tok/s should scale near-linearly with slots until
the activation/KV work catches up (reference is single-request — this
is the capability upgrade's payoff measurement).

V2-Lite Q4 synthetic, all slots decoding concurrently from ~512-token
prompts.
"""
from __future__ import annotations

import json
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
MAX_LEN = 2048
BLOCK = 32

cfg = preset_config("deepseek-v2-lite")
quant = QuantConfig(expert_bits=4, group_size=128)
t0 = time.time()
params = init_synthetic_params(cfg, quant, jax.random.PRNGKey(0))
print(f"params built {time.time()-t0:.1f}s", flush=True)

rng = np.random.default_rng(0)
results = {}
for slots in (int(a) for a in (sys.argv[1:] or ["1", "2", "4", "8"])):
    sched = BatchScheduler(cfg, quant, params, max_len=MAX_LEN,
                           num_slots=slots, decode_block=BLOCK)
    greedy = SamplingParams(temperature=0.0)

    prompts = [rng.integers(100, cfg.vocab_size - 100,
                            size=PROMPT_LEN).tolist()
               for _ in range(slots + 1)]

    def run_one(out, idx):
        req = sched.submit(prompts[idx], max_new_tokens=DECODE,
                           sampling=greedy, stop_ids={-1})
        n = 0
        first = None
        while True:
            t = req.out_queue.get(timeout=600)
            if t is None:
                break
            if first is None:
                first = time.time()
            n += 1
        out[idx] = (n, first)

    # warmup (compiles prefill + insert + block decode)
    w = [None]
    run_one(w, 0)
    print(f"[slots={slots}] warmup done ({w[0][0]} toks)", flush=True)

    out = [None] * slots
    threads = [threading.Thread(target=run_one, args=(out, i))
               for i in range(slots)]
    t0 = time.time()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.time() - t0
    total = sum(o[0] for o in out)
    # steady-state decode rate: tokens after the LAST stream's first token
    last_first = max(o[1] for o in out)
    steady = sum(o[0] for o in out) - slots
    decode_rate = steady / (time.time() - last_first) if steady else 0.0
    agg = total / wall
    results[slots] = {"total_tok": total, "wall_s": round(wall, 2),
                      "agg_tok_s": round(agg, 1),
                      "steady_decode_tok_s": round(decode_rate, 1)}
    print(f"[slots={slots}] {results[slots]}", flush=True)
    sched.shutdown()

print(json.dumps(results), flush=True)
