#!/usr/bin/env python
"""On-chip probe: grouped-vs-gathered MoE kernel crossover at batched
decode shapes (continuous-batching slots).

At B slots × top-k picks, the gathered kernel's grid ∝ B·k re-reads a
hot expert once per pick; with B·k approaching E, the grouped kernel
reads each expert ONCE. Where's the crossover on v5e?
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

import krasis_tpu.ops.moe as moe
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
params = init_synthetic_params(cfg, quant, jax.random.PRNGKey(0))
rng = np.random.default_rng(0)
orig = moe.use_grouped_path

results = {}
for slots in (4, 8):
    for mode in ("gathered", "grouped"):
        moe.use_grouped_path = (
            orig if mode == "gathered"
            else (lambda T, k, E: True)
        )
        sched = BatchScheduler(cfg, quant, params, max_len=MAX_LEN,
                               num_slots=slots, decode_block=BLOCK)
        greedy = SamplingParams(temperature=0.0)
        prompts = [rng.integers(100, cfg.vocab_size - 100,
                                size=PROMPT_LEN).tolist()
                   for _ in range(slots)]

        def run_one(out, idx):
            req = sched.submit(prompts[idx], max_new_tokens=DECODE,
                               sampling=greedy, stop_ids={-1})
            n, first = 0, None
            while True:
                t = req.out_queue.get(timeout=900)
                if t is None:
                    break
                if first is None:
                    first = time.time()
                n += 1
            out[idx] = (n, first)

        w = [None]
        run_one(w, 0)  # warmup/compile
        out = [None] * slots
        threads = [threading.Thread(target=run_one, args=(out, i))
                   for i in range(slots)]
        t0 = time.time()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        end = time.time()
        last_first = max(o[1] for o in out)
        steady = sum(o[0] for o in out) - slots
        rate = steady / (end - last_first)
        results[f"{mode}_slots{slots}"] = round(rate, 1)
        print(f"[{mode} slots={slots}] steady {rate:.1f} tok/s", flush=True)
        sched.shutdown()

moe.use_grouped_path = orig
print(json.dumps(results), flush=True)
