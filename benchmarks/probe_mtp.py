#!/usr/bin/env python
"""On-chip probe: MTP speculative-decode verify-step cost (V2-Lite shape).

Acceptance rate α is a property of the trained MTP head + data (DeepSeek
reports ~80-90% for V3), so synthetic weights can't measure end-to-end
speedup honestly. What IS measurable on synthetic weights:

  t_vanilla — ms per vanilla decode token (1-token step)
  t_verify  — ms per verify step (2-query-token main forward, Sq=2
              decode-attention kernel, + the 1-layer MTP module on 2
              tokens)

Effective decode rate under acceptance α is (1+α)/t_verify tok/s, so
the probe prints the speedup curve and the break-even α
(t_verify/t_vanilla - 1). The verify step should cost only slightly
more than a vanilla step: both are weight-streaming-bound, the second
query token rides the same expert/KV DMA stream.

Run (TPU): python benchmarks/probe_mtp.py
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

assert jax.default_backend() == "tpu", jax.default_backend()

from krasis_tpu.config import QuantConfig, preset_config
from krasis_tpu.models.synthetic import build_synthetic_engine
from krasis_tpu.ops.sampling import SamplingParams

PREFILL = 2048
DECODE = 96
MAX_LEN = 4096
BLOCK = 32

cfg = preset_config("deepseek-v2-lite", num_nextn_predict_layers=1)
quant = QuantConfig(expert_bits=4, group_size=128)
t0 = time.time()
eng = build_synthetic_engine(cfg, quant, max_len=MAX_LEN)
eng.decode_block = BLOCK
print(f"engine built {time.time()-t0:.1f}s", flush=True)

rng = np.random.default_rng(0)
prompt = rng.integers(100, cfg.vocab_size - 100, size=PREFILL).tolist()
greedy = SamplingParams(temperature=0.0)


def run(spec: bool):
    eng.spec_available = spec
    eng.generate(prompt, max_new_tokens=3, sampling=greedy,
                 stop_ids={-1})  # warmup/compile
    best_rate = 0.0
    stats = None
    for _ in range(3):
        res = eng.generate(prompt, max_new_tokens=DECODE, sampling=greedy,
                           stop_ids={-1})
        best_rate = max(best_rate, res.decode_tok_s)
        stats = eng.last_spec_stats
    return best_rate, stats


van_rate, _ = run(spec=False)
t_vanilla = 1000.0 / van_rate
print(f"vanilla decode: {van_rate:.1f} tok/s ({t_vanilla:.2f} ms/tok)",
      flush=True)

out = {"t_vanilla_ms": round(t_vanilla, 3),
       "vanilla_tok_s": round(van_rate, 1), "depths": {}}
for k in (1, 2, 3):
    eng.spec_k = k
    spec_rate, stats = run(spec=True)
    # emitted/steps - 1 = synthetic per-step acceptance; per-STEP time is
    # what transfers to a real checkpoint
    commit_syn = stats["emitted"] / stats["steps"]
    t_verify = commit_syn * 1000.0 / spec_rate
    # expected tokens/step at per-token acceptance α with depth k:
    # (1 - α^(k+1)) / (1 - α)
    curve = {}
    for a in (0.6, 0.8, 0.9):
        exp_commit = sum(a ** i for i in range(k + 1))
        curve[f"alpha_{a:.1f}"] = round(exp_commit * 1000.0 / t_verify, 1)
    out["depths"][f"k{k}"] = {
        "t_verify_ms": round(t_verify, 3),
        "verify_overhead": round(t_verify / t_vanilla - 1.0, 4),
        "tok_s_at_alpha": curve,
    }
    print(f"k={k}: verify step {t_verify:.2f} ms "
          f"(overhead {t_verify / t_vanilla - 1.0:+.1%}); "
          f"projected tok/s {curve}", flush=True)
print(json.dumps(out))
