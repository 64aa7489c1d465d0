#!/usr/bin/env python
"""On-chip probe: QCN decode speed with quantized attention/DeltaNet projections.

Measures decode tok/s for qcn-1chip at attention = bf16 / int8 / int4.
Hypothesis (ROUND2_RESULTS / commit ccc966a): hybrid-model decode HBM
traffic is dominated by the DeltaNet in/out projections (~2.4 GB/token
at bf16 over 36 LA layers), so int8 halves the dominant stream.
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax

assert jax.default_backend() == "tpu", jax.default_backend()

from krasis_tpu.config import QuantConfig, preset_config
from krasis_tpu.models.synthetic import build_synthetic_engine
from krasis_tpu.ops.sampling import SamplingParams

PREFILL = 2048
DECODE = 96
MAX_LEN = 4096

results = {}
for att in (sys.argv[1:] or ["bf16", "int8", "int4"]):
    cfg = preset_config("qcn-1chip")
    quant = QuantConfig(expert_bits=4, group_size=128, attention=att)
    t0 = time.time()
    eng = build_synthetic_engine(cfg, quant, max_len=MAX_LEN)
    eng.decode_block = 32
    print(f"[{att}] engine built {time.time()-t0:.1f}s", flush=True)

    rng = np.random.default_rng(0)
    prompt = rng.integers(100, cfg.vocab_size - 100, size=PREFILL).tolist()
    t0 = time.time()
    eng.generate(prompt, max_new_tokens=3,
                 sampling=SamplingParams(temperature=0.0), stop_ids={-1})
    print(f"[{att}] warmup {time.time()-t0:.1f}s", flush=True)

    best = 0.0
    for rep in range(3):
        res = eng.generate(prompt, max_new_tokens=DECODE,
                           sampling=SamplingParams(temperature=0.0),
                           stop_ids={-1})
        print(f"[{att}] rep{rep}: decode {res.decode_tok_s:.1f} tok/s "
              f"({1000/res.decode_tok_s:.2f} ms/tok), prefill {res.prefill_tok_s:.0f}",
              flush=True)
        best = max(best, res.decode_tok_s)
    results[att] = round(best, 2)
    del eng

print(json.dumps(results), flush=True)
