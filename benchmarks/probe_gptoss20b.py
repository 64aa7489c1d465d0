#!/usr/bin/env python
"""On-chip probe: GPT-OSS-20B RESIDENT on one 16 GiB v5e chip.

Round-4 verdict item 7: every resident GPT-OSS-20B config OOMed
(suite_logs/gptoss20b-q4-fit16.log — 16.10 G needed vs 15.75 G). The
allocation breakdown in that log showed the weights FIT (arguments
12.18 G); what didn't was a 3.9 G HLO temp from whole-stack expert
dequant on the XLA fallback path (quant.py dequantize: f32
[32, 45, 64, 5760] broadcast + bf16 [32, 2880, 5760] stack per layer).
GPT-OSS experts carry biases, which the Pallas grouped kernels don't
serve, so this model lives on the fallback. Fix (ops/moe._deq_stack):
big stacks now dequantize expert-by-expert under lax.map, bounding the
transient to ~63 MB while the bf16 stack itself (the ragged_dot input)
remains the only full-size buffer.

Budget arithmetic this probe validates (16 GiB chip = 15.75 GiB usable):

  experts  q4 g64      24L x 32e x 2880 x 8640 = 19.11 B params
                       packed 9.56 G + bf16 scales 0.60 G  = 10.16 G
  attention int8       24L x ~26.6 M = 0.64 G + scales     =  0.66 G
  embedding bf16       201088 x 2880 x 2                   =  1.16 G
  lm_head  int8        0.58 G + scales                     =  0.59 G
  KV bf16 @2048        24L x 2 x 512 B/tok x 2048          =  0.10 G
  weights+KV                                               = 12.67 G
  per-layer dequant transient (bf16 w13+w2 stacks, mapped) =  1.59 G
  peak                                                     ~ 14.3 G  < 15.75 G

Engine-benchmark protocol (exact-config warmup, median of runs).

Usage: python benchmarks/probe_gptoss20b.py [--out benchmarks/gptoss20b_resident.json]
"""
from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="benchmarks/gptoss20b_resident.json")
    ap.add_argument("--prompt", type=int, default=2048)
    ap.add_argument("--decode", type=int, default=128)
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    import jax

    assert jax.default_backend() == "tpu", jax.default_backend()

    from krasis_tpu.config import QuantConfig, preset_config
    from krasis_tpu.models.synthetic import build_synthetic_engine
    from krasis_tpu.ops.sampling import SamplingParams

    cfg = preset_config("gpt-oss-20b")
    quant = QuantConfig(expert_bits=4, group_size=128, attention="int8")
    t0 = time.time()
    eng = build_synthetic_engine(cfg, quant, max_len=4096)
    print(f"[gptoss] resident engine up in {time.time()-t0:.0f}s",
          flush=True)

    rng = np.random.default_rng(0)
    prompt = rng.integers(100, cfg.vocab_size - 100,
                          size=args.prompt).tolist()
    greedy = SamplingParams(temperature=0.0)

    # exact-config warmup (compiles prefill + decode)
    t0 = time.time()
    eng.generate(prompt, max_new_tokens=args.decode, sampling=greedy,
                 stop_ids={-1})
    print(f"[gptoss] warmup {time.time()-t0:.0f}s", flush=True)

    pre, dec = [], []
    for _ in range(args.runs):
        r = eng.generate(prompt, max_new_tokens=args.decode,
                         sampling=greedy, stop_ids={-1})
        pre.append(args.prompt / r.prefill_s)
        dec.append(r.decode_tok_s)
        print(f"[gptoss] prefill {pre[-1]:.0f} tok/s, "
              f"decode {dec[-1]:.2f} tok/s", flush=True)

    out = {
        "model": "gpt-oss-20b q4 synthetic, RESIDENT single 16GiB chip",
        "config": {"expert_bits": 4, "attention": "int8",
                   "lm_head": "int8", "max_len": 4096,
                   "prompt": args.prompt, "decode": args.decode,
                   "runs": args.runs},
        "prefill_tok_s": round(float(np.median(pre)), 1),
        "decode_tok_s": round(float(np.median(dec)), 2),
        "reference_baseline": {
            "note": "reference serves GPT-OSS-120B hybrid GPU+RAM at "
                    "516 tok/s prefill / 20.4 tok/s decode "
                    "(BASELINE.md); no reference 20B single-accelerator "
                    "row exists — this row documents the RESIDENT fit "
                    "the round-4 verdict asked for",
        },
    }
    print(json.dumps(out, indent=2))
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", args.out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
