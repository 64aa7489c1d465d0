#!/usr/bin/env python
"""On-chip probe: host-RAM expert offload on a model BIGGER than HBM.

DeepSeek V2-Lite at Q8 is the suite's documented single-chip failure:
int8 experts alone are 14.4 GB and the resident compile OOMs at
15.80/15.75 GiB HBM (suite_logs/v2lite-q8.log, round 2). With the
offload tier the same model runs on one 16 GB chip: experts live in
host RAM (the reference's defining capability, README.md:3-23), prefill
streams each repetition's experts through a double-buffered HBM slot,
decode computes the picked experts on the host (segmented dispatches on
this relay backend — no host-callback support).

Through the axon relay every host<->device interaction pays ~28 ms RTT
and H2D runs at ~0.02-0.09 GB/s, so the measured numbers are RELAY
bounds, not design bounds; the probe separately reports bytes moved and
call counts so local-PCIe expectations (10-25 GB/s, ~0.1 ms dispatch)
can be derived. Archived for ROUND3_RESULTS.md.
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import numpy as np

from krasis_tpu.config import QuantConfig, preset_config
from krasis_tpu.models.params import init_synthetic_params, pattern_info
from krasis_tpu.offload import build_synthetic_store, store_from_params
from krasis_tpu.runtime.offload_engine import OffloadEngine, callbacks_supported


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="deepseek-v2-lite")
    ap.add_argument("--bits", type=int, default=8)
    ap.add_argument("--prompt", type=int, default=512)
    ap.add_argument("--decode", type=int, default=16)
    ap.add_argument("--max-len", type=int, default=2048)
    args = ap.parse_args()

    assert jax.default_backend() == "tpu", jax.default_backend()
    print(f"[probe] backend=tpu callbacks={callbacks_supported()}",
          flush=True)

    cfg = preset_config(args.preset)
    quant = QuantConfig(expert_bits=args.bits)

    t0 = time.time()
    store = build_synthetic_store(cfg, quant, seed=1, fill="fast")
    print(f"[probe] host store: {store.nbytes()/2**30:.2f} GiB in "
          f"{time.time()-t0:.1f}s ({len(store.layers)} MoE layers)",
          flush=True)

    t0 = time.time()
    # device tree without experts (synthetic non-expert weights)
    params = init_synthetic_params(cfg, quant, jax.random.PRNGKey(0),
                                   skip_experts=True)
    eng = OffloadEngine(cfg, quant, params, store, max_len=args.max_len)
    print(f"[probe] engine up in {time.time()-t0:.1f}s "
          f"(streaming={eng.streaming} segmented={eng.segmented})",
          flush=True)

    rng = np.random.default_rng(0)
    prompt = rng.integers(1, cfg.vocab_size, args.prompt).tolist()

    t0 = time.time()
    r = eng.generate(prompt, max_new_tokens=args.decode)
    cold = time.time() - t0
    print(f"[probe] cold generate: {cold:.1f}s "
          f"(prefill {r.prefill_s:.1f}s, decode {r.decode_s:.1f}s)",
          flush=True)

    t0 = time.time()
    r = eng.generate(prompt, max_new_tokens=args.decode)
    out = {
        "metric": f"{args.preset}_q{args.bits}_offload_1chip",
        "prefill_tokens": args.prompt,
        "prefill_s": round(r.prefill_s, 2),
        "prefill_tok_s": round(r.prefill_tok_s, 1),
        "decode_tokens": len(r.tokens),
        "decode_s": round(r.decode_s, 2),
        "decode_tok_s": round(r.decode_tok_s, 2),
        "host_store_gib": round(store.nbytes() / 2**30, 2),
        "streamed_gib_per_prefill": round(store.nbytes() / 2**30, 2),
        "stream_eff_gb_s": round(store.nbytes() / 1e9 / max(r.prefill_s, 1e-9), 3),
        "warm_total_s": round(time.time() - t0, 1),
        "note": ("relay-bound: ~28 ms/dispatch, 0.02-0.09 GB/s H2D; "
                 "resident Q8 OOMs 16 GB HBM (round-2 suite)"),
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
