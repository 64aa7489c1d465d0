"""Perplexity harness through the production forward path.

Parity with the reference's measure_ppl.py (reference
perplexity/measure_ppl.py:154 evaluate_perplexity): sliding window 2048 /
stride 1024, NLL of the last `stride` tokens per window, run through the
SAME forward used for serving (`return_all_logits=True`) so quantization,
cache handling, and kernels are all in the measurement. Datasets:
WikiText-2/-103 / C4 (loaded from local files or HF datasets when
available; any text file works via --text).
"""

from __future__ import annotations

import argparse
import json
import math
import os
import time
from typing import List, Optional

import numpy as np


def sliding_windows(n_tokens: int, window: int, stride: int):
    """Yield (start, end, shifted score_start) per window.

    Exactly the reference protocol (reference perplexity/measure_ppl.py
    evaluate_perplexity): window starts every `stride` tokens up to
    n_tokens-1; the first window scores every shifted position, later
    windows score shifted positions >= stride-1 (i.e. original positions
    >= start+stride — the non-overlapping region when window == 2*stride).
    Windows shorter than 2 tokens stop the walk; a trailing window whose
    whole span is overlap contributes 0 scored tokens, matching the
    reference's empty-slice behavior.
    """
    for pos in range(0, max(n_tokens - 1, 1), stride):
        end = min(pos + window, n_tokens)
        if end - pos < 2:
            break
        yield pos, end, (0 if pos == 0 else stride - 1)


def evaluate_perplexity(
    engine,
    token_ids: List[int],
    window: int = 2048,
    stride: int = 1024,
    max_tokens: Optional[int] = None,
    log_every: int = 10,
) -> dict:
    import jax.numpy as jnp

    if max_tokens:
        token_ids = token_ids[:max_tokens]
    n = len(token_ids)
    total_nll = 0.0
    total_scored = 0
    t0 = time.time()
    n_windows = 0
    window_nlls = []          # per-window (nll_sum, n_scored) — the raw
    #                           material for paired bootstrap CIs

    for start, end, score_start in sliding_windows(n, window, stride):
        ids = token_ids[start:end]
        logits = engine.forward_all_logits(ids)       # [S, V] f32
        logits = np.asarray(logits, np.float32)
        # NLL of token t+1 given logits at t, scored from score_start
        tgt = np.asarray(ids[1:], np.int64)
        lg = logits[:-1]
        m = lg.max(axis=-1, keepdims=True)
        lse = m[:, 0] + np.log(np.exp(lg - m).sum(axis=-1))
        nll = lse - lg[np.arange(len(tgt)), tgt]
        scored = nll[score_start:]
        total_nll += float(scored.sum())
        total_scored += len(scored)
        window_nlls.append((float(scored.sum()), int(len(scored))))
        n_windows += 1
        if log_every and n_windows % log_every == 0:
            ppl = math.exp(total_nll / total_scored)
            print(f"[ppl] window {n_windows}: tokens={total_scored} ppl={ppl:.4f}")

    ppl = math.exp(total_nll / total_scored)
    bpc = total_nll / total_scored / math.log(2)
    return {
        "ppl": ppl,
        "bits_per_token": bpc,
        "tokens_scored": total_scored,
        "windows": n_windows,
        "window_nlls": window_nlls,
        "elapsed_s": time.time() - t0,
    }


def load_dataset_text(name: str, split: str = "test") -> str:
    """WikiText-2 / C4-val loaders via HF datasets; falls back to local
    cache files under $KRASIS_TPU_HOME/datasets."""
    home = os.environ.get("KRASIS_TPU_HOME", os.path.expanduser("~/.krasis_tpu"))
    cache = os.path.join(home, "datasets", f"{name}.{split}.txt")
    if os.path.exists(cache):
        with open(cache) as f:
            return f.read()
    from datasets import load_dataset  # type: ignore

    if name == "wikitext-2":
        ds = load_dataset("wikitext", "wikitext-2-raw-v1", split=split)
        text = "\n\n".join(r["text"] for r in ds)
    elif name == "wikitext-103":
        ds = load_dataset("wikitext", "wikitext-103-raw-v1", split=split)
        text = "\n\n".join(r["text"] for r in ds)
    elif name == "c4":
        ds = load_dataset("allenai/c4", "en", split="validation", streaming=True)
        parts, total = [], 0
        for r in ds:
            parts.append(r["text"])
            total += len(r["text"])
            if total > 5_000_000:
                break
        text = "\n\n".join(parts)
    else:
        raise ValueError(f"unknown dataset {name}")
    os.makedirs(os.path.dirname(cache), exist_ok=True)
    with open(cache, "w") as f:
        f.write(text)
    return text


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True)
    ap.add_argument("--dataset", default="wikitext-2")
    ap.add_argument("--text", help="score a local text file instead")
    ap.add_argument("--window", type=int, default=2048)
    ap.add_argument("--stride", type=int, default=1024)
    ap.add_argument("--max-tokens", type=int, default=300_000)
    ap.add_argument("--expert-bits", type=int, default=4)
    ap.add_argument("--out", help="results JSON path")
    args = ap.parse_args()

    from .config import ModelConfig, QuantConfig
    from .models.loader import load_params
    from .runtime.engine import Engine
    from .runtime.tokenizer import Tokenizer

    cfg = ModelConfig.from_model_path(args.model)
    quant = QuantConfig(expert_bits=args.expert_bits)
    params = load_params(cfg, quant)
    engine = Engine(cfg, quant, params, max_len=args.window)
    tok = Tokenizer(args.model)

    if args.text:
        with open(args.text) as f:
            text = f.read()
    else:
        text = load_dataset_text(args.dataset)
    ids = tok.encode(text)
    res = evaluate_perplexity(
        engine, ids, window=args.window, stride=args.stride,
        max_tokens=args.max_tokens,
    )
    res.update({"model": args.model, "dataset": args.dataset,
                "expert_bits": args.expert_bits,
                "window": args.window, "stride": args.stride})
    print(json.dumps(res, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(res, f, indent=2)


if __name__ == "__main__":
    main()
