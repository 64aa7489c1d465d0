"""Generation stress battery: diverse prompts with output validation.

Parity with the reference's stress test (reference python/krasis/stress_test.py:197):
a battery of structurally different prompts (short/long, code, repetition
bait, multilingual, empty-ish) each generated and validated for
degenerate output (token loops, empty completions, NaN-driven repeats).
Runs against an Engine directly or a running server.
"""

from __future__ import annotations

import argparse
import json
from typing import Dict, List

PROMPT_KINDS = {
    "short": "Hi",
    "question": "What are the three primary colors? Answer briefly.",
    "code": "Write a Python function that reverses a string.",
    "long_context": "The quick brown fox jumps over the lazy dog. " * 200
    + "\nSummarize the above text in one sentence.",
    "repetition_bait": "Repeat the word 'test' exactly three times.",
    "multilingual": "Translate 'good morning' into French, German and Japanese.",
    "numeric": "Count from 1 to 10, separated by commas.",
}


def validate_tokens(tokens: List[int], max_run: int = 12) -> Dict:
    """Degenerate-output checks: long single-token runs, tiny vocab usage."""
    issues = []
    if not tokens:
        issues.append("empty")
    run, best = 1, 1
    for a, b in zip(tokens, tokens[1:]):
        run = run + 1 if a == b else 1
        best = max(best, run)
    if best >= max_run:
        issues.append(f"token_run_{best}")
    if len(tokens) >= 32 and len(set(tokens)) <= max(2, len(tokens) // 16):
        issues.append("low_diversity")
    return {"ok": not issues, "issues": issues, "n": len(tokens)}


def run_stress(engine, tokenizer=None, max_new_tokens: int = 64) -> Dict:
    from .ops.sampling import SamplingParams

    results = {}
    for name, prompt in PROMPT_KINDS.items():
        if tokenizer is not None:
            ids = tokenizer.apply_chat_template(
                [{"role": "user", "content": prompt}]
            )
        else:
            vocab = engine.cfg.vocab_size
            ids = [(7 + 31 * ord(c)) % (vocab - 2) + 1 for c in prompt[:1024]]
        res = engine.generate(
            ids, max_new_tokens=max_new_tokens,
            sampling=SamplingParams(temperature=0.6, top_k=20, top_p=0.95),
            seed=hash(name) % (2**31),
        )
        v = validate_tokens(res.tokens)
        v["decode_tok_s"] = round(res.decode_tok_s, 2)
        results[name] = v
    results["_summary"] = {
        "passed": sum(1 for k, v in results.items()
                      if not k.startswith("_") and v["ok"]),
        "total": len(PROMPT_KINDS),
    }
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model")
    ap.add_argument("--synthetic", default="tiny")
    ap.add_argument("--max-new-tokens", type=int, default=64)
    args = ap.parse_args()

    from .config import ModelConfig, QuantConfig

    if args.model:
        from .models.loader import load_params
        from .runtime.engine import Engine
        from .runtime.tokenizer import Tokenizer

        cfg = ModelConfig.from_model_path(args.model)
        quant = QuantConfig()
        engine = Engine(cfg, quant, load_params(cfg, quant))
        tok = Tokenizer(args.model)
    else:
        from .models.synthetic import build_synthetic_engine, tiny_config

        engine = build_synthetic_engine(
            tiny_config("qwen3-moe"), QuantConfig(expert_bits=4, group_size=32)
        )
        tok = None
    print(json.dumps(run_stress(engine, tok, args.max_new_tokens), indent=2))


if __name__ == "__main__":
    main()
