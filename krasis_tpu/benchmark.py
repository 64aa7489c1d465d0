"""Standardized benchmark harness (reference protocol parity).

Reproduces the reference's measurement protocol
(reference python/krasis/benchmark.py:43,874-899): warmup generate,
timed prefill at 20K/35K/50K tokens, decode = 3 runs × 64 tokens,
optional network re-measurement through a temporary HTTP server to
quantify serving overhead (reference :648,:823). Reports archived as
JSON under benchmarks/ with system info.
"""

from __future__ import annotations

import argparse
import json
import os
import time
from typing import Dict, List, Optional

import numpy as np

PREFILL_LENGTHS = (20_000, 35_000, 50_000)   # reference benchmark.py:43
DECODE_RUNS = 5
DECODE_TOKENS = 64


def robust_stats(xs: List[float]) -> Dict:
    """Median + IQR dispersion for a run series, with outlier flagging.

    The relay/tunnel to the chip is noisy (round-3 saw the same kernel
    measure 2.4 vs 4.0 ms in consecutive runs) and a first run that hits
    an uncompiled program is silently slow — so every reported number
    carries its dispersion, and runs outside median ± 1.5*IQR are listed
    in `flagged` instead of silently averaged in (the round-3
    25/72/73-tok/s mean-of-compile bug)."""
    a = np.asarray(xs, np.float64)
    med = float(np.median(a))
    q1, q3 = float(np.percentile(a, 25)), float(np.percentile(a, 75))
    iqr = q3 - q1
    lo, hi = med - 1.5 * iqr, med + 1.5 * iqr
    flagged = [i for i, v in enumerate(a) if not (lo <= v <= hi)]
    return {
        "median": round(med, 2),
        "iqr": round(iqr, 2),
        "runs": [round(float(v), 2) for v in a],
        "flagged_runs": flagged,
    }


def _system_info() -> Dict:
    import jax

    devs = jax.devices()
    return {
        "backend": jax.default_backend(),
        "devices": [str(d) for d in devs],
        "jax": jax.__version__,
    }


def run_engine_benchmark(
    engine,
    prompt_ids: Optional[List[int]] = None,
    prefill_lengths=PREFILL_LENGTHS,
    decode_runs: int = DECODE_RUNS,
    decode_tokens: int = DECODE_TOKENS,
) -> Dict:
    """Engine-direct measurement (no network).

    Prompts come from the bundled domain-distinct natural-text corpus
    (krasis_tpu/prompts.py ≙ reference prompts/prefill_prompt_1-6):
    the warmup prompt uses the reserved ``warmup`` domain, every timed
    run a different real domain — the reference keeps these disjoint
    (benchmark.py:253-336) because random/repeated tokens give MoE
    routing unrealistically uniform statistics.
    """
    from .ops.sampling import SamplingParams
    from . import prompts as corpus

    greedy = SamplingParams(temperature=0.0)
    vocab = engine.cfg.vocab_size
    tokenizer = getattr(engine, "tokenizer", None)
    domains = list(corpus.DOMAINS)

    def make_prompt(n, domain):
        if prompt_ids and len(prompt_ids) >= n:
            return prompt_ids[:n]
        return corpus.prompt_ids(domain, n, vocab, tokenizer=tokenizer)

    # warmup: full generate at the LARGEST timed length (warmup-only
    # domain) — warming shorter would leave the timed runs' prefill
    # buckets / history-chunk programs uncompiled, and remote compiles
    # land inside the measurement (seen as a 9 s "prefill" at 2048).
    warm_n = min(
        max([*prefill_lengths, 2048], default=2048),
        engine.max_len - decode_tokens - 8,
    )
    engine.generate(
        make_prompt(warm_n, corpus.WARMUP_DOMAIN),
        max_new_tokens=decode_tokens, sampling=greedy, stop_ids={-1})

    # warm EVERY timed length: the tail-chunk program is specialized on
    # the prompt remainder, so warming only the largest length leaves
    # one compile inside the first timed prefill (observed: a 20K row
    # at 613 tok/s / 32.6 s TTFT against 4,267 tok/s once warm)
    for n in prefill_lengths:
        if n != warm_n and n + decode_tokens + 8 <= engine.max_len:
            engine.generate(make_prompt(n, corpus.WARMUP_DOMAIN),
                            max_new_tokens=2, sampling=greedy,
                            stop_ids={-1})

    results: Dict = {"prefill": {}, "decode": {}}
    for i, n in enumerate(prefill_lengths):
        if n + decode_tokens + 8 > engine.max_len:
            continue
        dom = domains[i % len(domains)]
        res = engine.generate(make_prompt(n, dom), max_new_tokens=2,
                              sampling=greedy, stop_ids={-1})
        results["prefill"][str(n)] = {
            "tok_s": round(res.prefill_tok_s, 1),
            "ttft_s": round(res.prefill_s, 3),
            "domain": dom,
        }

    # decode warm run at the EXACT timed configuration: the decode
    # programs are specialized on cache length, so the 50K-context
    # warmup above does NOT warm the 2048-context decode path (round-3
    # leak: first decode run measured 25 tok/s against 72/73 after —
    # a compile inside the timing window).
    n_ctx = min(2048, engine.max_len // 2)
    engine.generate(make_prompt(n_ctx, corpus.WARMUP_DOMAIN),
                    max_new_tokens=decode_tokens,
                    sampling=greedy, stop_ids={-1})

    decode_rates = []
    for r in range(decode_runs):
        dom = domains[(r + len(prefill_lengths)) % len(domains)]
        res = engine.generate(make_prompt(n_ctx, dom),
                              max_new_tokens=decode_tokens,
                              sampling=greedy, stop_ids={-1})
        decode_rates.append(res.decode_tok_s)
    stats = robust_stats(decode_rates)
    results["decode"] = {
        "tok_s_median": stats["median"],
        "tok_s_iqr": stats["iqr"],
        "tok_s_runs": stats["runs"],
        "flagged_runs": stats["flagged_runs"],
        # kept for older report readers; median is the headline
        "tok_s_mean": round(float(np.mean(decode_rates)), 2),
        "context": n_ctx,
        "tokens_per_run": decode_tokens,
    }
    results["best_prefill_tok_s"] = max(
        (v["tok_s"] for v in results["prefill"].values()), default=0.0
    )
    # offload tier: the measured host->HBM stream rate (pure first-rep
    # transfer + overlap-effective) so a real-PCIe/DMA host can validate
    # the transport in one run — through the relay tunnel this measures
    # the tunnel (~25 MB/s observed), which is exactly the point of
    # recording it instead of modeling it. The pure-rate measurement
    # serializes one transfer against the pipeline, so it is gated on
    # KRASIS_TPU_STREAM_STATS; run one extra untimed prefill with it on
    # to capture the number without perturbing the timed rows above.
    if hasattr(engine, "last_stream_stats"):
        import os as _os

        _os.environ["KRASIS_TPU_STREAM_STATS"] = "1"
        try:
            engine.generate(make_prompt(min(512, n_ctx), corpus.WARMUP_DOMAIN),
                            max_new_tokens=2, sampling=greedy, stop_ids={-1})
        finally:
            _os.environ.pop("KRASIS_TPU_STREAM_STATS", None)
    stream = getattr(engine, "last_stream_stats", None)
    if stream:
        results["offload_stream"] = stream
    return results


def run_slots_benchmark(cfg, quant, params, slots_list=(1, 4, 8, 16),
                        max_len: int = 2048, prompt_len: int = 512,
                        decode_tokens: int = 128,
                        decode_block: int = 32) -> Dict:
    """Continuous-batching aggregate decode throughput vs slot count
    (capability the single-request reference cannot measure). All slots
    decode concurrently from `prompt_len`-token prompts; the steady rate
    counts tokens after the LAST stream's first token."""
    import threading

    from .ops.sampling import SamplingParams
    from .runtime.scheduler import BatchScheduler

    greedy = SamplingParams(temperature=0.0)
    rng = np.random.default_rng(0)
    results: Dict = {}
    for slots in slots_list:
        sched = BatchScheduler(cfg, quant, params, max_len=max_len,
                               num_slots=slots, decode_block=decode_block)
        prompts = [rng.integers(100, cfg.vocab_size - 100,
                                size=prompt_len).tolist()
                   for _ in range(slots)]

        def run_one(out, idx):
            req = sched.submit(prompts[idx], max_new_tokens=decode_tokens,
                               sampling=greedy, stop_ids={-1})
            n, first = 0, None
            while True:
                t = req.out_queue.get(timeout=1800)
                if t is None:
                    break
                if first is None:
                    first = time.time()
                n += 1
            out[idx] = (n, first)

        warm = [None]
        run_one(warm, 0)  # compile prefill/insert/block-decode
        out = [None] * slots
        threads = [threading.Thread(target=run_one, args=(out, i))
                   for i in range(slots)]
        t0 = time.time()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        end = time.time()
        total = sum(o[0] for o in out)
        last_first = max(o[1] for o in out)
        steady = (total - slots) / (end - last_first) \
            if end > last_first else 0.0
        results[str(slots)] = {
            "total_tok": total,
            "wall_s": round(end - t0, 2),
            "agg_tok_s": round(total / (end - t0), 1),
            "steady_decode_tok_s": round(steady, 1),
        }
        sched.shutdown()
    return results


def run_network_benchmark(port: int, n_prompt_tokens: int = 2048,
                          decode_tokens: int = DECODE_TOKENS) -> Dict:
    """Re-measure through a running HTTP server via SSE: network-side
    decode rate = streamed chunks over their wall-clock span, compared
    against the engine's own timing — the reference's engine→network
    overhead check (reference benchmark.py:823, BENCHMARKS.md:9-11
    reports ~7% loss; here the transport is localhost HTTP + SSE)."""
    import urllib.request

    prompt = "benchmark " * (n_prompt_tokens // 2)
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/v1/chat/completions",
        data=json.dumps({
            "messages": [{"role": "user", "content": prompt}],
            "max_tokens": decode_tokens, "temperature": 0.0,
            "stream": True,
        }).encode(),
        headers={"Content-Type": "application/json"},
    )
    t0 = time.time()
    t_first = None
    n_chunks = 0
    t_last = t0
    with urllib.request.urlopen(req, timeout=2400) as resp:
        for raw in resp:
            line = raw.decode("utf-8", "replace").strip()
            if not line.startswith("data: ") or line == "data: [DONE]":
                continue
            obj = json.loads(line[6:])
            delta = obj["choices"][0].get("delta", {})
            if "content" in delta:
                now = time.time()
                if t_first is None:
                    t_first = now
                n_chunks += 1
                t_last = now
    net_decode = ((n_chunks - 1) / (t_last - t_first)
                  if n_chunks > 1 and t_last > t_first else None)
    return {
        "total_s": round(time.time() - t0, 2),
        "ttfc_s": round(t_first - t0, 3) if t_first else None,
        "network_decode_tok_s": round(net_decode, 2) if net_decode else None,
        "streamed_chunks": n_chunks,
    }


def archive_report(report: Dict, out_dir: str = "benchmarks") -> str:
    os.makedirs(out_dir, exist_ok=True)
    stamp = time.strftime("%Y%m%d_%H%M%S")
    name = report.get("model", "model").replace("/", "_")
    path = os.path.join(out_dir, f"{name}_{stamp}.json")
    with open(path, "w") as f:
        json.dump(report, f, indent=2)
    return path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", help="checkpoint path")
    ap.add_argument("--synthetic", help="synthetic preset name")
    ap.add_argument("--expert-bits", type=int, default=4)
    ap.add_argument("--attention-quant", default="bf16",
                    choices=("bf16", "int8", "int4"))
    ap.add_argument("--expert-activation", default="bf16",
                    choices=("bf16", "int8"))
    ap.add_argument("--decode-block", type=int, default=32,
                    help="tokens per fused decode call (32 amortizes "
                         "remote-tunnel dispatch; match bench.py)")
    ap.add_argument("--max-len", type=int, default=65536)
    ap.add_argument("--prefill-lengths", type=int, nargs="*",
                    default=list(PREFILL_LENGTHS))
    ap.add_argument("--archive", action="store_true")
    ap.add_argument("--network", action="store_true",
                    help="also re-measure through a temp HTTP server and "
                         "report the engine→network overhead")
    ap.add_argument("--offload", default="none",
                    choices=("none", "experts"),
                    help="host-RAM expert tier (models whose experts "
                         "exceed HBM — e.g. GPT-OSS-20B resident-OOMs "
                         "one 16 GiB chip in every quant config)")
    ap.add_argument("--slots-bench", type=int, nargs="*", default=None,
                    help="measure continuous-batching aggregate decode "
                         "throughput at these slot counts (skips the "
                         "single-request protocol)")
    ap.add_argument("--port", type=int, default=8398)
    args = ap.parse_args()

    from .config import ModelConfig, QuantConfig, preset_config

    quant = QuantConfig(expert_bits=args.expert_bits,
                        attention=args.attention_quant,
                        expert_activation=args.expert_activation)
    if args.synthetic:
        from .models.synthetic import build_synthetic_engine

        cfg = preset_config(args.synthetic)
        engine = build_synthetic_engine(
            cfg, quant, max_len=args.max_len,
            offload_engine=args.offload == "experts")
        model_name = f"synthetic/{args.synthetic}"
    else:
        from .models.loader import load_params
        from .runtime.engine import Engine

        cfg = ModelConfig.from_model_path(args.model)
        params = load_params(cfg, quant)
        engine = Engine(cfg, quant, params, max_len=args.max_len)
        model_name = args.model
    engine.decode_block = args.decode_block

    report = {
        "model": model_name,
        "quant": {"expert_bits": args.expert_bits,
                  "attention": args.attention_quant},
        "system": _system_info(),
    }
    if args.slots_bench is not None:
        slots = tuple(args.slots_bench) or (1, 4, 8, 16)
        report["results"] = {"slots_throughput": run_slots_benchmark(
            cfg, quant, engine.params, slots_list=slots,
            max_len=min(args.max_len, 2048),
            decode_block=args.decode_block,
        )}
    else:
        report["results"] = run_engine_benchmark(
            engine, prefill_lengths=tuple(args.prefill_lengths)
        )
    if args.network:
        from .server import start_temp_server

        # both transports, mirroring reference BENCHMARKS.md:9-11 (its
        # engine→network overhead is ~7%; the bar to beat)
        eng_decode = report["results"].get("decode", {}).get("tok_s_median")
        report["results"]["network"] = {}
        for backend in ("native", "python"):
            try:
                httpd = start_temp_server(engine, None, model_name,
                                          port=args.port, backend=backend)
            except RuntimeError as e:
                report["results"]["network"][backend] = {"error": str(e)}
                continue
            try:
                runs = [run_network_benchmark(args.port)
                        for _ in range(3)]
            finally:
                httpd.shutdown()
            rates = [r["network_decode_tok_s"] for r in runs
                     if r.get("network_decode_tok_s")]
            net = runs[-1]
            if rates and eng_decode:
                med = sorted(rates)[len(rates) // 2]
                net["network_decode_tok_s"] = med
                net["runs"] = rates
                net["overhead_pct"] = round(
                    100.0 * (1 - med / eng_decode), 1)
            report["results"]["network"][backend] = net

    print(json.dumps(report, indent=2))
    if args.archive:
        print("archived:", archive_report(report))


if __name__ == "__main__":
    main()
