"""Engine→network overhead measurement path (reference benchmark.py:823,
BENCHMARKS.md:9-11): temp in-process server + SSE-timed re-measurement.
Runs self-contained on the CPU backend with a tiny synthetic engine."""

import numpy as np

from krasis_tpu.benchmark import run_network_benchmark
from krasis_tpu.config import QuantConfig
from krasis_tpu.models.synthetic import build_synthetic_engine, tiny_config
from krasis_tpu.server import start_temp_server

PORT = 8437


def test_network_remeasure_roundtrip():
    cfg = tiny_config("qwen3-moe")
    eng = build_synthetic_engine(
        cfg, QuantConfig(expert_bits=4, group_size=32, kv_cache_dtype="bf16"),
        max_len=512,
    )
    httpd = start_temp_server(eng, None, "synthetic/tiny", port=PORT)
    try:
        net = run_network_benchmark(PORT, n_prompt_tokens=64,
                                    decode_tokens=16)
    finally:
        httpd.shutdown()
    assert net["streamed_chunks"] >= 8          # tokens actually streamed
    assert net["ttfc_s"] is not None and net["ttfc_s"] > 0
    assert net["network_decode_tok_s"] and net["network_decode_tok_s"] > 0
    assert net["total_s"] > 0
