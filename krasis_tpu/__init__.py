"""krasis_tpu — a TPU-native quantized MoE LLM inference framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
krasis reference engine (Python+Rust, GPU-prefill / CPU-decode): INT4/INT8
weight-only-quantized mixture-of-experts serving of 16B–235B+ models with
GQA / MLA / hybrid Gated-DeltaNet attention, FP8 KV cache, and an
OpenAI-compatible HTTP server.

Unlike the reference, prefill and decode run in a single unified engine:
HBM plays the role the reference assigns to system RAM, Pallas grouped
quantized matmuls play the role of the AVX2/Marlin kernels, and scaling is
expressed as expert/tensor sharding over a `jax.sharding.Mesh` instead of
NUMA pinning + multi-GPU streams.
"""

__version__ = "0.1.0"

import os as _os


def _setup_compilation_cache():
    """Point jax at a persistent jit cache as early as possible: on this
    class of machine every XLA compile round-trips a remote-compile
    service, so even eager-op compiles (weight init, sampling) cost
    seconds each the first time. Harmless no-op elsewhere."""
    if _os.environ.get("KRASIS_TPU_NO_JIT_CACHE"):
        return
    try:
        import jax

        if jax.config.jax_compilation_cache_dir:
            return
        d = _os.path.join(
            _os.environ.get("KRASIS_TPU_HOME",
                            _os.path.expanduser("~/.krasis_tpu")),
            "jit_cache",
        )
        _os.makedirs(d, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
    except Exception:
        pass


_setup_compilation_cache()

from krasis_tpu.config import ModelConfig, QuantConfig  # noqa: F401
