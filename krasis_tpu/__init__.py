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

from krasis_tpu.config import ModelConfig, QuantConfig  # noqa: F401
