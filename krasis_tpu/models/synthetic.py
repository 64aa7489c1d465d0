"""Synthetic model builder: config → random-weight engine, no checkpoint.

TPU analog of the reference's synthetic decode benchmark harness
(reference src/decode.rs:4618 bench_decode_synthetic + fake weights
:4480): real memory layouts and access patterns from a config alone, for
benchmarks, dryruns, and tests on machines without model files.
"""

from __future__ import annotations

from typing import Optional

import jax

from ..config import ModelConfig, QuantConfig, preset_config
from ..runtime.engine import Engine
from .params import init_synthetic_params

TINY_OVERRIDES = dict(
    hidden_size=128, intermediate_size=256, moe_intermediate_size=64,
    num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
    vocab_size=512,
    n_routed_experts=8, num_experts_per_tok=2,
)


def tiny_config(preset: str = "qwen3-moe", **overrides) -> ModelConfig:
    kw = dict(TINY_OVERRIDES)
    kw.update(overrides)
    return preset_config(preset, **kw)


def build_synthetic_engine(
    cfg: ModelConfig,
    quant: Optional[QuantConfig] = None,
    max_len: int = 4096,
    batch_size: int = 1,
    seed: int = 0,
    mesh=None,
    offload: bool = False,
    offload_engine: bool = False,
) -> Engine:
    """`offload=True` builds the host-RAM expert tier (krasis_tpu/offload):
    the SAME synthetic weights, with routed experts moved to host memory
    and stripped from the device tree — so offloaded == resident is
    testable bit-for-bit.

    `offload_engine=True` builds the PRODUCTION OffloadEngine instead
    (streamed-weight prefill + segmented decode — works on backends
    without host callbacks, e.g. the axon relay) with a host-side
    synthetic store: expert weights never touch HBM at build time, so
    models whose experts exceed HBM outright (GPT-OSS-20B on 16 GiB)
    are constructible. Weights differ from the offload=True path (store
    is generated host-side), so use it for serving/perf, not parity."""
    quant = quant or QuantConfig()
    if offload_engine:
        from ..offload import build_synthetic_store
        from ..runtime.offload_engine import OffloadEngine

        store = build_synthetic_store(cfg, quant, seed=seed)
        params = init_synthetic_params(
            cfg, quant, jax.random.PRNGKey(seed), skip_experts=True)
        return OffloadEngine(cfg, quant, params, store, max_len=max_len,
                             batch_size=batch_size)
    params = init_synthetic_params(cfg, quant, jax.random.PRNGKey(seed))
    store = None
    if offload:
        from ..offload import store_from_params

        params, store = store_from_params(cfg, quant, params)
    if mesh is not None:
        from ..parallel.mesh import shard_params

        params = shard_params(params, cfg, mesh)
    return Engine(cfg, quant, params, max_len=max_len,
                  batch_size=batch_size, mesh=mesh, offload=store)
