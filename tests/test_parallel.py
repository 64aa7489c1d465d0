"""Mesh sharding: EP+TP sharded forward == unsharded forward.

Runs on the virtual 8-device CPU mesh (conftest). The dp×ep mesh shards
experts (expert dim) and attention heads (TP) over `ep`, batch over
`dp`; GSPMD inserts collectives — outputs must match the single-device
reference bit-for-bit-ish (same math, different partitioning)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from krasis_tpu.config import QuantConfig, preset_config
from krasis_tpu.models.model import make_forward_fns
from krasis_tpu.models.params import init_synthetic_params
from krasis_tpu.parallel.mesh import cache_shardings, make_mesh, shard_params
from krasis_tpu.runtime.kv_cache import init_cache

QUANT = QuantConfig(expert_bits=4, group_size=32, kv_cache_dtype="bf16")


def _cfg():
    return preset_config(
        "qwen3-moe",
        hidden_size=64, intermediate_size=128, moe_intermediate_size=32,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=4,
        vocab_size=256, head_dim=16,
        n_routed_experts=8, num_experts_per_tok=2,
    )


def test_sharded_forward_matches_unsharded():
    cfg = _cfg()
    params = init_synthetic_params(cfg, QUANT, jax.random.PRNGKey(0))
    prefill_fn, decode_fn, _ = make_forward_fns(cfg, QUANT)

    B = 2
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, cfg.vocab_size, size=(B, 8)).astype(np.int32)
    seq_lens = np.full((B,), 8, np.int32)

    # unsharded reference
    cache = init_cache(cfg, QUANT, B, 32)
    ref_logits, ref_cache = jax.jit(prefill_fn)(
        params, jnp.asarray(tokens), jnp.asarray(seq_lens), cache
    )
    nxt = jnp.argmax(ref_logits, -1).astype(jnp.int32)[:, None]
    ref_dec, _ = jax.jit(decode_fn)(params, nxt, ref_cache)

    # sharded (dp=2 × ep=4)
    mesh = make_mesh(8, dp=2)
    with mesh:
        sp = shard_params(params, cfg, mesh)
        sc = cache_shardings(init_cache(cfg, QUANT, B, 32), mesh)
        logits, cache2 = jax.jit(prefill_fn)(
            sp, jnp.asarray(tokens), jnp.asarray(seq_lens), sc
        )
        dec, _ = jax.jit(decode_fn)(sp, nxt, cache2)

    np.testing.assert_allclose(np.asarray(ref_logits), np.asarray(logits),
                               atol=3e-2, rtol=3e-2)
    np.testing.assert_allclose(np.asarray(ref_dec), np.asarray(dec),
                               atol=3e-2, rtol=3e-2)
    # greedy tokens must agree exactly
    np.testing.assert_array_equal(
        np.argmax(np.asarray(ref_logits), -1), np.argmax(np.asarray(logits), -1)
    )
