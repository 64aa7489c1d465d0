#!/usr/bin/env python
"""On-chip A/B: fused full-N grouped kernels vs the per-(t,j) legacy.

Measures, at V2-Lite prefill shapes (T=2048, k=6):
  - legacy pipeline: gmm(w13) → XLA swiglu → gmm(w2)
  - fused pipeline:  gmm13_fused (w13+swiglu in-kernel) → gmm2_fused
  - the full moe_prefill_pallas layer (new glue + fused kernels)
with numeric parity checks, plus a tm sweep for the fused path.
"""
from __future__ import annotations

import functools
import json
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

assert jax.default_backend() == "tpu", jax.default_backend()

from _timing import timeit_ms as timeit  # noqa: E402
from krasis_tpu.config import preset_config
from krasis_tpu.ops.activations import swiglu
from krasis_tpu.ops.gmm_pallas import (
    _plan_tiles, gmm, gmm13_fused, gmm2_fused, moe_prefill_pallas,
)
from krasis_tpu.quant import random_qtensor

cfg = preset_config("deepseek-v2-lite")
T, H, I = 2048, cfg.hidden_size, cfg.moe_intermediate_size
E, K_top = cfg.n_routed_experts, cfg.num_experts_per_tok
key = jax.random.PRNGKey(0)


@jax.jit
def legacy_pipeline(x_tiles, w13, w2, te, tv):
    Mp = x_tiles.shape[0]
    h = gmm(x_tiles, w13, te, tv)[:Mp]
    a = swiglu(h.astype(jnp.bfloat16))
    return gmm(a, w2, te, tv)


@functools.partial(jax.jit, static_argnames=("tm",))
def fused_pipeline(x_tiles, w13, w2, te, tv, tm=128):
    Mp = x_tiles.shape[0]
    a = gmm13_fused(x_tiles, w13, te, tv, tm=tm)[:Mp]
    return gmm2_fused(a, w2, te, tv, tm=tm)


def main():
    results = {}
    w13 = random_qtensor(jax.random.fold_in(key, 1), (E, H, 2 * I), 4, 128)
    w2 = random_qtensor(jax.random.fold_in(key, 2), (E, I, H), 4, 128)
    idx = jax.random.randint(jax.random.fold_in(key, 4), (T, K_top), 0, E)
    x = jax.random.normal(jax.random.fold_in(key, 3), (T, H),
                          jnp.bfloat16) * 0.1
    wts = jax.nn.softmax(jax.random.normal(jax.random.fold_in(key, 5),
                                           (T, K_top)))

    for tm in (128, 256):
        dest, te, tv, order, n_tiles = jax.jit(
            functools.partial(_plan_tiles, T=T, k=K_top, E=E, tm=tm))(idx)
        Mp = n_tiles * tm
        x_tiles = jax.random.normal(
            jax.random.fold_in(key, 9), (Mp, H), jnp.bfloat16) * 0.1
        if tm == 128:
            ms_leg = timeit(legacy_pipeline, x_tiles, w13, w2, te, tv)
            results["legacy_tm128"] = round(ms_leg, 3)
            print(f"legacy two-stage tm=128: {ms_leg:.3f} ms", flush=True)
        ms_f = timeit(functools.partial(fused_pipeline, tm=tm),
                      x_tiles, w13, w2, te, tv)
        results[f"fused_tm{tm}"] = round(ms_f, 3)
        print(f"fused  two-stage tm={tm}: {ms_f:.3f} ms", flush=True)
        if tm == 128:
            a = legacy_pipeline(x_tiles, w13, w2, te, tv)[:Mp]
            b = fused_pipeline(x_tiles, w13, w2, te, tv)[:Mp]
            err = float(jnp.max(jnp.abs(a - b)))
            rel = err / (float(jnp.max(jnp.abs(a))) + 1e-9)
            results["max_abs_err"] = err
            results["max_rel_err"] = rel
            print(f"parity legacy vs fused: abs {err:.4f} rel {rel:.5f}",
                  flush=True)

    # full layer through moe_prefill_pallas (new glue + fused default)
    layer = jax.jit(lambda x, i, w, w13, w2: moe_prefill_pallas(
        x, w13, w2, i, w))
    ms = timeit(layer, x, idx, wts, w13, w2)
    flops = 2 * T * K_top * (H * 2 * I + I * H)
    results["moe_layer_fused"] = round(ms, 3)
    results["moe_layer_gf_s"] = round(flops / ms / 1e9, 1)
    print(f"moe layer (fused+new glue): {ms:.3f} ms "
          f"({flops/ms/1e9:.0f} GF/s)", flush=True)

    # glue floor: same layer with tiny weights
    w13t = random_qtensor(jax.random.fold_in(key, 6), (E, 256, 256), 4, 128)
    w2t = random_qtensor(jax.random.fold_in(key, 7), (E, 128, 256), 4, 128)
    ms_glue = timeit(layer, x[:, :256], idx, wts, w13t, w2t)
    results["glue_floor"] = round(ms_glue, 3)
    print(f"glue floor (tiny weights):  {ms_glue:.3f} ms", flush=True)

    with open("/root/repo/benchmarks/fused_gmm.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
