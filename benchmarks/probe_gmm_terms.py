#!/usr/bin/env python
"""On-chip probe: per-term decomposition of one grouped-GEMM step.

probe_unpack_variants measured that cheaper unpack ALU sequences change
nothing and halving the tile count buys only 12% — so the step is NOT
simply unpack-ALU-bound. Hypothesis: within one grid step the VPU
unpack and the MXU dot serialize (Mosaic does not software-pipeline
VPU work of step i+1 under the MXU dot of step i), so step time ≈
t_unpack + t_dot, and the lever is removing unpack work from the
critical path (int8-staged weights), not shaving its op count.

Variants (V2-Lite w13 shapes: K=2048, N=2816, tn=256, tm=128):
  full      unpack int4→bf16 + scale + dot       (production)
  nounpack  dot against a broadcast-of-scales w  (DMA+MXU+pipeline)
  unpackonly unpack + write a slice, no dot      (DMA+VPU+pipeline)
  copy      write x slice                        (pipeline floor)
  int8      bits=8 weights: cast+scale + dot     (the staging lever:
            2× weight bytes, ~1/3 the unpack ops)
"""
from __future__ import annotations

import functools
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

assert jax.default_backend() == "tpu", jax.default_backend()

from krasis_tpu.config import preset_config
from krasis_tpu.ops.gmm_pallas import _plan_tiles
from krasis_tpu.ops.moe_pallas import _unpack_scale, pick_tile
from krasis_tpu.quant import random_qtensor

cfg = preset_config("deepseek-v2-lite")
T, H, I = 2048, cfg.hidden_size, cfg.moe_intermediate_size
E, K_top = cfg.n_routed_experts, cfg.num_experts_per_tok
key = jax.random.PRNGKey(0)
TM, TN = 128, 512


from _timing import timeit_ms as timeit  # noqa: E402


def _kernel(l_ref, tile_e_ref, tv_ref, x_ref, q_ref, s_ref, o_ref,
            *, bits, gs, mode):
    t = pl.program_id(0)

    @pl.when(tv_ref[t] == 1)
    def _compute():
        if mode == "copy":
            o_ref[:] = x_ref[:, : o_ref.shape[1]].astype(jnp.float32)
            return
        if mode == "nounpack":
            s = s_ref[0, 0]
            G, N = s.shape
            w = jnp.broadcast_to(s[:, None, :], (G, gs, N)).reshape(
                G * gs, N).astype(jnp.bfloat16)
            o_ref[:] = jnp.dot(x_ref[:], w,
                               preferred_element_type=jnp.float32)
            return
        w = _unpack_scale(q_ref[0, 0], s_ref[0, 0], bits, gs)
        if mode == "unpackonly":
            o_ref[:] = w[: o_ref.shape[0], :].astype(jnp.float32)
        else:  # full
            o_ref[:] = jnp.dot(x_ref[:], w,
                               preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("mode",))
def gmm_mode(x_tiles, w, tile_experts, tile_valid, mode="full"):
    Mp, K = x_tiles.shape
    N = w.n_dim
    gs = w.group_size
    q4, s4 = w.q[None], w.scales[None]
    layer_arr = jnp.zeros((1,), jnp.int32)
    rows = q4.shape[-2]
    tn = pick_tile(N, TN)
    n_tiles = Mp // TM
    grid = (n_tiles, N // tn)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TM, K),
                         lambda t, j, l, e, v: (jnp.where(v[t] == 1, t, 0), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, rows, tn),
                         lambda t, j, l, e, v: (
                             l[0], e[t], 0, jnp.where(v[t] == 1, j, 0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, K // gs, tn),
                         lambda t, j, l, e, v: (
                             l[0], e[t], 0, jnp.where(v[t] == 1, j, 0)),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (TM, tn),
            lambda t, j, l, e, v: (jnp.where(v[t] == 1, t, n_tiles),
                                   jnp.where(v[t] == 1, j, 0)),
            memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_kernel, bits=w.bits, gs=gs, mode=mode),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Mp + TM, N), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * K * N,
            bytes_accessed=(Mp // TM) * (rows * N + (K // gs) * N * 2)
            + Mp * K * 2 + Mp * N * 4,
            transcendentals=0,
        ),
    )(layer_arr, tile_experts.astype(jnp.int32), tile_valid.astype(jnp.int32),
      x_tiles.astype(jnp.bfloat16), q4, s4)


def main():
    idx = jax.random.randint(jax.random.fold_in(key, 4), (T, K_top), 0, E)
    dest, te, tv, order, n_tiles = jax.jit(
        lambda i: _plan_tiles(i, T, K_top, E, tm=TM))(idx)
    Mp = n_tiles * TM
    x_tiles = jax.random.normal(
        jax.random.fold_in(key, 9), (Mp, H), jnp.bfloat16) * 0.1

    results = {}
    w4 = random_qtensor(jax.random.fold_in(key, 1), (E, H, 2 * I), 4, 128)
    for mode in ("copy", "nounpack", "unpackonly", "full"):
        ms = timeit(functools.partial(gmm_mode, mode=mode), x_tiles, w4, te, tv)
        results[f"w4_{mode}"] = round(ms, 3)
        print(f"int4 {mode:10s}: {ms:.3f} ms", flush=True)

    w8 = random_qtensor(jax.random.fold_in(key, 2), (E, H, 2 * I), 8, 128)
    for mode in ("unpackonly", "full"):
        ms = timeit(functools.partial(gmm_mode, mode=mode), x_tiles, w8, te, tv)
        results[f"w8_{mode}"] = round(ms, 3)
        print(f"int8 {mode:10s}: {ms:.3f} ms", flush=True)

    with open("/root/repo/benchmarks/gmm_terms.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
