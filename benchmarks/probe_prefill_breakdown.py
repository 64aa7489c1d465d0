#!/usr/bin/env python
"""On-chip probe: where does a 2048-token V2-Lite prefill chunk spend
its time? Times the MoE grouped GEMM, the MLA flash attention, the
dense projections, and the full layer in isolation at production shapes
so the sum can be compared against the measured per-layer cost (whole
prefill / 27 layers). Drives prefill-optimization decisions with data
instead of guesses.
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

assert jax.default_backend() == "tpu", jax.default_backend()

from krasis_tpu.config import QuantConfig, preset_config
from krasis_tpu.ops import flash_attention as fa
from krasis_tpu.ops.gmm_pallas import moe_prefill_pallas
from krasis_tpu.quant import random_qtensor

cfg = preset_config("deepseek-v2-lite")
q = QuantConfig()
T, H, I, E, K = 2048, cfg.hidden_size, cfg.moe_intermediate_size, \
    cfg.n_routed_experts, cfg.num_experts_per_tok
key = jax.random.PRNGKey(0)


from _timing import timeit_ms as timeit  # noqa: E402


# --- MoE grouped GEMM (both stages + glue) at one layer's shapes ------
w13 = random_qtensor(jax.random.fold_in(key, 1), (E, H, 2 * I), 4, 128)
w2 = random_qtensor(jax.random.fold_in(key, 2), (E, I, H), 4, 128)
x = jax.random.normal(jax.random.fold_in(key, 3), (T, H), jnp.bfloat16) * 0.1
idx = jax.random.randint(jax.random.fold_in(key, 4), (T, K), 0, E)
wts = jax.nn.softmax(jax.random.normal(jax.random.fold_in(key, 5), (T, K)))

# weights as ARGUMENTS, not closure constants (413 from remote compile)
moe_fn = jax.jit(
    lambda x, i, w, w13, w2: moe_prefill_pallas(x, w13, w2, i, w))
ms_moe = timeit(moe_fn, x, idx, wts, w13, w2)
flops = 2 * T * K * (H * 2 * I + I * H)
print(f"MoE layer (grouped, T={T} k={K}): {ms_moe:.2f} ms "
      f"({flops/ms_moe/1e9:.0f} GF/s)", flush=True)

# glue-only variant: weights swapped for tiny stacks isolates sort/scatter
w13t = random_qtensor(jax.random.fold_in(key, 6), (E, 256, 256), 4, 128)
w2t = random_qtensor(jax.random.fold_in(key, 7), (E, 128, 256), 4, 128)
xt = x[:, :256]
glue_fn = jax.jit(
    lambda x, i, w, w13t, w2t: moe_prefill_pallas(x, w13t, w2t, i, w))
ms_glue = timeit(glue_fn, xt, idx, wts, w13t, w2t)
print(f"MoE glue floor (tiny weights):    {ms_glue:.2f} ms", flush=True)

# --- MLA flash attention at 2048 --------------------------------------
hq = cfg.num_attention_heads
L, dr = cfg.kv_lora_rank, cfg.qk_rope_head_dim
Dp = 640  # lane_pad(512 + 64)
qv = jax.random.normal(jax.random.fold_in(key, 8), (1, T, hq, Dp),
                       jnp.bfloat16) * 0.1
kv = jax.random.normal(jax.random.fold_in(key, 9), (1, T, 1, Dp),
                       jnp.bfloat16) * 0.1
q_off = jnp.zeros((1,), jnp.int32)
kv_len = jnp.full((1,), T, jnp.int32)
att_fn = jax.jit(lambda qv, kv: fa.flash_attention(
    qv, kv, None, q_off, kv_len, 0.05, v_from_k=True, v_dim=L))
ms_att = timeit(att_fn, qv, kv)
att_flops = 2 * hq * T * T // 2 * (Dp + L)
print(f"MLA flash attention (S={T}):      {ms_att:.2f} ms "
      f"({att_flops/ms_att/1e9:.0f} GF/s)", flush=True)

# --- dense projections (attention in/out, one layer) -------------------
from krasis_tpu.ops.qmm import linear

wq = jax.random.normal(jax.random.fold_in(key, 10), (H, hq * 192),
                       jnp.bfloat16) * 0.02
wkv = jax.random.normal(jax.random.fold_in(key, 11), (H, L + dr),
                        jnp.bfloat16) * 0.02
wo = jax.random.normal(jax.random.fold_in(key, 12), (hq * 128, H),
                       jnp.bfloat16) * 0.02
xo = jax.random.normal(jax.random.fold_in(key, 13), (1, T, hq * 128),
                       jnp.bfloat16) * 0.1
x3 = x[None]
proj_fn = jax.jit(lambda x3, xo, wq, wkv, wo: (
    linear(x3, wq), linear(x3, wkv), linear(xo, wo)))
ms_proj = timeit(proj_fn, x3, xo, wq, wkv, wo)
print(f"attention projections:            {ms_proj:.2f} ms", flush=True)

# --- whole-model reference: one prefill chunk / layers ----------------
from krasis_tpu.models.params import init_synthetic_params
from krasis_tpu.runtime.engine import Engine

params = init_synthetic_params(cfg, q, jax.random.PRNGKey(0))
eng = Engine(cfg, q, params, max_len=4096)
rng = np.random.default_rng(0)
prompt = rng.integers(100, cfg.vocab_size - 100, 2048).tolist()
r = eng.generate(prompt, max_new_tokens=2)   # warm
t0 = time.perf_counter()
reps = 5
for _ in range(reps):
    r = eng.generate(prompt, max_new_tokens=2)
full_ms = 0.0
for _ in range(3):
    r = eng.generate(prompt, max_new_tokens=2)
    full_ms += r.prefill_s * 1e3 / 3
n_layers = cfg.num_hidden_layers
print(f"full prefill 2048: {full_ms:.1f} ms "
      f"({2048/full_ms*1e3:.0f} tok/s) -> {full_ms/n_layers:.2f} ms/layer "
      f"vs components {ms_moe + ms_att + ms_proj:.2f} ms/layer "
      f"(moe {ms_moe:.2f} + attn {ms_att:.2f} + proj {ms_proj:.2f})",
      flush=True)
