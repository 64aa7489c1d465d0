#!/usr/bin/env python
"""On-chip study: what does the gathered decode-MoE kernel pay for?

Isolates, at V2-Lite expert shapes (H=2048, I=1408, gs=128):
  A. DMA floor   — kernel that only streams the packed expert bytes
                   (no unpack, no dot): the achievable HBM bandwidth
                   for the gathered access pattern.
  B. W4A16       — production dequant-to-bf16 kernel (baseline).
  C. W4A8        — int8-unpack + int8 MXU kernel (current opt-in).
  D. int4-native — can Mosaic feed the MXU int4 operands directly
                   (no per-element unpack at all)?  Tests jnp.dot with
                   an int4-dtype ref, and int4 x int8 mixes.
  E. unpack ops  — cheaper VPU unpack variants (shift sign-extend vs
                   mask-xor-sub).

Timing protocol: each variant queues ITERS independent async dispatches
of the same args and blocks once at the end (see timed()): the queue
drains at kernel speed, so per-iter time approaches on-chip kernel time
while the relay's ~28 ms dispatch cost amortizes across the queue.
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from krasis_tpu.quant import quantize
from krasis_tpu.ops.moe_pallas import (
    moe_gathered_pallas, moe_gathered_w4a8_pallas)

E, H, I, GS = 64, 2048, 1408, 128
K_TOP = 6
ITERS = 32

assert jax.default_backend() == "tpu", jax.default_backend()

key = jax.random.PRNGKey(0)
w13f = jax.random.normal(key, (E, H, 2 * I), jnp.float32) * 0.05
w2f = jax.random.normal(key, (E, I, H), jnp.float32) * 0.05
w13 = quantize(w13f, bits=4, group_size=GS)
w2 = quantize(w2f, bits=4, group_size=GS)
print("packed shapes:", w13.q.shape, w2.q.shape, file=sys.stderr)

T = 1
x0 = jax.random.normal(key, (T, H), jnp.bfloat16)
idx = jnp.arange(K_TOP, dtype=jnp.int32)[None, :] * 3  # spread experts
wts = jnp.full((T, K_TOP), 1.0 / K_TOP, jnp.float32)

# bytes one expert pick streams: packed int4 weights + bf16 group scales
# (kernels in sections B/C read both)
PICK_BYTES = (
    w13.q.shape[-2] * w13.q.shape[-1] + w2.q.shape[-2] * w2.q.shape[-1]
    + 2 * (w13.scales.shape[-2] * w13.scales.shape[-1]
           + w2.scales.shape[-2] * w2.scales.shape[-1])
)


def timed(name, fn, *args, bytes_per_iter=None):
    """Async-dispatch timing: queue ITERS calls, one final readback.

    (A jitted fori_loop around a pallas_call hangs the relay's remote
    compile; queued dispatches overlap execution, so the queue drains at
    kernel speed — the style probe_w4a8.py validated in round 2.)"""
    out = fn(*args)
    jax.block_until_ready(out)  # compile
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / ITERS
    bw = f"  {bytes_per_iter / dt / 1e9:7.1f} GB/s" if bytes_per_iter else ""
    print(f"{name:28s} {dt * 1e3:8.3f} ms/iter{bw}", flush=True)
    return dt


def loop(body):
    f = jax.jit(body)
    return lambda x: f(x, w13, w2)


# ---------------------------------------------------------------- A. DMA floor
def _stream_kernel(e_ref, q13_ref, q2_ref, o_ref):
    p = pl.program_id(0)

    @pl.when(p == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)
    # touch every loaded byte with minimal VPU work
    o_ref[0, :] += q13_ref[0].astype(jnp.float32).sum(axis=0)[:H]
    o_ref[0, :] += q2_ref[0].astype(jnp.float32).sum(axis=0)[:H]


def stream_once(x, a, b):
    eids = idx.reshape(-1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(K_TOP,),
        in_specs=[
            pl.BlockSpec((1, w13.q.shape[-2], w13.q.shape[-1]),
                         lambda p, e: (e[p], 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w2.q.shape[-2], w2.q.shape[-1]),
                         lambda p, e: (e[p], 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H), lambda p, e: (0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _stream_kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((1, H), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=K_TOP * PICK_BYTES, bytes_accessed=K_TOP * PICK_BYTES,
            transcendentals=0),
    )(eids, a.q, b.q)


# ------------------------------------------------------------- D. int4 native
def try_int4_dot():
    """XLA-level: does dot(int8, int4) compile and run on this TPU?"""
    for adt, bdt in ((jnp.int8, jnp.int4), (jnp.int4, jnp.int4),
                     (jnp.int8, jnp.int8)):
        try:
            a = jnp.ones((8, 128), adt)
            b = jnp.ones((128, 256), bdt)
            f = jax.jit(lambda a, b: jnp.dot(
                a, b, preferred_element_type=jnp.int32))
            d = f(a, b)
            jax.block_until_ready(d)
            print(f"XLA dot({adt.__name__},{bdt.__name__}): OK ->",
                  d.dtype, d.shape, int(d[0, 0]))
        except Exception as ex:  # noqa: BLE001
            print(f"XLA dot({adt.__name__},{bdt.__name__}): FAIL:",
                  str(ex).splitlines()[0][:180])


def _int4_pallas_kernel(x_ref, w_ref, o_ref):
    o_ref[:] = jnp.dot(x_ref[:], w_ref[:],
                       preferred_element_type=jnp.int32)


def try_int4_pallas():
    """Pallas: int4-dtype ref as a dot operand."""
    try:
        x = jnp.ones((8, 128), jnp.int8)
        w = jnp.ones((128, 256), jnp.int4)
        out = pl.pallas_call(
            _int4_pallas_kernel,
            out_shape=jax.ShapeDtypeStruct((8, 256), jnp.int32),
        )(x, w)
        jax.block_until_ready(out)
        print("Pallas int4-ref dot: OK ->", int(out[0, 0]))
    except Exception as ex:  # noqa: BLE001
        print("Pallas int4-ref dot: FAIL:", str(ex).splitlines()[0][:180])


def _int4_pallas_cast_kernel(x_ref, w_ref, o_ref):
    o_ref[:] = jnp.dot(x_ref[:], w_ref[:].astype(jnp.int8),
                       preferred_element_type=jnp.int32)


def try_int4_pallas_cast():
    try:
        x = jnp.ones((8, 128), jnp.int8)
        w = jnp.ones((128, 256), jnp.int4)
        out = pl.pallas_call(
            _int4_pallas_cast_kernel,
            out_shape=jax.ShapeDtypeStruct((8, 256), jnp.int32),
        )(x, w)
        jax.block_until_ready(out)
        print("Pallas int4->int8 cast dot: OK ->", int(out[0, 0]))
    except Exception as ex:  # noqa: BLE001
        print("Pallas int4->int8 cast dot: FAIL:",
              str(ex).splitlines()[0][:180])


def _bitcast_kernel(q_ref, o_ref):
    # write a full (1, 2) block so a scalar-store limitation can't
    # masquerade as a bitcast failure
    w4 = pltpu.bitcast(q_ref[:], jnp.int4)
    o_ref[:] = jnp.array([[w4.shape[0], w4.shape[1]]], jnp.int32)


def try_bitcast():
    try:
        q = jnp.zeros((128, 256), jnp.uint8)
        out = pl.pallas_call(
            _bitcast_kernel,
            out_shape=jax.ShapeDtypeStruct((1, 2), jnp.int32),
        )(q)
        jax.block_until_ready(out)
        print("Pallas bitcast u8->int4 result shape:", np.asarray(out[0]))
    except Exception as ex:  # noqa: BLE001
        print("Pallas bitcast u8->int4: FAIL:", str(ex).splitlines()[0][:180])


# ------------------------------------------------------------ E. unpack costs
def _mk_unpack_kernel(mode):
    def k(q_ref, o_ref):
        b = q_ref[:].astype(jnp.int32)
        if mode == "maskxor":
            lo = ((b & 0xF) ^ 8) - 8
            hi = (((b >> 4) & 0xF) ^ 8) - 8
        else:
            lo = jax.lax.shift_right_arithmetic(
                jax.lax.shift_left(b, 28), 28)
            hi = jax.lax.shift_right_arithmetic(
                jax.lax.shift_left(b, 24), 28)
        w = jnp.concatenate([lo, hi], axis=0).astype(jnp.int8)
        o_ref[:] = w.astype(jnp.float32).sum(axis=0, keepdims=True)
    return k


def unpack_once(mode):
    n = w13.q.shape[-1]

    def body(x, a, b):
        return pl.pallas_call(
            _mk_unpack_kernel(mode),
            out_shape=jax.ShapeDtypeStruct((1, n), jnp.float32),
        )(a.q[0])
    return body


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("sections", nargs="*", default=["A", "B", "C", "E", "D"])
    args = ap.parse_args()
    secs = set(s.upper() for s in args.sections) or {"A", "B", "C", "E", "D"}

    bytes_iter = K_TOP * PICK_BYTES
    if "A" in secs:
        timed("A. DMA-floor stream", loop(stream_once), x0,
              bytes_per_iter=bytes_iter)
    if "B" in secs:
        timed("B. W4A16 production", loop(
            lambda x, a, b: moe_gathered_pallas(x, a, b, idx, wts)), x0,
            bytes_per_iter=bytes_iter)
    if "C" in secs:
        timed("C. W4A8 opt-in", loop(
            lambda x, a, b: moe_gathered_w4a8_pallas(x, a, b, idx, wts)), x0,
            bytes_per_iter=bytes_iter)

    eb = w13.q.shape[-2] * w13.q.shape[-1]
    if "E" in secs:
        print("== E. unpack-only (one expert w13, %.1f MB) ==" % (eb / 1e6))
        timed("E. unpack mask-xor-sub", loop(unpack_once("maskxor")), x0,
              bytes_per_iter=eb)
        timed("E. unpack shl/sar", loop(unpack_once("shift")), x0,
              bytes_per_iter=eb)

    if "D" in secs:
        print("== D. native int4 support ==")
        try_int4_pallas()
        try_int4_pallas_cast()
        try_bitcast()
        try_int4_dot()


if __name__ == "__main__":
    main()
