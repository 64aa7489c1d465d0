"""Pipeline parallelism: layer stages sharded over a ``pp`` mesh axis.

TPU-native re-design of the reference's PP (reference
python/krasis/config.py:529-581 `compute_pp_partition`/`build_pp_ranks`,
model.py:2279-2289 hidden-state hop between GPUs; tested there by
tests/test_pp2_*.py). The reference deprecates PP in practice
("Multi-GPU uses EP, not PP", launcher.py:971-975) and so do we — EP+dp
is the throughput story — but PP remains the capacity lever when one
chip cannot hold even its expert shard, so it is wired and tested.

Design: the model forward already scans a rep-stacked layer pattern
(models/params.py), so PP falls out of sharding the **rep axis**: a
``pp``-axis mesh gives each device ``reps/pp`` contiguous repetitions of
the pattern (= a contiguous block of layers — the same contiguous-range
stage split as the reference's `compute_pp_partition`). Under
`shard_map`, every device runs the ordinary `run_pattern_scan` on its
LOCAL parameter/cache slice and hands the hidden state to the next stage
with `ppermute` over ICI.

SPMD pipeline schedule (single microbatch): all stages compute every
iteration; stage s's input is only *valid* at iteration s, so its cache
update is committed exactly then (`jnp.where` select). pp iterations of
reps/pp repetitions each = the same total layer work as the unsharded
forward, executed pp-way-replicated — wall-clock parity with serial PP
(one stage active at a time is inherent to a 1-microbatch pipeline) at
1/pp the per-device weight memory, which is the point. Embedding, prefix
layers, final norm, and lm_head are small and run replicated.

Numerics are exactly the unsharded computation (same kernels, same
order); sharded == unsharded is asserted by tests/test_parallel.py's PP
cases on the virtual CPU mesh, including with the Pallas MoE kernels in
interpret mode.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import ModelConfig, QuantConfig
from .ep import _smap


def make_pp_mesh(n_devices: Optional[int] = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.asarray(devs[:n]).reshape(n), ("pp",))


def pp_supported(cfg: ModelConfig, mesh: Optional[Mesh]) -> bool:
    from ..models.params import pattern_info

    if mesh is None or "pp" not in mesh.axis_names:
        return False
    pp = mesh.shape["pp"]
    if pp <= 1:
        return False
    info = pattern_info(cfg)
    return info.reps > 0 and info.reps % pp == 0


def _rep_spec(leaf) -> P:
    s: list = [None] * leaf.ndim
    s[0] = "pp"
    return P(*s)


def _replicated(tree):
    return jax.tree_util.tree_map(lambda _: P(), tree)


def param_specs(params: Dict[str, Any]) -> Dict[str, Any]:
    """PartitionSpec pytree: pattern leaves sharded on the rep dim over
    ``pp``; everything else replicated."""
    return {
        "embed": P(),
        "final_norm": P(),
        "lm_head": _replicated(params["lm_head"]),
        "prefix_layers": _replicated(params["prefix_layers"]),
        "pattern": jax.tree_util.tree_map(_rep_spec, params["pattern"]),
    }


def cache_specs(cache: Dict[str, Any]) -> Dict[str, Any]:
    return {
        "prefix_layers": _replicated(cache["prefix_layers"]),
        "pattern": jax.tree_util.tree_map(_rep_spec, cache["pattern"]),
        "length": P(),
    }


def _place(tree, specs, mesh: Mesh):
    return jax.tree_util.tree_map(
        lambda l, s: jax.device_put(l, NamedSharding(mesh, s)), tree, specs
    )


def pp_shard_params(params, mesh: Mesh):
    return _place(params, param_specs(params), mesh)


def pp_shard_cache(cache, mesh: Mesh):
    return _place(cache, cache_specs(cache), mesh)


def forward_pp(
    params: Dict[str, Any],
    tokens: jax.Array,     # [B, S] int32
    seq_lens: jax.Array,   # [B]
    cache: Dict[str, Any],
    cfg: ModelConfig,
    quant: QuantConfig,
    mesh: Mesh,
    prefill: bool,
    return_all_logits: bool = False,
    history: int = 0,
):
    """Pipeline-parallel forward: identical numerics to models.model.forward
    with the pattern reps sharded over the ``pp`` mesh axis."""
    from ..models.model import make_layer_step, run_pattern_scan
    from ..models.params import layer_specs, pattern_info
    from ..ops.norm import rms_norm
    from ..ops.qmm import linear

    info = pattern_info(cfg)
    specs = layer_specs(cfg)
    pp = mesh.shape["pp"]
    if not pp_supported(cfg, mesh):
        raise ValueError(
            f"PP needs pattern reps divisible by pp: reps={info.reps}, pp={pp}"
        )
    local_reps = info.reps // pp
    pat_specs = specs[info.prefix_n : info.prefix_n + info.period]

    def worker(params, tokens, seq_lens, cache):
        rank = jax.lax.axis_index("pp")
        B, S = tokens.shape
        length = cache["length"]
        positions = length[:, None] + jnp.arange(S)[None, :]
        valid = jnp.arange(S)[None, :] < seq_lens[:, None]
        kv_len = length + seq_lens

        x = jnp.take(params["embed"], tokens, axis=0)
        layer_step = make_layer_step(
            cfg, prefill=prefill, history=history, mesh=None,
            positions=positions, valid=valid, kv_len=kv_len,
        )

        # prefix layers: small, replicated compute on every stage
        new_prefix = []
        for i, lp in enumerate(params["prefix_layers"]):
            x, nlc = layer_step(x, lp, cache["prefix_layers"][i], specs[i])
            new_prefix.append(nlc)

        # pipeline over stages: every device scans its local reps each
        # iteration; stage s's input is valid exactly at iteration s, so
        # only then is its cache slice committed. The hidden state rides
        # ICI between consecutive stages (ppermute ring).
        cur_cache = cache["pattern"]
        perm = [(i, (i + 1) % pp) for i in range(pp)]
        final = x
        for it in range(pp):
            y, new_c = run_pattern_scan(
                x, params["pattern"], cur_cache, pat_specs,
                local_reps, layer_step, prefill,
            )
            active = rank == it
            cur_cache = jax.tree_util.tree_map(
                lambda n, o: jnp.where(active, n, o), new_c, cur_cache
            )
            if it < pp - 1:
                x = jax.lax.ppermute(y, "pp", perm)
            else:
                final = y

        # the last stage holds the real output; broadcast it
        x = jax.lax.psum(
            jnp.where(rank == pp - 1, final, jnp.zeros_like(final)), "pp"
        )

        x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps,
                     cfg.norm_plus_one)
        if not return_all_logits:
            idx = jnp.maximum(seq_lens - 1, 0)
            x = jnp.take_along_axis(x, idx[:, None, None], axis=1)[:, 0]
        logits = linear(x, params["lm_head"], out_dtype=jnp.float32)

        new_cache = {
            "prefix_layers": new_prefix,
            "pattern": cur_cache,
            "length": kv_len,
        }
        return logits, new_cache

    in_specs = (param_specs(params), P(), P(), cache_specs(cache))
    out_specs = (P(), cache_specs(cache))
    return _smap(worker, mesh, in_specs, out_specs)(
        params, tokens, seq_lens, cache
    )


def make_pp_forward_fns(cfg: ModelConfig, quant: QuantConfig, mesh: Mesh):
    """(prefill_fn, decode_fn, prefill_all_logits_fn) mirroring
    models.model.make_forward_fns, pipeline-parallel over ``pp``."""

    def prefill_fn(params, tokens, seq_lens, cache):
        return forward_pp(params, tokens, seq_lens, cache, cfg, quant,
                          mesh, prefill=True)

    def decode_fn(params, tokens, cache):
        seq_lens = jnp.ones((tokens.shape[0],), jnp.int32)
        return forward_pp(params, tokens, seq_lens, cache, cfg, quant,
                          mesh, prefill=False)

    def prefill_all_logits_fn(params, tokens, seq_lens, cache):
        return forward_pp(params, tokens, seq_lens, cache, cfg, quant,
                          mesh, prefill=True, return_all_logits=True)

    return prefill_fn, decode_fn, prefill_all_logits_fn
