"""Sequence parallelism: prefill MLP tokens sharded over an ``sp`` axis.

The reference has no sequence/context parallelism (SURVEY §2.3: absent —
single-sequence server); this is a TPU capability addition for long-
context prefill when more chips are available than EP needs.

Design (why MLP-token SP and not attention SP): prefill FLOPs are
dominated by the MoE/dense MLPs (per-token, embarrassingly parallel
over S); attention is the small term but couples positions causally,
and DeltaNet is a recurrence that cannot split over S at all. So the
activations stay REPLICATED through embedding/attention/norms — every
shard computes identical attention and writes an identical KV cache
(which therefore stays replicated, ready for ordinary decode) — and
each layer's MLP computes only this shard's token slice, all_gathering
outputs (one [S/n, H] gather per layer over ICI). Hybrid models work
unchanged: the DeltaNet core runs replicated, its MoE still shards.

Upper bound: speedup on the MLP share of prefill time (Amdahl on the
replicated attention/DeltaNet part); combine with ``ep`` on a second
axis when expert capacity also binds.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..config import ModelConfig, QuantConfig
from .ep import _smap


def make_sp_mesh(n_devices: Optional[int] = None, ep: int = 1) -> Mesh:
    """1D ``sp`` mesh, or a 2D ``sp × ep`` mesh when ep > 1 (tokens split
    over `sp`, experts over `ep` — the composed long-context-prefill
    layout for pods bigger than the expert count needs)."""
    devs = jax.devices()
    n = n_devices or len(devs)
    if ep > 1:
        assert n % ep == 0, (n, ep)
        return Mesh(np.asarray(devs[:n]).reshape(n // ep, ep), ("sp", "ep"))
    return Mesh(np.asarray(devs[:n]).reshape(n), ("sp",))


def _expert_pspec(leaf) -> P:
    """Expert-dim spec: dim 0 for [E,...] leaves, dim 1 for stacked
    [L, E, ...] leaves (QTensor q/scales are ndim-3; biases ndim-2)."""
    s: list = [None] * leaf.ndim
    s[max(leaf.ndim - 3, 0) if leaf.ndim >= 3 else 0] = "ep"
    return P(*s)


def _bias_pspec(leaf) -> P:
    s: list = [None] * leaf.ndim
    s[leaf.ndim - 2] = "ep"
    return P(*s)


def param_pspecs(params, ep: bool):
    """PartitionSpec pytree for shard_map in_specs: expert stacks (and
    their biases) sharded over ``ep``; everything else replicated."""
    import jax.tree_util as jtu

    if not ep:
        return jtu.tree_map(lambda _: P(), params)

    def layer_specs(lp):
        out = {}
        for k, v in lp.items():
            if k in ("w13", "w2"):
                out[k] = jtu.tree_map(_expert_pspec, v)
            elif k in ("w13_bias", "w2_bias") and v is not None:
                out[k] = _bias_pspec(v)
            else:
                out[k] = jtu.tree_map(lambda _: P(), v)
        return out

    return {
        "embed": P(),
        "final_norm": P(),
        "lm_head": jtu.tree_map(lambda _: P(), params["lm_head"]),
        "prefix_layers": [layer_specs(lp) for lp in params["prefix_layers"]],
        "pattern": [layer_specs(lp) for lp in params["pattern"]],
    }


def sp_supported(mesh: Optional[Mesh]) -> bool:
    return (mesh is not None and "sp" in mesh.axis_names
            and mesh.shape["sp"] > 1)


def make_sp_prefill_fns(cfg: ModelConfig, quant: QuantConfig, mesh: Mesh):
    """(prefill_fn, chunk_fn_factory) running the production forward
    inside shard_map over ``sp``. Everything is replicated in and out;
    the token split is internal to each layer's MLP (models/model._mlp).
    The returned cache is replicated and valid for the regular decode
    path."""
    from ..models.model import forward, make_chunk_prefill_fn

    ep = "ep" in mesh.axis_names and mesh.shape["ep"] > 1
    ep_axis = "ep" if ep else None

    def _wrap(history: int):
        def worker(params, tokens, seq_lens, cache):
            return forward(params, tokens, seq_lens, cache, cfg, quant,
                           prefill=True, history=history, sp_axis="sp",
                           ep_axis=ep_axis)

        def fn(params, tokens, seq_lens, cache):
            return _smap(
                worker, mesh,
                in_specs=(param_pspecs(params, ep), P(), P(), P()),
                out_specs=(P(), P()),
            )(params, tokens, seq_lens, cache)

        return fn

    prefill_fn = _wrap(history=0)

    def chunk_fn_factory(history: int):
        return _wrap(history=history)

    return prefill_fn, chunk_fn_factory
