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


def make_sp_mesh(n_devices: Optional[int] = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.asarray(devs[:n]).reshape(n), ("sp",))


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

    def _wrap(history: int):
        def worker(params, tokens, seq_lens, cache):
            return forward(params, tokens, seq_lens, cache, cfg, quant,
                           prefill=True, history=history, sp_axis="sp")

        def fn(params, tokens, seq_lens, cache):
            return _smap(
                worker, mesh,
                in_specs=(P(), P(), P(), P()),
                out_specs=(P(), P()),
            )(params, tokens, seq_lens, cache)

        return fn

    prefill_fn = _wrap(history=0)

    def chunk_fn_factory(history: int):
        return _wrap(history=history)

    return prefill_fn, chunk_fn_factory
