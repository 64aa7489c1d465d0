"""Device mesh + parameter/cache sharding specs.

Replaces the reference's hand-rolled multi-GPU communication (CUDA P2P
probing, pinned-CPU-hub collectives, per-rank expert slices —
reference python/krasis/model.py:42-66,297-372, gpu_prefill.py:350-364)
with a jax.sharding.Mesh and GSPMD-propagated collectives over ICI.

Mesh axes:
* ``dp`` — data parallel over batch slots (decode throughput scaling);
* ``ep`` — expert parallel: routed expert stacks sharded on the expert
  dim; attention/dense weights replicated across ``ep`` (matches the
  reference's EP-only multi-GPU strategy, SURVEY §2.3) — tensor-parallel
  attention is layered on later via head sharding on the same axis.

GSPMD inserts the all-reduce of partial MoE outputs (the analog of the
reference's masked-expert partial-sum across GPUs).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import ModelConfig
from ..models.params import layer_specs
from ..quant import QTensor


def make_mesh(n_devices: Optional[int] = None, dp: int = 1) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    ep = n // dp
    return Mesh(np.asarray(devs[:n]).reshape(dp, ep), ("dp", "ep"))


def param_shardings(cfg: ModelConfig, mesh: Mesh) -> Dict[str, Any]:
    """PartitionSpec pytree matching the params pytree: experts sharded on
    the expert dim over `ep`, everything else replicated."""
    rep = P()
    exp3 = P("ep", None, None)   # [E, K, N] expert stacks
    exp2 = P("ep", None)         # [E, N] scales-lead / biases

    def qspec(spec3, spec2):
        return QTensor(q=spec3, scales=spec3, bits=0, group_size=0)  # type: ignore

    out: Dict[str, Any] = {
        "embed": rep, "final_norm": rep,
        "lm_head": rep, "layers": [],
    }
    params_template_keys = None  # layer dicts are built per spec below

    for i, spec in enumerate(layer_specs(cfg)):
        lp: Dict[str, Any] = {}
        # everything defaults to replicated; experts get the ep shard
        if spec.mlp_kind == "moe":
            lp["w13"] = QTensor(q=exp3, scales=exp3, bits=0, group_size=0)
            lp["w2"] = QTensor(q=exp3, scales=exp3, bits=0, group_size=0)
            if cfg.model_type == "gpt_oss":
                lp["w13_bias"] = exp2
                lp["w2_bias"] = exp2
        out["layers"].append(lp)
    return out


def shard_params(params: Dict[str, Any], cfg: ModelConfig, mesh: Mesh):
    """device_put each leaf with its sharding (experts over ep)."""
    def put(leaf, s):
        return jax.device_put(leaf, NamedSharding(mesh, s))

    specs = param_shardings(cfg, mesh)
    out = {
        "embed": put(params["embed"], P()),
        "final_norm": put(params["final_norm"], P()),
        "lm_head": jax.tree_util.tree_map(
            lambda l: put(l, P()), params["lm_head"]
        ),
        "layers": [],
    }
    for lp, ls in zip(params["layers"], specs["layers"]):
        new_lp = {}
        for name, w in lp.items():
            if name in ("w13", "w2") and isinstance(w, QTensor):
                new_lp[name] = QTensor(
                    q=put(w.q, P("ep", None, None)),
                    scales=put(w.scales, P("ep", None, None)),
                    bits=w.bits, group_size=w.group_size,
                )
            elif name in ("w13_bias", "w2_bias"):
                new_lp[name] = put(w, P("ep", None))
            else:
                new_lp[name] = jax.tree_util.tree_map(lambda l: put(l, P()), w)
        out["layers"].append(new_lp)
    return out


def cache_shardings(cache, mesh: Mesh):
    """Cache sharded over dp on the batch (slot) dim."""
    def spec_for(leaf):
        return NamedSharding(mesh, P("dp", *([None] * (leaf.ndim - 1))))

    return jax.tree_util.tree_map(
        lambda l: jax.device_put(l, spec_for(l)), cache
    )
