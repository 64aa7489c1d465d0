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

Params use the pattern-stacked layout (models/params.py): pattern expert
leaves are [reps, E, ...] → sharded on dim 1; prefix expert leaves
[E, ...] → dim 0. GSPMD inserts the all-reduce of partial MoE outputs
(the analog of the reference's masked-expert partial-sum across GPUs).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import ModelConfig
from ..quant import QTensor

EXPERT_KEYS = ("w13", "w2")
EXPERT_BIAS_KEYS = ("w13_bias", "w2_bias")


def make_mesh(n_devices: Optional[int] = None, dp: int = 1) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    if len(devs) < n:
        raise ValueError(
            f"need {n} devices, have {len(devs)} "
            "(for CPU testing set XLA_FLAGS=--xla_force_host_platform_device_count)"
        )
    ep = n // dp
    return Mesh(np.asarray(devs[:n]).reshape(dp, ep), ("dp", "ep"))


def init_distributed(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host bring-up: initialize jax.distributed from args or the
    standard env vars (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    JAX_PROCESS_ID; TPU pods also auto-detect). Idempotent. The reference
    has no multi-node story at all (SURVEY §2.3 'Multi-node is NOT
    tested'); on TPU this is one call + the right mesh."""
    import os

    if jax.process_count() > 1:
        return  # already initialized
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator is None and num_processes is None:
        return  # single-process run; nothing to do
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_multihost_mesh(
    dp: Optional[int] = None, ep_per_host: Optional[int] = None
) -> Mesh:
    """dp × ep mesh for multi-host serving: ``ep`` spans each host's
    chips (MoE psum combine rides ICI), ``dp`` spans hosts (data-parallel
    slots need no inter-host collective in the serving path, so the slow
    DCN hop is kept off the per-layer critical path — the scaling-book
    recipe of mapping the chatty axis to ICI).

    Degenerates to the single-host mesh when process_count == 1."""
    from jax.experimental import mesh_utils

    n_proc = jax.process_count()
    local = jax.local_device_count()
    dp = dp or n_proc
    ep = ep_per_host or (jax.device_count() // dp)
    if n_proc == 1:
        return make_mesh(dp * ep, dp=dp)
    devs = mesh_utils.create_hybrid_device_mesh(
        (1, ep), (dp, 1), allow_split_physical_axes=True
    )
    return Mesh(devs, ("dp", "ep"))


def _put(leaf, mesh: Mesh, spec: P):
    return jax.device_put(leaf, NamedSharding(mesh, spec))


# attention weights sharded over heads when divisible (tensor parallel on
# the same mesh axis as EP — the natural TPU upgrade the reference lacks,
# SURVEY §2.3 "TP ... ABSENT")
_TP_OUT = ("q_proj", "k_proj", "v_proj", "q_b_proj")   # shard output dim
_TP_IN = ("o_proj",)                                   # shard input dim
_TP_HEAD0 = ("w_kc", "w_vc")                           # shard head dim 0


def _shard_layer(
    lp: Dict[str, Any], mesh: Mesh, stacked: bool, cfg: ModelConfig,
    shard_attention: bool = True,
) -> Dict[str, Any]:
    """Experts over ep (dim 1 when pattern-stacked, else 0); attention
    head-sharded over the same axis when head counts divide; rest
    replicated."""
    e_dim = 1 if stacked else 0
    off = 1 if stacked else 0
    mp = mesh.shape["ep"]

    def espec(ndim):
        s = [None] * ndim
        s[e_dim] = "ep"
        return P(*s)

    def dimspec(ndim, dim):
        s = [None] * ndim
        s[dim] = "ep"
        return P(*s)

    hq, hkv = cfg.num_attention_heads, cfg.num_key_value_heads
    tp_ok = shard_attention and hq % mp == 0 and hkv % mp == 0

    # Folded shared experts (models/params.fold_shared_experts) are a
    # single-chip decode optimization: the mesh path computes shared
    # densely and E+n_virt breaks ep divisibility — strip the virtual
    # rows before sharding.
    E_r = cfg.n_routed_experts

    def strip_virtual(w):
        if isinstance(w, QTensor) and w.q.shape[-3] > E_r:
            return QTensor(
                jnp.take(w.q, jnp.arange(E_r), axis=-3),
                jnp.take(w.scales, jnp.arange(E_r), axis=-3),
                w.bits, w.group_size)
        if (not isinstance(w, QTensor) and hasattr(w, "shape")
                and w.ndim >= 3 and w.shape[-3] > E_r):
            return jnp.take(w, jnp.arange(E_r), axis=-3)
        return w

    lp = {name: (strip_virtual(w) if name in EXPERT_KEYS else w)
          for name, w in lp.items()}

    out = {}
    for name, w in lp.items():
        if name in EXPERT_KEYS and isinstance(w, QTensor):
            out[name] = QTensor(
                q=_put(w.q, mesh, espec(w.q.ndim)),
                scales=_put(w.scales, mesh, espec(w.scales.ndim)),
                bits=w.bits, group_size=w.group_size,
            )
        elif name in EXPERT_BIAS_KEYS:
            out[name] = _put(w, mesh, espec(w.ndim))
        elif tp_ok and name in _TP_OUT and not isinstance(w, QTensor):
            out[name] = _put(w, mesh, dimspec(w.ndim, w.ndim - 1))
        elif tp_ok and name in _TP_IN and not isinstance(w, QTensor):
            out[name] = _put(w, mesh, dimspec(w.ndim, off))
        elif tp_ok and name in _TP_HEAD0:
            out[name] = _put(w, mesh, dimspec(w.ndim, off))
        else:
            out[name] = jax.tree_util.tree_map(
                lambda l: _put(l, mesh, P()), w
            )
    return out


def shard_params(params: Dict[str, Any], cfg: ModelConfig, mesh: Mesh):
    out = {
        "embed": _put(params["embed"], mesh, P()),
        "final_norm": _put(params["final_norm"], mesh, P()),
        "lm_head": jax.tree_util.tree_map(
            lambda l: _put(l, mesh, P()), params["lm_head"]
        ),
        "prefix_layers": [
            _shard_layer(lp, mesh, stacked=False, cfg=cfg)
            for lp in params["prefix_layers"]
        ],
        "pattern": [
            _shard_layer(lp, mesh, stacked=True, cfg=cfg)
            for lp in params["pattern"]
        ],
    }
    if "mtp" in params:
        mtp = dict(params["mtp"])
        layer = mtp.pop("layer")
        out["mtp"] = jax.tree_util.tree_map(
            lambda l: _put(l, mesh, P()), mtp)
        out["mtp"]["layer"] = _shard_layer(layer, mesh, stacked=False,
                                           cfg=cfg)
    return out


def cache_shardings(cache, mesh: Mesh):
    """Cache sharded over dp on the slot (batch) dim: dim 0 for prefix
    layers and `length`, dim 1 for pattern-stacked leaves."""

    def put_with_batch_dim(leaf, b_dim):
        s = [None] * leaf.ndim
        s[b_dim] = "dp"
        return _put(leaf, mesh, P(*s))

    out = {
        "prefix_layers": [
            jax.tree_util.tree_map(lambda l: put_with_batch_dim(l, 0), lc)
            for lc in cache["prefix_layers"]
        ],
        "pattern": [
            jax.tree_util.tree_map(lambda l: put_with_batch_dim(l, 1), lc)
            for lc in cache["pattern"]
        ],
        "length": put_with_batch_dim(cache["length"], 0),
    }
    return out
