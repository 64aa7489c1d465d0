"""Expert-parallel MoE dispatch: explicit shard_map over the `ep` axis.

The TPU-native re-design of the reference's multi-GPU expert engine
(reference python/krasis/model.py:2719-2835 per-GPU expert slices with
masked partial sums; gpu_prefill.py:350-364 concurrent per-GPU dispatch).
GSPMD auto-sharding cannot partition the Pallas MoE kernels (their
scalar-prefetched expert-index maps address the FULL expert stack), so
the MoE block runs under `shard_map` instead: every device holds a
contiguous slice of E/ep experts, converts the replicated global top-k
ids to shard-local ids, runs the SAME Pallas kernels on its local slice,
and the partial outputs are `psum`-combined over the ICI ring.

Numerics are exactly the unsharded computation — no capacity factor, no
token dropping (every pick is computed by exactly one shard; remote
picks carry zero weight locally). Per-shard cost:

* HBM traffic: only the local experts' packed bytes (remote picks'
  index maps are redirected/pinned constant inside the kernels — see
  ops/gmm_pallas.py, ops/moe_pallas.py `pick_valid`);
* prefill MXU time: ~M/ep of the pick-GEMM tiles (trash-group tiles are
  `pl.when`-gated off);
* one [T, H] f32 psum per MoE layer over ICI — the all-to-all-free
  combine (dispatch ships no tokens because activations are replicated
  over `ep`; at decode sizes this is strictly cheaper than GShard-style
  double all_to_all, and at prefill sizes it overlaps with the next layer's
  compute under XLA's async collectives).

Tokens stay sharded over `dp` throughout, so dp×ep meshes compose.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..quant import QTensor

try:                                    # jax >= 0.8
    from jax import shard_map as _shard_map
except ImportError:                     # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map as _shard_map


def _smap(f, mesh, in_specs, out_specs):
    try:
        return _shard_map(f, mesh=mesh, in_specs=in_specs,
                          out_specs=out_specs, check_vma=False)
    except TypeError:                   # pragma: no cover - older jax
        return _shard_map(f, mesh=mesh, in_specs=in_specs,
                          out_specs=out_specs, check_rep=False)


def _expert_spec(ndim: int) -> P:
    """Shard the expert dim: dim 0 for [E, ...] leaves, dim 1 for
    pattern-stacked [L, E, ...] leaves."""
    s = [None] * ndim
    s[ndim - 3] = "ep"
    return P(*s)


def _bias_spec(ndim: int) -> P:
    s = [None] * ndim
    s[ndim - 2] = "ep"
    return P(*s)


def ep_supported(mesh: Optional[Mesh], w13, w2) -> bool:
    if mesh is None or "ep" not in mesh.axis_names:
        return False
    ep = mesh.shape["ep"]
    if ep <= 1:
        return False
    if not (isinstance(w13, QTensor) and isinstance(w2, QTensor)):
        return False
    if w13.q.ndim not in (3, 4):
        return False
    E = w13.q.shape[-3]
    return E % ep == 0


def moe_forward_ep_local(
    x: jax.Array,             # [T_local, H]
    w13_l: QTensor,           # [(L,) E_local, H(/2), 2I] — THIS shard's slice
    w2_l: QTensor,
    topk_idx: jax.Array,      # [T_local, k] GLOBAL expert ids
    topk_weights: jax.Array,
    *,
    axis: str = "ep",
    swiglu_limit: float = 0.0,
    gpt_oss: bool = False,
    w13_bias=None,
    w2_bias=None,
    layer_idx=None,
    activation: str = "bf16",
) -> jax.Array:
    """EP MoE body for use INSIDE an ambient shard_map that has `axis`
    in scope and the expert stacks already sharded (moe_forward_ep wraps
    this in its own shard_map; parallel/sp.py composes it under sp×ep).

    Global → shard-local expert ids. Remote picks: weight 0, and the id
    is replaced by the row's last LOCAL pick (valids sorted first) so
    the kernels' redirected index maps stay constant over the remote
    tail — no extra weight DMA. Rows with no local pick clamp to expert
    0 (one cheap fetch, zero contribution)."""
    from ..ops.moe import moe_forward  # deferred: avoids import cycle

    rank = jax.lax.axis_index(axis)
    e_dim = w13_l.q.ndim - 3
    E_local = w13_l.q.shape[e_dim]

    local = topk_idx - rank * E_local
    valid = (local >= 0) & (local < E_local)
    order = jnp.argsort((~valid).astype(jnp.int8), axis=1, stable=True)
    local_s = jnp.take_along_axis(local, order, axis=1)
    valid_s = jnp.take_along_axis(valid, order, axis=1)
    wts_s = jnp.where(
        valid_s, jnp.take_along_axis(topk_weights, order, axis=1), 0.0)
    # Fill the invalid tail with the row's LAST valid id (valids sort
    # first, so that is position n_valid-1); valid entries must pass
    # through untouched (a cummax would corrupt descending id pairs).
    nv = valid_s.sum(axis=1)
    fill = jnp.take_along_axis(
        local_s, jnp.maximum(nv - 1, 0)[:, None], axis=1)
    fill = jnp.where(nv[:, None] > 0, fill, 0)
    ids = jnp.where(valid_s, local_s, fill).astype(jnp.int32)

    out = moe_forward(
        x, w13_l, w2_l, ids, wts_s,
        swiglu_limit=swiglu_limit, gpt_oss=gpt_oss,
        w13_bias=w13_bias, w2_bias=w2_bias,
        layer_idx=layer_idx, pick_valid=valid_s, activation=activation,
    )
    # f32 combine: with high top-k (QCN k=10) the 8 bf16 partials round
    # visibly (0.1 logit drift at k=10/E=512); f32 on the wire costs 2x
    # ICI bytes on a [T, H] tensor but keeps sharded == unsharded
    # numerics.
    return jax.lax.psum(out.astype(jnp.float32), axis).astype(x.dtype)


def moe_forward_ep(
    x: jax.Array,             # [T, H] (rows dp-sharded when dp > 1)
    w13: QTensor,             # [(L,) E, H(/2), 2I]
    w2: QTensor,              # [(L,) E, I(/2), H]
    topk_idx: jax.Array,      # [T, k] GLOBAL expert ids
    topk_weights: jax.Array,  # [T, k] f32
    *,
    mesh: Mesh,
    swiglu_limit: float = 0.0,
    gpt_oss: bool = False,
    w13_bias: Optional[jax.Array] = None,
    w2_bias: Optional[jax.Array] = None,
    layer_idx=None,
    activation: str = "bf16",
) -> jax.Array:
    T, H = x.shape
    dp = mesh.shape.get("dp", 1)
    row_axis = "dp" if ("dp" in mesh.axis_names and dp > 1 and T % dp == 0) \
        else None
    rows = P(row_axis, None)

    li = jnp.asarray(0 if layer_idx is None else layer_idx, jnp.int32)
    has_bias = w13_bias is not None and w2_bias is not None

    def local_moe(x, q13, s13, q2, s2, idx, wts, li, *biases):
        w13_l = QTensor(q13, s13, w13.bits, w13.group_size)
        w2_l = QTensor(q2, s2, w2.bits, w2.group_size)
        b13, b2 = (biases[0], biases[1]) if biases else (None, None)
        return moe_forward_ep_local(
            x, w13_l, w2_l, idx, wts,
            swiglu_limit=swiglu_limit, gpt_oss=gpt_oss,
            w13_bias=b13, w2_bias=b2,
            layer_idx=li, activation=activation,
        )

    args = [x, w13.q, w13.scales, w2.q, w2.scales, topk_idx, topk_weights, li]
    in_specs = [
        rows,
        _expert_spec(w13.q.ndim), _expert_spec(w13.scales.ndim),
        _expert_spec(w2.q.ndim), _expert_spec(w2.scales.ndim),
        rows, rows, P(),
    ]
    if has_bias:
        args += [w13_bias, w2_bias]
        in_specs += [_bias_spec(w13_bias.ndim), _bias_spec(w2_bias.ndim)]

    return _smap(local_moe, mesh, tuple(in_specs), rows)(*args)
