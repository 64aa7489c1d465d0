"""Offload-tier engine: streamed-weight prefill + host-expert decode.

Prefill for host-resident-expert models (offload.HostExpertStore) runs
at device speed by STREAMING expert weights through HBM instead of
computing MoE on the host: pattern repetition r's expert tensors are
`jax.device_put` into a fresh buffer while repetition r-1 computes, and
the whole prompt (all chunks) flows through one repetition's layers
before the next repetition is touched — weights cross PCIe exactly once
per prefill regardless of prompt length. This is the TPU-native form of
the reference's layer-grouped pinned-DMA prefill pipeline (reference
python/krasis/gpu_prefill.py:1266 preload_layer_group/swap_prefetch;
model.py:2719 group-outer/chunk-inner loop), with jax's async dispatch
standing in for CUDA streams and events.

Decode inherits the host-callback MoE path from Engine (models/model.py
_offload_moe): per decoded token the picked experts' bytes are read at
host-RAM bandwidth — the reference's CPU-decode regime.

Layer-wise dataflow note: processing chunk c of repetition r requires
only chunks ≤ c of repetition r-1, so group-outer/chunk-inner computes
exactly the same function as chunk-outer/layer-inner; the KV written by
earlier chunks of the SAME repetition serves as attention history for
later ones.
"""

from __future__ import annotations

import logging
import os
import time
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from ml_dtypes import bfloat16

from ..config import ModelConfig, QuantConfig
from ..models.model import (
    _gqa_attention,
    _la_attention,
    _mla_attention,
    make_layer_step,
)
from ..models.params import layer_specs, pattern_info
from ..ops.moe import mlp_forward
from ..ops.norm import rms_norm
from ..ops.qmm import linear
from ..ops.routing import compute_routing
from ..quant import QTensor
from .engine import Engine, pick_history_bucket, _is_oom

log = logging.getLogger("krasis_tpu.offload")

_CALLBACKS_OK: Optional[bool] = None


def callbacks_supported() -> bool:
    """Whether this backend's PJRT implements host callbacks
    (pure_callback). Standard TPU/CPU PJRT does; the axon relay does not
    ("axon_pjrt does not support host send/recv callbacks") — there the
    offload tier decodes through the segmented per-layer path instead."""
    global _CALLBACKS_OK
    if _CALLBACKS_OK is None:
        try:
            def probe(x):
                return jax.pure_callback(
                    lambda v: np.asarray(v) + 1,
                    jax.ShapeDtypeStruct((), jnp.int32), x)

            _CALLBACKS_OK = int(jax.jit(probe)(jnp.int32(1))) == 2
        except Exception:
            _CALLBACKS_OK = False
    return _CALLBACKS_OK


def make_streaming_rep_fn(cfg: ModelConfig, quant: QuantConfig,
                          history: int):
    """One pattern repetition (period layers) over one prefill chunk,
    with this repetition's expert tensors as ARGUMENTS (streamed in) and
    the stacked caches updated in place at repetition `r`."""
    specs = layer_specs(cfg)
    info = pattern_info(cfg)
    pat_specs = specs[info.prefix_n : info.prefix_n + info.period]

    def fn(pattern_ne, experts, r, x, seq_lens, length, caches):
        B, S, H = x.shape
        positions = length[:, None] + jnp.arange(S)[None, :]
        valid = jnp.arange(S)[None, :] < seq_lens[:, None]
        kv_len = length + seq_lens
        layer_step = make_layer_step(
            cfg, prefill=True, history=history, mesh=None,
            positions=positions, valid=valid, kv_len=kv_len,
        )
        new_caches = []
        for t in range(info.period):
            lp = {
                name: jax.tree_util.tree_map(
                    lambda l: jax.lax.dynamic_index_in_dim(
                        l, r, 0, keepdims=False), w)
                for name, w in pattern_ne[t].items()
                # hot-cache leaves are a decode feature; prefill runs the
                # full streamed stack
                if not name.startswith("hot_")
            }
            if experts[t] is not None:
                lp.update(experts[t])  # w13/w2 (+biases) for THIS rep
            lc = jax.tree_util.tree_map(
                lambda l: jax.lax.dynamic_index_in_dim(
                    l, r, 0, keepdims=False), caches[t])
            x, new_lc = layer_step(x, lp, lc, pat_specs[t])
            new_caches.append({
                k: caches[t][k].at[r].set(new_lc[k]) for k in new_lc
            })
        return x, new_caches

    return fn


def make_streaming_prefix_fn(cfg: ModelConfig, quant: QuantConfig,
                             history: int, offload):
    """Embedding + the unrolled prefix layers over one chunk (dense
    prefix layers run resident; a MoE prefix layer would go through the
    host callback)."""
    specs = layer_specs(cfg)
    info = pattern_info(cfg)

    def fn(params, tokens, seq_lens, prefix_caches, length):
        B, S = tokens.shape
        positions = length[:, None] + jnp.arange(S)[None, :]
        valid = jnp.arange(S)[None, :] < seq_lens[:, None]
        kv_len = length + seq_lens
        x = jnp.take(params["embed"], tokens, axis=0)
        layer_step = make_layer_step(
            cfg, prefill=True, history=history, mesh=None,
            positions=positions, valid=valid, kv_len=kv_len,
            offload=offload,
        )
        new = []
        for i, lp in enumerate(params["prefix_layers"]):
            if offload is not None:
                lp = {**lp, "_abs_layer": jnp.int32(i)}
            x, nlc = layer_step(x, lp, prefix_caches[i], specs[i])
            new.append(nlc)
        return x, new

    return fn


_KV_KEYS = ("k", "v", "kv")


def make_seg_layer_fn(cfg: ModelConfig, quant: QuantConfig, spec,
                      stacked: bool):
    """One decode layer as a standalone jitted segment, splitting at the
    routed-MoE boundary so a host without callback support (axon relay)
    can compute the experts between device dispatches.

    Segment body: apply the PREVIOUS MoE layer's pending outputs
    (shared-expert tensor left on device + routed output uploaded from
    the host), then input-norm → attention → post-norm, and either
    finish a dense MLP inline or stop after routing + shared expert,
    returning what the host engine needs (normed activations, top-k ids
    and weights). KV caches stay pattern-stacked with the repetition
    index resolved in the attention kernels — the same access pattern as
    the fused production decode."""
    gpt_oss = cfg.model_type == "gpt_oss"
    has_moe = spec.mlp_kind == "moe"

    def fn(stacks, pendS, pendM, x, caches, r, length):
        B = x.shape[0]
        x = x + pendS + pendM.astype(x.dtype)
        positions = length[:, None]
        valid = jnp.ones((B, 1), jnp.bool_)
        kv_len = length + 1
        if stacked:
            # hot-expert substacks stay WHOLE (kernels index the rep
            # in-kernel, same as the production stacked-weight rule)
            lp = {
                name: (w if name in ("hot_w13", "hot_w2")
                       else jax.tree_util.tree_map(
                           lambda l: jax.lax.dynamic_index_in_dim(
                               l, r, 0, keepdims=False), w))
                for name, w in stacks.items()
            }
        else:
            lp = stacks
        normed = rms_norm(x, lp["input_norm"], cfg.rms_norm_eps,
                          cfg.norm_plus_one)
        if spec.attn_kind == "gqa":
            lc = {k: v for k, v in caches.items() if k in _KV_KEYS}
            attn, new_lc = _gqa_attention(
                lp, lc, normed, positions, kv_len, cfg, spec,
                prefill=False, lidx=r if stacked else None)
            new_caches = new_lc
        elif spec.attn_kind == "mla":
            lc = {k: v for k, v in caches.items() if k in _KV_KEYS}
            attn, new_lc = _mla_attention(
                lp, lc, normed, positions, kv_len, cfg, prefill=False,
                lidx=r if stacked else None)
            new_caches = new_lc
        else:
            # recurrent state is small: slice at r, write back at r
            if stacked:
                lc = jax.tree_util.tree_map(
                    lambda l: jax.lax.dynamic_index_in_dim(
                        l, r, 0, keepdims=False), caches)
            else:
                lc = caches
            attn, new_lc = _la_attention(lp, lc, normed, valid, cfg,
                                         prefill=False)
            if stacked:
                new_caches = {k: caches[k].at[r].set(v)
                              for k, v in new_lc.items()}
            else:
                new_caches = new_lc
        x = x + attn
        normed2 = rms_norm(x, lp["post_norm"], cfg.rms_norm_eps,
                           cfg.norm_plus_one)
        H = x.shape[-1]
        n2d = normed2.reshape(B, H)
        if not has_moe:
            out = mlp_forward(n2d, lp["mlp_w13"], lp["mlp_w2"],
                              swiglu_limit=cfg.swiglu_limit,
                              gpt_oss=gpt_oss)
            return x + out.reshape(B, 1, H), new_caches
        routing = compute_routing(
            n2d, lp["gate_w"], cfg, lp.get("gate_bias"),
            logit_bias=lp.get("gate_logit_bias"))
        idx, wts = routing.topk_idx, routing.topk_weights
        shared = jnp.zeros_like(x)
        if "shared_w13" in lp:
            sh = mlp_forward(n2d, lp["shared_w13"], lp["shared_w2"])
            if "shared_gate_w" in lp:
                sg = jax.nn.sigmoid(
                    linear(n2d, lp["shared_gate_w"]).astype(jnp.float32))
                sh = sh * sg.astype(sh.dtype)
            shared = sh.reshape(B, 1, H)
        if "hot_w13" in lp:
            # HBM hot-expert cache (offload.build_hot_params): hot picks
            # compute on the MXU and ride the device-resident `shared`
            # tensor; only cold picks cross to the host.
            from ..ops.moe import moe_forward

            remap = lp["hot_remap"]
            hot_local = jnp.take(remap, idx, axis=0)
            hot_valid = hot_local >= 0
            hot_out = moe_forward(
                n2d, lp["hot_w13"], lp["hot_w2"],
                jnp.where(hot_valid, hot_local, 0),
                jnp.where(hot_valid, wts, 0.0),
                swiglu_limit=cfg.swiglu_limit, gpt_oss=gpt_oss,
                w13_bias=lp.get("hot_w13_bias"),
                w2_bias=lp.get("hot_w2_bias"),
                layer_idx=r if stacked else None, pick_valid=hot_valid,
            )
            shared = shared + hot_out.reshape(B, 1, H)
            idx = jnp.where(hot_valid, -1, idx)
            wts = jnp.where(hot_valid, 0.0, wts)
        # Host-bound outputs packed into ONE f32 buffer: each device->host
        # fetch is a full round trip on relay backends, so
        # [activations | topk ids | topk weights] travel together.
        # (int32 ids are exact in f32 for any real expert count.)
        packed = jnp.concatenate([
            n2d.astype(jnp.float32),
            idx.astype(jnp.float32),
            wts.astype(jnp.float32),
        ], axis=-1)
        return x, shared, packed, new_caches

    return fn


def make_embed_fn(cfg: ModelConfig):
    def fn(params, tok):
        return jnp.take(params["embed"], tok[:, None], axis=0)

    return fn


def make_seg_final_fn(cfg: ModelConfig):
    def fn(params, x, pendS, pendM):
        x = x + pendS + pendM.astype(x.dtype)
        x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps,
                     cfg.norm_plus_one)
        return linear(x[:, 0], params["lm_head"], out_dtype=jnp.float32)

    return fn


def make_head_fn(cfg: ModelConfig):
    def fn(params, x, seq_lens):
        x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps,
                     cfg.norm_plus_one)
        idx = jnp.maximum(seq_lens - 1, 0)
        x = jnp.take_along_axis(x, idx[:, None, None], axis=1)[:, 0]
        return linear(x, params["lm_head"], out_dtype=jnp.float32)

    return fn


def make_head_all_fn(cfg: ModelConfig):
    """All-position logits head (perplexity path)."""
    def fn(params, x):
        x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps,
                     cfg.norm_plus_one)
        return linear(x, params["lm_head"], out_dtype=jnp.float32)

    return fn


class OffloadEngine(Engine):
    """Engine whose routed experts live in host RAM. Decode = Engine's
    host-callback path; prefill = streamed-weight pipeline (disable with
    streaming=False to run prefill through the host callback too — the
    correctness reference for tests)."""

    def __init__(self, cfg, quant, params, offload, streaming: bool = True,
                 segmented: Optional[bool] = None, hot_experts: int = 0,
                 **kw):
        if hot_experts > 0:
            from ..offload import build_hot_params

            params = build_hot_params(cfg, quant, params, offload,
                                      hot_experts)
        super().__init__(cfg, quant, params, offload=offload, **kw)
        self.hot_experts = hot_experts
        self.streaming = streaming
        self._info = pattern_info(cfg)
        self._rep_fns: Dict[int, Any] = {}
        self._prefix_fns: Dict[int, Any] = {}
        self._head = jax.jit(make_head_fn(cfg))
        # Segmented decode: per-layer device dispatches with the host MoE
        # between them, for backends without host-callback support (the
        # axon relay). KRASIS_TPU_SEG_DECODE=1 forces it (tests).
        import os

        if segmented is None:
            segmented = bool(os.environ.get("KRASIS_TPU_SEG_DECODE")) or \
                not callbacks_supported()
        self.segmented = segmented
        self._specs = layer_specs(cfg)
        self._seg_pattern: Dict[int, Any] = {}
        self._seg_prefix: Dict[int, Any] = {}
        self._emb = jax.jit(make_embed_fn(cfg))
        self._seg_final = jax.jit(make_seg_final_fn(cfg))

    def update_hot_cache(self):
        """Re-select the hot experts from the heatmap collected since
        startup (store.heatmap counts COLD traffic while the cache is
        active — calibrate with hot_experts disabled or accept drift)
        and swap the substacks in place. Shapes are unchanged, so no
        graph recompiles (≙ the reference's HCS calibration loop,
        server.py:475-700)."""
        if self.hot_experts <= 0:
            return
        from ..offload import build_hot_params

        self.params = build_hot_params(
            self.cfg, self.quant, self.params, self.offload,
            self.hot_experts)

    # -- segmented decode (callback-free backends) ------------------------

    def _seg_fn(self, t: int, stacked: bool):
        cache_fns = self._seg_pattern if stacked else self._seg_prefix
        if t not in cache_fns:
            spec = self._specs[self._info.prefix_n + t] if stacked \
                else self._specs[t]
            cache_fns[t] = jax.jit(
                make_seg_layer_fn(self.cfg, self.quant, spec, stacked),
                donate_argnums=(3, 4),  # x, caches
            )
        return cache_fns[t]

    def _host_moe(self, layer: int, packed, B: int):
        """Unpack [activations | ids | weights] (one D2H fetch) and run
        the host expert engine."""
        k = self.cfg.num_experts_per_tok
        p = np.asarray(packed, np.float32)
        n2d, idx, wts = p[:, :-2 * k], p[:, -2 * k:-k], p[:, -k:]
        out = self.offload.forward(
            layer, n2d, np.rint(idx).astype(np.int32), wts)
        H = out.shape[-1]
        return jnp.asarray(out.reshape(B, 1, H), jnp.float32)

    def _segmented_forward(self, params, tok, cache):
        """One decode step: per-layer segments with the host expert
        engine invoked between dispatches. Returns (logits, new_cache)."""
        info, cfg = self._info, self.cfg
        B = tok.shape[0]
        x = self._emb(params, tok)
        zeros = jnp.zeros_like(x)
        pendS, pendM = zeros, zeros.astype(jnp.float32)
        length = cache["length"]
        prefix_caches = list(cache["prefix_layers"])
        for i, lp in enumerate(params["prefix_layers"]):
            seg = self._seg_fn(i, stacked=False)
            if self._specs[i].mlp_kind == "moe":
                x, pendS, packed, prefix_caches[i] = seg(
                    lp, pendS, pendM, x, prefix_caches[i], 0, length)
                pendM = self._host_moe(i, packed, B)
            else:
                x, prefix_caches[i] = seg(
                    lp, pendS, pendM, x, prefix_caches[i], 0, length)
                pendS, pendM = zeros, zeros.astype(jnp.float32)
        pat_caches = list(cache["pattern"])
        for r in range(info.reps):
            ri = jnp.int32(r)
            for t in range(info.period):
                seg = self._seg_fn(t, stacked=True)
                layer = info.prefix_n + r * info.period + t
                if self._specs[layer].mlp_kind == "moe":
                    x, pendS, packed, pat_caches[t] = seg(
                        params["pattern"][t], pendS, pendM, x,
                        pat_caches[t], ri, length)
                    pendM = self._host_moe(layer, packed, B)
                else:
                    x, pat_caches[t] = seg(
                        params["pattern"][t], pendS, pendM, x,
                        pat_caches[t], ri, length)
                    pendS, pendM = zeros, zeros.astype(jnp.float32)
        logits = self._seg_final(params, x, pendS, pendM)
        new_cache = {
            "prefix_layers": prefix_caches,
            "pattern": pat_caches,
            "length": length + 1,
        }
        return logits, new_cache

    def _multi_decode_fn(self, sampling, steps: int, top_logprobs: int = 0,
                         need_logprobs: bool = True):
        # need_logprobs is a fast-path hint for the fused block; the
        # segmented driver's per-step logprob is negligible next to its
        # per-layer host hops, so it always computes them
        if not self.segmented:
            return super()._multi_decode_fn(sampling, steps, top_logprobs,
                                            need_logprobs=need_logprobs)
        sample_fn = self._sample_fn(sampling)

        def driver(params, tok, cache, key, seen):
            B = tok.shape[0]
            toks, lps, tvs, tis = [], [], [], []
            for _ in range(steps):
                logits, cache = self._segmented_forward(params, tok, cache)
                key, sk = jax.random.split(key)
                tok, lp = sample_fn(sk, logits, seen)
                if top_logprobs > 0:
                    lsm = jax.nn.log_softmax(logits.astype(jnp.float32),
                                             axis=-1)
                    tv, ti = jax.lax.top_k(lsm, top_logprobs)
                else:
                    tv = jnp.zeros((B, 1), jnp.float32)
                    ti = jnp.zeros((B, 1), jnp.int32)
                seen = seen.at[jnp.arange(B), tok].set(True)
                toks.append(tok)
                lps.append(lp)
                tvs.append(tv)
                tis.append(ti)
            return (jnp.stack(toks), jnp.stack(lps),
                    (jnp.stack(tvs), jnp.stack(tis)), cache, key, seen)

        return driver

    # -- streamed prefill ------------------------------------------------

    def _rep_fn(self, hist_bucket: int):
        if hist_bucket not in self._rep_fns:
            self._rep_fns[hist_bucket] = jax.jit(
                make_streaming_rep_fn(self.cfg, self.quant, hist_bucket),
                donate_argnums=(3, 6),  # x, caches
            )
        return self._rep_fns[hist_bucket]

    def _prefix_fn(self, hist_bucket: int):
        if hist_bucket not in self._prefix_fns:
            self._prefix_fns[hist_bucket] = jax.jit(
                make_streaming_prefix_fn(self.cfg, self.quant, hist_bucket,
                                         self.offload),
                donate_argnums=(3,),
            )
        return self._prefix_fns[hist_bucket]

    def _rep_host_tree(self, r: int) -> List[Optional[Dict[str, Any]]]:
        """Host-side (numpy, zero-copy views into the store) expert
        tensors of repetition r, one entry per pattern position."""
        info = self._info
        out: List[Optional[Dict[str, Any]]] = []
        for t in range(info.period):
            layer = info.prefix_n + r * info.period + t
            entry = self.offload._layers.get(layer)
            if entry is None:
                out.append(None)
                continue
            w13q, w13s, w2q, w2s, b13, b2 = entry
            d: Dict[str, Any] = {
                "w13": QTensor(w13q, w13s.view(bfloat16),
                               self.offload.bits, self.offload.gs13),
                "w2": QTensor(w2q, w2s.view(bfloat16),
                              self.offload.bits, self.offload.gs2),
            }
            if b13 is not None:
                d["w13_bias"] = b13
            if b2 is not None:
                d["w2_bias"] = b2
            out.append(d)
        return out

    def _prefill_prompt_once(self, prompt_ids):
        if not (self.streaming and self._info.reps):
            return super()._prefill_prompt_once(prompt_ids)
        return self._streaming_prefill(prompt_ids)

    def forward_all_logits(self, prompt_ids):
        """All-position logits through the streamed prefill (perplexity
        path for offloaded models — the resident implementation's
        prefill graph would need the callback support this tier cannot
        assume)."""
        if not (self.streaming and self._info.reps):
            return super().forward_all_logits(prompt_ids)
        self.reset()
        n = len(prompt_ids)
        if not hasattr(self, "_head_all"):
            self._head_all = jax.jit(make_head_all_fn(self.cfg))
        _, x_all, seqs = self._streaming_prefill(prompt_ids,
                                                 return_hidden=True)
        outs = [np.asarray(self._head_all(self.params, x)[0])
                for x in x_all]
        return jnp.asarray(np.concatenate(outs, axis=0)[:n])

    def _streaming_prefill(self, prompt_ids, return_hidden: bool = False):
        cfg, info = self.cfg, self._info
        n = len(prompt_ids)
        B = self.batch_size
        C = min(self.chunk, ((n + 127) // 128) * 128)
        n_chunks = -(-n // C)

        tok_chunks, seq_chunks, len_chunks = [], [], []
        for c in range(n_chunks):
            m = min(C, n - c * C)
            tokens = np.zeros((B, C), np.int32)
            tokens[0, :m] = prompt_ids[c * C : c * C + m]
            seq = np.zeros((B,), np.int32)
            seq[0] = m
            length = np.zeros((B,), np.int32)
            length[0] = c * C
            tok_chunks.append(jnp.asarray(tokens))
            seq_chunks.append(jnp.asarray(seq))
            len_chunks.append(jnp.asarray(length))

        def bucket(c: int) -> int:
            return 0 if c == 0 else pick_history_bucket(c * C)

        # Phase 1: embedding + prefix layers, all chunks.
        x_all: List[jax.Array] = []
        prefix_caches = self.cache["prefix_layers"]
        for c in range(n_chunks):
            x, prefix_caches = self._prefix_fn(bucket(c))(
                self.params, tok_chunks[c], seq_chunks[c], prefix_caches,
                len_chunks[c],
            )
            x_all.append(x)

        # Phase 2: pattern repetitions, weights streamed rep-by-rep with
        # the NEXT rep's host->HBM copy issued before this rep computes
        # (async dispatch overlaps transfer with compute).
        pat_caches = self.cache["pattern"]
        pattern_ne = self.params["pattern"]
        t_h2d0 = time.perf_counter()
        first = self._rep_host_tree(0)
        rep_bytes = sum(
            a.size * a.dtype.itemsize
            for a in jax.tree_util.tree_leaves(first))
        nxt = jax.device_put(first)
        # Pure H2D rate of ONE rep needs a barrier before any compute is
        # issued — that serializes the first transfer against the
        # pipeline, so only pay it when stats are requested
        # (KRASIS_TPU_STREAM_STATS=1); the overlap-effective rate below
        # is free either way.
        h2d_first_s = None
        if os.environ.get("KRASIS_TPU_STREAM_STATS"):
            jax.block_until_ready(nxt)
            h2d_first_s = time.perf_counter() - t_h2d0
        t_phase2 = time.perf_counter()
        for r in range(info.reps):
            cur = nxt
            if r + 1 < info.reps:
                nxt = jax.device_put(self._rep_host_tree(r + 1))
            ri = jnp.int32(r)
            for c in range(n_chunks):
                x_all[c], pat_caches = self._rep_fn(bucket(c))(
                    pattern_ne, cur, ri, x_all[c], seq_chunks[c],
                    len_chunks[c], pat_caches,
                )
            del cur
        jax.block_until_ready(x_all[-1])
        phase2_s = time.perf_counter() - t_phase2
        total_bytes = rep_bytes * info.reps
        self.last_stream_stats = {
            "rep_bytes": int(rep_bytes),
            "streamed_bytes": int(total_bytes),
            "phase2_s": round(phase2_s, 3),
            "effective_gbps_with_overlap": round(
                total_bytes / max(phase2_s, 1e-9) / 1e9, 3),
        }
        if h2d_first_s is not None:
            self.last_stream_stats["h2d_first_rep_s"] = round(h2d_first_s, 4)
            self.last_stream_stats["h2d_gbps_measured"] = round(
                rep_bytes / h2d_first_s / 1e9, 3)
        log.info("offload stream: %s", self.last_stream_stats)

        kv_len = jnp.zeros((B,), jnp.int32).at[0].set(n)
        self.cache = {
            "prefix_layers": prefix_caches,
            "pattern": pat_caches,
            "length": kv_len,
        }
        logits = self._head(self.params, x_all[-1], seq_chunks[-1])
        if return_hidden:
            return logits, x_all, seq_chunks
        return logits
