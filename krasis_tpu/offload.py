"""Host-RAM expert offload: serve MoE models whose experts exceed HBM.

The reference's defining capability is running 80B-685B MoE models on a
device whose memory holds only a fraction of the weights, by keeping the
expert tensors in system RAM (reference src/moe.rs CPU expert engine;
python/krasis/gpu_prefill.py layer-grouped DMA prefill). The TPU-native
re-design, one uniform weight format instead of the reference's two:

* **Decode** keeps attention / norms / routing / shared experts /
  lm_head on the TPU (they always fit) and computes the routed-expert
  sublayer on the host via `jax.pure_callback` into the C++ engine
  (native/hostmoe.cpp) — the picked experts' bytes are read from host
  RAM at RAM bandwidth, exactly the reference's CPU-decode regime. The
  callback sits inside the jitted decode graph; the device never holds
  expert weights.
* **Prefill** streams expert weights per pattern-repetition into a
  double-buffered HBM slot while the previous repetition computes on
  the regular device kernels (runtime/offload_engine.py) — the analog
  of the reference's `preload_layer_group`/`swap_prefetch` pinned-DMA
  pipeline (gpu_prefill.py:1266-1663), expressed as overlapping
  `jax.device_put` with per-rep jitted compute.

Weights come from the same quantized formats as the resident path
(quant.py INT4 split-half / INT8, bf16 group scales): the mmap'd weight
cache can be pointed at directly with zero copies.
"""

from __future__ import annotations

import ctypes
import os
from typing import Dict, Optional, Tuple

import numpy as np
from ml_dtypes import bfloat16

from .config import ModelConfig, QuantConfig
from .quant import QTensor, pick_group_size

__all__ = ["HostExpertStore", "build_synthetic_store", "store_from_params"]


def _as_u16(scales: np.ndarray) -> np.ndarray:
    if scales.dtype == np.uint16:
        return scales
    assert scales.dtype == bfloat16, scales.dtype
    return scales.view(np.uint16)


class HostExpertStore:
    """Routed-expert weights resident in host RAM, one entry per MoE
    layer (absolute layer index). Compute goes through the C++ engine
    when a toolchain is available, else a numpy fallback with identical
    numerics (both verified against ops/moe in tests/test_offload.py)."""

    def __init__(self, cfg: ModelConfig, quant: QuantConfig):
        self.cfg = cfg
        self.quant = quant
        self.E = cfg.n_routed_experts
        self.H = cfg.hidden_size
        self.I = cfg.moe_intermediate_size
        self.bits = quant.expert_bits
        self.gs13 = pick_group_size(self.H, quant.group_size)
        self.gs2 = pick_group_size(self.I, quant.group_size)
        self.gpt_oss = cfg.model_type == "gpt_oss"
        self.swiglu_limit = cfg.swiglu_limit
        # layer -> (w13_q, w13_s_u16, w2_q, w2_s_u16, w13_b, w2_b)
        self._layers: Dict[int, Tuple] = {}
        self._handle = None
        self._lib = None
        # expert-activation heatmap: layer -> int64 [E] hit counts
        # (reference gpu_prefill.py:2388 heatmap collection — drives the
        # hot-expert HBM cache, build_hot_params)
        self.heatmap: Dict[int, np.ndarray] = {}
        self.collect_heatmap = True
        # cumulative host-compute accounting (benchmarks/probe_hot_experts
        # reads these: through the relay the end-to-end tok/s is
        # RTT-bound, so the host compute seconds saved per token is the
        # number that transfers to a local-PCIe deployment)
        self.host_calls = 0
        self.host_time_s = 0.0
        self.host_picks = 0

    # -- construction ------------------------------------------------

    def add_layer(
        self,
        layer: int,
        w13_q: np.ndarray,           # int8 [E, H(/2), 2I]
        w13_scales: np.ndarray,      # bf16 [E, H/gs13, 2I]
        w2_q: np.ndarray,            # int8 [E, I(/2), H]
        w2_scales: np.ndarray,       # bf16 [E, I/gs2, H]
        w13_bias: Optional[np.ndarray] = None,  # f32 [E, 2I]
        w2_bias: Optional[np.ndarray] = None,   # f32 [E, H]
    ) -> None:
        rows13 = self.H // 2 if self.bits == 4 else self.H
        rows2 = self.I // 2 if self.bits == 4 else self.I
        assert w13_q.shape == (self.E, rows13, 2 * self.I), w13_q.shape
        assert w2_q.shape == (self.E, rows2, self.H), w2_q.shape
        entry = (
            np.ascontiguousarray(w13_q),
            np.ascontiguousarray(_as_u16(w13_scales)),
            np.ascontiguousarray(w2_q),
            np.ascontiguousarray(_as_u16(w2_scales)),
            None if w13_bias is None else np.ascontiguousarray(
                w13_bias, np.float32),
            None if w2_bias is None else np.ascontiguousarray(
                w2_bias, np.float32),
        )
        self._layers[layer] = entry
        if self._handle is not None:
            self._register(layer, entry)

    @property
    def layers(self):
        return sorted(self._layers)

    def nbytes(self) -> int:
        return sum(
            sum(a.nbytes for a in e if a is not None)
            for e in self._layers.values()
        )

    # -- native engine -----------------------------------------------

    def _ptr(self, a: Optional[np.ndarray]):
        return None if a is None else a.ctypes.data_as(ctypes.c_void_p)

    def _register(self, layer: int, entry) -> None:
        rc = self._lib.krasish_set_layer(
            self._handle, layer, self._ptr(entry[0]), self._ptr(entry[1]),
            self._ptr(entry[2]), self._ptr(entry[3]), self._ptr(entry[4]),
            self._ptr(entry[5]),
        )
        if rc != 0:
            raise RuntimeError(f"krasish_set_layer({layer}) rc={rc}")

    def _ensure_native(self) -> bool:
        if self._handle is not None:
            return True
        if os.environ.get("KRASIS_TPU_NO_HOSTMOE"):
            return False
        from . import native

        lib = native._load_hostmoe()
        if lib is None:
            return False
        n_layers = self.cfg.num_hidden_layers + max(
            self.cfg.num_nextn_predict_layers, 0)
        handle = lib.krasish_create(
            n_layers, self.E, self.H, self.I, self.bits, self.gs13,
            self.gs2, int(self.gpt_oss), float(self.swiglu_limit or 0.0),
        )
        if not handle:
            return False
        self._lib = lib
        self._handle = ctypes.c_void_p(handle)
        for layer, entry in self._layers.items():
            self._register(layer, entry)
        return True

    def native_tier(self) -> str:
        """Active SIMD tier of the native engine: 'avx512' | 'avx2' |
        'scalar' (runtime cpuid dispatch; KRASISH_FORCE_TIER pins one),
        or 'numpy' when the C++ engine isn't available."""
        if not self._ensure_native():
            return "numpy"
        t = self._lib.krasish_tier(self._handle)
        return {0: "scalar", 1: "avx2", 2: "avx512"}.get(t, f"unknown({t})")

    def __del__(self):  # pragma: no cover - interpreter teardown
        try:
            if self._handle is not None and self._lib is not None:
                self._lib.krasish_destroy(self._handle)
        except Exception:
            pass

    # -- forward -------------------------------------------------------

    def forward(
        self,
        layer: int,
        x: np.ndarray,        # [T, H] f32
        topk_idx: np.ndarray, # [T, k] int32
        topk_w: np.ndarray,   # [T, k] f32
    ) -> np.ndarray:
        import time as _time
        t_host0 = _time.perf_counter()
        x = np.ascontiguousarray(x, np.float32)
        topk_idx = np.ascontiguousarray(topk_idx, np.int32)
        topk_w = np.ascontiguousarray(topk_w, np.float32)
        T, k = topk_idx.shape
        if self.collect_heatmap:
            hm = self.heatmap.get(layer)
            if hm is None:
                hm = self.heatmap[layer] = np.zeros(self.E, np.int64)
            ids = topk_idx[topk_idx >= 0]
            if ids.size:
                np.add.at(hm, ids, 1)
        if self._ensure_native():
            out = np.empty((T, self.H), np.float32)
            rc = self._lib.krasish_forward(
                self._handle, layer, T, k, self._ptr(x), self._ptr(topk_idx),
                self._ptr(topk_w), self._ptr(out),
            )
            if rc != 0:
                raise RuntimeError(f"krasish_forward(layer={layer}) rc={rc}")
        else:
            out = self._forward_np(layer, x, topk_idx, topk_w)
        self.host_calls += 1
        self.host_picks += int((topk_idx >= 0).sum())
        self.host_time_s += _time.perf_counter() - t_host0
        return out

    def _dequant_np(self, q: np.ndarray, s_u16: np.ndarray, K: int,
                    gs: int) -> np.ndarray:
        s = s_u16.view(bfloat16).astype(np.float32)      # [K/gs, N]
        if self.bits == 4:
            b = q.view(np.uint8)
            lo = (((b & 0xF) ^ 8).astype(np.int8) - 8).astype(np.float32)
            hi = ((b >> 4) ^ 8).astype(np.int8).astype(np.float32) - 8
            qf = np.concatenate([lo, hi], axis=0)        # [K, N]
        else:
            qf = q.astype(np.float32)
        N = qf.shape[-1]
        return (qf.reshape(K // gs, gs, N) * s[:, None, :]).reshape(K, N)

    def _forward_np(self, layer, x, topk_idx, topk_w):
        e13q, e13s, e2q, e2s, b13, b2 = self._layers[layer]
        T, k = topk_idx.shape
        out = np.zeros((T, self.H), np.float32)
        for t in range(T):
            for j in range(k):
                e = int(topk_idx[t, j])
                w = float(topk_w[t, j])
                if e < 0 or w == 0.0:
                    continue
                w13 = self._dequant_np(e13q[e], e13s[e], self.H, self.gs13)
                h = x[t] @ w13
                if b13 is not None:
                    h = h + b13[e]
                g, u = h[: self.I], h[self.I:]
                if self.gpt_oss:
                    lim = self.swiglu_limit
                    if lim and lim > 0:
                        g = np.minimum(g, lim)
                        u = np.clip(u, -lim, lim)
                    a = g / (1 + np.exp(-1.702 * g)) * (u + 1.0)
                else:
                    a = g / (1 + np.exp(-g)) * u
                w2 = self._dequant_np(e2q[e], e2s[e], self.I, self.gs2)
                o = a @ w2
                if b2 is not None:
                    o = o + b2[e]
                out[t] += w * o
        return out


def store_from_params(
    cfg: ModelConfig,
    quant: QuantConfig,
    params: Dict,
) -> Tuple[Dict, HostExpertStore]:
    """Split a resident parameter tree into (device params WITHOUT routed
    expert weights, HostExpertStore holding them). Used to build an
    offloaded engine with bit-identical weights to a resident one (tests)
    and by the synthetic offload builder; the checkpoint loader fills the
    store directly from its host-side arrays instead."""
    from .models.params import pattern_info

    store = HostExpertStore(cfg, quant)
    info = pattern_info(cfg)

    E_r = cfg.n_routed_experts

    def qnp(x, routed_only=False):
        a = np.asarray(x)
        if routed_only and a.ndim >= 3 and a.shape[-3] != E_r:
            # folded stacks carry shared experts as virtual rows beyond
            # E (models/params.fold_shared_experts); the host store owns
            # ROUTED experts only — shared stays on device
            a = a[..., :E_r, :, :]
        return a

    def strip(lp: Dict, add):
        if "w13" not in lp:
            return lp
        w13, w2 = lp["w13"], lp["w2"]
        add(
            qnp(w13.q, True), qnp(w13.scales, True),
            qnp(w2.q, True), qnp(w2.scales, True),
            None if "w13_bias" not in lp else qnp(lp["w13_bias"]),
            None if "w2_bias" not in lp else qnp(lp["w2_bias"]),
        )
        return {
            k: v for k, v in lp.items()
            if k not in ("w13", "w2", "w13_bias", "w2_bias")
        }

    out = dict(params)
    out["prefix_layers"] = [
        strip(lp, lambda *a, i=i: store.add_layer(i, *a))
        for i, lp in enumerate(params["prefix_layers"])
    ]

    def add_stacked(t, w13q, w13s, w2q, w2s, b13, b2):
        for r in range(info.reps):
            layer = info.prefix_n + r * info.period + t
            store.add_layer(
                layer, w13q[r], w13s[r], w2q[r], w2s[r],
                None if b13 is None else b13[r],
                None if b2 is None else b2[r],
            )

    out["pattern"] = [
        strip(lp, lambda *a, t=t: add_stacked(t, *a))
        for t, lp in enumerate(params["pattern"])
    ]
    return out, store


def hot_expert_ids(store: HostExpertStore, layer: int, n_hot: int,
                   heatmap: Optional[Dict[int, np.ndarray]] = None) -> np.ndarray:
    """Top-n_hot expert ids for a layer by activation count (sorted).
    Falls back to the first n_hot when no heatmap data exists yet."""
    hm = (heatmap or store.heatmap).get(layer)
    if hm is None or hm.sum() == 0:
        return np.arange(n_hot, dtype=np.int32)
    return np.sort(np.argsort(-hm)[:n_hot]).astype(np.int32)


def build_hot_params(
    cfg: ModelConfig,
    quant: QuantConfig,
    params: Dict,
    store: HostExpertStore,
    n_hot: int,
    heatmap: Optional[Dict[int, np.ndarray]] = None,
) -> Dict:
    """Pin the hottest n_hot experts per MoE layer into HBM — the TPU
    analog of the reference's HCS (hot-cached-static) decode
    (gpu_prefill.py:2742 _init_hot_cached_static: heatmap-driven GPU-hot
    + CPU-cold split). Adds to each MoE layer's params:

    * hot_w13 / hot_w2: QTensor substacks [(reps,) n_hot, ...] (device);
    * hot_remap: int32 [(reps,) E] — global expert id → hot slot, -1 for
      cold (decode computes hot picks on the MXU, ships only cold picks
      to the host engine);
    * hot biases for GPT-OSS.

    Shapes are uniform across layers, so swapping in a recalibrated hot
    set (OffloadEngine.update_hot_cache) never recompiles."""
    import jax
    import jax.numpy as jnp

    from .models.params import pattern_info

    info = pattern_info(cfg)

    def one_layer(layer: int):
        entry = store._layers[layer]
        w13q, w13s, w2q, w2s, b13, b2 = entry
        ids = hot_expert_ids(store, layer, n_hot, heatmap)
        remap = np.full(store.E, -1, np.int32)
        remap[ids] = np.arange(n_hot, dtype=np.int32)
        out = {
            "hot_w13": (w13q[ids], w13s[ids]),
            "hot_w2": (w2q[ids], w2s[ids]),
            "hot_remap": remap,
        }
        if b13 is not None:
            out["hot_w13_bias"] = b13[ids]
        if b2 is not None:
            out["hot_w2_bias"] = b2[ids]
        return out

    def qt(pairs, gs):
        q = np.stack([p[0] for p in pairs])
        s = np.stack([p[1] for p in pairs])
        return QTensor(jnp.asarray(q), jnp.asarray(s.view(bfloat16)),
                       store.bits, gs)

    new = dict(params)
    new["prefix_layers"] = []
    for i, lp in enumerate(params["prefix_layers"]):
        if i in store._layers:
            h = one_layer(i)
            lp = dict(lp)
            lp["hot_w13"] = QTensor(
                jnp.asarray(h["hot_w13"][0]),
                jnp.asarray(h["hot_w13"][1].view(bfloat16)),
                store.bits, store.gs13)
            lp["hot_w2"] = QTensor(
                jnp.asarray(h["hot_w2"][0]),
                jnp.asarray(h["hot_w2"][1].view(bfloat16)),
                store.bits, store.gs2)
            lp["hot_remap"] = jnp.asarray(h["hot_remap"])
            for bk in ("hot_w13_bias", "hot_w2_bias"):
                if bk in h:
                    lp[bk] = jnp.asarray(h[bk])
        new["prefix_layers"].append(lp)

    new["pattern"] = []
    for t, lp in enumerate(params["pattern"]):
        layers = [info.prefix_n + r * info.period + t
                  for r in range(info.reps)]
        if layers and all(l in store._layers for l in layers):
            hs = [one_layer(l) for l in layers]
            lp = dict(lp)
            lp["hot_w13"] = qt([h["hot_w13"] for h in hs], store.gs13)
            lp["hot_w2"] = qt([h["hot_w2"] for h in hs], store.gs2)
            lp["hot_remap"] = jnp.asarray(
                np.stack([h["hot_remap"] for h in hs]))
            for bk in ("hot_w13_bias", "hot_w2_bias"):
                if bk in hs[0]:
                    lp[bk] = jnp.asarray(np.stack([h[bk] for h in hs]))
        new["pattern"].append(lp)
    return new


def build_synthetic_store(
    cfg: ModelConfig,
    quant: QuantConfig,
    seed: int = 0,
    fill: str = "random",
) -> HostExpertStore:
    """Random host-resident expert weights for every MoE layer — the
    offload-tier analog of models/params.init_synthetic_params (itself
    the analog of the reference's xorshift fake weights, decode.rs:4480).

    fill="random": rng-filled int values (correctness + perf).
    fill="fast":   uninitialized weight bytes, random scales — identical
                   memory traffic for perf runs on 10s-of-GB models where
                   rng fill time dominates; NOT for numerics tests.
    """
    store = HostExpertStore(cfg, quant)
    rng = np.random.default_rng(seed)
    E, H, I = store.E, store.H, store.I
    rows13 = H // 2 if store.bits == 4 else H
    rows2 = I // 2 if store.bits == 4 else I

    def scales(K, gs, N):
        s = rng.uniform(0.01, 0.03, (E, K // gs, N)).astype(np.float32)
        return s.astype(bfloat16)

    def qbytes(shape):
        if fill == "fast":
            return np.empty(shape, np.int8)
        # rng.bytes is ~10× rng.integers for multi-GB stores (GPT-OSS'
        # host store is ~10 GB; the integers path took tens of minutes)
        n = int(np.prod(shape))
        return np.frombuffer(rng.bytes(n), np.int8).reshape(shape).copy()

    for layer in range(cfg.num_hidden_layers):
        if not cfg.layer_is_moe(layer):
            continue
        kwargs = {}
        if cfg.model_type == "gpt_oss":
            kwargs["w13_bias"] = np.zeros((E, 2 * I), np.float32)
            kwargs["w2_bias"] = np.zeros((E, H), np.float32)
        store.add_layer(
            layer,
            qbytes((E, rows13, 2 * I)),
            scales(H, store.gs13, 2 * I),
            qbytes((E, rows2, H)),
            scales(I, store.gs2, H),
            **kwargs,
        )
    return store
