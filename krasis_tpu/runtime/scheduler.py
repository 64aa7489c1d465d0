"""Continuous batching scheduler: prefill → slot insert → batched decode.

Capability upgrade over the reference's single-request server
(reference src/server.rs:7 "single request at a time"; README TODO notes
batching as future work). JetStream-style split:

* prefill runs at batch 1 into a dedicated prefill cache;
* the prefilled KV/state is *inserted* into a free slot of the batched
  decode cache (dynamic_update on the slot dim);
* one jitted decode step advances ALL active slots per iteration —
  decode throughput scales with concurrency at ~no latency cost (the
  decode step is HBM-bandwidth-bound on weights, which are read once
  per step regardless of batch).

The scheduler thread owns the TPU; request threads enqueue and wait on
per-request queues (SSE streaming pulls tokens as they arrive).
"""

from __future__ import annotations

import queue
import threading
import time
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig, QuantConfig
from ..models.model import (
    make_chunk_prefill_fn,
    make_forward_fns,
    make_multi_decode_batched_fn,
)
from ..ops.sampling import SamplingParams, sample_batched
from .engine import CHUNK, _is_oom, pick_bucket, pick_history_bucket
from .kv_cache import init_cache, init_mtp_cache, resolve_kv_quant


def insert_slot(decode_cache, prefill_cache, slot):
    """Copy a batch-1 prefill cache into decode-cache slot `slot`.

    `slot` is a TRACED scalar (dynamic_update handles it), so one
    compiled program covers every slot — a static index compiled one
    program per slot value, wasteful at high slot counts.

    Slot dim is 0 for prefix-layer leaves and `length`, 1 for
    pattern-stacked leaves (leading reps dim).
    """
    out = {
        "prefix_layers": [
            jax.tree_util.tree_map(
                lambda d, p: jax.lax.dynamic_update_index_in_dim(
                    d, jnp.take(p, 0, axis=0), slot, axis=0
                ),
                dlc, plc,
            )
            for dlc, plc in zip(
                decode_cache["prefix_layers"], prefill_cache["prefix_layers"]
            )
        ],
        "pattern": [
            jax.tree_util.tree_map(
                lambda d, p: jax.lax.dynamic_update_index_in_dim(
                    d, jnp.take(p, 0, axis=1), slot, axis=1
                ),
                dlc, plc,
            )
            for dlc, plc in zip(decode_cache["pattern"], prefill_cache["pattern"])
        ],
        "length": decode_cache["length"].at[slot].set(prefill_cache["length"][0]),
    }
    return out


def insert_mtp_slot(decode_mtp, prefill_mtp, slot):
    """insert_slot for the MTP-module cache (models/mtp.py): one layer
    dict with the slot on dim 0, plus a per-slot length."""
    return {
        "layer": jax.tree_util.tree_map(
            lambda d, p: jax.lax.dynamic_update_index_in_dim(
                d, jnp.take(p, 0, axis=0), slot, axis=0
            ),
            decode_mtp["layer"], prefill_mtp["layer"],
        ),
        "length": decode_mtp["length"].at[slot].set(prefill_mtp["length"][0]),
    }


@dataclass
class Request:
    prompt_ids: List[int]
    max_new_tokens: int
    sampling: SamplingParams
    stop_ids: set
    out_queue: "queue.Queue[Optional[int]]" = field(default_factory=queue.Queue)
    cancelled: threading.Event = field(default_factory=threading.Event)
    # per-request OpenAI logprobs opt-in; when False the emitted
    # logprobs are zeros UNLESS another active slot requested them in
    # the same block (the block computes for all slots or none)
    want_logprobs: bool = False
    # log P(token) under the raw model distribution, index-aligned with
    # emitted tokens; appended BEFORE the token lands in out_queue, so a
    # consumer reading token i may read logprobs[i]
    logprobs: List[float] = field(default_factory=list)
    # assigned at schedule time
    slot: int = -1
    emitted: int = 0


class BatchScheduler:
    """Owns the device; runs prefill/insert/decode in a loop."""

    def __init__(
        self,
        cfg: ModelConfig,
        quant: QuantConfig,
        params: Dict[str, Any],
        max_len: int = 4096,
        num_slots: int = 4,
        mesh=None,
        decode_block: int = 8,
        offload=None,
    ):
        self.cfg = cfg
        self.quant = quant = resolve_kv_quant(cfg, quant, num_slots, max_len)
        if quant.fold_shared_decode and mesh is None and offload is None:
            from ..models.params import fold_shared_experts

            params = fold_shared_experts(params, cfg, quant)
        self.params = params
        self.max_len = max_len
        self.num_slots = num_slots
        self.mesh = mesh
        self.decode_block = max(1, decode_block)
        # Host-RAM expert offload: MoE layers call the host engine from
        # inside the jitted graphs (models/model.py _offload_moe) — the
        # continuous-batching upgrade of the reference's CPU-decode
        # serving. Requires a PJRT with host-callback support (standard
        # TPU/CPU; NOT the axon relay — use the single-request
        # OffloadEngine's segmented decode there).
        self.offload = offload
        if offload is not None:
            from .offload_engine import callbacks_supported

            if not callbacks_supported():
                raise RuntimeError(
                    "continuous batching with --offload experts needs a "
                    "backend with host-callback support; this PJRT has "
                    "none (run without --slots for segmented decode)")

        prefill_fn, decode_fn, _ = make_forward_fns(cfg, quant, mesh=mesh,
                                                    offload=offload)
        self._prefill = jax.jit(prefill_fn, donate_argnums=(3,))
        self._decode = jax.jit(decode_fn, donate_argnums=(2,))
        self._insert = jax.jit(insert_slot, donate_argnums=(0,))

        # one fused decode+sample BLOCK for ALL slots: `decode_block`
        # tokens per device call (per-token dispatch costs a host round
        # trip per step); per-slot sampling params stay vectorized.
        # Two variants: the default skips the per-step chosen-logprob
        # math (measured ≈free — XLA fuses it — but it is the OpenAI
        # semantic: logprobs are per-request opt-in), and the loop flips
        # to the full variant whenever an active request asked
        # (Request.want_logprobs).
        self._decode_sample = jax.jit(
            make_multi_decode_batched_fn(cfg, quant, self.decode_block,
                                         mesh=mesh, offload=offload,
                                         need_logprobs=False),
            donate_argnums=(2,),
        )
        self._decode_sample_lp = jax.jit(
            make_multi_decode_batched_fn(cfg, quant, self.decode_block,
                                         mesh=mesh, offload=offload,
                                         need_logprobs=True),
            donate_argnums=(2,),
        )
        self._chunk_fns = {}

        # Speculative decoding across ALL slots — MTP-module drafts
        # (models/mtp.py) or prompt-lookup drafts (models/spec_ngram.py),
        # per spec_config: the verify step is exact per-slot for any
        # sampling params, so the whole batch runs spec steps uniformly —
        # each slot commits 1..spec_k+1 tokens/step. Draft-side state
        # only influences acceptance, never the output distribution,
        # which is what keeps prefix reuse and slot churn simple.
        from ..models.mtp import spec_config

        self.spec_mode, self.spec_k = spec_config(cfg, params)
        if offload is not None:
            self.spec_mode = None  # spec graphs don't carry the callback
        self.spec = self.spec_mode == "mtp"   # MTP-module machinery
        if self.spec_mode == "ngram":
            import os

            from ..models.spec_ngram import make_ngram_decode_fn

            # per-slot token history, device-resident; drafting happens
            # in-graph so it never costs a host round trip
            self._hist = jnp.zeros((num_slots, max_len), jnp.int32)
            self._ngram_decode = jax.jit(
                make_ngram_decode_fn(
                    cfg, quant, self.decode_block, mesh=mesh,
                    k=self.spec_k,
                    n_max=int(os.environ.get("KRASIS_TPU_NGRAM_N", "3")),
                ),
                donate_argnums=(2, 3),
            )
            self.stats_spec = {"steps": 0, "accepted": 0}
        if self.spec:
            from ..models.mtp import (
                make_first_draft_fn,
                make_spec_decode_fn,
                make_spec_prefill_fn,
            )
            self.mtp_decode_cache = init_mtp_cache(
                cfg, quant, num_slots, max_len)
            self.mtp_prefill_cache = init_mtp_cache(cfg, quant, 1, max_len)
            self._drafts = np.zeros((num_slots, self.spec_k), np.int32)
            self._spec_decode = jax.jit(
                make_spec_decode_fn(cfg, quant, self.decode_block,
                                    mesh=mesh, k=self.spec_k),
                donate_argnums=(3, 4),
            )
            self._spec_chunk_fns = {
                0: jax.jit(make_spec_prefill_fn(cfg, quant, 0, mesh=mesh),
                           donate_argnums=(5, 6))
            }
            self._first_draft = jax.jit(
                make_first_draft_fn(cfg, quant, mesh=mesh, k=self.spec_k),
                donate_argnums=(3,),
            )
            self._insert_mtp = jax.jit(insert_mtp_slot, donate_argnums=(0,))
            self.stats_spec = {"steps": 0, "accepted": 0}
        from ..models.model import chosen_logprob

        def first_sample(key, logits, temp, top_p, pres, seen, top_k):
            tok = sample_batched(key, logits, temp, top_p, pres, seen, top_k)
            return tok, chosen_logprob(logits, tok)

        self._first_sample = jax.jit(first_sample)

        self.decode_cache = init_cache(cfg, quant, num_slots, max_len)
        # one reusable batch-1 prefill cache (length reset per admission;
        # stale KV beyond `length` is masked and later overwritten)
        self.prefill_cache = init_cache(cfg, quant, 1, max_len)
        self._active: List[Optional[Request]] = [None] * num_slots
        self._tokens = np.zeros((num_slots,), np.int32)
        self._seen = jnp.zeros((num_slots, cfg.vocab_size), jnp.bool_)
        self._temp = np.zeros((num_slots,), np.float32)
        self._top_p = np.ones((num_slots,), np.float32)
        self._pres = np.zeros((num_slots,), np.float32)
        self._top_k = np.zeros((num_slots,), np.int32)
        self._key = jax.random.PRNGKey(0)
        self.chunk = CHUNK
        self._pending = None   # in-progress chunked admission
        # tokens currently materialized in the (single, reused) prefill
        # cache — enables incremental prefix reuse across admissions
        self._pc_tokens: List[int] = []
        self.stats = {"prefill_chunks": 0, "prefix_reused_tokens": 0}

        self._in_queue: "queue.Queue[Request]" = queue.Queue()
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    # ------------------------------------------------------------------

    def submit(
        self,
        prompt_ids: Sequence[int],
        max_new_tokens: int = 512,
        sampling: Optional[SamplingParams] = None,
        stop_ids: Optional[set] = None,
        want_logprobs: bool = False,
    ) -> Request:
        req = Request(
            prompt_ids=list(prompt_ids),
            max_new_tokens=max_new_tokens,
            sampling=sampling or SamplingParams(),
            stop_ids=stop_ids
            or {self.cfg.eos_token_id, *self.cfg.extra_stop_token_ids},
            want_logprobs=want_logprobs,
        )
        self._in_queue.put(req)
        return req

    def shutdown(self):
        self._stop.set()
        self._thread.join(timeout=30)

    # ------------------------------------------------------------------

    def _chunk_fn(self, hist_bucket: int):
        if hist_bucket not in self._chunk_fns:
            self._chunk_fns[hist_bucket] = jax.jit(
                make_chunk_prefill_fn(self.cfg, self.quant, hist_bucket,
                                      mesh=self.mesh, offload=self.offload),
                donate_argnums=(3,),
            )
        return self._chunk_fns[hist_bucket]

    def _spec_chunk_fn(self, hist_bucket: int):
        if hist_bucket not in self._spec_chunk_fns:
            from ..models.mtp import make_spec_prefill_fn

            self._spec_chunk_fns[hist_bucket] = jax.jit(
                make_spec_prefill_fn(self.cfg, self.quant, hist_bucket,
                                     mesh=self.mesh),
                donate_argnums=(5, 6),
            )
        return self._spec_chunk_fns[hist_bucket]

    def _free_slot(self) -> int:
        for i, r in enumerate(self._active):
            if r is None:
                return i
        return -1

    def _start_admission(self) -> bool:
        """Pop a queued request and reserve a slot; prefill advances one
        chunk at a time via _admit_step so active slots keep decoding."""
        slot = self._free_slot()
        if slot < 0:
            return False
        while True:
            try:
                req = self._in_queue.get_nowait()
            except queue.Empty:
                return False
            if req.cancelled.is_set():
                req.out_queue.put(None)
                continue
            break
        # Over-long prompts keep their END (recent context); max_new is
        # clamped to the remaining cache room so decode never scatters
        # past the cache (client-supplied max_tokens must not be able to
        # silently drop prompt tokens or overrun the cache).
        ids = req.prompt_ids
        if len(ids) > self.max_len - 2:
            ids = ids[-(self.max_len - 2):]
        req.max_new_tokens = max(
            1, min(req.max_new_tokens, self.max_len - len(ids) - 1)
        )
        req.slot = slot
        pcache = self.prefill_cache
        # Incremental prefix reuse (multi-turn chat: every request re-sends
        # the whole conversation): if the new prompt extends the tokens
        # already materialized in the prefill cache — the previous
        # admission's prompt, or the prefilled part of a cancelled one —
        # resume prefill after the shared prefix instead of starting over.
        # KV/DeltaNet state in the cache correspond exactly to
        # self._pc_tokens (chunks advance them sequentially), and stale KV
        # beyond `length` is masked. Only a STRICT extension qualifies:
        # reusing a prefix shorter than _pc_tokens would need the DeltaNet
        # state rewound, which a recurrence cannot do — and strictness
        # also guarantees ≥1 new token to prefill (the last token
        # produces the first-sample logits).
        n_pc = len(self._pc_tokens)
        reuse = 0
        if 0 < n_pc < len(ids) and ids[:n_pc] == self._pc_tokens:
            reuse = n_pc
        if reuse == 0:
            pcache["length"] = jnp.zeros((1,), jnp.int32)
            # DeltaNet state must start clean (not masked by length)
            for lc in list(pcache["prefix_layers"]) + list(pcache["pattern"]):
                if "state" in lc:
                    lc["state"] = jnp.zeros_like(lc["state"])
                    lc["conv"] = jnp.zeros_like(lc["conv"])
            self._pc_tokens = []
            if self.spec:
                self.mtp_prefill_cache["length"] = jnp.zeros((1,), jnp.int32)
        else:
            self.stats["prefix_reused_tokens"] += reuse
            if self.spec:
                # Reused prefix: clamp the MTP cache to the shared part
                # (its row at reuse-1 was computed against the PREVIOUS
                # turn's sampled token — stale MTP rows only lower
                # acceptance, never correctness, so clamping rather than
                # rebuilding is fine).
                self.mtp_prefill_cache["length"] = jnp.minimum(
                    self.mtp_prefill_cache["length"], reuse)
        self._pending = {"req": req, "ids": ids, "pos": reuse,
                         "pcache": pcache, "logits": None,
                         "mcache": self.mtp_prefill_cache if self.spec
                         else None, "h_last": None}
        return True

    def _admit_step(self):
        """Advance the in-progress admission by ONE prefill chunk (or
        start/finish one). Interleaving chunks with decode steps keeps
        active streams flowing during a long admission, and honors
        cancellation at chunk granularity (a disconnect mid-prefill stops
        paying for the rest of the prompt)."""
        if self._pending is None and not self._start_admission():
            return
        p = self._pending
        req = p["req"]
        if req.cancelled.is_set():
            # keep the LATEST prefill-cache buffer (the original was
            # donated into it chunk by chunk) for the next admission
            self.prefill_cache = p["pcache"]
            if self.spec:
                self.mtp_prefill_cache = p["mcache"]
            req.out_queue.put(None)
            self._pending = None
            return
        ids, pos, n = p["ids"], p["pos"], len(p["ids"])
        chunk = self.chunk
        if pos == 0:
            m = min(n, chunk)
            width = pick_bucket(m)
        else:
            m = min(chunk, n - pos)
            width = chunk
        tokens = np.zeros((1, width), np.int32)
        tokens[0, :m] = ids[pos : pos + m]
        hist = 0 if pos == 0 else pick_history_bucket(pos)
        if self.spec:
            # spec prefill: MTP module runs over the shifted chunk
            # (models/mtp.py make_spec_prefill_fn)
            k = min(m, n - 1 - pos)
            nxt = np.zeros((1, width), np.int32)
            nxt[0, :k] = ids[pos + 1 : pos + 1 + k]
            p["logits"], p["h_last"], p["pcache"], p["mcache"] = (
                self._spec_chunk_fn(hist)(
                    self.params, jnp.asarray(tokens), jnp.asarray(nxt),
                    jnp.asarray([m]), jnp.asarray([k]), p["pcache"],
                    p["mcache"],
                )
            )
        elif pos == 0:
            p["logits"], p["pcache"] = self._prefill(
                self.params, jnp.asarray(tokens), jnp.asarray([m]),
                p["pcache"],
            )
        else:
            p["logits"], p["pcache"] = self._chunk_fn(hist)(
                self.params, jnp.asarray(tokens), jnp.asarray([m]),
                p["pcache"],
            )
        p["pos"] = pos + m
        self.stats["prefill_chunks"] += 1
        self._pc_tokens = ids[: p["pos"]]
        if p["pos"] < n:
            return
        # prefill complete → insert into the reserved slot + first sample
        slot = req.slot
        self.prefill_cache = p["pcache"]
        self.decode_cache = self._insert(self.decode_cache, p["pcache"],
                                         jnp.int32(slot))
        self._key, sk = jax.random.split(self._key)
        sp = req.sampling
        tok_a, lp_a = self._first_sample(
            sk, p["logits"],
            jnp.asarray([sp.temperature], jnp.float32),
            jnp.asarray([sp.top_p], jnp.float32),
            jnp.asarray([sp.presence_penalty], jnp.float32),
            jnp.zeros((1, self.cfg.vocab_size), jnp.bool_),
            jnp.asarray([sp.top_k], jnp.int32),
        )
        tok = int(tok_a[0])
        req.logprobs.append(float(lp_a[0]))
        if self.spec:
            draft_a, mcache = self._first_draft(
                self.params, tok_a, p["h_last"], p["mcache"])
            self.mtp_prefill_cache = mcache
            self.mtp_decode_cache = self._insert_mtp(
                self.mtp_decode_cache, mcache, jnp.int32(slot))
            self._drafts[slot] = np.asarray(draft_a[0])
        elif self.spec_mode == "ngram":
            # seed the slot's on-device lookup history: prompt + first
            # sampled token (stale data past that is masked by hlen)
            row = np.zeros((self.max_len,), np.int32)
            row[: len(ids)] = ids
            row[len(ids)] = tok
            self._hist = self._hist.at[slot].set(jnp.asarray(row))
        self._seen = self._seen.at[slot].set(False).at[slot, tok].set(True)
        self._temp[slot] = sp.temperature
        self._top_p[slot] = sp.top_p
        self._pres[slot] = sp.presence_penalty
        self._top_k[slot] = sp.top_k
        self._active[slot] = req
        self._tokens[slot] = tok
        self._pending = None
        self._emit(req, tok)

    def _emit(self, req: Request, tok: int):
        req.emitted += 1
        req.out_queue.put(tok)
        done = (
            tok in req.stop_ids
            or req.emitted >= req.max_new_tokens
            or req.cancelled.is_set()
        )
        if done:
            req.out_queue.put(None)          # end-of-stream sentinel
            self._active[req.slot] = None

    def _admit_step_with_oom_retry(self):
        """Engine-parity HBM-OOM handling (reference model.py:2613 chunk
        halving): a prefill chunk that exhausts device memory restarts
        the CURRENT admission from scratch with half the chunk size —
        active decode slots are untouched."""
        try:
            self._admit_step()
        except Exception as e:
            if not _is_oom(e) or self.chunk <= 128 or self._pending is None:
                raise
            self.chunk //= 2
            import logging

            logging.getLogger("krasis_tpu.scheduler").warning(
                "admission prefill hit RESOURCE_EXHAUSTED; retrying with "
                "chunk=%d", self.chunk,
            )
            p = self._pending
            # restart this admission on a FRESH prefill cache: the old
            # buffer was donated into the failed call and may be invalid
            fresh = init_cache(self.cfg, self.quant, 1, self.max_len)
            self.prefill_cache = fresh
            mfresh = None
            if self.spec:
                mfresh = init_mtp_cache(self.cfg, self.quant, 1,
                                        self.max_len)
                self.mtp_prefill_cache = mfresh
            self._pc_tokens = []
            self._pending = {"req": p["req"], "ids": p["ids"], "pos": 0,
                             "pcache": fresh, "logits": None,
                             "mcache": mfresh, "h_last": None}

    def _loop(self):
        while not self._stop.is_set():
            self._admit_step_with_oom_retry()
            if not any(self._active):
                if self._pending is None:
                    time.sleep(0.002)
                continue
            if self.spec_mode is not None:
                self._spec_decode_block()
                continue
            decode_fn = (self._decode_sample_lp
                         if any(r is not None and r.want_logprobs
                                for r in self._active)
                         else self._decode_sample)
            toks, lps, _top, self.decode_cache, self._key, self._seen = (
                decode_fn(
                    self.params, jnp.asarray(self._tokens), self.decode_cache,
                    self._key, self._seen,
                    jnp.asarray(self._temp), jnp.asarray(self._top_p),
                    jnp.asarray(self._pres), jnp.asarray(self._top_k),
                )
            )
            toks_host = np.asarray(toks)  # [decode_block, num_slots]
            lps_host = np.asarray(lps)
            # Emit block tokens in generation order per slot. A slot that
            # hits its stop condition mid-block stops emitting (the rest
            # of its block is bounded overshoot, like Engine.generate);
            # the freed slot is reused at the next admission.
            for step in range(toks_host.shape[0]):
                for slot, req in enumerate(self._active):
                    if req is None:
                        continue
                    tok = int(toks_host[step, slot])
                    self._tokens[slot] = tok
                    req.logprobs.append(float(lps_host[step, slot]))
                    self._emit(req, tok)

    def _spec_decode_block(self):
        """One speculative decode block over all slots: every verify step
        commits 1..spec_k+1 tokens per slot, per that slot's accepted
        draft prefix (models/mtp.py make_spec_decode_fn /
        models/spec_ngram.py make_ngram_decode_fn)."""
        if self.spec_mode == "ngram":
            (ts, lps, ncommit, tok, self.decode_cache, self._hist,
             self._key, self._seen) = self._ngram_decode(
                self.params, jnp.asarray(self._tokens), self.decode_cache,
                self._hist, self._key, self._seen,
                jnp.asarray(self._temp), jnp.asarray(self._top_p),
                jnp.asarray(self._pres), jnp.asarray(self._top_k),
            )
            self._tokens = np.asarray(tok).copy()
        else:
            (ts, lps, ncommit, tok, drafts, self.decode_cache,
             self.mtp_decode_cache, self._key, self._seen) = self._spec_decode(
                self.params, jnp.asarray(self._tokens),
                jnp.asarray(self._drafts), self.decode_cache,
                self.mtp_decode_cache, self._key, self._seen,
                jnp.asarray(self._temp), jnp.asarray(self._top_p),
                jnp.asarray(self._pres), jnp.asarray(self._top_k),
            )
            self._tokens = np.asarray(tok).copy()
            self._drafts = np.asarray(drafts).copy()
        ts_h = np.asarray(ts)          # [steps, slots, k+1]
        lps_h = np.asarray(lps)
        nc_h = np.asarray(ncommit)     # [steps, slots]
        for step in range(ts_h.shape[0]):
            for slot, req in enumerate(self._active):
                if req is None:
                    continue
                n = int(nc_h[step, slot])
                self.stats_spec["steps"] += 1
                self.stats_spec["accepted"] += n - 1
                for j in range(n):
                    if self._active[slot] is not req:  # freed mid-step
                        break
                    req.logprobs.append(float(lps_h[step, slot, j]))
                    self._emit(req, int(ts_h[step, slot, j]))
