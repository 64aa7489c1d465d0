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
from ..models.model import make_forward_fns
from ..ops.sampling import SamplingParams, sample
from .engine import PREFILL_BUCKETS, pick_bucket
from .kv_cache import init_cache


def insert_slot(decode_cache, prefill_cache, slot: int):
    """Copy a batch-1 prefill cache into decode-cache slot `slot`.

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


@dataclass
class Request:
    prompt_ids: List[int]
    max_new_tokens: int
    sampling: SamplingParams
    stop_ids: set
    out_queue: "queue.Queue[Optional[int]]" = field(default_factory=queue.Queue)
    cancelled: threading.Event = field(default_factory=threading.Event)
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
    ):
        self.cfg = cfg
        self.quant = quant
        self.params = params
        self.max_len = max_len
        self.num_slots = num_slots

        prefill_fn, decode_fn, _ = make_forward_fns(cfg, quant)
        self._prefill = jax.jit(prefill_fn, donate_argnums=(3,))
        self._decode = jax.jit(decode_fn, donate_argnums=(2,))
        self._insert = jax.jit(insert_slot, static_argnums=(2,),
                               donate_argnums=(0,))

        self.decode_cache = init_cache(cfg, quant, num_slots, max_len)
        # one reusable batch-1 prefill cache (length reset per admission;
        # stale KV beyond `length` is masked and later overwritten)
        self.prefill_cache = init_cache(cfg, quant, 1, max_len)
        self._active: List[Optional[Request]] = [None] * num_slots
        self._tokens = np.zeros((num_slots, 1), np.int32)
        self._seen = jnp.zeros((num_slots, cfg.vocab_size), jnp.bool_)
        self._key = jax.random.PRNGKey(0)

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
    ) -> Request:
        req = Request(
            prompt_ids=list(prompt_ids),
            max_new_tokens=max_new_tokens,
            sampling=sampling or SamplingParams(),
            stop_ids=stop_ids
            or {self.cfg.eos_token_id, *self.cfg.extra_stop_token_ids},
        )
        self._in_queue.put(req)
        return req

    def shutdown(self):
        self._stop.set()
        self._thread.join(timeout=30)

    # ------------------------------------------------------------------

    def _free_slot(self) -> int:
        for i, r in enumerate(self._active):
            if r is None:
                return i
        return -1

    def _admit(self):
        """Prefill + insert as many queued requests as slots allow."""
        while True:
            slot = self._free_slot()
            if slot < 0:
                return
            try:
                req = self._in_queue.get_nowait()
            except queue.Empty:
                return
            if req.cancelled.is_set():
                continue
            n = len(req.prompt_ids)
            bucket = pick_bucket(min(n, self.max_len - req.max_new_tokens - 1))
            tokens = np.zeros((1, bucket), np.int32)
            tokens[0, :n] = req.prompt_ids[:bucket]
            pcache = self.prefill_cache
            pcache["length"] = jnp.zeros((1,), jnp.int32)
            # DeltaNet state must start clean (not masked by length)
            for lc in list(pcache["prefix_layers"]) + list(pcache["pattern"]):
                if "state" in lc:
                    lc["state"] = jnp.zeros_like(lc["state"])
                    lc["conv"] = jnp.zeros_like(lc["conv"])
            logits, pcache = self._prefill(
                self.params, jnp.asarray(tokens),
                jnp.asarray([min(n, bucket)]), pcache,
            )
            self.prefill_cache = pcache
            self.decode_cache = self._insert(self.decode_cache, pcache, slot)
            self._key, sk = jax.random.split(self._key)
            seen_row = jnp.zeros((self.cfg.vocab_size,), jnp.bool_)
            tok = int(sample(sk, logits, req.sampling, seen_row[None])[0])
            self._seen = self._seen.at[slot].set(False).at[slot, tok].set(True)
            req.slot = slot
            self._active[slot] = req
            self._tokens[slot, 0] = tok
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

    def _loop(self):
        while not self._stop.is_set():
            self._admit()
            if not any(self._active):
                time.sleep(0.002)
                continue
            logits, self.decode_cache = self._decode(
                self.params, jnp.asarray(self._tokens), self.decode_cache
            )
            self._key, sk = jax.random.split(self._key)
            # sample every slot with slot 0's params... sampling params are
            # per-request; use per-slot temperature via host loop (B small).
            logits_host = None
            for slot, req in enumerate(self._active):
                if req is None:
                    continue
                self._key, sk = jax.random.split(self._key)
                tok = int(
                    sample(sk, logits[slot][None], req.sampling,
                           self._seen[slot][None])[0]
                )
                self._seen = self._seen.at[slot, tok].set(True)
                self._tokens[slot, 0] = tok
                self._emit(req, tok)
