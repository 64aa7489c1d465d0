"""Generation engine: jitted prefill + decode loop over the model fns.

The offline/serving entry analogous to the reference's
KrasisModel.generate → CpuDecodeStore.generate_batch
(reference python/krasis/model.py:3404, src/decode.rs:3525): prefill the
prompt in one jitted call, then run the jitted decode step in a Python
loop with donated cache (zero-copy cache update on device), sampling on
device. Prompt lengths are padded to bucket sizes so a handful of
compiled prefill programs cover all lengths.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig, QuantConfig
from ..models.model import make_chunk_prefill_fn, make_forward_fns


def enable_persistent_compilation_cache():
    """Compiles on this machine round-trip a remote-compile tunnel and can
    take minutes for full-size models; the persistent jit cache makes
    every recompile of an unchanged graph a disk hit (the TPU analog of
    the reference's quantized-weight disk cache philosophy: pay once)."""
    import os

    d = os.path.join(
        os.environ.get("KRASIS_TPU_HOME", os.path.expanduser("~/.krasis_tpu")),
        "jit_cache",
    )
    os.makedirs(d, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
from ..ops.sampling import SamplingParams, sample
from .kv_cache import init_cache, init_mtp_cache, resolve_kv_quant

# Single-shot prefill buckets; prompts beyond CHUNK go through chunked
# prefill (reference model.py:2752 token chunking, here with cache-prefix
# history buckets so a handful of compiled programs cover any length).
PREFILL_BUCKETS = (128, 256, 512, 1024, 2048)
CHUNK = 2048
HISTORY_BUCKETS = (2048, 4096, 8192, 16384, 32768, 65536)


def _is_oom(e: Exception) -> bool:
    """True for XLA device-memory exhaustion (any backend's phrasing)."""
    s = f"{type(e).__name__}: {e}"
    return "RESOURCE_EXHAUSTED" in s or "Out of memory" in s


def pick_bucket(n: int) -> int:
    for b in PREFILL_BUCKETS:
        if n <= b:
            return b
    return PREFILL_BUCKETS[-1]


def pick_history_bucket(hist: int) -> int:
    for b in HISTORY_BUCKETS:
        if hist <= b:
            return b
    raise ValueError(f"history too long: {hist}")


def pick_cache_len(needed: int, max_len: int) -> int:
    """Smallest cache bucket covering `needed` tokens: decode attends
    over the WHOLE static cache each step, so sizing it to the request
    (instead of max_len) trims both the per-step KV read and the cache
    scatter (reference sizes its paged pool per request budget too)."""
    for b in HISTORY_BUCKETS:
        if needed <= b <= max_len:
            return b
    return max_len


@dataclass
class GenerationResult:
    tokens: List[int]
    prompt_len: int
    prefill_s: float
    decode_s: float
    # log P(token) under the raw model distribution, aligned with tokens
    logprobs: Optional[List[float]] = None
    # per token: list of (token_id, logprob) for the top-N alternatives
    # (only when generate(top_logprobs=N>0))
    top_logprobs: Optional[List[List[tuple]]] = None

    @property
    def prefill_tok_s(self) -> float:
        return self.prompt_len / self.prefill_s if self.prefill_s > 0 else 0.0

    @property
    def decode_tok_s(self) -> float:
        n = len(self.tokens)
        return n / self.decode_s if self.decode_s > 0 and n else 0.0


class Engine:
    """Single-model inference engine (one slot batch; continuous batching
    sits above in the server layer)."""

    def __init__(
        self,
        cfg: ModelConfig,
        quant: QuantConfig,
        params: Dict[str, Any],
        max_len: int = 4096,
        batch_size: int = 1,
        mesh=None,
        offload=None,
    ):
        self.cfg = cfg
        # Resolve "auto" kv dtype ONCE at the engine's full size so every
        # history bucket / request cache shares one storage dtype.
        self.quant = quant = resolve_kv_quant(cfg, quant, batch_size, max_len)
        if quant.fold_shared_decode and mesh is None and offload is None:
            # shared experts as virtual routed experts on the decode path
            # (idempotent: detected by stack shape, no-op when folded).
            # Full-size checkpoints arrive ALREADY folded — loader.
            # load_params folds host-side before placement, so this
            # device-side concat (which transiently doubles each expert
            # stack) only ever runs on small synthetic/test params.
            from ..models.params import fold_shared_experts

            params = fold_shared_experts(params, cfg, quant)
        self.params = params
        self.max_len = max_len
        self.batch_size = batch_size
        self.mesh = mesh
        # Host-RAM expert offload (offload.HostExpertStore): routed
        # experts live in host memory; the forward graphs call back into
        # the host engine per MoE layer (models/model.py _offload_moe).
        self.offload = offload
        enable_persistent_compilation_cache()

        prefill_fn, decode_fn, prefill_all_fn = make_forward_fns(
            cfg, quant, mesh=mesh, offload=offload)
        self._prefill = jax.jit(prefill_fn, donate_argnums=(3,))
        self._decode = jax.jit(decode_fn, donate_argnums=(2,))
        self._prefill_all = jax.jit(prefill_all_fn, donate_argnums=(3,))
        self._chunk_fns = {}  # history bucket → jitted continuation prefill
        self._multi_decode_fns = {}  # (sampling, steps) → jitted block decode
        self._sample_fns = {}        # sampling → jitted first-token sampler
        self.decode_block = 8       # tokens per device call
        self.chunk = CHUNK          # prefill chunk; halves on HBM OOM
        self.sampling = SamplingParams()
        # MTP self-speculative decoding (models/mtp.py): each verify step
        # commits 1..spec_k+1 tokens; the single MTP module is recursed
        # for depths beyond 1. Gate + depth come from the shared
        # spec_config (one source for engine AND scheduler).
        from ..models.mtp import spec_config

        self.spec_mode, self.spec_k = spec_config(cfg, params)
        if offload is not None:
            # Speculative paths have their own forward graphs that don't
            # carry the offload callback yet; vanilla decode only.
            self.spec_mode = None
        self.spec_available = self.spec_mode is not None
        import os

        self.spec_ngram_n = int(os.environ.get("KRASIS_TPU_NGRAM_N", "3"))
        self._spec_prefill_fns = {}   # history bucket → jitted chunk fn
        self._spec_decode_fns = {}    # (steps, max_top_k, k) → verify block
        self._ngram_decode_fns = {}   # (steps, max_top_k) → ngram verify block
        self._first_draft_fns = {}    # spec_k → jitted first-draft chain
        self.mtp_cache = None
        self.last_spec_stats: Optional[Dict[str, int]] = None
        self._cache_len = max_len
        self.cache = init_cache(cfg, quant, batch_size, max_len)
        if self.spec_mode == "mtp":
            self.mtp_cache = init_mtp_cache(cfg, quant, batch_size, max_len)

    def _sample_fn(self, sampling: SamplingParams):
        if sampling not in self._sample_fns:
            from ..models.model import chosen_logprob

            def fn(key, logits, seen):
                tok = sample(key, logits, sampling, seen)
                return tok, chosen_logprob(logits, tok)

            self._sample_fns[sampling] = jax.jit(fn)
        return self._sample_fns[sampling]

    def _multi_decode_fn(self, sampling: SamplingParams, steps: int,
                         top_logprobs: int = 0, need_logprobs: bool = True):
        from ..models.model import make_multi_decode_fn

        key = (sampling, steps, top_logprobs, need_logprobs)
        if key not in self._multi_decode_fns:
            self._multi_decode_fns[key] = jax.jit(
                make_multi_decode_fn(self.cfg, self.quant, sampling, steps,
                                     mesh=self.mesh,
                                     top_logprobs=top_logprobs,
                                     offload=self.offload,
                                     need_logprobs=need_logprobs),
                donate_argnums=(2,),
            )
        return self._multi_decode_fns[key]

    def _chunk_fn(self, hist_bucket: int):
        if hist_bucket not in self._chunk_fns:
            self._chunk_fns[hist_bucket] = jax.jit(
                make_chunk_prefill_fn(self.cfg, self.quant, hist_bucket,
                                      mesh=self.mesh, offload=self.offload),
                donate_argnums=(3,),
            )
        return self._chunk_fns[hist_bucket]

    # -- speculative decoding (models/mtp.py) ---------------------------

    def _spec_prefill_fn(self, hist_bucket: int):
        if hist_bucket not in self._spec_prefill_fns:
            from ..models.mtp import make_spec_prefill_fn

            self._spec_prefill_fns[hist_bucket] = jax.jit(
                make_spec_prefill_fn(self.cfg, self.quant, hist_bucket,
                                     mesh=self.mesh),
                donate_argnums=(5, 6),
            )
        return self._spec_prefill_fns[hist_bucket]

    def _spec_decode_fn(self, steps: int, max_top_k: int):
        key = (steps, max_top_k, self.spec_k)
        if key not in self._spec_decode_fns:
            from ..models.mtp import make_spec_decode_fn

            self._spec_decode_fns[key] = jax.jit(
                make_spec_decode_fn(self.cfg, self.quant, steps,
                                    mesh=self.mesh, max_top_k=max_top_k,
                                    k=self.spec_k),
                donate_argnums=(3, 4),
            )
        return self._spec_decode_fns[key]

    def _first_draft_fn(self):
        if self.spec_k not in self._first_draft_fns:
            from ..models.mtp import make_first_draft_fn

            self._first_draft_fns[self.spec_k] = jax.jit(
                make_first_draft_fn(self.cfg, self.quant, mesh=self.mesh,
                                    k=self.spec_k),
                donate_argnums=(3,),
            )
        return self._first_draft_fns[self.spec_k]

    def _ngram_decode_fn(self, steps: int, max_top_k: int):
        key = (steps, max_top_k, self.spec_k, self.spec_ngram_n)
        if key not in self._ngram_decode_fns:
            from ..models.spec_ngram import make_ngram_decode_fn

            self._ngram_decode_fns[key] = jax.jit(
                make_ngram_decode_fn(self.cfg, self.quant, steps,
                                     mesh=self.mesh, max_top_k=max_top_k,
                                     k=self.spec_k, n_max=self.spec_ngram_n),
                donate_argnums=(2, 3),
            )
        return self._ngram_decode_fns[key]

    def _spec_prefill_prompt(self, prompt_ids):
        """Speculative prefill (main chunks + MTP module over the shifted
        prompt), with the same OOM chunk-halving retry as the vanilla
        path. Returns (last-token logits, last-position hidden)."""
        while True:
            try:
                return self._spec_prefill_prompt_once(prompt_ids)
            except Exception as e:
                if not _is_oom(e) or self.chunk <= 128:
                    raise
                self.chunk //= 2
                import logging

                logging.getLogger("krasis_tpu.engine").warning(
                    "spec prefill hit RESOURCE_EXHAUSTED; retrying with "
                    "chunk=%d", self.chunk,
                )
                self.reset(self._cache_len)

    def _spec_prefill_prompt_once(self, prompt_ids):
        n = len(prompt_ids)
        B = self.batch_size
        pos = 0
        logits = h_last = None
        while pos < n:
            m = min(self.chunk, n - pos)
            width = pick_bucket(m) if pos == 0 else self.chunk
            tokens = np.zeros((B, width), np.int32)
            tokens[0, :m] = prompt_ids[pos : pos + m]
            # MTP inputs are the prompt shifted left by one; the final
            # chunk's last position waits for the first sampled token.
            k = min(m, n - 1 - pos)
            nxt = np.zeros((B, width), np.int32)
            nxt[0, :k] = prompt_ids[pos + 1 : pos + 1 + k]
            seq = np.zeros((B,), np.int32)
            seq[0] = m
            mseq = np.zeros((B,), np.int32)
            mseq[0] = k
            fn = self._spec_prefill_fn(
                0 if pos == 0 else pick_history_bucket(pos))
            logits, h_last, self.cache, self.mtp_cache = fn(
                self.params, jnp.asarray(tokens), jnp.asarray(nxt),
                jnp.asarray(seq), jnp.asarray(mseq), self.cache,
                self.mtp_cache,
            )
            pos += m
        return logits, h_last

    def _generate_spec(
        self, prompt_ids, max_new_tokens, sampling, stop_ids, seed,
        on_token, on_token_lp,
    ) -> GenerationResult:
        """Generation through speculative decoding — MTP-module drafts
        (models/mtp.py) or prompt-lookup drafts (models/spec_ngram.py),
        per self.spec_mode: 1..spec_k+1 tokens committed per verify
        step. Greedy output is bit-identical to the vanilla path;
        sampled output is distribution-exact. Acceptance stats land in
        self.last_spec_stats."""
        mtp = self.spec_mode != "ngram"
        n = len(prompt_ids)
        block = self.decode_block
        # each verify step may touch spec_k+1 cache positions
        span = (self.spec_k + 1) * block
        room = self.max_len - n - 1 - span
        if room < 1:
            raise ValueError(
                f"prompt ({n} tokens) leaves no room to generate within "
                f"max_len={self.max_len}"
            )
        max_new_tokens = min(max_new_tokens, room)
        self.reset(pick_cache_len(
            n + max_new_tokens + span + 1, self.max_len))
        t0 = time.perf_counter()
        if mtp:
            logits, h_last = self._spec_prefill_prompt(prompt_ids)
        else:
            logits = self._prefill_prompt(prompt_ids)
        logits.block_until_ready()
        t1 = time.perf_counter()
        B = self.batch_size

        key = jax.random.PRNGKey(seed)
        seen = jnp.zeros((B, self.cfg.vocab_size), jnp.bool_)
        out_tokens: List[int] = []
        out_lps: List[float] = []
        stopped = False

        def emit(tok: int, lp: float) -> bool:
            nonlocal stopped
            out_tokens.append(tok)
            out_lps.append(lp)
            try:
                if on_token is not None:
                    on_token(tok)
                if on_token_lp is not None:
                    on_token_lp(tok, lp)
            except StopIteration:
                stopped = True
            if tok in stop_ids or len(out_tokens) >= max_new_tokens:
                stopped = True
            return not stopped

        key, sk = jax.random.split(key)
        next_tok, first_lp = self._sample_fn(sampling)(sk, logits, seen)
        seen = seen.at[jnp.arange(B), next_tok].set(True)
        emit(int(next_tok[0]), float(first_lp[0]))

        t2 = time.perf_counter()
        steps_total = accepted_total = 0
        from ..models.model import static_max_top_k

        mtk = static_max_top_k(sampling, self.cfg.vocab_size)
        temp = jnp.full((B,), jnp.float32(sampling.temperature))
        topp = jnp.full((B,), jnp.float32(sampling.top_p))
        pres = jnp.full((B,), jnp.float32(sampling.presence_penalty))
        topk = jnp.full((B,), jnp.int32(sampling.top_k))
        if mtp:
            draft, self.mtp_cache = self._first_draft_fn()(
                self.params, next_tok, h_last, self.mtp_cache)
            fn = self._spec_decode_fn(block, mtk)
        else:
            # prompt-lookup drafting: the device-side token history seeds
            # with the prompt + first token (models/spec_ngram.py)
            hist_np = np.zeros((B, self._cache_len), np.int32)
            hist_np[0, :n] = prompt_ids
            hist_np[0, n] = int(next_tok[0])
            hist = jnp.asarray(hist_np)
            fn = self._ngram_decode_fn(block, mtk)
        while not stopped:
            if mtp:
                ts, lps, ncommit, next_tok, draft, self.cache, \
                    self.mtp_cache, key, seen = fn(
                        self.params, next_tok, draft, self.cache,
                        self.mtp_cache, key, seen, temp, topp, pres, topk,
                    )
            else:
                ts, lps, ncommit, next_tok, self.cache, hist, key, seen = fn(
                    self.params, next_tok, self.cache, hist, key, seen,
                    temp, topp, pres, topk,
                )
            ts_h = np.asarray(ts[:, 0, :])        # [steps, k+1]
            lps_h = np.asarray(lps[:, 0, :])
            nc_h = np.asarray(ncommit[:, 0]).tolist()
            for i in range(block):
                steps_total += 1
                accepted_total += nc_h[i] - 1
                for j in range(nc_h[i]):
                    if not emit(int(ts_h[i, j]), float(lps_h[i, j])):
                        break
                if stopped:
                    break
        jax.block_until_ready(next_tok)
        t3 = time.perf_counter()
        self.last_spec_stats = {
            "steps": steps_total,
            "accepted": accepted_total,
            "emitted": len(out_tokens),
        }
        return GenerationResult(
            tokens=out_tokens, prompt_len=n,
            prefill_s=t1 - t0, decode_s=t3 - t2,
            logprobs=out_lps,
        )

    def _prefill_prompt(self, prompt_ids):
        """Prefill a prompt of any length (chunked beyond self.chunk),
        with HBM-OOM retry: on RESOURCE_EXHAUSTED the chunk size is halved
        and the prompt re-prefilled from a fresh cache (reference
        model.py:2613 `_forward_prefill_with_oom_retry` chunk halving).
        Returns last-position logits."""
        while True:
            try:
                return self._prefill_prompt_once(prompt_ids)
            except Exception as e:  # jaxlib surfaces OOM as XlaRuntimeError
                if not _is_oom(e) or self.chunk <= 128:
                    raise
                self.chunk //= 2
                import logging

                logging.getLogger("krasis_tpu.engine").warning(
                    "prefill hit RESOURCE_EXHAUSTED; retrying with chunk=%d",
                    self.chunk,
                )
                self.reset(self._cache_len)

    def _prefill_prompt_once(self, prompt_ids):
        n = len(prompt_ids)
        B = self.batch_size
        first = min(n, self.chunk)
        bucket = pick_bucket(first)
        tokens = np.zeros((B, bucket), np.int32)
        tokens[0, :first] = prompt_ids[:first]
        seq_lens = np.zeros((B,), np.int32)
        seq_lens[0] = first
        logits, self.cache = self._prefill(
            self.params, jnp.asarray(tokens), jnp.asarray(seq_lens), self.cache
        )
        pos = first
        while pos < n:
            m = min(self.chunk, n - pos)
            tokens = np.zeros((B, self.chunk), np.int32)
            tokens[0, :m] = prompt_ids[pos : pos + m]
            seq_lens = np.zeros((B,), np.int32)
            seq_lens[0] = m
            fn = self._chunk_fn(pick_history_bucket(pos))
            logits, self.cache = fn(
                self.params, jnp.asarray(tokens), jnp.asarray(seq_lens),
                self.cache,
            )
            pos += m
        return logits

    def reset(self, cache_len: int | None = None):
        self._cache_len = cache_len or self.max_len
        self.cache = init_cache(
            self.cfg, self.quant, self.batch_size, self._cache_len
        )
        if self.spec_mode == "mtp":
            self.mtp_cache = init_mtp_cache(
                self.cfg, self.quant, self.batch_size, self._cache_len
            )

    # ------------------------------------------------------------------

    def generate(
        self,
        prompt_ids: Sequence[int],
        max_new_tokens: int = 64,
        sampling: Optional[SamplingParams] = None,
        stop_ids: Optional[set] = None,
        seed: int = 0,
        on_token=None,
        on_token_lp=None,
        top_logprobs: int = 0,
        want_logprobs: bool = True,
    ) -> GenerationResult:
        """Single-sequence generation (batch slot 0). `top_logprobs=N`
        additionally returns the top-N (token, logprob) alternatives per
        step from the raw model distribution. `on_token_lp(tok, logprob)`
        is the streaming-logprobs variant of `on_token(tok)`; both may be
        set (each fires per token, on_token first).

        `want_logprobs=False` skips the per-step chosen-logprob math
        (measured ≈free — XLA fuses it — but semantically the OpenAI
        default: logprobs are per-request opt-in) and returns zeros in
        `result.logprobs`; `top_logprobs>0` forces it on. The server
        passes the request's logprobs flag here."""
        sampling = sampling or SamplingParams(temperature=0.0)
        stop_ids = stop_ids or {self.cfg.eos_token_id, *self.cfg.extra_stop_token_ids}
        if self.spec_available and top_logprobs == 0:
            # MTP module present: speculative decoding commits 1..spec_k+1
            # tokens per verify step. Greedy output is bit-identical to
            # the vanilla path; sampled output is distribution-exact (the
            # PRNG stream advances differently — models/mtp.py docstring).
            # Near-max_len prompts fall through to the vanilla path: the
            # spec block's larger overshoot ((spec_k+1)*block vs block)
            # must never reject a request — or emit fewer tokens — than
            # vanilla decode would.
            n = len(prompt_ids)
            spec_room = self.max_len - n - 1 - (self.spec_k + 1) * self.decode_block
            vanilla_room = self.max_len - n - 1 - self.decode_block
            if spec_room >= min(max_new_tokens, vanilla_room):
                return self._generate_spec(
                    prompt_ids, max_new_tokens, sampling, stop_ids, seed,
                    on_token, on_token_lp,
                )
        self.last_spec_stats = None  # this request runs the vanilla path
        if on_token_lp is not None:
            tok_cb, lp_cb = on_token, on_token_lp

            def on_token(tok):
                if tok_cb is not None:
                    tok_cb(tok)
                lp_cb(tok, out_lps[-1])
        n = len(prompt_ids)
        # Decode runs in fused blocks that may overshoot by decode_block-1
        # positions; bound max_new so even the overshoot stays inside the
        # cache (out-of-range scatters are silently dropped by XLA, which
        # would degrade output instead of erroring).
        room = self.max_len - n - 1 - self.decode_block
        if room < 1:
            raise ValueError(
                f"prompt ({n} tokens) leaves no room to generate within "
                f"max_len={self.max_len}"
            )
        max_new_tokens = min(max_new_tokens, room)
        self.reset(pick_cache_len(
            n + max_new_tokens + self.decode_block + 1, self.max_len))
        t0 = time.perf_counter()
        logits = self._prefill_prompt(prompt_ids)
        logits.block_until_ready()
        t1 = time.perf_counter()
        B = self.batch_size

        key = jax.random.PRNGKey(seed)
        seen = jnp.zeros((B, self.cfg.vocab_size), jnp.bool_)
        out_tokens: List[int] = []
        out_lps: List[float] = []
        out_top: List[List[tuple]] = []
        key, sk = jax.random.split(key)
        next_tok, first_lp = self._sample_fn(sampling)(sk, logits, seen)
        if top_logprobs > 0:
            lsm = jax.nn.log_softmax(logits[0].astype(jnp.float32))
            tv, ti = jax.lax.top_k(lsm, top_logprobs)
            out_top.append(list(zip(np.asarray(ti).tolist(),
                                    np.asarray(tv).tolist())))
        seen = seen.at[0, next_tok[0]].set(True)

        # first (prefill) token. on_token raising StopIteration is the
        # caller's cancel signal (client gone / stop string hit): stop
        # cleanly and still return the partial GenerationResult.
        first = int(next_tok[0])
        out_tokens.append(first)
        out_lps.append(float(first_lp[0]))
        stopped = first in stop_ids
        if on_token is not None:
            try:
                on_token(first)
            except StopIteration:
                stopped = True

        # decode in fused blocks (one device call per `decode_block` tokens)
        t2 = time.perf_counter()
        block = self.decode_block
        # on_token_lp alone does NOT force the logprob math: the server
        # streams through it unconditionally and ignores the lp when the
        # request didn't ask — with want_logprobs=False the callback
        # (and result.logprobs) receives zeros
        need_lp = want_logprobs or top_logprobs > 0
        fn = self._multi_decode_fn(sampling, block, top_logprobs,
                                   need_logprobs=need_lp)

        # Block pipelining: block n+1 is DISPATCHED (pure device dataflow
        # on next_tok/cache/key/seen) before block n's host readbacks, so
        # the ~28 ms-per-readback tunnel round trips overlap the next
        # block's compute — measured 0.93 ms/tok of "outside-module" time
        # in benchmarks/decode_trace.json. Look-ahead is gated so no
        # block beyond max_new_tokens is ever launched; only a stop-id /
        # caller-cancel mid-pending discards one in-flight block (its
        # output is dropped, nothing waits on it).
        def _commit(p):
            nonlocal stopped
            toks, lps, tvs, tis = p
            lps_host = np.asarray(lps[:, 0]).tolist()
            if top_logprobs > 0:
                tvs_h = np.asarray(tvs[:, 0]).tolist()   # [steps][N]
                tis_h = np.asarray(tis[:, 0]).tolist()
            for i, tok in enumerate(np.asarray(toks[:, 0]).tolist()):
                out_tokens.append(tok)
                out_lps.append(lps_host[i])
                if top_logprobs > 0:
                    out_top.append(list(zip(tis_h[i], tvs_h[i])))
                if on_token is not None:
                    try:
                        on_token(tok)
                    except StopIteration:
                        stopped = True
                        break
                if tok in stop_ids or len(out_tokens) >= max_new_tokens:
                    stopped = True
                    break

        pending = None
        while not stopped:
            committed_ahead = len(out_tokens) + (
                block if pending is not None else 0)
            if committed_ahead >= max_new_tokens:
                break
            toks, lps, (tvs, tis), self.cache, key, seen = fn(
                self.params, next_tok, self.cache, key, seen
            )
            next_tok = toks[-1]
            if pending is not None:
                _commit(pending)
                if stopped:
                    pending = None   # drop the in-flight block
                    break
            pending = (toks, lps, tvs, tis)
        if pending is not None and not stopped:
            _commit(pending)
        t3 = time.perf_counter()

        return GenerationResult(
            tokens=out_tokens, prompt_len=n,
            prefill_s=t1 - t0, decode_s=t3 - t2,
            logprobs=out_lps,
            top_logprobs=(out_top[: len(out_tokens)]
                          if top_logprobs > 0 else None),
        )

    def forward_all_logits(self, prompt_ids: Sequence[int]) -> jax.Array:
        """All-position logits through the production path (perplexity)."""
        self.reset()
        n = len(prompt_ids)
        bucket = pick_bucket(n)
        B = self.batch_size
        tokens = np.zeros((B, bucket), np.int32)
        tokens[0, :n] = prompt_ids
        seq_lens = np.zeros((B,), np.int32)
        seq_lens[0] = n
        logits, self.cache = self._prefill_all(
            self.params, jnp.asarray(tokens), jnp.asarray(seq_lens), self.cache
        )
        return logits[0, :n]
