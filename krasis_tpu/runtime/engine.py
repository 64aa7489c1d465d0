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
from ..models.model import make_forward_fns
from ..ops.sampling import SamplingParams, sample
from .kv_cache import init_cache

PREFILL_BUCKETS = (128, 256, 512, 1024, 2048, 4096, 8192, 16384, 32768, 65536)


def pick_bucket(n: int) -> int:
    for b in PREFILL_BUCKETS:
        if n <= b:
            return b
    raise ValueError(f"prompt too long: {n}")


@dataclass
class GenerationResult:
    tokens: List[int]
    prompt_len: int
    prefill_s: float
    decode_s: float

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
    ):
        self.cfg = cfg
        self.quant = quant
        self.params = params
        self.max_len = max_len
        self.batch_size = batch_size

        prefill_fn, decode_fn, prefill_all_fn = make_forward_fns(cfg, quant)
        self._prefill = jax.jit(prefill_fn, donate_argnums=(3,))
        self._decode = jax.jit(decode_fn, donate_argnums=(2,))
        self._prefill_all = jax.jit(prefill_all_fn, donate_argnums=(3,))
        self._sample = jax.jit(
            lambda key, logits, seen: sample(key, logits, self.sampling, seen),
            static_argnums=(),
        )
        self.sampling = SamplingParams()
        self.cache = init_cache(cfg, quant, batch_size, max_len)

    def reset(self):
        self.cache = init_cache(self.cfg, self.quant, self.batch_size, self.max_len)

    # ------------------------------------------------------------------

    def generate(
        self,
        prompt_ids: Sequence[int],
        max_new_tokens: int = 64,
        sampling: Optional[SamplingParams] = None,
        stop_ids: Optional[set] = None,
        seed: int = 0,
        on_token=None,
    ) -> GenerationResult:
        """Single-sequence generation (batch slot 0)."""
        sampling = sampling or SamplingParams(temperature=0.0)
        stop_ids = stop_ids or {self.cfg.eos_token_id, *self.cfg.extra_stop_token_ids}
        self.reset()

        n = len(prompt_ids)
        bucket = pick_bucket(n)
        B = self.batch_size
        tokens = np.zeros((B, bucket), np.int32)
        tokens[0, :n] = prompt_ids
        seq_lens = np.zeros((B,), np.int32)
        seq_lens[0] = n

        t0 = time.perf_counter()
        logits, self.cache = self._prefill(
            self.params, jnp.asarray(tokens), jnp.asarray(seq_lens), self.cache
        )
        logits.block_until_ready()
        t1 = time.perf_counter()

        key = jax.random.PRNGKey(seed)
        seen = jnp.zeros((B, self.cfg.vocab_size), jnp.bool_)
        out_tokens: List[int] = []
        key, sk = jax.random.split(key)
        next_tok = sample(sk, logits, sampling, seen)

        t2 = time.perf_counter()
        for _ in range(max_new_tokens):
            tok = int(next_tok[0])
            out_tokens.append(tok)
            if on_token is not None:
                on_token(tok)
            if tok in stop_ids:
                break
            seen = seen.at[0, tok].set(True)
            logits, self.cache = self._decode(
                self.params, next_tok[:, None], self.cache
            )
            key, sk = jax.random.split(key)
            next_tok = sample(sk, logits, sampling, seen)
        jax.block_until_ready(next_tok)
        t3 = time.perf_counter()

        return GenerationResult(
            tokens=out_tokens, prompt_len=n,
            prefill_s=t1 - t0, decode_s=t3 - t2,
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
