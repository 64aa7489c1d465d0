"""Prompt-lookup (n-gram) speculative decoding — draft-model-free.

Capability addition over the reference engine (brontoguana/krasis has no
speculative decoding at all): drafts come from the request's own token
history — the longest n-gram ending at the current token is matched
against earlier history, and the tokens that followed its most recent
occurrence become the draft. No extra weights, so it works for EVERY
model family, including DeltaNet hybrids (Qwen3-Next / QCN / Qwen3.5),
whose recurrent state the verify step rolls back via
models/model.py la_spec_commit. High acceptance on the workloads that
re-quote their context (code editing, summarisation, RAG, multi-turn).

The verify step is the same exactness core as MTP spec decoding
(models/mtp.py verify_and_sample): greedy output is bit-identical to
vanilla decode; sampled output follows the identical distribution.
Drafts only ever set the acceptance rate.

The token history lives ON DEVICE ([B, cache_len] int32, a few hundred
KB) and is updated in-graph by the fused verify block — drafting never
costs a host round trip (~28 ms through a relay tunnel).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import ModelConfig, QuantConfig
from .model import forward, la_spec_commit
from .mtp import verify_and_sample


def ngram_draft(hist: jax.Array, hlen: jax.Array, k: int,
                n_max: int = 3) -> jax.Array:
    """Draft `k` tokens by prompt lookup.

    hist [B, L] int32 token history; hlen [B] committed tokens (the
    current last token sits at hist[hlen-1]). For n = n_max..1, match
    the trailing n-gram hist[hlen-n:hlen] against every window fully
    inside the committed region (excluding the trailing gram itself) and
    take the MOST RECENT match of the LONGEST n; the draft is the k
    tokens that followed it. Rows with no match draft their last token
    repeated (acceptance simply fails — drafts never affect outputs).
    """
    B, L = hist.shape
    # continuation start index (match position + n), -1 = not found yet
    start = jnp.full((B,), -1, jnp.int32)
    for n in range(n_max, 0, -1):
        W = L - n + 1
        pos = jnp.arange(W)
        win = jnp.stack([hist[:, j : j + W] for j in range(n)], axis=-1)
        gram_idx = jnp.maximum(hlen[:, None] - n + jnp.arange(n)[None], 0)
        gram = jnp.take_along_axis(hist, gram_idx, axis=1)     # [B, n]
        m = jnp.all(win == gram[:, None, :], axis=-1)          # [B, W]
        # window strictly before the trailing gram, gram fully present
        m = m & (pos[None] <= hlen[:, None] - n - 1) & (hlen[:, None] > n)
        p = jnp.max(jnp.where(m, pos[None], -1), axis=1)       # [B]
        start = jnp.where(start >= 0, start,
                          jnp.where(p >= 0, p + n, -1))
    last = jnp.take_along_axis(
        hist, jnp.maximum(hlen - 1, 0)[:, None], axis=1)[:, 0]
    idx = jnp.clip(start[:, None] + jnp.arange(k)[None], 0, L - 1)
    cont = jnp.take_along_axis(hist, idx, axis=1)              # [B, k]
    return jnp.where((start >= 0)[:, None], cont,
                     last[:, None]).astype(jnp.int32)


def make_ngram_decode_fn(cfg: ModelConfig, quant: QuantConfig, steps: int,
                         mesh=None, max_top_k: int = 64, k: int = 1,
                         n_max: int = 3):
    """Fused prompt-lookup speculative decode block: `steps` verify
    steps per device call, each committing 1..k+1 tokens per row.

    Carries (tok, cache, hist, key, seen); drafts are computed in-graph
    from `hist` at the top of each step, committed samples are scattered
    back into `hist` (stale rows past the committed length are masked
    out of matching and overwritten by later steps — the KV-cache
    invariant applied to the token history). Returns per step
    (tokens [steps, B, k+1], logprobs alike, n_committed [steps, B])
    plus the carried state."""
    S = k + 1

    def fn(params, tok, cache, hist, key, seen, temp, top_p, pres, top_k):
        B = tok.shape[0]
        seqS = jnp.full((B,), S, jnp.int32)
        rows = jnp.arange(B)

        def body(carry, _):
            tok, cache, hist, key, seen = carry
            hlen = cache["length"] + 1          # committed incl. `tok`
            drafts = ngram_draft(hist, hlen, k, n_max)
            toksS = jnp.concatenate([tok[:, None], drafts], axis=1)
            logits, cache = forward(
                params, toksS, seqS, cache, cfg, quant, prefill=False,
                return_all_logits=True, mesh=mesh, spec_la=True,
            )
            ts_a, lps_a, ncommit, seen, key = verify_and_sample(
                logits, drafts, key, seen, temp, top_p, pres, top_k,
                max_top_k)
            cache = la_spec_commit(cache, ncommit)
            # sequence continuation after `tok`: sampled tokens land at
            # hist[hlen + i]; rejected rows stay stale-but-masked
            posS = hlen[:, None] + jnp.arange(S)[None]
            hist = hist.at[rows[:, None], posS].set(
                ts_a, mode="drop")
            # roll the cache length back to the committed prefix
            cache = dict(cache, length=cache["length"] - (S - ncommit))
            next_tok = jnp.take_along_axis(
                ts_a, (ncommit - 1)[:, None], axis=1)[:, 0]
            return (next_tok, cache, hist, key, seen), (ts_a, lps_a, ncommit)

        (tok, cache, hist, key, seen), (ts, lps, ncommit) = jax.lax.scan(
            body, (tok, cache, hist, key, seen), None, length=steps,
        )
        return ts, lps, ncommit, tok, cache, hist, key, seen

    return fn
