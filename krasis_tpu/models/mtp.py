"""Multi-token prediction (MTP) module + self-speculative decoding.

DeepSeek V3 / R1 / Kimi K2 checkpoints ship an extra transformer layer
(index ``num_hidden_layers``) trained to predict token t+2: its input at
position i is ``eh_proj([enorm(emb(t_{i+1})) ; hnorm(h_i)])`` where
``h_i`` is the main model's final-norm hidden state, followed by one
normal decoder layer (MLA attention + MoE MLP) with its own KV cache and
a head norm before the shared lm_head.

This module uses it for self-speculative decoding — a capability the
reference engine (brontoguana/krasis) does not have. Each fused verify
step advances the sequence by 1 OR 2 tokens for ~one decode step's cost
(the extra query token rides the same KV-cache DMA stream —
ops/flash_attention decode kernel with Sq=2):

    feed [t, d]  →  main logits at both positions
        t' = sample(logits[0])          # true next-token distribution
        accept = (d == t')              # draft verified
        t'' = sample(logits[1])         # exact iff accept (cache row = t')
    MTP on [t', t''] with the step's hiddens → next drafts g', g''
        next token = t'' if accept else t'
        next draft = g'' if accept else g'

Exact for any sampling configuration: greedy output is bit-identical to
vanilla decode; sampled output follows the identical distribution (see
make_spec_decode_fn). The draft — always the MTP argmax — only sets the
acceptance rate, never the output law.

Rejected positions leave stale KV entries past the valid length; they
are masked out of attention by ``kv_len`` and overwritten by the next
step's scatter (the same invariant padded prefill relies on). Models
with DeltaNet layers are excluded (their recurrent state cannot be
rolled back on a reject).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from ..config import ModelConfig, QuantConfig
from ..ops.norm import rms_norm
from ..ops.qmm import linear
from .model import chosen_logprob, forward, make_layer_step
from .params import mtp_layer_spec


def mtp_forward(
    params: Dict[str, Any],
    tokens: jax.Array,     # [B, S] t_{i+1} aligned to hidden position i
    seq_lens: jax.Array,   # [B] valid rows (may trail the main chunk by 1)
    hidden: jax.Array,     # [B, S, H] main-model final-norm hiddens
    cache: Dict[str, Any],  # {"layer": ..., "length": [B]}
    cfg: ModelConfig,
    quant: QuantConfig,
    prefill: bool,
    history: int = 0,
    mesh=None,
    return_all_logits: bool = False,
) -> Tuple[jax.Array, Dict[str, Any]]:
    """One MTP-module pass; returns (draft logits, new mtp cache)."""
    mtp = params["mtp"]
    B, S = tokens.shape
    length = cache["length"]
    positions = length[:, None] + jnp.arange(S)[None, :]
    valid = jnp.arange(S)[None, :] < seq_lens[:, None]
    kv_len = length + seq_lens

    emb = jnp.take(params["embed"], tokens, axis=0)          # [B, S, H]
    x = jnp.concatenate(
        [
            rms_norm(emb, mtp["enorm"], cfg.rms_norm_eps, cfg.norm_plus_one),
            rms_norm(hidden, mtp["hnorm"], cfg.rms_norm_eps, cfg.norm_plus_one),
        ],
        axis=-1,
    )
    x = linear(x, mtp["eh_proj"])                            # [B, S, H]

    layer_step = make_layer_step(
        cfg, prefill=prefill, history=history, mesh=mesh,
        positions=positions, valid=valid, kv_len=kv_len,
        activation=(quant.expert_activation if not prefill else "bf16"),
    )
    x, new_lc = layer_step(x, mtp["layer"], cache["layer"], mtp_layer_spec(cfg))

    x = rms_norm(x, mtp["final_norm"], cfg.rms_norm_eps, cfg.norm_plus_one)
    if not return_all_logits:
        idx = jnp.maximum(seq_lens - 1, 0)
        x = jnp.take_along_axis(x, idx[:, None, None], axis=1)[:, 0]
    head = mtp.get("head", params["lm_head"])
    logits = linear(x, head, out_dtype=jnp.float32)
    return logits, {"layer": new_lc, "length": kv_len}


def make_spec_prefill_fn(cfg: ModelConfig, quant: QuantConfig,
                         history: int = 0, mesh=None):
    """One prompt chunk of speculative prefill: the main forward plus the
    MTP module over the SHIFTED chunk (``next_tokens[i] = prompt[pos+i+1]``,
    so the MTP cache covers prompt positions as training saw them). On the
    final chunk the caller passes ``mtp_seq_lens = seq_lens - 1`` — the
    input at the last prompt position needs the first *sampled* token,
    which `make_first_draft_fn` supplies afterwards.

    Returns (last-token logits, last-position hidden [B, H], cache,
    mtp_cache)."""

    def fn(params, tokens, next_tokens, seq_lens, mtp_seq_lens, cache,
           mtp_cache):
        logits, hidden, cache = forward(
            params, tokens, seq_lens, cache, cfg, quant, prefill=True,
            history=history, mesh=mesh, return_hidden=True,
        )
        _, mtp_cache = mtp_forward(
            params, next_tokens, mtp_seq_lens, hidden, mtp_cache, cfg,
            quant, prefill=True, history=history, mesh=mesh,
        )
        idx = jnp.maximum(seq_lens - 1, 0)
        h_last = jnp.take_along_axis(hidden, idx[:, None, None], axis=1)[:, 0]
        return logits, h_last, cache, mtp_cache

    return fn


def make_first_draft_fn(cfg: ModelConfig, quant: QuantConfig, mesh=None):
    """MTP step at the last prompt position once the first token is
    sampled: input (emb(t1), h_{n-1}) → draft for t2. Brings the MTP
    cache level with the main cache (both at length n)."""

    def fn(params, t1, h_last, mtp_cache):
        B = t1.shape[0]
        seq1 = jnp.ones((B,), jnp.int32)
        mlogits, mtp_cache = mtp_forward(
            params, t1[:, None], seq1, h_last[:, None, :], mtp_cache,
            cfg, quant, prefill=False, mesh=mesh,
        )
        draft = jnp.argmax(mlogits, axis=-1).astype(jnp.int32)
        return draft, mtp_cache

    return fn


def make_spec_decode_fn(cfg: ModelConfig, quant: QuantConfig, steps: int,
                        mesh=None, max_top_k: int = 64):
    """Fused speculative decode block with PER-SLOT sampling params:
    `steps` verify steps per device call, each committing 1–2 tokens.

    Exact for ANY sampling configuration, not just greedy: t1 is drawn
    from the true next-token distribution (position 0's logits are
    always computed from valid cache). When the sampled t1 happens to
    equal the draft, the second position's KV row corresponds to t1, so
    its logits are the true t+2 distribution and t2 is a legitimate
    sample from it (with the presence-penalty mask already including
    t1). When t1 differs, only t1 commits. Greedy (temp 0) is
    bit-identical to the vanilla path; sampled runs match it in
    DISTRIBUTION (the PRNG key stream advances differently). The draft
    itself is always the MTP argmax — it only sets the acceptance rate,
    never the output distribution.

    Returns per step (t1, t2, accept, lp1, lp2) stacked [steps, B] plus
    the carried state; the host emits t1 always and t2 when accept."""
    from ..ops.sampling import sample_batched

    def fn(params, tok, draft, cache, mtp_cache, key, seen, temp, top_p,
           pres, top_k):
        B = tok.shape[0]
        seq2 = jnp.full((B,), 2, jnp.int32)
        rows = jnp.arange(B)

        def body(carry, _):
            tok, draft, cache, mtp_cache, key, seen = carry
            toks2 = jnp.stack([tok, draft], axis=1)           # [B, 2]
            logits, hidden, cache = forward(
                params, toks2, seq2, cache, cfg, quant, prefill=False,
                return_all_logits=True, return_hidden=True, mesh=mesh,
            )
            key, k1, k2 = jax.random.split(key, 3)
            t1 = sample_batched(k1, logits[:, 0], temp, top_p, pres, seen,
                                top_k, max_top_k=max_top_k)
            seen1 = seen.at[rows, t1].set(True)
            t2 = sample_batched(k2, logits[:, 1], temp, top_p, pres, seen1,
                                top_k, max_top_k=max_top_k)
            accept = draft == t1
            # t2 joins the presence mask only when it was committed
            seen = seen1.at[rows, t2].set(seen1[rows, t2] | accept)
            lp1 = chosen_logprob(logits[:, 0], t1)
            lp2 = chosen_logprob(logits[:, 1], t2)

            mlogits, mtp_cache = mtp_forward(
                params, jnp.stack([t1, t2], axis=1), seq2, hidden,
                mtp_cache, cfg, quant, prefill=False,
                return_all_logits=True, mesh=mesh,
            )
            g1 = jnp.argmax(mlogits[:, 0], axis=-1).astype(jnp.int32)
            g2 = jnp.argmax(mlogits[:, 1], axis=-1).astype(jnp.int32)

            # Reject ⇒ the second position's KV entry (main and MTP) is
            # stale: step the valid length back so it is masked out and
            # overwritten by the next scatter.
            dec = jnp.where(accept, 0, 1).astype(jnp.int32)
            cache = dict(cache, length=cache["length"] - dec)
            mtp_cache = dict(mtp_cache, length=mtp_cache["length"] - dec)

            next_tok = jnp.where(accept, t2, t1)
            next_draft = jnp.where(accept, g2, g1)
            return (next_tok, next_draft, cache, mtp_cache, key, seen), (
                t1, t2, accept, lp1, lp2)

        (tok, draft, cache, mtp_cache, key, seen), outs = jax.lax.scan(
            body, (tok, draft, cache, mtp_cache, key, seen), None,
            length=steps,
        )
        t1s, t2s, accepts, lp1s, lp2s = outs
        return (t1s, t2s, accepts, lp1s, lp2s, tok, draft, cache,
                mtp_cache, key, seen)

    return fn
