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


def spec_config(cfg: ModelConfig, params: Dict[str, Any]):
    """(mode, draft_depth) for speculative decoding — the ONE gate both
    Engine and BatchScheduler consult (a drifted copy would let the two
    paths disagree about when spec runs). mode is one of:

    * ``"mtp"``   — checkpoint ships an MTP module (DeepSeek V3 / Kimi);
    * ``"ngram"`` — prompt-lookup drafting (models/spec_ngram.py), any
      model incl. DeltaNet hybrids; opt-in via KRASIS_TPU_SPEC_MODE=ngram;
    * ``None``    — vanilla decode.

    KRASIS_TPU_SPEC_MODE ∈ auto|mtp|ngram|off (auto = mtp when the
    module is present, else off); KRASIS_TPU_NO_SPEC=1 ≙ off;
    KRASIS_TPU_SPEC_K sets the draft depth (default 1 for mtp — one
    module recursion per extra token — and 3 for ngram, where deeper
    drafts cost only verify width)."""
    import os

    want = os.environ.get("KRASIS_TPU_SPEC_MODE", "auto").lower()
    if os.environ.get("KRASIS_TPU_NO_SPEC"):
        want = "off"
    mtp_ok = (
        cfg.num_nextn_predict_layers > 0
        and "mtp" in params
        and not cfg.is_hybrid
    )
    if want in ("auto", "mtp"):
        mode = "mtp" if mtp_ok else None
    elif want == "ngram":
        mode = "ngram"
    else:
        mode = None
    default_k = 3 if mode == "ngram" else 1
    k = max(1, int(os.environ.get("KRASIS_TPU_SPEC_K", str(default_k))))
    return mode, k


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
    return_hidden: bool = False,
) -> Tuple[jax.Array, Dict[str, Any]]:
    """One MTP-module pass; returns (draft logits, new mtp cache), or
    (logits, hidden, cache) with return_hidden — the module's own
    final-norm hidden feeds the NEXT recursion depth when drafting more
    than one token with the single shipped module."""
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
    h_out = x
    if not return_all_logits:
        idx = jnp.maximum(seq_lens - 1, 0)
        x = jnp.take_along_axis(x, idx[:, None, None], axis=1)[:, 0]
    head = mtp.get("head", params["lm_head"])
    logits = linear(x, head, out_dtype=jnp.float32)
    new_cache = {"layer": new_lc, "length": kv_len}
    if return_hidden:
        return logits, h_out, new_cache
    return logits, new_cache


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


def _draft_chain(params, tok, h, mtp_cache, cfg, quant, k, mesh,
                 keep_rows: int):
    """Draft `k` tokens by recursing the single MTP module: call 1 takes
    (emb(tok), h) at the cache's current length; call j feeds the
    previous draft and the module's OWN hidden output (the standard
    single-module multi-depth recursion — no main-model hidden exists at
    draft positions yet). Only the first `keep_rows` cache rows written
    are real; the rest are speculative, so the returned cache length
    advances by keep_rows and the stale rows get overwritten by the next
    verify step's scatter. Returns (drafts [B, k], mtp_cache)."""
    B = tok.shape[0]
    seq1 = jnp.ones((B,), jnp.int32)
    commit_len = mtp_cache["length"] + keep_rows
    drafts = []
    cur_tok, cur_h = tok, h
    for _ in range(k):
        mlogits, mh, mtp_cache = mtp_forward(
            params, cur_tok[:, None], seq1, cur_h[:, None, :], mtp_cache,
            cfg, quant, prefill=False, return_all_logits=True,
            return_hidden=True, mesh=mesh,
        )
        d = jnp.argmax(mlogits[:, 0], axis=-1).astype(jnp.int32)
        drafts.append(d)
        cur_tok, cur_h = d, mh[:, 0]
    mtp_cache = dict(mtp_cache, length=commit_len)
    return jnp.stack(drafts, axis=1), mtp_cache


def make_first_draft_fn(cfg: ModelConfig, quant: QuantConfig, mesh=None,
                        k: int = 1):
    """MTP chain at the last prompt position once the first token is
    sampled: input (emb(t1), h_{n-1}) → k drafts. Brings the MTP cache
    level with the main cache (both at length n; deeper draft rows are
    speculative)."""

    def fn(params, t1, h_last, mtp_cache):
        return _draft_chain(params, t1, h_last, mtp_cache, cfg, quant,
                            k, mesh, keep_rows=1)

    return fn


def verify_and_sample(logits, drafts, key, seen, temp, top_p, pres, top_k,
                      max_top_k: int):
    """The exactness core shared by every speculative verify step (MTP
    here, prompt-lookup in models/spec_ngram.py): sample the S = k+1
    positions SEQUENTIALLY — t_i is drawn with the presence mask of the
    committed prefix, and commits only while every earlier draft matched
    its sample (so each committed token's logits were computed from
    valid cache rows). Returns (tokens [B,S], logprobs [B,S],
    n_committed [B], seen, key)."""
    from ..ops.sampling import sample_batched

    B, S = drafts.shape[0], drafts.shape[1] + 1
    rows = jnp.arange(B)
    ok = jnp.ones((B,), jnp.bool_)
    ncommit = jnp.zeros((B,), jnp.int32)
    ts, lps = [], []
    for i in range(S):
        key, ki = jax.random.split(key)
        t_i = sample_batched(ki, logits[:, i], temp, top_p, pres,
                             seen, top_k, max_top_k=max_top_k)
        ts.append(t_i)
        lps.append(chosen_logprob(logits[:, i], t_i))
        ncommit = ncommit + ok.astype(jnp.int32)
        # committed tokens join the presence mask as they land
        seen = seen.at[rows, t_i].set(seen[rows, t_i] | ok)
        if i < S - 1:
            ok = ok & (drafts[:, i] == t_i)
    return jnp.stack(ts, axis=1), jnp.stack(lps, axis=1), ncommit, seen, key


def make_spec_decode_fn(cfg: ModelConfig, quant: QuantConfig, steps: int,
                        mesh=None, max_top_k: int = 64, k: int = 1):
    """Fused speculative decode block with PER-SLOT sampling params:
    `steps` verify steps per device call, each committing 1 to k+1
    tokens (k = draft depth; the single MTP module is recursed for
    depths beyond 1 — `_draft_chain`).

    Exact for ANY sampling configuration: the step feeds
    [tok, d_1..d_k] (one Sq=k+1 pass) and samples the positions
    SEQUENTIALLY — t_i is drawn with the presence mask of the committed
    prefix, and commits only while every earlier draft matched its
    sample (so each committed token's logits were computed from valid
    cache rows). Greedy (temp 0) is bit-identical to the vanilla path;
    sampled runs match it in DISTRIBUTION (the PRNG key stream advances
    differently). Drafts are always the MTP argmax — they only set the
    acceptance rate, never the output law.

    Returns per step (tokens [steps, B, k+1], logprobs alike,
    n_committed [steps, B]) plus the carried state; the host emits
    tokens[i, b, :n_committed[i, b]]."""
    from .model import la_spec_commit

    S = k + 1

    def fn(params, tok, drafts, cache, mtp_cache, key, seen, temp, top_p,
           pres, top_k):
        B = tok.shape[0]
        seqS = jnp.full((B,), S, jnp.int32)

        def body(carry, _):
            tok, drafts, cache, mtp_cache, key, seen = carry
            toksS = jnp.concatenate([tok[:, None], drafts], axis=1)  # [B,S]
            logits, hidden, cache = forward(
                params, toksS, seqS, cache, cfg, quant, prefill=False,
                return_all_logits=True, return_hidden=True, mesh=mesh,
                spec_la=True,
            )
            ts_a, lps_a, ncommit, seen, key = verify_and_sample(
                logits, drafts, key, seen, temp, top_p, pres, top_k,
                max_top_k)
            # DeltaNet layers (hybrid models): advance recurrent state by
            # exactly the committed prefix (models/model.py la_spec_commit;
            # no-op for pure-KV models).
            cache = la_spec_commit(cache, ncommit)

            mlogits, mhidden, mtp_cache = mtp_forward(
                params, ts_a, seqS, hidden, mtp_cache, cfg, quant,
                prefill=False, return_all_logits=True, return_hidden=True,
                mesh=mesh,
            )

            # Uncommitted positions' KV rows (main and MTP) are stale:
            # step the valid length back so they are masked out and
            # overwritten by the next scatter.
            dec = S - ncommit
            cache = dict(cache, length=cache["length"] - dec)
            mtp_cache = dict(mtp_cache, length=mtp_cache["length"] - dec)

            nidx = (ncommit - 1)[:, None]
            next_tok = jnp.take_along_axis(ts_a, nidx, axis=1)[:, 0]
            margmax = jnp.argmax(mlogits, axis=-1).astype(jnp.int32)
            d1 = jnp.take_along_axis(margmax, nidx, axis=1)[:, 0]
            if k > 1:
                h_prev = jnp.take_along_axis(
                    mhidden, nidx[:, :, None], axis=1)[:, 0]
                deeper, mtp_cache = _draft_chain(
                    params, d1, h_prev, mtp_cache, cfg, quant, k - 1,
                    mesh, keep_rows=0)
                next_drafts = jnp.concatenate([d1[:, None], deeper], axis=1)
            else:
                next_drafts = d1[:, None]
            return (next_tok, next_drafts, cache, mtp_cache, key, seen), (
                ts_a, lps_a, ncommit)

        (tok, drafts, cache, mtp_cache, key, seen), outs = jax.lax.scan(
            body, (tok, drafts, cache, mtp_cache, key, seen), None,
            length=steps,
        )
        ts, lps, ncommit = outs
        return (ts, lps, ncommit, tok, drafts, cache, mtp_cache, key, seen)

    return fn
