"""Perplexity windowing validated against a reference-protocol oracle.

VERDICT weak #8: the scoring-window boundary had never been validated
against the reference harness's numbers on identical token streams. Here
an independent torch transcription of the reference protocol (reference
perplexity/measure_ppl.py evaluate_perplexity: starts every `stride` up
to n-1, first window scores all shifted positions, later windows score
shifted >= stride-1) runs on the SAME logits as our
`evaluate_perplexity` (both read one tiny HF model), so any PPL
difference is a windowing off-by-one, not model noise.
"""

import math

import numpy as np
import pytest
import torch

torch.set_grad_enabled(False)

from krasis_tpu.perplexity import evaluate_perplexity, sliding_windows


@pytest.fixture(scope="module")
def hf_model():
    from transformers import Qwen3MoeConfig, Qwen3MoeForCausalLM

    torch.manual_seed(0)
    cfg = Qwen3MoeConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        moe_intermediate_size=16, num_hidden_layers=2,
        num_attention_heads=2, num_key_value_heads=2, head_dim=16,
        num_experts=4, num_experts_per_tok=2, decoder_sparse_step=1,
        max_position_embeddings=4096,
    )
    return Qwen3MoeForCausalLM(cfg).eval()


class HFEngine:
    """Engine stub: forward_all_logits via the HF model, so the test
    isolates the WINDOWING, not the model stack (covered elsewhere)."""

    def __init__(self, model):
        self.model = model

    def forward_all_logits(self, ids):
        out = self.model(input_ids=torch.tensor([list(ids)])).logits
        return out[0].float().numpy()


def reference_oracle(model, tokens, window, stride):
    """Independent transcription of the reference scoring semantics."""
    n = len(tokens)
    total_nll, total_scored = 0.0, 0
    for begin in range(0, n - 1, stride):
        end = min(begin + window, n)
        if end - begin < 2:
            break
        t = torch.tensor(tokens[begin:end])
        logits = model(input_ids=t[None]).logits[0].float()
        loss = torch.nn.functional.cross_entropy(
            logits[:-1], t[1:], reduction="none")
        score_start = 0 if begin == 0 else stride - 1
        scored = loss[score_start:]
        total_nll += float(scored.sum())
        total_scored += int(scored.numel())
    return math.exp(total_nll / total_scored), total_scored


@pytest.mark.parametrize("n,window,stride", [
    (300, 64, 32),    # standard window == 2*stride, ragged tail
    (256, 64, 32),    # exact multiple
    (100, 64, 48),    # non-standard stride
    (65, 64, 32),     # final window 1 token past the first
    (40, 64, 32),     # single short window
])
def test_ppl_matches_reference_protocol(hf_model, n, window, stride):
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, 128, size=n).tolist()
    want_ppl, want_scored = reference_oracle(hf_model, tokens, window, stride)
    got = evaluate_perplexity(HFEngine(hf_model), tokens,
                              window=window, stride=stride, log_every=0)
    assert got["tokens_scored"] == want_scored
    assert got["ppl"] == pytest.approx(want_ppl, rel=1e-5)


def test_sliding_windows_tiles_exactly():
    """window == 2*stride: scored shifted positions tile [0, n-1) with no
    gap and no double count."""
    n, window, stride = 5000, 2048, 1024
    covered = []
    for pos, end, ss in sliding_windows(n, window, stride):
        # shifted position i scores original token pos+i+1
        covered.extend(range(pos + ss + 1, end))
    assert covered == sorted(covered)
    assert len(covered) == len(set(covered))
    assert covered[0] == 1 and covered[-1] == n - 1
    assert len(covered) == n - 1
