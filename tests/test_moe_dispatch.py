"""Pin MoE kernel dispatch per architecture shape.

Regression guard for the decode-path selection bug fixed in ed7e34d:
QCN decode (T<=16 tokens, E=512) once routed through the grouped prefill
kernel, tile-padding ~10 tokens to thousands of rows (2.5x decode
regression). These tests fail if any preset architecture's decode shape
ever selects the grouped path again, or a prefill shape the gathered one.
"""

import pytest

from krasis_tpu.ops.moe import use_grouped_path

# (name, E routed experts, k top-k) for each supported preset family
ARCHS = [
    ("deepseek-v2-lite", 64, 6),
    ("deepseek-v3", 256, 8),
    ("qwen3-235b", 128, 8),
    ("qwen3-coder-next", 512, 10),
    ("qwen3.5-35b", 128, 8),
    ("gpt-oss-120b", 128, 4),
    ("glm-4-moe", 160, 8),
    ("kimi-k2", 384, 8),
]


@pytest.mark.parametrize("name,E,k", ARCHS)
@pytest.mark.parametrize("T", [1, 2, 4])
def test_decode_shapes_take_gathered_path(name, E, k, T):
    # single-stream / small-batch decode must never hit the tile-padded
    # grouped kernel on any preset architecture
    assert not use_grouped_path(T, k, E), (
        f"{name}: decode shape T={T} k={k} E={E} routed to grouped kernel"
    )


@pytest.mark.parametrize("T", [8, 16])
def test_qcn_batched_decode_stays_gathered(T):
    # the original ed7e34d regression: T≈10 tokens on 512 experts must
    # stay gathered even at high slot counts (T·k ≪ E)
    assert not use_grouped_path(T, 10, 512)


def test_v2lite_batched_decode_crossover():
    # measured on v5e (probe_grouped_decode.py): 8 slots × top-6 of 64
    # experts runs 53% faster through the grouped kernel; 4 slots is
    # faster gathered
    assert use_grouped_path(8, 6, 64)
    assert not use_grouped_path(4, 6, 64)


@pytest.mark.parametrize("name,E,k", ARCHS)
@pytest.mark.parametrize("T", [512, 2048])
def test_prefill_shapes_take_grouped_path(name, E, k, T):
    assert use_grouped_path(T, k, E), (
        f"{name}: prefill shape T={T} k={k} E={E} routed to gathered kernel"
    )
