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
@pytest.mark.parametrize("T", [1, 2, 4, 8, 16])
def test_decode_shapes_take_gathered_path(name, E, k, T):
    # batched decode up to 16 slots must never hit the tile-padded
    # grouped kernel on any preset architecture
    assert not use_grouped_path(T, k, E), (
        f"{name}: decode shape T={T} k={k} E={E} routed to grouped kernel"
    )


@pytest.mark.parametrize("name,E,k", ARCHS)
@pytest.mark.parametrize("T", [512, 2048])
def test_prefill_shapes_take_grouped_path(name, E, k, T):
    assert use_grouped_path(T, k, E), (
        f"{name}: prefill shape T={T} k={k} E={E} routed to gathered kernel"
    )
