"""GGUF parser + dequantizer + checkpoint-adapter tests.

A minimal GGUF v3 writer lives in this test (independent scalar
encoders) so the vectorized dequantizers are pinned against a second
implementation — the reference's test_gguf.py strategy."""

import struct

import numpy as np
import pytest

from krasis_tpu.utils.gguf import (
    GGML_F32, GGML_Q4_0, GGML_Q8_0, GGML_Q4_K, GGML_Q6_K,
    GgufFile, dequant_q4_0, dequant_q8_0, dequant_q4_k, dequant_q6_k,
)
from krasis_tpu.utils.gguf_source import GgufCheckpoint


# ---- scalar encoders (independent of the production decoders) -------------

def encode_q8_0(x: np.ndarray) -> bytes:
    out = b""
    for blk in x.reshape(-1, 32):
        d = np.abs(blk).max() / 127.0 or 1.0
        d16 = np.float16(d)
        q = np.clip(np.round(blk / np.float32(d16)), -128, 127).astype(np.int8)
        out += d16.tobytes() + q.tobytes()
    return out


def encode_q4_0(x: np.ndarray) -> bytes:
    out = b""
    for blk in x.reshape(-1, 32):
        amax_i = np.abs(blk).argmax()
        d = blk[amax_i] / -8.0 or 1.0
        d16 = np.float16(d)
        q = np.clip(np.round(blk / np.float32(d16)) + 8, 0, 15).astype(np.uint8)
        packed = (q[:16] | (q[16:] << 4)).astype(np.uint8)
        out += d16.tobytes() + packed.tobytes()
    return out


def encode_q4_k(x: np.ndarray) -> bytes:
    """Scalar Q4_K encoder: a VALID encoding (per-sub-block affine
    q*sc*d - m*dmin, 6-bit sc/m against superblock d/dmin) — not
    llama.cpp's error-minimizing search, but decodes through the same
    layout, which is what the decoder tests need. Inverse of
    utils/gguf.dequant_q4_k / _kquant_scale_min."""
    out = b""
    for sb in x.reshape(-1, 256).astype(np.float32):
        subs = sb.reshape(8, 32)
        mins = np.maximum(0.0, -subs.min(1))
        scales = np.maximum((subs.max(1) + mins) / 15.0, 0.0)
        d16 = np.float16(scales.max() / 63.0 if scales.max() > 0 else 1.0)
        dm16 = np.float16(mins.max() / 63.0 if mins.max() > 0 else 1.0)
        df, dmf = np.float32(d16), np.float32(dm16)
        sc6 = np.clip(np.round(scales / df), 0, 63).astype(np.uint8)
        m6 = np.clip(np.round(mins / dmf), 0, 63).astype(np.uint8)
        tbl = bytearray(12)
        for j in range(4):
            tbl[j] = (sc6[j] & 63) | ((sc6[j + 4] >> 4) << 6)
            tbl[j + 4] = (m6[j] & 63) | ((m6[j + 4] >> 4) << 6)
            tbl[j + 8] = (sc6[j + 4] & 0xF) | ((m6[j + 4] & 0xF) << 4)
        scf = df * sc6.astype(np.float32)
        mf = dmf * m6.astype(np.float32)
        q = np.zeros((8, 32), np.uint8)
        for s in range(8):
            denom = scf[s] if scf[s] > 0 else 1.0
            q[s] = np.clip(np.round((subs[s] + mf[s]) / denom), 0, 15)
        qs = bytearray(128)
        for j in range(4):
            lo, hi = q[2 * j], q[2 * j + 1]
            for i in range(32):
                qs[j * 32 + i] = int(lo[i]) | (int(hi[i]) << 4)
        out += d16.tobytes() + dm16.tobytes() + bytes(tbl) + bytes(qs)
    return out


def _gguf_string(s: str) -> bytes:
    b = s.encode()
    return struct.pack("<Q", len(b)) + b


def write_gguf(path, tensors, metadata):
    """tensors: list of (name, np.f32 array, ggml_type, raw_bytes|None)."""
    align = 32
    body = b"GGUF" + struct.pack("<IQQ", 3, len(tensors), len(metadata))
    for key, val in metadata.items():
        body += _gguf_string(key)
        if isinstance(val, str):
            body += struct.pack("<I", 8) + _gguf_string(val)
        elif isinstance(val, float):
            body += struct.pack("<If", 6, val)
        else:
            body += struct.pack("<II", 4, val)   # u32
    blobs = []
    offset = 0
    for name, arr, ttype, raw in tensors:
        if raw is None:
            raw = arr.astype(np.float32).tobytes()
        body += _gguf_string(name)
        dims = tuple(reversed(arr.shape))  # gguf stores innermost-first
        body += struct.pack("<I", len(dims))
        for d in dims:
            body += struct.pack("<Q", d)
        body += struct.pack("<IQ", ttype, offset)
        pad = (-len(raw)) % align
        blobs.append(raw + b"\0" * pad)
        offset += len(raw) + pad
    pad = (-len(body)) % align
    body += b"\0" * pad
    with open(path, "wb") as f:
        f.write(body + b"".join(blobs))


# ---- decoder unit tests ----------------------------------------------------

def test_q8_0_roundtrip():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(4, 64)).astype(np.float32)
    raw = np.frombuffer(encode_q8_0(x), np.uint8)
    got = dequant_q8_0(raw).reshape(4, 64)
    np.testing.assert_allclose(got, x, atol=np.abs(x).max() / 100)


def test_q4_0_roundtrip():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 64)).astype(np.float32)
    raw = np.frombuffer(encode_q4_0(x), np.uint8)
    got = dequant_q4_0(raw).reshape(2, 64)
    np.testing.assert_allclose(got, x, atol=np.abs(x).max() / 6)


def test_q4_k_encode_roundtrip():
    """The scalar encoder round-trips through the production dequant
    within Q4_K's representable error (affine 4-bit per 32-elem
    sub-block + 6-bit quantized scales)."""
    rng = np.random.default_rng(7)
    x = rng.standard_normal(1024).astype(np.float32)
    raw = encode_q4_k(x)
    assert len(raw) == (1024 // 256) * 144
    got = dequant_q4_k(np.frombuffer(raw, np.uint8))
    subs = x.reshape(-1, 32)
    step = (subs.max(1) - np.minimum(subs.min(1), 0)) / 15.0
    err = np.abs(got - x).reshape(-1, 32)
    # half-step rounding + 6-bit scale/min quantization slack
    assert (err.max(1) <= 0.75 * step + 0.05).all(), err.max()


def test_q4_k_structure():
    """Q4_K: hand-build one superblock with known scales and verify."""
    d, dmin = np.float16(0.5), np.float16(0.25)
    scales = bytearray(12)
    # sub-block 0: sc=2, m=1  (6-bit fields, j<4 layout)
    scales[0] = 2
    scales[4] = 1
    qs = np.full(128, 0x53, np.uint8)  # low nibble 3, high nibble 5
    raw = d.tobytes() + dmin.tobytes() + bytes(scales) + qs.tobytes()
    out = dequant_q4_k(np.frombuffer(raw, np.uint8))
    # elems 0..31: q=3, sc=2, m=1 → 0.5*2*3 - 0.25*1*1 = 2.75
    np.testing.assert_allclose(out[:32], 2.75)
    # elems 32..63 use sub-block 1 (sc=0, m=0) → 0
    np.testing.assert_allclose(out[32:64], 0.0)


def test_q6_k_structure():
    ql = np.full(128, 0x21, np.uint8)   # low nibbles: 1 (first half), 2 (second)
    qh = np.zeros(64, np.uint8)
    scales = np.zeros(16, np.int8)
    scales[0] = 4
    d = np.float16(0.5)
    raw = ql.tobytes() + qh.tobytes() + scales.tobytes() + d.tobytes()
    out = dequant_q6_k(np.frombuffer(raw, np.uint8))
    # elems 0..15: q = 1 - 32 = -31, scale 4*0.5 → -62
    np.testing.assert_allclose(out[:16], -62.0)
    # elems 16..31 use scales[1] = 0
    np.testing.assert_allclose(out[16:32], 0.0)


# ---- file + adapter tests --------------------------------------------------

def test_gguf_file_and_adapter(tmp_path):
    rng = np.random.default_rng(2)
    H, V, I, E = 16, 32, 8, 4
    embd = rng.normal(size=(V, H)).astype(np.float32)
    qw = rng.normal(size=(H, H)).astype(np.float32)
    exps = rng.normal(size=(E, I, H)).astype(np.float32)

    path = tmp_path / "tiny.gguf"
    write_gguf(
        str(path),
        [
            ("token_embd.weight", embd, GGML_F32, None),
            ("blk.0.attn_q.weight", qw, GGML_Q8_0,
             encode_q8_0(qw.reshape(-1))),
            ("blk.0.ffn_gate_exps.weight", exps, GGML_F32, None),
        ],
        {
            "general.architecture": "qwen3moe",
            "qwen3moe.block_count": 1,
            "qwen3moe.embedding_length": H,
            "qwen3moe.attention.head_count": 2,
            "qwen3moe.feed_forward_length": I,
            "qwen3moe.expert_count": E,
            "qwen3moe.expert_used_count": 2,
            "qwen3moe.expert_feed_forward_length": I,
            "qwen3moe.vocab_size": V,
            "qwen3moe.rope.freq_base": 10000.0,
        },
    )

    f = GgufFile(str(path))
    assert f.version == 3
    assert f.metadata["qwen3moe.expert_count"] == E
    np.testing.assert_allclose(f.dequantize("token_embd.weight"), embd)
    np.testing.assert_allclose(
        f.dequantize("blk.0.attn_q.weight"), qw, atol=np.abs(qw).max() / 100
    )
    f.close()

    ck = GgufCheckpoint(str(path))
    assert "model.embed_tokens.weight" in ck
    assert "model.layers.0.self_attn.q_proj.weight" in ck
    assert "model.layers.0.mlp.experts.3.gate_proj.weight" in ck
    np.testing.assert_allclose(
        ck.tensor("model.layers.0.mlp.experts.2.gate_proj.weight"), exps[2]
    )
    cfg = ck.to_config_dict()
    assert cfg["n_routed_experts"] == E
    assert cfg["hidden_size"] == H
    assert cfg["model_type"] == "qwen3_moe"
    ck.close()
