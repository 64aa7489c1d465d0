"""ctypes bindings for the native C++ quantizer (lazy self-build).

Compiles quant.cpp with g++ on first use (cached in
$KRASIS_TPU_HOME/native/); falls back transparently to the numpy
quantizer when no compiler is available. Numerics are bit-exact with
krasis_tpu.quant.quantize_np (verified in tests/test_native.py).
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import Optional

log = logging.getLogger("krasis_tpu.native")


def _report_build_failure(what: str, exc: Exception) -> None:
    """One clear warning per failed self-build: what failed, why, and
    what the fallback costs (install story: a missing g++ must degrade
    loudly-but-gracefully, not silently)."""
    detail = ""
    if isinstance(exc, subprocess.CalledProcessError):
        err = (exc.stderr or b"").decode("utf-8", "replace").strip()
        detail = f"; compiler said:\n{err[-2000:]}" if err else ""
    elif isinstance(exc, FileNotFoundError):
        detail = "; is g++ installed and on PATH?"
    else:
        detail = f": {exc!r}"
    log.warning("native %s self-build failed (%s)%s", what,
                type(exc).__name__, detail)

import numpy as np
from ml_dtypes import bfloat16

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False

_SRC = os.path.join(os.path.dirname(__file__), "quant.cpp")

_hm_lock = threading.Lock()
_hm_lib: Optional[ctypes.CDLL] = None
_hm_build_failed = False

_HM_SRC = os.path.join(os.path.dirname(__file__), "hostmoe.cpp")


def _build_dir() -> str:
    home = os.environ.get("KRASIS_TPU_HOME", os.path.expanduser("~/.krasis_tpu"))
    d = os.path.join(home, "native")
    os.makedirs(d, exist_ok=True)
    return d


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        so_path = os.path.join(_build_dir(), "libkrasisq.so")
        try:
            src_mtime = os.path.getmtime(_SRC)
            if not os.path.exists(so_path) or os.path.getmtime(so_path) < src_mtime:
                cmd = [
                    "g++", "-O3", "-march=native", "-fopenmp",
                    "-shared", "-fPIC", _SRC, "-o", so_path + ".tmp",
                ]
                subprocess.run(cmd, check=True, capture_output=True, timeout=120)
                os.replace(so_path + ".tmp", so_path)
            lib = ctypes.CDLL(so_path)
            lib.krasisq_quantize.restype = ctypes.c_int
            lib.krasisq_quantize.argtypes = [
                ctypes.c_void_p, ctypes.c_int,
                ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int, ctypes.c_int,
                ctypes.c_void_p, ctypes.c_void_p,
            ]
            lib.krasisq_quantize_batch.restype = ctypes.c_int
            lib.krasisq_quantize_batch.argtypes = [
                ctypes.c_void_p, ctypes.c_int,
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int, ctypes.c_int,
                ctypes.c_void_p, ctypes.c_void_p,
            ]
            _lib = lib
        except Exception as exc:
            _build_failed = True
            _report_build_failure(
                "quantizer (quant.cpp) — falling back to the numpy "
                "quantizer (slower first-load quantization, identical "
                "numerics)", exc)
        return _lib


def available() -> bool:
    return _load() is not None


def _load_hostmoe() -> Optional[ctypes.CDLL]:
    """Host-RAM MoE expert engine (hostmoe.cpp) — the offload tier's
    compute backend (krasis_tpu/offload.py). Same lazy self-build
    pattern as the quantizer."""
    global _hm_lib, _hm_build_failed
    with _hm_lock:
        if _hm_lib is not None or _hm_build_failed:
            return _hm_lib
        so_path = os.path.join(_build_dir(), "libkrasishost.so")
        try:
            src_mtime = os.path.getmtime(_HM_SRC)
            if not os.path.exists(so_path) or os.path.getmtime(so_path) < src_mtime:
                cmd = [
                    "g++", "-O3", "-march=native", "-fopenmp", "-std=c++17",
                    "-shared", "-fPIC", _HM_SRC, "-o", so_path + ".tmp",
                ]
                subprocess.run(cmd, check=True, capture_output=True, timeout=180)
                os.replace(so_path + ".tmp", so_path)
            lib = ctypes.CDLL(so_path)
            lib.krasish_create.restype = ctypes.c_void_p
            lib.krasish_create.argtypes = [
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_float,
            ]
            lib.krasish_set_layer.restype = ctypes.c_int
            lib.krasish_set_layer.argtypes = [ctypes.c_void_p, ctypes.c_int64] + \
                [ctypes.c_void_p] * 6
            lib.krasish_forward.restype = ctypes.c_int
            lib.krasish_forward.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_void_p,
            ]
            lib.krasish_destroy.restype = None
            lib.krasish_destroy.argtypes = [ctypes.c_void_p]
            lib.krasish_tier.restype = ctypes.c_int
            lib.krasish_tier.argtypes = [ctypes.c_void_p]
            _hm_lib = lib
        except Exception as exc:
            _hm_build_failed = True
            _report_build_failure(
                "host-MoE engine (hostmoe.cpp) — the --offload experts "
                "tier will use the numpy fallback (orders of magnitude "
                "slower; fine for tests, not serving)", exc)
        return _hm_lib


def hostmoe_available() -> bool:
    return _load_hostmoe() is not None


def quantize_native(w: np.ndarray, bits: int, group_size: int = 128):
    """Quantize [..., K, N] (f32 or bf16, C-contiguous) with the native
    kernel. Returns (q int8, scales bf16) numpy arrays, or None if the
    native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    w = np.ascontiguousarray(w)
    if w.dtype == np.float32:
        is_f32 = 1
    elif w.dtype == bfloat16:
        is_f32 = 0
    else:
        w = w.astype(np.float32)
        is_f32 = 1

    *lead, K, N = w.shape
    E = int(np.prod(lead)) if lead else 1
    q_rows = K // 2 if bits == 4 else K
    q = np.zeros((*lead, q_rows, N), np.int8)
    scales = np.empty((*lead, K // group_size, N), bfloat16)

    rc = lib.krasisq_quantize_batch(
        w.ctypes.data_as(ctypes.c_void_p), is_f32,
        E, K, N, bits, group_size,
        q.ctypes.data_as(ctypes.c_void_p),
        scales.ctypes.data_as(ctypes.c_void_p),
    )
    if rc != 0:
        raise ValueError(f"krasisq_quantize failed rc={rc}")
    return q, scales
