"""ctypes bindings for the native C++ HTTP/SSE server (lazy self-build).

The native layer (serve.cpp) owns all socket work on an epoll thread;
Python worker threads pull parsed requests and run the same route
handlers as the stdlib server (server.py handle_request). Token writes
during streaming are buffered try-sends in C — the generation loop never
blocks on a client socket.

Parity target: the reference's Rust axum server (reference
src/server.rs). Falls back transparently to the stdlib server when no
compiler is available (server.py picks the backend).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Callable, Optional

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False

_SRC = os.path.join(os.path.dirname(__file__), "serve.cpp")


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
        so_path = os.path.join(_build_dir(), "libkrasis_serve.so")
        try:
            src_mtime = os.path.getmtime(_SRC)
            if not os.path.exists(so_path) or os.path.getmtime(so_path) < src_mtime:
                cmd = [
                    "g++", "-O2", "-shared", "-fPIC", "-pthread",
                    _SRC, "-o", so_path + ".tmp",
                ]
                subprocess.run(cmd, check=True, capture_output=True, timeout=120)
                os.replace(so_path + ".tmp", so_path)
            lib = ctypes.CDLL(so_path)
            lib.ks_start.restype = ctypes.c_int
            lib.ks_start.argtypes = [ctypes.c_char_p, ctypes.c_int]
            lib.ks_port.restype = ctypes.c_int
            lib.ks_port.argtypes = [ctypes.c_int]
            lib.ks_stop.restype = None
            lib.ks_stop.argtypes = [ctypes.c_int]
            lib.ks_next.restype = ctypes.c_long
            lib.ks_next.argtypes = [
                ctypes.c_int, ctypes.c_int,
                ctypes.c_char_p, ctypes.c_int,
                ctypes.c_char_p, ctypes.c_int,
                ctypes.POINTER(ctypes.c_long),
            ]
            lib.ks_copy_body.restype = ctypes.c_int
            lib.ks_copy_body.argtypes = [
                ctypes.c_int, ctypes.c_long, ctypes.c_char_p, ctypes.c_long,
            ]
            lib.ks_respond.restype = ctypes.c_int
            lib.ks_respond.argtypes = [
                ctypes.c_int, ctypes.c_long, ctypes.c_int,
                ctypes.c_char_p, ctypes.c_char_p, ctypes.c_long,
            ]
            lib.ks_stream_start.restype = ctypes.c_int
            lib.ks_stream_start.argtypes = [ctypes.c_int, ctypes.c_long]
            lib.ks_stream_send.restype = ctypes.c_int
            lib.ks_stream_send.argtypes = [
                ctypes.c_int, ctypes.c_long, ctypes.c_char_p, ctypes.c_long,
            ]
            lib.ks_stream_end.restype = ctypes.c_int
            lib.ks_stream_end.argtypes = [ctypes.c_int, ctypes.c_long]
            lib.ks_cancelled.restype = ctypes.c_int
            lib.ks_cancelled.argtypes = [ctypes.c_int, ctypes.c_long]
            _lib = lib
        except Exception as exc:
            _build_failed = True
            from . import _report_build_failure

            _report_build_failure(
                "HTTP server (serve.cpp) — falling back to the stdlib "
                "ThreadingHTTPServer transport (correct, higher "
                "per-connection overhead)", exc)
        return _lib


def available() -> bool:
    return _load() is not None


class NativeResponseWriter:
    """server.py ResponseWriter protocol over the C API."""

    def __init__(self, srv: "NativeHTTPServer", req_id: int):
        self._srv = srv
        self._id = req_id
        self.streaming = False

    def send_json(self, code: int, body: bytes) -> None:
        self._srv._lib.ks_respond(
            self._srv._h, self._id, code, b"application/json", body, len(body)
        )

    def sse_start(self) -> None:
        self.streaming = True
        self._srv._lib.ks_stream_start(self._srv._h, self._id)

    def sse_send(self, data: bytes) -> bool:
        rc = self._srv._lib.ks_stream_send(self._srv._h, self._id, data, len(data))
        return rc == 0

    def sse_end(self) -> None:
        self._srv._lib.ks_stream_end(self._srv._h, self._id)

    def cancelled(self) -> bool:
        return bool(self._srv._lib.ks_cancelled(self._srv._h, self._id))


class NativeHTTPServer:
    """Drop-in for ThreadingHTTPServer: epoll C++ transport + a Python
    worker pool running `handler(method, path, body, writer)`."""

    def __init__(self, host: str, port: int,
                 handler: Callable[[str, str, bytes, NativeResponseWriter], None],
                 workers: int = 32):
        # workers bound concurrent in-flight requests; they must exceed
        # the scheduler slot count (or the served API can never fill the
        # slots) and leave headroom so /health stays answerable while
        # generations hold the engine lock
        lib = _load()
        if lib is None:
            raise RuntimeError("native server library unavailable")
        self._lib = lib
        self._h = lib.ks_start(host.encode(), port)
        if self._h < 0:
            raise OSError(-self._h, os.strerror(-self._h))
        self.port = lib.ks_port(self._h)
        self._handler = handler
        self._stop = threading.Event()
        self._threads = [
            threading.Thread(target=self._worker, daemon=True)
            for _ in range(workers)
        ]
        for t in self._threads:
            t.start()

    def _worker(self) -> None:
        method = ctypes.create_string_buffer(16)
        path = ctypes.create_string_buffer(1024)
        blen = ctypes.c_long(0)
        while not self._stop.is_set():
            rid = self._lib.ks_next(
                self._h, 200, method, 16, path, 1024, ctypes.byref(blen)
            )
            if rid < 0:
                return  # server stopping
            if rid == 0:
                continue
            body = b""
            if blen.value > 0:
                buf = ctypes.create_string_buffer(blen.value)
                if self._lib.ks_copy_body(self._h, rid, buf, blen.value) == 0:
                    body = buf.raw
            w = NativeResponseWriter(self, rid)
            try:
                self._handler(method.value.decode(), path.value.decode(), body, w)
            except Exception as e:  # handler bug — answer 500, keep serving
                import json

                try:
                    if w.streaming:
                        # the response already started as an SSE stream; a
                        # raw 500 status line here would corrupt the chunk
                        # framing — terminate the stream instead
                        w.sse_end()
                    else:
                        w.send_json(500, json.dumps({"error": str(e)}).encode())
                except Exception:
                    pass

    # ThreadingHTTPServer-compatible surface used by server.py callers
    def shutdown(self) -> None:
        # Join workers BEFORE ks_stop: they poll ks_next with a 200 ms
        # timeout, and destroying the C server while a worker waits on
        # its condvar (or inside any ks_* call mid-handler) would be
        # use-after-free. If a worker is stuck in a long generation past
        # the timeout, LEAK the C server rather than free it under a
        # live ks_stream_send.
        self._stop.set()
        for t in self._threads:
            t.join(timeout=5)
        if any(t.is_alive() for t in self._threads):
            import sys

            print("NativeHTTPServer.shutdown: worker still in a handler; "
                  "leaking the native server to stay memory-safe",
                  file=sys.stderr)
            return
        self._lib.ks_stop(self._h)

    def serve_forever(self) -> None:
        # transport runs on its own threads; just park until shutdown
        while not self._stop.wait(0.5):
            pass
