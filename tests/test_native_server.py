"""Native C++ HTTP/SSE server (native/serve.cpp) — full battery, plus the
same routes over the stdlib transport to pin behavioral parity.

Reference parity target: src/server.rs (health/models/chat, SSE with
immediate first chunk, disconnect cancellation). Runs self-contained on
the CPU backend with a tiny synthetic engine.
"""

import http.client
import json
import socket
import threading
import time

import pytest

from krasis_tpu.config import QuantConfig
from krasis_tpu.models.synthetic import build_synthetic_engine, tiny_config
from krasis_tpu.native import serve as native_serve
from krasis_tpu.ops.sampling import SamplingParams
from krasis_tpu.server import start_temp_server

pytestmark = pytest.mark.skipif(
    not native_serve.available(), reason="no C++ toolchain for native server"
)


class SpyEngine:
    """Delegates to a real engine, counting emitted tokens (cancellation
    observability)."""

    def __init__(self, eng):
        self._eng = eng
        self.cfg = eng.cfg
        self.max_len = eng.max_len
        self.tokens_emitted = 0

    def generate(self, prompt_ids, max_new_tokens, sampling, on_token=None,
                 **kw):
        def counting(tok):
            self.tokens_emitted += 1
            if on_token is not None:
                on_token(tok)

        return self._eng.generate(prompt_ids, max_new_tokens=max_new_tokens,
                                  sampling=sampling, on_token=counting, **kw)


@pytest.fixture(scope="module")
def engine():
    cfg = tiny_config("qwen3-moe")
    return build_synthetic_engine(
        cfg, QuantConfig(expert_bits=4, group_size=32, kv_cache_dtype="bf16"),
        max_len=512,
    )


@pytest.fixture(scope="module", params=["native", "python"])
def server(request, engine):
    port = 8461 if request.param == "native" else 8462
    spy = SpyEngine(engine)
    httpd = start_temp_server(spy, None, "synthetic/tiny", port=port,
                              backend=request.param)
    # the native transport reports its actual backend via the class
    if request.param == "native":
        assert type(httpd).__name__ == "NativeHTTPServer"
    yield port, spy
    httpd.shutdown()


def _post(port, obj, timeout=300):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=timeout)
    conn.request("POST", "/v1/chat/completions", json.dumps(obj),
                 {"Content-Type": "application/json"})
    r = conn.getresponse()
    body = r.read()
    conn.close()
    return r.status, body


def test_health_and_models(server):
    port, _ = server
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=10)
    conn.request("GET", "/health")
    r = conn.getresponse()
    assert r.status == 200
    assert json.loads(r.read())["status"] == "ok"
    # keep-alive: second request over the SAME connection
    conn.request("GET", "/v1/models")
    r = conn.getresponse()
    data = json.loads(r.read())
    assert data["object"] == "list" and data["data"][0]["id"] == "synthetic/tiny"
    conn.close()


def test_not_found_and_bad_json(server):
    port, _ = server
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=10)
    conn.request("GET", "/nope")
    assert conn.getresponse().status == 404
    conn.close()
    status, _ = _post(port, None)  # "null" body → not a JSON object
    assert status == 400
    status, _ = _post_raw(port, b"{not json")
    assert status == 400


def _post_raw(port, raw, timeout=60):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=timeout)
    conn.request("POST", "/v1/chat/completions", raw,
                 {"Content-Type": "application/json"})
    r = conn.getresponse()
    body = r.read()
    conn.close()
    return r.status, body


def test_chat_completion_json(server):
    port, _ = server
    status, body = _post(port, {
        "messages": [{"role": "user", "content": "hello"}],
        "max_tokens": 4, "temperature": 0.0,
    })
    assert status == 200
    obj = json.loads(body)
    assert obj["choices"][0]["message"]["content"]
    assert obj["usage"]["completion_tokens"] >= 1


def test_sse_stream(server):
    port, _ = server
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
    conn.request("POST", "/v1/chat/completions", json.dumps({
        "messages": [{"role": "user", "content": "hi"}],
        "max_tokens": 4, "temperature": 0.0, "stream": True,
    }), {"Content-Type": "application/json"})
    r = conn.getresponse()
    assert r.status == 200
    assert r.getheader("Content-Type") == "text/event-stream"
    chunks, done = 0, False
    for raw in r:
        line = raw.decode().strip()
        if line.startswith("data: "):
            if line == "data: [DONE]":
                done = True
                break
            chunks += 1
    conn.close()
    assert done and chunks >= 2  # role chunk + ≥1 content chunk


def test_concurrent_requests(server):
    port, _ = server
    results = []

    def worker():
        status, body = _post(port, {
            "messages": [{"role": "user", "content": "go"}],
            "max_tokens": 2, "temperature": 0.0,
        })
        results.append(status)

    ts = [threading.Thread(target=worker) for _ in range(4)]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=300)
    assert results == [200, 200, 200, 200]


def test_greedy_determinism(server):
    port, _ = server
    outs = []
    for _ in range(2):
        _, body = _post(port, {
            "messages": [{"role": "user", "content": "determinism"}],
            "max_tokens": 6, "temperature": 0.0,
        })
        outs.append(json.loads(body)["choices"][0]["message"]["content"])
    assert outs[0] == outs[1]


def test_disconnect_cancels_generation(engine):
    """Client drops mid-stream → the native transport observes EPOLLRDHUP
    and the generation loop stops early (reference server.rs disconnect
    cancellation). Native-only: stdlib sockets can't see a disconnect
    without writing."""
    port = 8463
    spy = SpyEngine(engine)
    httpd = start_temp_server(spy, None, "synthetic/tiny", port=port,
                              backend="native")
    try:
        s = socket.create_connection(("127.0.0.1", port), timeout=60)
        body = json.dumps({
            "messages": [{"role": "user", "content": "long"}],
            "max_tokens": 400, "temperature": 0.0, "stream": True,
        }).encode()
        s.sendall(
            b"POST /v1/chat/completions HTTP/1.1\r\n"
            b"Host: x\r\nContent-Type: application/json\r\n"
            b"Content-Length: " + str(len(body)).encode() + b"\r\n\r\n" + body
        )
        s.recv(1024)  # wait for the first bytes (headers + role chunk)
        s.close()     # client goes away
        # generation should stop well before 400 tokens
        deadline = time.time() + 120
        while time.time() < deadline:
            done = spy.tokens_emitted
            time.sleep(1.0)
            if spy.tokens_emitted == done and done > 0:
                break  # token counter stopped moving
        assert 0 < spy.tokens_emitted < 400
    finally:
        httpd.shutdown()


def test_native_with_batch_scheduler(engine):
    """Continuous batching behind the native transport: two concurrent
    SSE streams multiplexed through scheduler slots."""
    from krasis_tpu.runtime.scheduler import BatchScheduler

    port = 8464
    sched = BatchScheduler(engine.cfg, engine.quant, engine.params,
                           max_len=512, num_slots=2)
    httpd = start_temp_server(engine, None, "synthetic/tiny", port=port,
                              scheduler=sched, backend="native")
    try:
        results = []

        def worker():
            conn = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
            conn.request("POST", "/v1/chat/completions", json.dumps({
                "messages": [{"role": "user", "content": "batch me"}],
                "max_tokens": 4, "temperature": 0.0, "stream": True,
            }), {"Content-Type": "application/json"})
            r = conn.getresponse()
            chunks, done = 0, False
            for raw in r:
                line = raw.decode().strip()
                if line == "data: [DONE]":
                    done = True
                    break
                if line.startswith("data: "):
                    chunks += 1
            conn.close()
            results.append((done, chunks))

        ts = [threading.Thread(target=worker) for _ in range(2)]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=300)
        assert len(results) == 2
        assert all(done and chunks >= 2 for done, chunks in results)

        # logprobs through the scheduler path
        status, body = _post(port, {
            "messages": [{"role": "user", "content": "lp batched"}],
            "max_tokens": 3, "temperature": 0.0, "logprobs": True,
        })
        assert status == 200
        content = json.loads(body)["choices"][0]["logprobs"]["content"]
        assert len(content) == 3 and all(e["logprob"] <= 0 for e in content)
    finally:
        httpd.shutdown()
        sched.shutdown()


def test_stream_logprobs(server):
    """Streaming logprobs: every content chunk carries the token-aligned
    entries; totals match the token count."""
    port, _ = server
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
    conn.request("POST", "/v1/chat/completions", json.dumps({
        "messages": [{"role": "user", "content": "stream lp"}],
        "max_tokens": 4, "temperature": 0.0, "stream": True,
        "logprobs": True,
        "stream_options": {"include_usage": True},
    }), {"Content-Type": "application/json"})
    r = conn.getresponse()
    entries, usage = [], None
    for raw in r:
        line = raw.decode().strip()
        if line == "data: [DONE]":
            break
        if line.startswith("data: "):
            obj = json.loads(line[6:])
            if obj.get("usage"):
                usage = obj["usage"]
                continue
            ch = obj["choices"][0]
            if ch.get("logprobs"):
                entries.extend(ch["logprobs"]["content"])
    conn.close()
    assert usage and len(entries) == usage["completion_tokens"] == 4
    assert all(e["logprob"] <= 0 for e in entries)


def test_stream_include_usage(server):
    """stream_options.include_usage: a final usage chunk (empty choices)
    arrives before [DONE]."""
    port, _ = server
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
    conn.request("POST", "/v1/chat/completions", json.dumps({
        "messages": [{"role": "user", "content": "usage"}],
        "max_tokens": 3, "temperature": 0.0, "stream": True,
        "stream_options": {"include_usage": True},
    }), {"Content-Type": "application/json"})
    r = conn.getresponse()
    usage = None
    for raw in r:
        line = raw.decode().strip()
        if line == "data: [DONE]":
            break
        if line.startswith("data: "):
            obj = json.loads(line[6:])
            if obj.get("usage"):
                assert obj["choices"] == []
                usage = obj["usage"]
    conn.close()
    assert usage and usage["completion_tokens"] == 3
    assert usage["total_tokens"] == usage["prompt_tokens"] + 3


def test_stop_matcher_unit():
    from krasis_tpu.server import StopMatcher

    # stop straddles chunk boundary → never emitted
    sm = StopMatcher(["END"])
    out = sm.push("hello E")
    assert out == "hello "          # "E" held back (could start "END")
    out2 = sm.push("ND world")
    assert out2 == "" and sm.stopped
    assert sm.flush() == ""
    # no stop hit → held tail released at flush
    sm2 = StopMatcher(["ZZZ"])
    a = sm2.push("abcZ")
    assert a == "abc"
    assert sm2.flush() == "Z"
    # multiple stops, earliest in-buffer match wins
    sm3 = StopMatcher(["xy", "bc"])
    assert sm3.push("abcxy") == "a" and sm3.stopped
    # no stops: pass-through
    sm4 = StopMatcher([])
    assert sm4.push("anything") == "anything"


def test_stop_strings_over_http(server):
    port, _ = server
    # capture the deterministic greedy output, then replay with a stop
    # string cut from its middle — OpenAI semantics: stop text excluded
    _, body = _post(port, {
        "messages": [{"role": "user", "content": "stop test"}],
        "max_tokens": 8, "temperature": 0.0,
    })
    full = json.loads(body)["choices"][0]["message"]["content"]
    pieces = full.split(" ")
    assert len(pieces) >= 4
    stop = pieces[2]
    _, body2 = _post(port, {
        "messages": [{"role": "user", "content": "stop test"}],
        "max_tokens": 8, "temperature": 0.0, "stop": [stop],
    })
    got = json.loads(body2)["choices"][0]["message"]["content"]
    assert stop not in got
    assert full.startswith(got)
    assert len(got) < len(full)
    # streaming path (synthetic models render tokens as <id>, a different
    # text form than the JSON path): stream once without and once with
    # the stop, and check truncation within the stream format
    def stream_text(stop_arg):
        req_body = {
            "messages": [{"role": "user", "content": "stop test"}],
            "max_tokens": 8, "temperature": 0.0, "stream": True,
        }
        if stop_arg is not None:
            req_body["stop"] = stop_arg
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
        conn.request("POST", "/v1/chat/completions", json.dumps(req_body),
                     {"Content-Type": "application/json"})
        r = conn.getresponse()
        text = ""
        for raw in r:
            line = raw.decode().strip()
            if line.startswith("data: ") and line != "data: [DONE]":
                delta = json.loads(line[6:])["choices"][0]["delta"]
                text += delta.get("content", "")
        conn.close()
        return text

    s_full = stream_text(None)
    s_stop = f"<{pieces[2]}>"
    s_cut = stream_text(s_stop)
    assert s_stop not in s_cut
    assert s_full.startswith(s_cut)
    assert len(s_cut) < len(s_full)


def test_logprobs_in_response(server):
    """OpenAI `logprobs: true` returns per-token raw-model logprobs
    (capability the reference server lacks)."""
    port, _ = server
    status, body = _post(port, {
        "messages": [{"role": "user", "content": "lp"}],
        "max_tokens": 5, "temperature": 0.0, "logprobs": True,
    })
    assert status == 200
    obj = json.loads(body)
    content = obj["choices"][0]["logprobs"]["content"]
    assert len(content) == obj["usage"]["completion_tokens"] == 5
    for e in content:
        assert e["logprob"] <= 0.0 and e["token"]
    # greedy sampling: the chosen token is the argmax, so its raw-model
    # logprob must be 'large' (> log(1/V) by a wide margin)
    assert all(e["logprob"] > -20.0 for e in content)
    # and absent unless requested
    _, body2 = _post(port, {
        "messages": [{"role": "user", "content": "lp"}],
        "max_tokens": 2, "temperature": 0.0,
    })
    assert "logprobs" not in json.loads(body2)["choices"][0]
    # top_logprobs: N alternatives per token; greedy → the chosen token
    # is the top-1 alternative with the same logprob
    status, body3 = _post(port, {
        "messages": [{"role": "user", "content": "lp"}],
        "max_tokens": 3, "temperature": 0.0, "logprobs": True,
        "top_logprobs": 4,
    })
    assert status == 200
    for e in json.loads(body3)["choices"][0]["logprobs"]["content"]:
        alts = e["top_logprobs"]
        assert len(alts) == 4
        assert alts[0]["token"] == e["token"]
        assert abs(alts[0]["logprob"] - e["logprob"]) < 1e-4
        lps = [a["logprob"] for a in alts]
        assert lps == sorted(lps, reverse=True)
    # out-of-range top_logprobs is a client error
    status, _ = _post(port, {
        "messages": [{"role": "user", "content": "lp"}],
        "max_tokens": 1, "logprobs": True, "top_logprobs": 50,
    })
    assert status == 400


def test_half_close_client_still_served(engine):
    """A client that writes a full request then shutdown(SHUT_WR) must
    still get its response (EPOLLIN and EPOLLRDHUP arrive together; the
    request must be parsed before honoring the hangup)."""
    port = 8465
    httpd = start_temp_server(engine, None, "synthetic/tiny", port=port,
                              backend="native")
    try:
        s = socket.create_connection(("127.0.0.1", port), timeout=120)
        body = json.dumps({
            "messages": [{"role": "user", "content": "half close"}],
            "max_tokens": 2, "temperature": 0.0,
        }).encode()
        s.sendall(
            b"POST /v1/chat/completions HTTP/1.1\r\n"
            b"Host: x\r\nContent-Type: application/json\r\n"
            b"Content-Length: " + str(len(body)).encode() + b"\r\n\r\n" + body
        )
        s.shutdown(socket.SHUT_WR)  # half-close: we still read the reply
        data = b""
        s.settimeout(120)
        while True:
            try:
                chunk = s.recv(65536)
            except socket.timeout:
                break
            if not chunk:
                break
            data += chunk
        s.close()
        assert b"200 OK" in data and b"chat.completion" in data
    finally:
        httpd.shutdown()


def test_served_on_mesh():
    """Multi-chip serving wiring (--mesh): an 8-way expert-parallel
    engine + scheduler served over HTTP must answer exactly like the
    unsharded engine (greedy)."""
    from krasis_tpu.parallel.mesh import make_mesh
    from krasis_tpu.runtime.scheduler import BatchScheduler

    cfg = tiny_config("qwen3-moe")
    quant = QuantConfig(expert_bits=4, group_size=32, kv_cache_dtype="bf16")
    ref_eng = build_synthetic_engine(cfg, quant, max_len=512)

    mesh = make_mesh(8, dp=1)
    eng = build_synthetic_engine(cfg, quant, max_len=512, mesh=mesh)
    sched = BatchScheduler(cfg, quant, eng.params, max_len=512,
                           num_slots=2, mesh=mesh)
    port = 8466
    httpd = start_temp_server(eng, None, "synthetic/tiny-mesh", port=port,
                              scheduler=sched, backend="native")
    try:
        status, body = _post(port, {
            "messages": [{"role": "user", "content": "mesh serve"}],
            "max_tokens": 5, "temperature": 0.0,
        })
        assert status == 200
        got = json.loads(body)["choices"][0]["message"]["content"]
    finally:
        httpd.shutdown()
        sched.shutdown()

    # unsharded reference through the same text→token hashing
    text = "mesh serve"
    vocab = cfg.vocab_size
    ids = [(7 + 31 * ord(c)) % (vocab - 2) + 1 for c in text]
    from krasis_tpu.ops.sampling import SamplingParams

    ref = ref_eng.generate(ids, max_new_tokens=5,
                           sampling=SamplingParams(temperature=0.0),
                           stop_ids={-1})
    assert got == " ".join(str(t) for t in ref.tokens)


def test_native_concurrency_soak(engine):
    """Short soak of the C++ transport: health checks stay answerable
    (and fast) while streams are in flight; no request is lost across
    many keep-alive cycles."""
    port = 8467
    httpd = start_temp_server(engine, None, "synthetic/tiny", port=port,
                              backend="native")
    try:
        errors = []

        def stream_worker():
            try:
                conn = http.client.HTTPConnection("127.0.0.1", port,
                                                  timeout=300)
                conn.request("POST", "/v1/chat/completions", json.dumps({
                    "messages": [{"role": "user", "content": "soak"}],
                    "max_tokens": 16, "temperature": 0.0, "stream": True,
                }), {"Content-Type": "application/json"})
                r = conn.getresponse()
                for _ in r:
                    pass
                conn.close()
            except Exception as e:
                errors.append(e)

        def health_worker():
            try:
                conn = http.client.HTTPConnection("127.0.0.1", port,
                                                  timeout=60)
                for _ in range(25):  # keep-alive reuse across iterations
                    conn.request("GET", "/health")
                    r = conn.getresponse()
                    assert r.status == 200
                    r.read()
                conn.close()
            except Exception as e:
                errors.append(e)

        ts = ([threading.Thread(target=stream_worker) for _ in range(2)]
              + [threading.Thread(target=health_worker) for _ in range(6)])
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=300)
        assert not errors, errors
    finally:
        httpd.shutdown()


def test_native_parser_fuzz(engine):
    """Garbage in, liveness out: random/malformed/truncated bytes thrown
    at the hand-written C++ HTTP parser must never take the server down
    or wedge a worker.

    NOTE: the very first run of this test (2026-08-18) crashed the
    process with 'terminate called after throwing an instance of'' /
    'FATAL: exception not rethrown' (pthread forced-unwind signature);
    13 subsequent runs are clean and per-payload bisection found no
    killer. If this recurs in CI, suspect a teardown race between
    NativeHTTPServer.shutdown and a worker inside a ks_* call."""
    import random

    port = 8468
    httpd = start_temp_server(engine, None, "synthetic/tiny", port=port,
                              backend="native")
    rnd = random.Random(0)
    payloads = [
        b"",                                   # connect-and-close
        b"\r\n\r\n",
        b"GET\r\n\r\n",                        # malformed request line
        b"GET / HTTP/1.1\r\nContent-Length: -5\r\n\r\n",
        b"POST /v1/chat/completions HTTP/1.1\r\nContent-Length: 10\r\n\r\nabc",  # truncated body
        b"GET /health HTTP/1.1\r\nHost: x\r\n\r\nGET /health HTTP/1.1\r\n\r\n",  # pipelined
        b"POST / HTTP/1.1\r\nContent-Length: 99999999999999999999\r\n\r\n",      # overflow-ish
        bytes(rnd.randrange(256) for _ in range(512)),   # pure noise
        b"GET " + b"A" * 2000 + b" HTTP/1.1\r\n\r\n",    # long path
        b"POST /v1/chat/completions HTTP/1.1\r\ncontent-length: 2\r\n\r\n{}",    # lowercase header
    ]
    try:
        for pl in payloads:
            try:
                s = socket.create_connection(("127.0.0.1", port), timeout=10)
                if pl:
                    s.sendall(pl)
                time.sleep(0.05)
                s.close()
            except OSError:
                pass  # server may reset — that's allowed; dying is not
        # after all that, the server still answers
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
        conn.request("GET", "/health")
        assert conn.getresponse().status == 200
        conn.close()
    finally:
        httpd.shutdown()


def test_oversized_path_request(server):
    """A request the parser must reject (no crash, connection dropped)."""
    port, _ = server
    s = socket.create_connection(("127.0.0.1", port), timeout=10)
    s.sendall(b"GET /" + b"x" * (80 * 1024) + b" HTTP/1.1\r\n")
    time.sleep(0.2)
    s.close()
    # server still alive
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=10)
    conn.request("GET", "/health")
    assert conn.getresponse().status == 200
    conn.close()
