"""OpenAI-compatible HTTP server with SSE streaming.

Feature parity with the reference's Rust server
(reference src/server.rs: /health, /v1/models, /v1/chat/completions,
SSE streaming with immediate first chunk, client-disconnect
cancellation, server registry under ~/.krasis_tpu/servers/).

Two transports share the same route handlers (`handle_request`):

* **native** (default when a C++ toolchain exists): epoll event loop in
  C++ (`native/serve.cpp`) — socket reads/writes, HTTP parsing, and
  disconnect detection never touch the GIL, and streamed token writes
  are buffered try-sends so a slow client can never stall the
  generation loop. This is the TPU-side analog of the reference's Rust
  axum server.
* **python**: stdlib ThreadingHTTPServer fallback (zero build deps).

Generation is serialized through an engine lock unless a
continuous-batching scheduler is attached (the reference is likewise
single-request-at-a-time, server.rs:7).

Also serves synthetic models (`--synthetic tiny`) so the API surface can
be driven without a checkpoint.
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import threading
import time
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Dict, Optional

from .config import ModelConfig, QuantConfig, preset_config
from .ops.sampling import SamplingParams

REGISTRY_DIR = os.path.join(
    os.environ.get("KRASIS_TPU_HOME", os.path.expanduser("~/.krasis_tpu")),
    "servers",
)


class ServerState:
    def __init__(self, engine, tokenizer, model_name: str, scheduler=None):
        self.engine = engine
        self.tokenizer = tokenizer  # may be None for synthetic models
        self.model_name = model_name
        self.scheduler = scheduler  # continuous batching (None = serialized)
        self.lock = threading.Lock()


STATE: Optional[ServerState] = None


# ---- transport-independent route handlers ---------------------------------
# Both transports provide a writer with:
#   send_json(code, body_bytes) / sse_start() / sse_send(bytes) -> bool
#   sse_end() / cancelled() -> bool


def _json_bytes(obj: Dict[str, Any]) -> bytes:
    return json.dumps(obj).encode()


def _chunk(state: ServerState, rid, created, delta: Dict[str, Any],
           finish=None, logprobs=None) -> bytes:
    choice: Dict[str, Any] = {"index": 0, "delta": delta,
                              "finish_reason": finish}
    if logprobs is not None:
        choice["logprobs"] = {"content": logprobs}
    obj = {
        "id": rid, "object": "chat.completion.chunk", "created": created,
        "model": state.model_name,
        "choices": [choice],
    }
    return f"data: {json.dumps(obj)}\n\n".encode()


def handle_request(state: ServerState, method: str, path: str,
                   body: bytes, w) -> None:
    if method == "GET" and path == "/health":
        w.send_json(200, _json_bytes({"status": "ok", "model": state.model_name}))
        return
    if method == "GET" and path == "/v1/models":
        w.send_json(200, _json_bytes({
            "object": "list",
            "data": [{"id": state.model_name, "object": "model",
                      "owned_by": "krasis-tpu"}],
        }))
        return
    if method != "POST" or path != "/v1/chat/completions":
        w.send_json(404, _json_bytes({"error": "not found"}))
        return

    try:
        req = json.loads(body)
        if not isinstance(req, dict):
            raise ValueError("request body must be a JSON object")
        # field validation inside the 400 envelope: a null max_tokens or
        # a non-list stop is a CLIENT error, not a 500/dropped socket
        stream = bool(req.get("stream", False))
        max_tokens = int(
            req.get("max_tokens", req.get("max_completion_tokens", 512)))
        sampling = SamplingParams(
            temperature=float(req.get("temperature", 0.6)),
            top_k=int(req.get("top_k", 20)),
            top_p=float(req.get("top_p", 0.95)),
            presence_penalty=float(req.get("presence_penalty", 0.0)),
        )
        stops = _parse_stops(req)
        want_logprobs = bool(req.get("logprobs", False))
        top_logprobs = int(req.get("top_logprobs", 0) or 0)
        if not 0 <= top_logprobs <= 8:
            raise ValueError("top_logprobs must be in [0, 8]")
        seed = int(req.get("seed", 0) or 0)
        include_usage = bool(
            (req.get("stream_options") or {}).get("include_usage", False))
        messages = req.get("messages", [])
        if not isinstance(messages, list):
            raise ValueError("messages must be a list")
    except Exception as e:  # malformed request
        w.send_json(400, _json_bytes({"error": str(e)}))
        return
    if state.tokenizer is not None:
        prompt_ids = state.tokenizer.apply_chat_template(messages)
    else:
        # synthetic model: hash message text into token ids
        text = " ".join(m.get("content", "") for m in messages)
        vocab = state.engine.cfg.vocab_size
        prompt_ids = [(7 + 31 * ord(c)) % (vocab - 2) + 1 for c in text[:512]] or [1]

    rid = f"chatcmpl-{uuid.uuid4().hex[:12]}"
    created = int(time.time())

    if state.scheduler is not None:
        # continuous batching: no lock — scheduler multiplexes slots
        if stream:
            _stream_batched(state, w, rid, created, prompt_ids, max_tokens,
                            sampling, stops, include_usage, want_logprobs)
        else:
            _full_batched(state, w, rid, created, prompt_ids, max_tokens,
                          sampling, stops, want_logprobs)
        return
    with state.lock:
        if stream:
            _stream_single(state, w, rid, created, prompt_ids, max_tokens,
                           sampling, stops, seed, include_usage,
                           want_logprobs)
        else:
            _full_single(state, w, rid, created, prompt_ids, max_tokens,
                         sampling, stops, want_logprobs, top_logprobs, seed)


def _make_decoder(state: ServerState):
    if state.tokenizer is None:
        return None
    from .runtime.tokenizer import IncrementalDecoder

    return IncrementalDecoder(state.tokenizer)


class StopMatcher:
    """Streaming `stop`-string matcher (reference server.rs:295 stop
    tokens): emits text only once it can no longer be the prefix of a
    stop string, so a stop sequence straddling chunk boundaries is still
    caught and never leaks to the client."""

    def __init__(self, stops):
        self.stops = [s for s in (stops or []) if s]
        self.hold = max((len(s) for s in self.stops), default=0)
        self.buf = ""
        self.stopped = False

    def push(self, text: str) -> str:
        """Feed decoded text; returns the text safe to emit now."""
        if self.stopped:
            return ""
        if not self.stops:
            return text
        self.buf += text
        hits = [i for i in (self.buf.find(s) for s in self.stops) if i >= 0]
        if hits:
            self.stopped = True
            out, self.buf = self.buf[:min(hits)], ""
            return out
        # emit everything except a tail that could still start a stop
        keep = 0
        for j in range(min(self.hold - 1, len(self.buf)), 0, -1):
            tail = self.buf[-j:]
            if any(s.startswith(tail) for s in self.stops):
                keep = j
                break
        if keep:
            out, self.buf = self.buf[:-keep], self.buf[-keep:]
        else:
            out, self.buf = self.buf, ""
        return out

    def flush(self) -> str:
        """End of generation: release any held-back tail."""
        out, self.buf = ("" if self.stopped else self.buf), ""
        return out


def _parse_stops(req) -> list:
    stop = req.get("stop")
    if stop is None:
        return []
    if isinstance(stop, str):
        stop = [stop]
    return [s for s in stop[:8] if isinstance(s, str) and s]


def _usage_chunk(state, rid, created, prompt_tokens, completion) -> bytes:
    obj = {
        "id": rid, "object": "chat.completion.chunk", "created": created,
        "model": state.model_name, "choices": [],
        "usage": {"prompt_tokens": prompt_tokens,
                  "completion_tokens": completion,
                  "total_tokens": prompt_tokens + completion},
    }
    return f"data: {json.dumps(obj)}\n\n".encode()


def _stream_single(state, w, rid, created, prompt_ids, max_tokens, sampling,
                   stops=(), seed=0, include_usage=False,
                   want_logprobs=False):
    w.sse_start()
    # immediate role chunk (TTFT, reference server.rs:407 first-chunk)
    w.sse_send(_chunk(state, rid, created, {"role": "assistant"}))
    dec = _make_decoder(state)
    sm = StopMatcher(stops)
    n_tok = 0
    pending_lp: list = []  # (tok, lp) since the last emitted chunk

    def on_token_lp(tok: int, lp: float):
        nonlocal n_tok
        n_tok += 1
        if w.cancelled():
            raise StopIteration  # client went away → cancel decode
        if want_logprobs:
            pending_lp.append((tok, lp))
        text = dec.push(tok) if dec is not None else f"<{tok}>"
        text = sm.push(text)
        if text:
            lps = None
            if want_logprobs:
                lps = _logprobs_content(
                    state, [t for t, _ in pending_lp],
                    [l for _, l in pending_lp])
                pending_lp.clear()
            if not w.sse_send(_chunk(state, rid, created, {"content": text},
                                     logprobs=lps)):
                raise StopIteration
        if sm.stopped:
            raise StopIteration  # stop string hit → cancel decode

    try:
        # on_token_lp drives streaming; when the request didn't ask for
        # logprobs the lp values are unused, so skip their computation
        state.engine.generate(
            prompt_ids, max_new_tokens=max_tokens,
            sampling=sampling, on_token_lp=on_token_lp, seed=seed,
            want_logprobs=want_logprobs,
        )
    except StopIteration:
        pass
    tail = sm.flush()
    if tail:
        w.sse_send(_chunk(state, rid, created, {"content": tail}))
    w.sse_send(_chunk(state, rid, created, {}, finish="stop"))
    if include_usage:
        w.sse_send(_usage_chunk(state, rid, created, len(prompt_ids), n_tok))
    w.sse_send(b"data: [DONE]\n\n")
    w.sse_end()


def _logprobs_content(state, tokens, lps, top=None):
    """OpenAI `logprobs.content` entries: per-token text + raw-model
    logprob (+ top-N alternatives when computed)."""
    def tok_str(t):
        return (state.tokenizer.decode([t])
                if state.tokenizer is not None else str(t))

    out = []
    for i, (t, lp) in enumerate(zip(tokens, lps or [])):
        alts = []
        if top is not None and i < len(top):
            alts = [{"token": tok_str(tid), "logprob": round(tlp, 6)}
                    for tid, tlp in top[i]]
        out.append({"token": tok_str(t), "logprob": round(lp, 6),
                    "top_logprobs": alts})
    return out


def _full_single(state, w, rid, created, prompt_ids, max_tokens, sampling,
                 stops=(), want_logprobs=False, top_logprobs=0, seed=0):
    # Stop strings must CANCEL generation, not post-truncate — a stop on
    # token 3 of a 512-max_tokens request must not pay for 512 tokens
    # (reference server.rs:295 halts at the stop token).
    sm = StopMatcher(stops)
    dec = _make_decoder(state) if stops else None
    pieces = []

    def on_token(tok: int):
        if not stops:
            return
        piece = dec.push(tok) if dec is not None else (
            ("" if not pieces else " ") + str(tok))
        pieces.append(sm.push(piece))
        if sm.stopped:
            raise StopIteration

    res = state.engine.generate(
        prompt_ids, max_new_tokens=max_tokens, sampling=sampling,
        on_token=on_token, seed=seed,
        top_logprobs=(top_logprobs if want_logprobs else 0),
        want_logprobs=want_logprobs,
    )
    if stops:
        pieces.append(sm.flush())
        text = "".join(pieces)
    elif state.tokenizer is not None:
        text = state.tokenizer.decode(res.tokens)
    else:
        text = " ".join(str(t) for t in res.tokens)
    n_tok = len(res.tokens)
    choice = {"index": 0,
              "message": {"role": "assistant", "content": text},
              "finish_reason": "stop"}
    if want_logprobs:
        choice["logprobs"] = {
            "content": _logprobs_content(state, res.tokens, res.logprobs,
                                         res.top_logprobs)}
    w.send_json(200, _json_bytes({
        "id": rid, "object": "chat.completion", "created": created,
        "model": state.model_name,
        "choices": [choice],
        "usage": {
            "prompt_tokens": res.prompt_len,
            "completion_tokens": n_tok,
            "total_tokens": res.prompt_len + n_tok,
        },
        "timing": {
            "prefill_tok_s": round(res.prefill_tok_s, 2),
            "decode_tok_s": round(res.decode_tok_s, 2),
            # MTP speculative decoding acceptance (models/mtp.py), when
            # the request ran through a spec engine
            **({"spec": state.engine.last_spec_stats}
               if getattr(state.engine, "last_spec_stats", None) else {}),
        },
    }))


def _stream_batched(state, w, rid, created, prompt_ids, max_tokens, sampling,
                    stops=(), include_usage=False, want_logprobs=False):
    w.sse_start()
    w.sse_send(_chunk(state, rid, created, {"role": "assistant"}))
    dec = _make_decoder(state)
    sm = StopMatcher(stops)
    n_tok = 0
    pending_lp: list = []

    req = state.scheduler.submit(prompt_ids, max_new_tokens=max_tokens,
                                 sampling=sampling,
                                 want_logprobs=want_logprobs)
    client_gone = False
    while True:
        tok = req.out_queue.get()
        if tok is None:
            break
        if client_gone:
            continue  # drain until the scheduler's end sentinel
        if w.cancelled():
            req.cancelled.set()
            client_gone = True
            continue
        if want_logprobs:
            # logprobs[i] is appended before token i reaches the queue
            pending_lp.append((tok, req.logprobs[n_tok]))
        n_tok += 1
        text = dec.push(tok) if dec is not None else f"<{tok}>"
        text = sm.push(text)
        if text:
            lps = None
            if want_logprobs:
                lps = _logprobs_content(
                    state, [t for t, _ in pending_lp],
                    [l for _, l in pending_lp])
                pending_lp.clear()
            if not w.sse_send(_chunk(state, rid, created, {"content": text},
                                     logprobs=lps)):
                req.cancelled.set()
                client_gone = True
                continue
        if sm.stopped:
            req.cancelled.set()   # frees the slot at the next emission
            client_gone = True    # drain; final chunks sent below
    if not sm.stopped and client_gone:
        # client went away: still sse_end() — on the native transport
        # that is what releases the request in the C registry
        w.sse_end()
        return
    tail = sm.flush()
    if tail:
        w.sse_send(_chunk(state, rid, created, {"content": tail}))
    w.sse_send(_chunk(state, rid, created, {}, finish="stop"))
    if include_usage:
        w.sse_send(_usage_chunk(state, rid, created, len(prompt_ids), n_tok))
    w.sse_send(b"data: [DONE]\n\n")
    w.sse_end()


def _full_batched(state, w, rid, created, prompt_ids, max_tokens, sampling,
                  stops=(), want_logprobs=False):
    req = state.scheduler.submit(prompt_ids, max_new_tokens=max_tokens,
                                 sampling=sampling,
                                 want_logprobs=want_logprobs)
    sm = StopMatcher(stops)
    dec = _make_decoder(state) if stops else None
    toks, pieces = [], []
    while True:
        t = req.out_queue.get()
        if t is None:
            break
        if sm.stopped:
            continue  # draining after a stop hit (slot already cancelled)
        toks.append(t)
        if stops:
            piece = dec.push(t) if dec is not None else (
                ("" if len(toks) == 1 else " ") + str(t))
            pieces.append(sm.push(piece))
            if sm.stopped:
                req.cancelled.set()  # stop paying for the rest
    pieces.append(sm.flush())
    if stops:
        text = "".join(pieces)
    elif state.tokenizer is not None:
        text = state.tokenizer.decode(toks)
    else:
        text = " ".join(str(t) for t in toks)
    choice = {"index": 0,
              "message": {"role": "assistant", "content": text},
              "finish_reason": "stop"}
    if want_logprobs:
        choice["logprobs"] = {
            "content": _logprobs_content(state, toks, req.logprobs)}
    w.send_json(200, _json_bytes({
        "id": rid, "object": "chat.completion", "created": created,
        "model": state.model_name,
        "choices": [choice],
        "usage": {"prompt_tokens": len(prompt_ids),
                  "completion_tokens": len(toks),
                  "total_tokens": len(prompt_ids) + len(toks)},
    }))


# ---- stdlib transport ------------------------------------------------------


class _StdlibWriter:
    """ResponseWriter over a BaseHTTPRequestHandler (chunked SSE)."""

    def __init__(self, h: BaseHTTPRequestHandler):
        self._h = h
        self._dead = False

    def send_json(self, code: int, body: bytes) -> None:
        h = self._h
        try:
            h.send_response(code)
            h.send_header("Content-Type", "application/json")
            h.send_header("Content-Length", str(len(body)))
            h.end_headers()
            h.wfile.write(body)
        except (BrokenPipeError, ConnectionResetError):
            # client disconnected before/while the response was written —
            # routine teardown, not an error (the socketserver default
            # would print a full traceback mid-suite)
            self._dead = True

    def sse_start(self) -> None:
        h = self._h
        try:
            h.send_response(200)
            h.send_header("Content-Type", "text/event-stream")
            h.send_header("Cache-Control", "no-cache")
            h.send_header("Transfer-Encoding", "chunked")
            h.end_headers()
        except (BrokenPipeError, ConnectionResetError):
            self._dead = True

    def sse_send(self, data: bytes) -> bool:
        if self._dead:
            return False
        try:
            self._h.wfile.write(f"{len(data):x}\r\n".encode() + data + b"\r\n")
            self._h.wfile.flush()
            return True
        except (BrokenPipeError, ConnectionResetError):
            self._dead = True
            return False

    def sse_end(self) -> None:
        if self._dead:
            return
        try:
            self._h.wfile.write(b"0\r\n\r\n")
            self._h.wfile.flush()
        except (BrokenPipeError, ConnectionResetError):
            self._dead = True

    def cancelled(self) -> bool:
        # stdlib sockets can't observe a disconnect without writing; a
        # failed write sets _dead (the native transport sees EPOLLRDHUP)
        return self._dead


class Handler(BaseHTTPRequestHandler):
    protocol_version = "HTTP/1.1"

    def log_message(self, fmt, *args):  # quiet default logging
        pass

    def _dispatch(self):
        try:
            n = int(self.headers.get("Content-Length", 0))
        except ValueError:
            n = 0
        try:
            body = self.rfile.read(n) if n else b""
            handle_request(STATE, self.command, self.path, body,
                           _StdlibWriter(self))
        except (BrokenPipeError, ConnectionResetError):
            # mid-request disconnect: close quietly
            self.close_connection = True

    def do_GET(self):
        self._dispatch()

    def do_POST(self):
        self._dispatch()


class _QuietThreadingHTTPServer(ThreadingHTTPServer):
    """ThreadingHTTPServer that treats client-gone errors as routine.

    The default handle_error prints a full traceback to stderr for ANY
    exception in a handler thread — including BrokenPipe/ConnectionReset
    from a client that simply disconnected mid-stream (seen as stray
    "Exception occurred during processing of request" noise in test
    runs). Real errors still get the default report."""

    daemon_threads = True

    def handle_error(self, request, client_address):
        import sys

        exc = sys.exc_info()[1]
        if isinstance(exc, (BrokenPipeError, ConnectionResetError,
                            ConnectionAbortedError, TimeoutError)):
            return
        super().handle_error(request, client_address)


# ---- lifecycle -------------------------------------------------------------


def register_server(port: int, model_name: str):
    """Server discovery registry (reference server.py:160-187)."""
    os.makedirs(REGISTRY_DIR, exist_ok=True)
    path = os.path.join(REGISTRY_DIR, f"{port}.json")
    with open(path, "w") as f:
        json.dump({"port": port, "model": model_name, "pid": os.getpid(),
                   "started": time.time()}, f)
    return path


def _make_httpd(host: str, port: int, backend: str = "auto"):
    """Build the requested transport. Returns (httpd, backend_used)."""
    if backend in ("auto", "native"):
        from .native import serve as native_serve

        if native_serve.available():
            slots = getattr(STATE.scheduler, "num_slots", 0) if STATE else 0
            httpd = native_serve.NativeHTTPServer(
                host, port,
                lambda m, p, b, w: handle_request(STATE, m, p, b, w),
                workers=max(32, 2 * slots + 8),
            )
            return httpd, "native"
        if backend == "native":
            raise RuntimeError("native server requested but the C++ "
                               "library failed to build")
    return _QuietThreadingHTTPServer((host, port), Handler), "python"


def start_temp_server(engine, tokenizer, model_name: str,
                      host="127.0.0.1", port=8398, scheduler=None,
                      backend: str = "auto"):
    """Non-blocking server for the benchmark's network re-measurement
    (reference benchmark.py:648 spins a temp RustServer the same way).
    Returns the httpd; call .shutdown() when done."""
    global STATE
    STATE = ServerState(engine, tokenizer, model_name, scheduler=scheduler)
    httpd, used = _make_httpd(host, port, backend)
    if used == "python":
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
    return httpd


def run_server(engine, tokenizer, model_name: str, host="127.0.0.1",
               port=8399, scheduler=None, backend: str = "auto"):
    global STATE
    STATE = ServerState(engine, tokenizer, model_name, scheduler=scheduler)
    reg = register_server(port, model_name)
    httpd, used = _make_httpd(host, port, backend)
    print(f"krasis-tpu serving {model_name} on http://{host}:{port} "
          f"[{used} transport]")
    try:
        httpd.serve_forever()
    finally:
        try:
            os.unlink(reg)
        except OSError:
            pass


def warmup(engine, scheduler=None):
    """Compile prefill+decode before accepting traffic (reference
    server.py startup warmup) so the first request doesn't eat the
    multi-minute remote compile."""
    from .ops.sampling import SamplingParams

    t0 = time.time()
    n = min(256, engine.max_len // 4)
    engine.generate(list(range(1, n + 1)), max_new_tokens=4,
                    sampling=SamplingParams(temperature=0.0), stop_ids={-1})
    if scheduler is not None:
        r = scheduler.submit(list(range(1, n + 1)), max_new_tokens=4,
                             sampling=SamplingParams(temperature=0.0))
        while r.out_queue.get() is not None:
            pass
    print(f"warmup done in {time.time() - t0:.1f}s")


def main():
    from .runlog import apply_config_precedence, setup_run_logging

    ap = argparse.ArgumentParser()
    ap.add_argument("--model", help="model checkpoint path")
    ap.add_argument("--synthetic", help="synthetic preset (tiny | v2-lite | ...)")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8399)
    ap.add_argument("--max-len", type=int, default=4096)
    ap.add_argument("--expert-bits", type=int, default=4, choices=(4, 8))
    ap.add_argument("--kv-dtype", default="auto",
                    choices=("auto", "fp8", "bf16"))
    ap.add_argument("--attention-quant", default="bf16",
                    choices=("bf16", "int8", "int4"))
    ap.add_argument("--expert-activation", default="bf16",
                    choices=("bf16", "int8"),
                    help="int8 = W4A8 decode MoE (int8 MXU dots; "
                         "adds bounded activation rounding)")
    ap.add_argument("--shared-expert-quant", default="int8",
                    choices=("bf16", "int8"))
    ap.add_argument("--dense-mlp-quant", default="int8",
                    choices=("bf16", "int8"))
    ap.add_argument("--lm-head-quant", default="int8", choices=("bf16", "int8"))
    ap.add_argument("--mesh", default=None, metavar="DP,EP",
                    help="shard over the local chips: e.g. 1,8 = 8-way "
                         "expert parallelism, 2,4 = 2 data x 4 expert "
                         "(parallel/mesh.py; weights are placed onto the "
                         "mesh after load)")
    ap.add_argument("--slots", type=int, default=0,
                    help="continuous-batching slots (0 = single-request)")
    ap.add_argument("--decode-block", type=int, default=8,
                    help="tokens per fused device call in the batch "
                         "scheduler (higher amortizes dispatch latency, "
                         "coarser stop/cancel granularity)")
    ap.add_argument("--spec-k", type=int, default=None, metavar="K",
                    help="speculative draft depth on MTP checkpoints "
                         "(each verify step commits 1..K+1 tokens; "
                         "0 disables speculative decoding)")
    ap.add_argument("--spec-mode", default=None,
                    choices=("auto", "mtp", "ngram", "off"),
                    help="speculative draft source: mtp = checkpoint's "
                         "MTP module, ngram = prompt-lookup (any model, "
                         "incl. DeltaNet hybrids), auto = mtp when "
                         "available else off (models/mtp.py spec_config)")
    ap.add_argument("--server-backend", default="auto",
                    choices=("auto", "native", "python"),
                    help="HTTP transport: C++ epoll server or stdlib")
    ap.add_argument("--note", default=None,
                    help="run note written to the top of the log file")
    ap.add_argument("--hot-experts", type=int, default=0, metavar="N",
                    help="offload mode: pin the N hottest experts per MoE "
                         "layer in HBM (heatmap-driven; host serves only "
                         "cold picks — the reference's HCS split)")
    ap.add_argument("--offload", default="auto",
                    choices=("auto", "none", "experts"),
                    help="experts: keep routed expert weights in HOST RAM "
                         "(serve models whose experts exceed HBM; prefill "
                         "streams weights per layer group, decode computes "
                         "experts on the host — the reference's big-model "
                         "capability, README.md:3-23). auto (default): "
                         "resident when the model fits HBM, experts "
                         "otherwise")
    ap.add_argument("--no-warmup", action="store_true",
                    help="skip the pre-serve compile warmup")
    ap.add_argument("--min-free-ram-gb", type=float, default=2.0,
                    help="RAM watchdog floor; 0 disables (reference "
                         "model.py:1536 watchdog thread)")
    args = apply_config_precedence(ap)

    if args.spec_k is not None:
        # engine/scheduler read these at construction time
        if args.spec_k <= 0:
            os.environ["KRASIS_TPU_NO_SPEC"] = "1"
        else:
            os.environ["KRASIS_TPU_SPEC_K"] = str(args.spec_k)
    if args.spec_mode is not None:
        os.environ["KRASIS_TPU_SPEC_MODE"] = args.spec_mode

    setup_run_logging(note=args.note)

    if args.min_free_ram_gb > 0:
        from .syscheck import start_ram_watchdog
        start_ram_watchdog(min_free_gb=args.min_free_ram_gb)

    def make_quant(group_size=128):
        return QuantConfig(
            expert_bits=args.expert_bits, group_size=group_size,
            kv_cache_dtype=args.kv_dtype,
            attention=args.attention_quant,
            expert_activation=args.expert_activation,
            shared_expert=args.shared_expert_quant,
            dense_mlp=args.dense_mlp_quant, lm_head=args.lm_head_quant,
        )

    mesh = None
    if args.mesh:
        from .parallel.mesh import make_mesh

        dp, ep = (int(x) for x in args.mesh.split(","))
        mesh = make_mesh(dp * ep, dp=dp)

    offload = args.offload == "experts"
    if args.offload == "auto" and mesh is None and args.slots == 0:
        # pick the tier by fit: resident when HBM holds the model
        from .budget import compute_budget
        from .syscheck import device_report

        acfg = (preset_config(args.synthetic) if args.synthetic
                and args.synthetic != "tiny"
                else None if args.synthetic
                else ModelConfig.from_model_path(args.model))
        if acfg is not None:
            b = compute_budget(acfg, make_quant())
            rep = device_report()
            hbm = max((int(d.get("hbm_limit_gb", 0) * (1 << 30))
                       for d in rep.get("devices", [])), default=0)                 or (16 << 30)
            if b.per_chip(max(rep.get("n_devices", 1), 1)) > hbm * 0.92:
                offload = True
                logging.getLogger("krasis_tpu.server").warning(
                    "model does not fit HBM resident "
                    "(%.1f GiB > %.1f GiB usable) — enabling "
                    "--offload experts automatically",
                    b.per_chip(max(rep.get("n_devices", 1), 1)) / 2**30,
                    hbm * 0.92 / 2**30)
    if offload and mesh is not None:
        ap.error("--offload experts is single-chip for now (no --mesh)")
    if offload and args.slots > 0:
        from .runtime.offload_engine import callbacks_supported

        if not callbacks_supported():
            ap.error("--offload experts with --slots needs a backend with "
                     "host-callback support (this PJRT has none); drop "
                     "--slots for segmented decode")

    if args.synthetic:
        from .models.synthetic import build_synthetic_engine, tiny_config

        if args.synthetic == "tiny":
            cfg = tiny_config("qwen3-moe")
            quant = make_quant(group_size=32)
        else:
            cfg = preset_config(args.synthetic)
            quant = make_quant()
        if offload:
            from .models.params import init_synthetic_params
            from .offload import build_synthetic_store
            from .runtime.offload_engine import OffloadEngine
            import jax as _jax

            store = build_synthetic_store(cfg, quant, seed=0)
            params = init_synthetic_params(
                cfg, quant, _jax.random.PRNGKey(0), skip_experts=True)
            engine = OffloadEngine(cfg, quant, params, store,
                                   max_len=args.max_len,
                                   hot_experts=args.hot_experts)
        else:
            engine = build_synthetic_engine(cfg, quant, max_len=args.max_len,
                                            mesh=mesh)
        tok, params = None, engine.params
        name = f"synthetic/{args.synthetic}"
    else:
        from .models.loader import load_params, load_params_offload
        from .runtime.engine import Engine
        from .runtime.tokenizer import Tokenizer

        cfg = ModelConfig.from_model_path(args.model)
        quant = make_quant()
        if offload:
            from .runtime.offload_engine import OffloadEngine

            params, store = load_params_offload(cfg, quant)
            engine = OffloadEngine(cfg, quant, params, store,
                                   max_len=args.max_len,
                                   hot_experts=args.hot_experts)
        else:
            params = load_params(cfg, quant)
            if mesh is not None:
                from .parallel.mesh import shard_params

                params = shard_params(params, cfg, mesh)
            engine = Engine(cfg, quant, params, max_len=args.max_len,
                            mesh=mesh)
        tok_files = ("tokenizer.json", "tokenizer_config.json",
                     "tokenizer.model")
        if os.path.isdir(args.model) and not any(
            os.path.exists(os.path.join(args.model, f)) for f in tok_files
        ):
            # dev/partial checkpoint that ships NO tokenizer files at all:
            # serve token ids like the synthetic path. A checkpoint WITH
            # tokenizer files that fail to load still fails fast — a
            # production server must not silently degrade to id soup.
            logging.getLogger("krasis_tpu.server").warning(
                "no tokenizer files in %s; serving raw token ids",
                args.model)
            tok = None
        else:
            tok = Tokenizer(args.model)
        name = os.path.basename(args.model)

    sched = None
    if args.slots > 0:
        from .runtime.scheduler import BatchScheduler
        sched = BatchScheduler(cfg, quant, engine.params,
                               max_len=args.max_len, num_slots=args.slots,
                               decode_block=args.decode_block, mesh=mesh,
                               offload=getattr(engine, "offload", None))
    if not args.no_warmup:
        warmup(engine, sched)
    run_server(engine, tok, name, args.host, args.port, scheduler=sched,
               backend=args.server_backend)


if __name__ == "__main__":
    main()
