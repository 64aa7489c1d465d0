"""OpenAI-compatible HTTP server with SSE streaming.

Feature parity with the reference's Rust server
(reference src/server.rs: /health, /v1/models, /v1/chat/completions,
SSE streaming with immediate first chunk, client-disconnect
cancellation, server registry under ~/.krasis_tpu/servers/) — built on
stdlib ThreadingHTTPServer. Generation is serialized through an engine
lock (the reference is likewise single-request-at-a-time, server.rs:7);
continuous batching lands with the batch scheduler.

Also serves synthetic models (`--synthetic tiny`) so the API surface can
be driven without a checkpoint.
"""

from __future__ import annotations

import argparse
import json
import os
import threading
import time
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Dict, List, Optional

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


class Handler(BaseHTTPRequestHandler):
    protocol_version = "HTTP/1.1"

    def log_message(self, fmt, *args):  # quiet default logging
        pass

    # ---- helpers ----------------------------------------------------------

    def _json(self, code: int, obj: Dict[str, Any]):
        body = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    # ---- routes -----------------------------------------------------------

    def do_GET(self):
        if self.path == "/health":
            self._json(200, {"status": "ok", "model": STATE.model_name})
        elif self.path == "/v1/models":
            self._json(200, {
                "object": "list",
                "data": [{"id": STATE.model_name, "object": "model",
                          "owned_by": "krasis-tpu"}],
            })
        else:
            self._json(404, {"error": "not found"})

    def do_POST(self):
        if self.path != "/v1/chat/completions":
            self._json(404, {"error": "not found"})
            return
        try:
            n = int(self.headers.get("Content-Length", 0))
            req = json.loads(self.rfile.read(n))
        except Exception as e:  # malformed request
            self._json(400, {"error": str(e)})
            return

        stream = bool(req.get("stream", False))
        max_tokens = int(req.get("max_tokens", req.get("max_completion_tokens", 512)))
        sampling = SamplingParams(
            temperature=float(req.get("temperature", 0.6)),
            top_k=int(req.get("top_k", 20)),
            top_p=float(req.get("top_p", 0.95)),
            presence_penalty=float(req.get("presence_penalty", 0.0)),
        )

        messages = req.get("messages", [])
        if STATE.tokenizer is not None:
            prompt_ids = STATE.tokenizer.apply_chat_template(messages)
        else:
            # synthetic model: hash message text into token ids
            text = " ".join(m.get("content", "") for m in messages)
            vocab = STATE.engine.cfg.vocab_size
            prompt_ids = [(7 + 31 * ord(c)) % (vocab - 2) + 1 for c in text[:512]] or [1]

        rid = f"chatcmpl-{uuid.uuid4().hex[:12]}"
        created = int(time.time())

        if STATE.scheduler is not None:
            # continuous batching: no lock — scheduler multiplexes slots
            if stream:
                self._stream_response_batched(rid, created, prompt_ids,
                                              max_tokens, sampling)
            else:
                self._full_response_batched(rid, created, prompt_ids,
                                            max_tokens, sampling)
            return
        with STATE.lock:
            if stream:
                self._stream_response(rid, created, prompt_ids, max_tokens, sampling)
            else:
                self._full_response(rid, created, prompt_ids, max_tokens, sampling)

    # ---- generation -------------------------------------------------------

    def _chunk(self, rid, created, delta: Dict[str, Any], finish=None) -> bytes:
        obj = {
            "id": rid, "object": "chat.completion.chunk", "created": created,
            "model": STATE.model_name,
            "choices": [{"index": 0, "delta": delta, "finish_reason": finish}],
        }
        return f"data: {json.dumps(obj)}\n\n".encode()

    def _stream_response(self, rid, created, prompt_ids, max_tokens, sampling):
        self.send_response(200)
        self.send_header("Content-Type", "text/event-stream")
        self.send_header("Cache-Control", "no-cache")
        self.send_header("Transfer-Encoding", "chunked")
        self.end_headers()

        def write_chunk(b: bytes):
            self.wfile.write(f"{len(b):x}\r\n".encode() + b + b"\r\n")
            self.wfile.flush()

        # immediate role chunk (TTFT, reference server.rs:407 first-chunk)
        write_chunk(self._chunk(rid, created, {"role": "assistant"}))

        dec = None
        if STATE.tokenizer is not None:
            from .runtime.tokenizer import IncrementalDecoder
            dec = IncrementalDecoder(STATE.tokenizer)

        cancelled = threading.Event()

        def on_token(tok: int):
            if cancelled.is_set():
                raise StopIteration  # client went away → cancel decode
            text = dec.push(tok) if dec is not None else f"<{tok}>"
            if text:
                try:
                    write_chunk(self._chunk(rid, created, {"content": text}))
                except (BrokenPipeError, ConnectionResetError):
                    cancelled.set()
                    raise StopIteration

        try:
            STATE.engine.generate(
                prompt_ids, max_new_tokens=max_tokens,
                sampling=sampling, on_token=on_token,
            )
        except StopIteration:
            pass
        try:
            write_chunk(self._chunk(rid, created, {}, finish="stop"))
            write_chunk(b"data: [DONE]\n\n")
            self.wfile.write(b"0\r\n\r\n")
            self.wfile.flush()
        except (BrokenPipeError, ConnectionResetError):
            pass

    def _full_response(self, rid, created, prompt_ids, max_tokens, sampling):
        res = STATE.engine.generate(
            prompt_ids, max_new_tokens=max_tokens, sampling=sampling
        )
        if STATE.tokenizer is not None:
            text = STATE.tokenizer.decode(res.tokens)
        else:
            text = " ".join(str(t) for t in res.tokens)
        self._json(200, {
            "id": rid, "object": "chat.completion", "created": created,
            "model": STATE.model_name,
            "choices": [{"index": 0, "message": {"role": "assistant", "content": text},
                         "finish_reason": "stop"}],
            "usage": {
                "prompt_tokens": res.prompt_len,
                "completion_tokens": len(res.tokens),
                "total_tokens": res.prompt_len + len(res.tokens),
            },
            "timing": {
                "prefill_tok_s": round(res.prefill_tok_s, 2),
                "decode_tok_s": round(res.decode_tok_s, 2),
            },
        })


    def _stream_response_batched(self, rid, created, prompt_ids,
                                 max_tokens, sampling):
        self.send_response(200)
        self.send_header("Content-Type", "text/event-stream")
        self.send_header("Cache-Control", "no-cache")
        self.send_header("Transfer-Encoding", "chunked")
        self.end_headers()

        def write_chunk(b: bytes):
            self.wfile.write(f"{len(b):x}\r\n".encode() + b + b"\r\n")
            self.wfile.flush()

        write_chunk(self._chunk(rid, created, {"role": "assistant"}))
        dec = None
        if STATE.tokenizer is not None:
            from .runtime.tokenizer import IncrementalDecoder
            dec = IncrementalDecoder(STATE.tokenizer)

        req = STATE.scheduler.submit(prompt_ids, max_new_tokens=max_tokens,
                                     sampling=sampling)
        try:
            while True:
                tok = req.out_queue.get()
                if tok is None:
                    break
                text = dec.push(tok) if dec is not None else f"<{tok}>"
                if text:
                    write_chunk(self._chunk(rid, created, {"content": text}))
            write_chunk(self._chunk(rid, created, {}, finish="stop"))
            write_chunk(b"data: [DONE]\n\n")
            self.wfile.write(b"0\r\n\r\n")
            self.wfile.flush()
        except (BrokenPipeError, ConnectionResetError):
            req.cancelled.set()

    def _full_response_batched(self, rid, created, prompt_ids,
                               max_tokens, sampling):
        req = STATE.scheduler.submit(prompt_ids, max_new_tokens=max_tokens,
                                     sampling=sampling)
        toks = []
        while True:
            t = req.out_queue.get()
            if t is None:
                break
            toks.append(t)
        if STATE.tokenizer is not None:
            text = STATE.tokenizer.decode(toks)
        else:
            text = " ".join(str(t) for t in toks)
        self._json(200, {
            "id": rid, "object": "chat.completion", "created": created,
            "model": STATE.model_name,
            "choices": [{"index": 0,
                         "message": {"role": "assistant", "content": text},
                         "finish_reason": "stop"}],
            "usage": {"prompt_tokens": len(prompt_ids),
                      "completion_tokens": len(toks),
                      "total_tokens": len(prompt_ids) + len(toks)},
        })


def register_server(port: int, model_name: str):
    """Server discovery registry (reference server.py:160-187)."""
    os.makedirs(REGISTRY_DIR, exist_ok=True)
    path = os.path.join(REGISTRY_DIR, f"{port}.json")
    with open(path, "w") as f:
        json.dump({"port": port, "model": model_name, "pid": os.getpid(),
                   "started": time.time()}, f)
    return path


def start_temp_server(engine, tokenizer, model_name: str,
                      host="127.0.0.1", port=8398, scheduler=None):
    """Non-blocking server for the benchmark's network re-measurement
    (reference benchmark.py:648 spins a temp RustServer the same way).
    Returns the httpd; call .shutdown() when done."""
    import threading

    global STATE
    STATE = ServerState(engine, tokenizer, model_name, scheduler=scheduler)
    httpd = ThreadingHTTPServer((host, port), Handler)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    return httpd


def run_server(engine, tokenizer, model_name: str, host="127.0.0.1",
               port=8399, scheduler=None):
    global STATE
    STATE = ServerState(engine, tokenizer, model_name, scheduler=scheduler)
    reg = register_server(port, model_name)
    httpd = ThreadingHTTPServer((host, port), Handler)
    print(f"krasis-tpu serving {model_name} on http://{host}:{port}")
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
    ap.add_argument("--shared-expert-quant", default="int8",
                    choices=("bf16", "int8"))
    ap.add_argument("--dense-mlp-quant", default="int8",
                    choices=("bf16", "int8"))
    ap.add_argument("--lm-head-quant", default="int8", choices=("bf16", "int8"))
    ap.add_argument("--slots", type=int, default=0,
                    help="continuous-batching slots (0 = single-request)")
    ap.add_argument("--note", default=None,
                    help="run note written to the top of the log file")
    ap.add_argument("--no-warmup", action="store_true",
                    help="skip the pre-serve compile warmup")
    ap.add_argument("--min-free-ram-gb", type=float, default=2.0,
                    help="RAM watchdog floor; 0 disables (reference "
                         "model.py:1536 watchdog thread)")
    args = apply_config_precedence(ap)

    setup_run_logging(note=args.note)

    if args.min_free_ram_gb > 0:
        from .syscheck import start_ram_watchdog
        start_ram_watchdog(min_free_gb=args.min_free_ram_gb)

    def make_quant(group_size=128):
        return QuantConfig(
            expert_bits=args.expert_bits, group_size=group_size,
            kv_cache_dtype=args.kv_dtype,
            shared_expert=args.shared_expert_quant,
            dense_mlp=args.dense_mlp_quant, lm_head=args.lm_head_quant,
        )

    if args.synthetic:
        from .models.synthetic import build_synthetic_engine, tiny_config

        if args.synthetic == "tiny":
            cfg = tiny_config("qwen3-moe")
            quant = make_quant(group_size=32)
        else:
            cfg = preset_config(args.synthetic)
            quant = make_quant()
        engine = build_synthetic_engine(cfg, quant, max_len=args.max_len)
        tok, params = None, engine.params
        name = f"synthetic/{args.synthetic}"
    else:
        from .models.loader import load_params
        from .runtime.engine import Engine
        from .runtime.tokenizer import Tokenizer

        cfg = ModelConfig.from_model_path(args.model)
        quant = make_quant()
        params = load_params(cfg, quant)
        engine = Engine(cfg, quant, params, max_len=args.max_len)
        tok = Tokenizer(args.model)
        name = os.path.basename(args.model)

    sched = None
    if args.slots > 0:
        from .runtime.scheduler import BatchScheduler
        sched = BatchScheduler(cfg, quant, params,
                               max_len=args.max_len, num_slots=args.slots)
    if not args.no_warmup:
        warmup(engine, sched)
    run_server(engine, tok, name, args.host, args.port, scheduler=sched)


if __name__ == "__main__":
    main()
