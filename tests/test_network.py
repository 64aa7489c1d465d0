"""Network/e2e test against a RUNNING server (reference tests/test_network.py).

Skipped unless a server is reachable (start one first:
`python -m krasis_tpu.server --synthetic tiny --port 8399 [--slots 2]`).
Run directly: `python -m pytest tests/test_network.py --no-header -q`.
"""

import json
import os
import urllib.error
import urllib.request

import pytest

URL = os.environ.get("KRASIS_TPU_TEST_URL", "http://127.0.0.1:8399")


def _server_up() -> bool:
    try:
        with urllib.request.urlopen(URL + "/health", timeout=3) as r:
            return json.loads(r.read()).get("status") == "ok"
    except (urllib.error.URLError, OSError, ValueError):
        return False


pytestmark = pytest.mark.skipif(not _server_up(), reason="no running server")


def test_models_endpoint():
    with urllib.request.urlopen(URL + "/v1/models", timeout=10) as r:
        data = json.loads(r.read())
    assert data["object"] == "list" and data["data"]


def test_chat_completion_json():
    req = urllib.request.Request(
        URL + "/v1/chat/completions",
        data=json.dumps({
            "messages": [{"role": "user", "content": "hello"}],
            "max_tokens": 4, "temperature": 0.0,
        }).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=600) as r:
        body = json.loads(r.read())
    assert body["choices"][0]["message"]["content"]
    assert body["usage"]["completion_tokens"] >= 1


def test_chat_completion_sse_stream():
    req = urllib.request.Request(
        URL + "/v1/chat/completions",
        data=json.dumps({
            "messages": [{"role": "user", "content": "hi"}],
            "max_tokens": 4, "temperature": 0.0, "stream": True,
        }).encode(),
        headers={"Content-Type": "application/json"},
    )
    chunks, done = 0, False
    with urllib.request.urlopen(req, timeout=600) as r:
        for raw in r:
            line = raw.decode().strip()
            if line.startswith("data: "):
                if line == "data: [DONE]":
                    done = True
                    break
                chunks += 1
    assert done and chunks >= 2  # role chunk + ≥1 content chunk


def test_greedy_determinism_over_network():
    outs = []
    for _ in range(2):
        req = urllib.request.Request(
            URL + "/v1/chat/completions",
            data=json.dumps({
                "messages": [{"role": "user", "content": "determinism"}],
                "max_tokens": 6, "temperature": 0.0,
            }).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=600) as r:
            outs.append(json.loads(r.read())["choices"][0]["message"]["content"])
    assert outs[0] == outs[1]
