"""Bundled benchmark prompt corpus (reference parity: prompts/prefill_prompt_1-6).

The reference ships six long, domain-distinct natural prompts and keeps
the warmup domain disjoint from the timed domains (reference
python/krasis/benchmark.py:253-336) because random-token prompts give
MoE routing and linear-attention state unrealistically uniform
statistics. This module builds an equivalent corpus **offline** from
public text already on the machine (Python stdlib source + docstrings,
Debian copyright/changelog prose, package descriptions) and tokenizes
it either with the model's real tokenizer or — when benchmarking
synthetic checkpoints with no tokenizer on disk — with a
frequency-preserving hash vocabulary: each distinct word maps to a
stable vocab id, so repetition/Zipf statistics (what routing actually
sees) survive even though the ids are not a trained BPE.

Domains: code, docs, legal, changelog, catalog, dialogue.
``warmup`` domain for warmup runs only; never timed.
"""

from __future__ import annotations

import glob
import gzip
import hashlib
import io
import os
import re
from typing import Dict, List, Optional

DOMAINS = ("code", "docs", "legal", "headers", "catalog", "dialogue")
WARMUP_DOMAIN = "warmup"
_CORPUS_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                           "benchmarks", "prompts")
TARGET_BYTES = 400_000


def _stdlib_files() -> List[str]:
    import sysconfig

    lib = sysconfig.get_paths()["stdlib"]
    files = sorted(glob.glob(os.path.join(lib, "*.py")))
    return [f for f in files if os.path.getsize(f) > 2000]


def _read(path: str) -> str:
    try:
        if path.endswith(".gz"):
            with gzip.open(path, "rt", errors="replace") as f:
                return f.read()
        with io.open(path, "r", errors="replace") as f:
            return f.read()
    except OSError:
        return ""


def _build_code(target: int) -> str:
    out: List[str] = []
    n = 0
    for f in _stdlib_files():
        t = _read(f)
        out.append(f"# ===== {os.path.basename(f)} =====\n{t}")
        n += len(t)
        if n >= target:
            break
    return "\n".join(out)


def _build_docs(target: int) -> str:
    """Docstring prose extracted from stdlib modules."""
    out: List[str] = []
    n = 0
    pat = re.compile(r'"""(.*?)"""', re.S)
    for f in _stdlib_files():
        for m in pat.finditer(_read(f)):
            d = m.group(1).strip()
            if len(d) > 200:
                out.append(d)
                n += len(d)
        if n >= target:
            break
    return "\n\n".join(out)


def _glob_docs(pattern: str, target: int, header: str) -> str:
    out: List[str] = []
    n = 0
    for f in sorted(glob.glob(pattern)):
        t = _read(f)
        if len(t) < 500:
            continue
        out.append(f"===== {header}: {f.split('/')[-2]} =====\n{t}")
        n += len(t)
        if n >= target:
            break
    return "\n".join(out)


def _build_legal(target: int) -> str:
    return _glob_docs("/usr/share/doc/*/copyright", target, "license")


def _build_headers(target: int) -> str:
    """C system headers: macro/declaration-heavy, unlike Python source."""
    return _glob_docs("/usr/include/*.h", target, "header")


def _build_catalog(target: int) -> str:
    """Package descriptions: short structured prose paragraphs."""
    t = _read("/var/lib/dpkg/status")
    blocks = []
    n = 0
    for para in t.split("\n\n"):
        keep = [ln for ln in para.splitlines()
                if ln.startswith(("Package:", "Description", " "))]
        if len(keep) > 3:
            blocks.append("\n".join(keep))
            n += sum(len(k) for k in keep)
        if n >= target:
            break
    return "\n\n".join(blocks)


def _build_dialogue(target: int) -> str:
    """Synthetic support transcript: Q/A turns paired from doc prose."""
    docs = _build_docs(target * 2).split("\n\n")
    out: List[str] = []
    n = 0
    for i in range(0, len(docs) - 1, 2):
        q = docs[i].split(".")[0].strip().replace("\n", " ")
        a = docs[i + 1].strip()
        turn = f"User: Can you explain {q.lower()}?\nAssistant: {a}\n"
        out.append(turn)
        n += len(turn)
        if n >= target:
            break
    return "\n".join(out)


def _build_warmup(target: int) -> str:
    """Separate domain (man-page-style terse text) used ONLY for warmup."""
    t = _build_code(target * 3)
    # comments only — different token statistics from the timed code domain
    lines = [ln for ln in t.splitlines() if ln.lstrip().startswith("#")]
    return "\n".join(lines)[:target]


_BUILDERS = {
    "code": _build_code,
    "docs": _build_docs,
    "legal": _build_legal,
    "headers": _build_headers,
    "catalog": _build_catalog,
    "dialogue": _build_dialogue,
    WARMUP_DOMAIN: _build_warmup,
}


def build_corpus(out_dir: str = _CORPUS_DIR,
                 target_bytes: int = TARGET_BYTES) -> Dict[str, str]:
    """Write one .txt per domain; returns {domain: path}. Idempotent."""
    os.makedirs(out_dir, exist_ok=True)
    paths = {}
    for dom, fn in _BUILDERS.items():
        path = os.path.join(out_dir, f"{dom}.txt")
        if not (os.path.exists(path)
                and os.path.getsize(path) >= target_bytes // 2):
            text = fn(target_bytes)
            with open(path, "w") as f:
                f.write(text)
        paths[dom] = path
    return paths


def load_domain(domain: str, out_dir: str = _CORPUS_DIR) -> str:
    path = os.path.join(out_dir, f"{domain}.txt")
    if not os.path.exists(path):
        build_corpus(out_dir)
    return _read(path)


_WORD_RE = re.compile(r"[A-Za-z_]+|\d|[^\sA-Za-z_\d]")


def hash_tokenize(text: str, vocab_size: int, n: Optional[int] = None,
                  reserve: int = 1_000) -> List[int]:
    """Frequency-preserving pseudo-tokenization for tokenizer-less runs.

    Each distinct word/symbol maps to a stable id in
    [reserve, vocab_size-100); repeated words repeat ids, so the id
    stream has natural-language repetition structure (Zipf head, long
    tail) instead of the uniform-random ids the round-1 bench used.
    """
    hi = vocab_size - 100 - reserve
    ids: List[int] = []
    for m in _WORD_RE.finditer(text):
        w = m.group(0)
        h = int.from_bytes(hashlib.blake2b(
            w.encode(), digest_size=4).digest(), "little")
        ids.append(reserve + (h % hi))
        if n is not None and len(ids) >= n:
            break
    return ids


def prompt_ids(domain: str, n: int, vocab_size: int,
               tokenizer=None) -> List[int]:
    """n prompt token ids from a domain corpus (repeat text if short)."""
    text = load_domain(domain)
    if tokenizer is not None:
        ids = tokenizer.encode(text)
        while len(ids) < n:
            ids = ids + ids
        return ids[:n]
    ids = hash_tokenize(text, vocab_size)
    while len(ids) < n:
        ids = ids + ids
    return ids[:n]
