"""Mmap-able quantized-weight disk cache (v2) with per-leaf offsets.

The TPU analog of the reference's "KRAS" cache, rebuilt for scale
(reference src/weights/mod.rs:857-894 cache format, :955-1135 per-layer
offsets + partial reads, :1181 streaming build):

* one binary file per parameter group (`head`, `prefix_NN`, `pattern_NN`)
  with 64-byte-aligned leaf regions and a JSON index of
  (group, offset, shape, dtype[, bits, group_size]) per flat leaf key —
  reads are ``np.memmap`` slices, so reload cost is page-in, not parse,
  and any leaf (or any single expert of a stacked leaf) can be read
  without touching the rest;
* the build streams: stacked expert regions are allocated up front and
  written one expert at a time (`write_at`), so peak host RSS during a
  build is ~2 expert tensors, never a whole layer stack
  (the reference's rayon-per-expert quantize pipeline, mod.rs:1181);
* a build lock (pid + heartbeat file) serializes concurrent server
  starts: the loser waits for the winner's cache instead of rebuilding
  (reference's cache build lock).

Flat key scheme: ``head/embed``, ``prefix/0/o_proj``,
``pattern/1/w13.q`` (QTensor leaves split into ``.q``/``.scales`` with
bits/group_size carried in the index entry).
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Iterator, Optional, Tuple

import numpy as np
from ml_dtypes import bfloat16

from ..quant import QTensor

FORMAT_VERSION = 2
ALIGN = 64

_DTYPES = {
    "float32": np.float32,
    "float16": np.float16,
    "bfloat16": bfloat16,
    "int8": np.int8,
    "int32": np.int32,
    "uint8": np.uint8,
}


def _dtype_name(dt) -> str:
    name = np.dtype(dt).name
    if name not in _DTYPES:
        raise ValueError(f"unsupported cache dtype {name}")
    return name


class CacheWriter:
    """Builds a cache directory atomically (writes to `<dir>.tmp`,
    publishes with os.replace on finalize)."""

    def __init__(self, path: str):
        self.path = path
        self.tmp = path + ".tmp"
        os.makedirs(self.tmp, exist_ok=True)
        self.index: Dict[str, Dict[str, Any]] = {}
        self.meta: Dict[str, Any] = {}
        self._sizes: Dict[str, int] = {}

    def _group_path(self, group: str) -> str:
        return os.path.join(self.tmp, f"{group}.bin")

    def alloc(self, key: str, group: str, shape, dtype, **extra) -> str:
        """Reserve an aligned region for `key`; fill via write_at."""
        if key in self.index:
            raise ValueError(f"duplicate cache key {key}")
        size = self._sizes.get(group, 0)
        off = (size + ALIGN - 1) // ALIGN * ALIGN
        nbytes = int(np.prod(shape)) * np.dtype(dtype).itemsize
        self._sizes[group] = off + nbytes
        with open(self._group_path(group), "ab") as f:
            f.truncate(off + nbytes)
        self.index[key] = dict(
            group=group, offset=off, shape=[int(s) for s in shape],
            dtype=_dtype_name(dtype), **extra,
        )
        return key

    def write_at(self, key: str, idx: Tuple[int, ...], arr: np.ndarray):
        """Write `arr` into the region at leading indices `idx`."""
        e = self.index[key]
        mm = np.memmap(
            self._group_path(e["group"]), dtype=_DTYPES[e["dtype"]],
            mode="r+", offset=e["offset"], shape=tuple(e["shape"]),
        )
        mm[idx] = np.asarray(arr, dtype=_DTYPES[e["dtype"]])
        mm.flush()
        del mm

    def add(self, key: str, group: str, arr: np.ndarray, **extra):
        arr = np.asarray(arr)
        self.alloc(key, group, arr.shape, arr.dtype, **extra)
        self.write_at(key, (), arr)

    def add_leaf(self, key: str, group: str, leaf):
        """Store an array or QTensor under `key`."""
        if isinstance(leaf, QTensor):
            self.add(f"{key}.q", group, np.asarray(leaf.q),
                     bits=leaf.bits, group_size=leaf.group_size)
            self.add(f"{key}.scales", group, np.asarray(leaf.scales),
                     bits=leaf.bits, group_size=leaf.group_size)
        else:
            self.add(key, group, np.asarray(leaf))

    def alloc_qtensor(self, key: str, group: str, q_shape, scales_shape,
                      bits: int, group_size: int):
        self.alloc(f"{key}.q", group, q_shape, np.int8,
                   bits=bits, group_size=group_size)
        self.alloc(f"{key}.scales", group, scales_shape, bfloat16,
                   bits=bits, group_size=group_size)

    def finalize(self, **meta):
        self.meta = dict(version=FORMAT_VERSION, index=self.index, **meta)
        with open(os.path.join(self.tmp, "meta.json"), "w") as f:
            json.dump(self.meta, f)
        if os.path.exists(self.path):
            import shutil

            shutil.rmtree(self.path)
        os.replace(self.tmp, self.path)

    def abort(self):
        import shutil

        shutil.rmtree(self.tmp, ignore_errors=True)


class CacheReader:
    """Zero-copy reads from a finalized cache directory."""

    def __init__(self, path: str):
        self.path = path
        with open(os.path.join(path, "meta.json")) as f:
            self.meta = json.load(f)
        if self.meta.get("version") != FORMAT_VERSION:
            raise ValueError(
                f"cache version {self.meta.get('version')} != {FORMAT_VERSION}"
            )
        self.index: Dict[str, Dict[str, Any]] = self.meta["index"]

    def get(self, key: str) -> np.ndarray:
        e = self.index[key]
        return np.memmap(
            os.path.join(self.path, f"{e['group']}.bin"),
            dtype=_DTYPES[e["dtype"]], mode="r",
            offset=e["offset"], shape=tuple(e["shape"]),
        )

    def get_leaf(self, key: str):
        """Array or QTensor (when `key.q` exists)."""
        if f"{key}.q" in self.index:
            e = self.index[f"{key}.q"]
            return QTensor(
                q=self.get(f"{key}.q"), scales=self.get(f"{key}.scales"),
                bits=e["bits"], group_size=e["group_size"],
            )
        return self.get(key)

    def leaf_keys(self) -> Iterator[str]:
        seen = set()
        for k in self.index:
            base = k[:-2] if k.endswith(".q") else (
                k[:-7] if k.endswith(".scales") else k)
            if base not in seen:
                seen.add(base)
                yield base

    def as_pytree(self) -> Dict[str, Any]:
        """Reconstruct the params pytree of memmap-backed leaves."""
        params: Dict[str, Any] = {
            "prefix_layers": [
                {} for _ in range(self.meta["n_prefix"])
            ],
            "pattern": [{} for _ in range(self.meta["n_pattern"])],
        }
        for base in self.leaf_keys():
            parts = base.split("/")
            leaf = self.get_leaf(base)
            if parts[0] == "head":
                params[parts[1]] = leaf
            elif parts[0] == "prefix":
                params["prefix_layers"][int(parts[1])][parts[2]] = leaf
            elif parts[0] == "pattern":
                params["pattern"][int(parts[1])][parts[2]] = leaf
            elif parts[0] == "mtp":  # MTP module (models/mtp.py)
                mtp = params.setdefault("mtp", {})
                if parts[1] == "layer":
                    mtp.setdefault("layer", {})[parts[2]] = leaf
                else:
                    mtp[parts[1]] = leaf
            else:
                raise ValueError(f"unknown cache key {base}")
        return params


# ---------------------------------------------------------------------------
# Build lock
# ---------------------------------------------------------------------------

_LOCK_STALE_S = 1800.0


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        return True   # exists, owned by someone else
    except OSError:
        return False
    return True


class BuildLock:
    """Exclusive cache-build lock. The losing process waits for the
    winner's finalized cache instead of duplicating a multi-minute
    quantization run."""

    def __init__(self, cache_path: str):
        self.lockfile = cache_path + ".lock"
        self.cache_path = cache_path
        self.acquired = False

    def acquire(self, poll_s: float = 2.0, timeout_s: float = 7200.0) -> str:
        """Returns 'acquired' (caller must build + release) or 'built'
        (another process finished the cache while we waited)."""
        deadline = time.time() + timeout_s
        while True:
            try:
                fd = os.open(self.lockfile,
                             os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                os.write(fd, f"{os.getpid()} {time.time()}".encode())
                os.close(fd)
                self.acquired = True
                return "acquired"
            except FileExistsError:
                pass
            # lock held: stale (dead pid or too old)?
            try:
                with open(self.lockfile) as f:
                    pid_s, t_s = f.read().split()
                stale = (time.time() - float(t_s) > _LOCK_STALE_S
                         or not _pid_alive(int(pid_s)))
            except (OSError, ValueError):
                stale = True
            if stale:
                try:
                    os.unlink(self.lockfile)
                except OSError:
                    pass
                continue
            if os.path.exists(os.path.join(self.cache_path, "meta.json")):
                return "built"
            if time.time() > deadline:
                raise TimeoutError(
                    f"cache build lock {self.lockfile} held too long")
            time.sleep(poll_s)

    def release(self):
        if self.acquired:
            try:
                os.unlink(self.lockfile)
            except OSError:
                pass
            self.acquired = False

    def __enter__(self):
        return self.acquire()

    def __exit__(self, *exc):
        self.release()
