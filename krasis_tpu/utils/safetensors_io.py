"""Zero-copy mmap safetensors reader.

Same role as the reference's MmapSafetensors
(reference src/weights/safetensors_io.rs:85): parse the JSON header once,
then serve tensors as numpy views into an mmap — no read() copies, so
streaming a 100 GB checkpoint costs only page-cache traffic.
"""

from __future__ import annotations

import json
import mmap
import os
import struct
from typing import Dict, Iterator, List, Tuple

import numpy as np
from ml_dtypes import bfloat16, float8_e4m3fn

_DTYPES = {
    "F64": np.float64,
    "F32": np.float32,
    "F16": np.float16,
    "BF16": bfloat16,
    "F8_E4M3": float8_e4m3fn,
    "I64": np.int64,
    "I32": np.int32,
    "I16": np.int16,
    "I8": np.int8,
    "U8": np.uint8,
    "U16": np.uint16,
    "U32": np.uint32,
    "BOOL": np.bool_,
}


class SafetensorsFile:
    """One shard, mmap-backed."""

    def __init__(self, path: str):
        self.path = path
        self._f = open(path, "rb")
        (hlen,) = struct.unpack("<Q", self._f.read(8))
        header = json.loads(self._f.read(hlen))
        self._meta = header.pop("__metadata__", {})
        self._data_offset = 8 + hlen
        self._mm = mmap.mmap(self._f.fileno(), 0, access=mmap.ACCESS_READ)
        self._infos: Dict[str, Tuple[np.dtype, Tuple[int, ...], int, int]] = {}
        for name, info in header.items():
            dt = _DTYPES[info["dtype"]]
            b0, b1 = info["data_offsets"]
            self._infos[name] = (dt, tuple(info["shape"]), b0, b1)

    def keys(self) -> List[str]:
        return list(self._infos)

    def __contains__(self, name: str) -> bool:
        return name in self._infos

    def shape(self, name: str) -> Tuple[int, ...]:
        return self._infos[name][1]

    def dtype(self, name: str):
        return self._infos[name][0]

    def tensor(self, name: str) -> np.ndarray:
        """Zero-copy view into the mmap (read-only)."""
        dt, shape, b0, b1 = self._infos[name]
        buf = memoryview(self._mm)[self._data_offset + b0 : self._data_offset + b1]
        arr = np.frombuffer(buf, dtype=dt)
        return arr.reshape(shape)

    def close(self):
        self._mm.close()
        self._f.close()


class ShardedSafetensors:
    """A checkpoint directory: index-file routing + lazy per-shard mmaps
    (reference weight streaming pattern, src/weights/mod.rs:1181)."""

    def __init__(self, model_path: str):
        self.model_path = model_path
        index_path = os.path.join(model_path, "model.safetensors.index.json")
        self._files: Dict[str, SafetensorsFile] = {}
        if os.path.exists(index_path):
            with open(index_path) as f:
                self.weight_map: Dict[str, str] = json.load(f)["weight_map"]
        else:
            single = os.path.join(model_path, "model.safetensors")
            st = self._open("model.safetensors")
            self.weight_map = {k: "model.safetensors" for k in st.keys()}

    def _open(self, shard: str) -> SafetensorsFile:
        if shard not in self._files:
            self._files[shard] = SafetensorsFile(
                os.path.join(self.model_path, shard)
            )
        return self._files[shard]

    def keys(self) -> List[str]:
        return list(self.weight_map)

    def __contains__(self, name: str) -> bool:
        return name in self.weight_map

    def shape(self, name: str) -> Tuple[int, ...]:
        return self._open(self.weight_map[name]).shape(name)

    def tensor(self, name: str) -> np.ndarray:
        return self._open(self.weight_map[name]).tensor(name)

    def items(self) -> Iterator[Tuple[str, np.ndarray]]:
        for name in self.weight_map:
            yield name, self.tensor(name)

    def close(self):
        for f in self._files.values():
            f.close()
        self._files.clear()


def write_safetensors(path: str, tensors: Dict[str, np.ndarray]):
    """Minimal safetensors writer (tests / cache export)."""
    inv = {v: k for k, v in _DTYPES.items()}
    header = {}
    offset = 0
    blobs = []
    for name, arr in tensors.items():
        arr = np.ascontiguousarray(arr)
        n = arr.nbytes
        header[name] = {
            "dtype": inv[arr.dtype.type],
            "shape": list(arr.shape),
            "data_offsets": [offset, offset + n],
        }
        blobs.append(arr.tobytes())
        offset += n
    hjson = json.dumps(header).encode()
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(hjson)))
        f.write(hjson)
        for b in blobs:
            f.write(b)
