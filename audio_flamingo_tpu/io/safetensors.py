"""Safetensors reader/writer (no external deps).

Format ([hf] `safetensors` Rust crate; SURVEY.md §2.10): 8-byte LE header length, JSON
header mapping tensor name -> {dtype, shape, data_offsets:[begin,end)}, then a raw byte
buffer. Reading is zero-copy via mmap. Supports HF sharded checkpoints via
`model.safetensors.index.json` (weight_map), which is how the NVIDIA '-hf' releases ship
(README.md:30,79-84).
"""

from __future__ import annotations

import json
import mmap
import os
import struct

import numpy as np

_DTYPES = {
    "F64": np.float64, "F32": np.float32, "F16": np.float16,
    "I64": np.int64, "I32": np.int32, "I16": np.int16, "I8": np.int8,
    "U8": np.uint8, "BOOL": np.bool_,
    # BF16 has no numpy dtype; read as uint16 and upcast via ml_dtypes when available
    "BF16": None,
}


def _bf16_to_f32(raw_u16: np.ndarray) -> np.ndarray:
    return (raw_u16.astype(np.uint32) << 16).view(np.float32)


class SafetensorsFile:
    """Lazy mmap-backed reader for one .safetensors file."""

    def __init__(self, path: str):
        self.path = path
        self._f = open(path, "rb")
        self._mm = mmap.mmap(self._f.fileno(), 0, access=mmap.ACCESS_READ)
        (hlen,) = struct.unpack("<Q", self._mm[:8])
        header = json.loads(self._mm[8: 8 + hlen].decode("utf-8"))
        self.metadata = header.pop("__metadata__", {})
        self.index = header
        self._data_start = 8 + hlen

    def keys(self):
        return self.index.keys()

    def tensor(self, name: str, upcast_bf16: bool = True) -> np.ndarray:
        info = self.index[name]
        begin, end = info["data_offsets"]
        buf = self._mm[self._data_start + begin: self._data_start + end]
        shape = tuple(info["shape"])
        if info["dtype"] == "BF16":
            raw = np.frombuffer(buf, dtype=np.uint16).reshape(shape)
            return _bf16_to_f32(raw) if upcast_bf16 else raw
        dt = _DTYPES[info["dtype"]]
        if dt is None:
            raise ValueError(f"unsupported dtype {info['dtype']}")
        return np.frombuffer(buf, dtype=dt).reshape(shape)

    def close(self):
        self._mm.close()
        self._f.close()


def load_safetensors(path: str) -> dict[str, np.ndarray]:
    """Load a single .safetensors file fully into a dict."""
    f = SafetensorsFile(path)
    return {k: f.tensor(k) for k in f.keys()}


def load_checkpoint_dir(path: str) -> dict[str, np.ndarray]:
    """Load an HF checkpoint dir: sharded (index.json) or single model.safetensors."""
    idx = os.path.join(path, "model.safetensors.index.json")
    if os.path.exists(idx):
        with open(idx) as f:
            weight_map = json.load(f)["weight_map"]
        out: dict[str, np.ndarray] = {}
        for shard in sorted(set(weight_map.values())):
            out.update(load_safetensors(os.path.join(path, shard)))
        return out
    single = os.path.join(path, "model.safetensors")
    return load_safetensors(single if os.path.exists(single) else path)


def save_safetensors(path: str, tensors: dict[str, np.ndarray], metadata: dict | None = None):
    """Write a .safetensors file (fp32/fp16/int dtypes; bf16 written from uint16 view)."""
    name_for = {np.dtype(np.float64): "F64", np.dtype(np.float32): "F32",
                np.dtype(np.float16): "F16", np.dtype(np.int64): "I64",
                np.dtype(np.int32): "I32", np.dtype(np.int16): "I16",
                np.dtype(np.int8): "I8", np.dtype(np.uint8): "U8",
                np.dtype(np.bool_): "BOOL"}
    header: dict = {}
    if metadata:
        header["__metadata__"] = {str(k): str(v) for k, v in metadata.items()}
    offset = 0
    blobs = []
    for name, arr in tensors.items():
        arr = np.asarray(arr)
        if arr.dtype.name == "bfloat16":  # ml_dtypes bf16 (jax bf16 params): raw bytes
            arr = arr.view(np.uint16)
        arr = np.ascontiguousarray(arr)
        if arr.dtype == np.dtype("uint16"):
            dt = "BF16"
        else:
            dt = name_for[arr.dtype]
        blob = arr.tobytes()
        header[name] = {"dtype": dt, "shape": list(arr.shape),
                        "data_offsets": [offset, offset + len(blob)]}
        blobs.append(blob)
        offset += len(blob)
    hjson = json.dumps(header, separators=(",", ":")).encode("utf-8")
    pad = (-len(hjson)) % 8
    hjson += b" " * pad
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(hjson)))
        f.write(hjson)
        for blob in blobs:
            f.write(blob)
