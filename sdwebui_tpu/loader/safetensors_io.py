"""Zero-copy safetensors reader/writer (no torch in the load path).

Replaces the reference's `safetensors` + torch mmap load
(modules/sd_models.py:312-323): the header is parsed once, tensors are
`np.frombuffer` views over one `mmap`, and dtype conversion (fp16 → bf16/
fp32) happens lazily per tensor during tree conversion so the file bytes
are never copied twice.  Format: 8-byte LE header length + JSON header
{name: {dtype, shape, data_offsets}} + raw little-endian data.
"""

from __future__ import annotations

import json
import mmap
import struct

import numpy as np

try:
    import ml_dtypes

    _BF16 = np.dtype(ml_dtypes.bfloat16)
    _F8_E4M3 = np.dtype(ml_dtypes.float8_e4m3fn)
    _F8_E5M2 = np.dtype(ml_dtypes.float8_e5m2)
except ImportError:  # pragma: no cover
    _BF16 = _F8_E4M3 = _F8_E5M2 = None

_DTYPES = {
    "F64": np.dtype("<f8"), "F32": np.dtype("<f4"), "F16": np.dtype("<f2"),
    "I64": np.dtype("<i8"), "I32": np.dtype("<i4"), "I16": np.dtype("<i2"),
    "I8": np.dtype("i1"), "U8": np.dtype("u1"), "BOOL": np.dtype("?"),
    "U16": np.dtype("<u2"), "U32": np.dtype("<u4"), "U64": np.dtype("<u8"),
}
if _BF16 is not None:
    _DTYPES["BF16"] = _BF16
    _DTYPES["F8_E4M3"] = _F8_E4M3
    _DTYPES["F8_E5M2"] = _F8_E5M2

_RDTYPES = {v: k for k, v in _DTYPES.items()}


class SafetensorsFile:
    """Lazy view over a safetensors file. Tensors are numpy views into the
    mmap until copied/converted."""

    def __init__(self, path: str):
        self.path = path
        self._f = open(path, "rb")
        from sdwebui_tpu.utils.options import opts as _opts

        if _opts.get("disable_mmap_load_safetensors", False):
            # reference shared option: read the file eagerly instead of
            # mmapping (helps on network filesystems)
            self._mm = self._f.read()
        else:
            self._mm = mmap.mmap(self._f.fileno(), 0, access=mmap.ACCESS_READ)
        (header_len,) = struct.unpack("<Q", self._mm[:8])
        if header_len > len(self._mm) - 8:
            raise ValueError(f"corrupt safetensors header in {path}")
        header = json.loads(self._mm[8: 8 + header_len].decode("utf-8"))
        self.metadata = header.pop("__metadata__", {})
        self._entries = header
        self._data_start = 8 + header_len

    def keys(self):
        return self._entries.keys()

    def __contains__(self, name):
        return name in self._entries

    def shape(self, name):
        return tuple(self._entries[name]["shape"])

    def dtype(self, name) -> str:
        return self._entries[name]["dtype"]

    def tensor(self, name) -> np.ndarray:
        """Zero-copy view (do not write; becomes invalid after close)."""
        e = self._entries[name]
        dt = _DTYPES.get(e["dtype"])
        if dt is None:
            raise ValueError(f"unsupported dtype {e['dtype']} for {name}")
        b0, b1 = e["data_offsets"]
        buf = self._mm[self._data_start + b0: self._data_start + b1]
        return np.frombuffer(buf, dtype=dt).reshape(e["shape"])

    def load_all(self) -> dict:
        return {k: self.tensor(k) for k in self.keys()}

    def close(self):
        if isinstance(self._mm, mmap.mmap):
            self._mm.close()
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()


def read_metadata(path: str) -> dict:
    """Just the __metadata__ header (kohya ss_* fields etc.), no mmap held
    open — feeds the /sdapi/v1/loras card metadata like the reference's
    modules/cache.py cached_data_for_file('safetensors-metadata', ...)."""
    with open(path, "rb") as f:
        (header_len,) = struct.unpack("<Q", f.read(8))
        header = json.loads(f.read(header_len).decode("utf-8"))
    return {str(k): str(v)
            for k, v in (header.get("__metadata__") or {}).items()}


def read_state_dict(path: str) -> dict:
    """path → {key: np.ndarray views} (+ ._metadata attribute-free; use
    SafetensorsFile for metadata access)."""
    return SafetensorsFile(path).load_all()


def write_safetensors(path: str, tensors: dict, metadata: dict | None = None):
    header = {}
    offset = 0
    order = list(tensors.keys())
    arrays = {}
    for k in order:
        a = np.ascontiguousarray(tensors[k])
        if a.dtype not in _RDTYPES:
            a = a.astype(np.float32)
        arrays[k] = a
        n = a.nbytes
        header[k] = {"dtype": _RDTYPES[a.dtype], "shape": list(a.shape),
                     "data_offsets": [offset, offset + n]}
        offset += n
    if metadata:
        header["__metadata__"] = {str(k): str(v) for k, v in metadata.items()}
    hjson = json.dumps(header).encode("utf-8")
    pad = (8 - len(hjson) % 8) % 8
    hjson += b" " * pad
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(hjson)))
        f.write(hjson)
        for k in order:
            f.write(arrays[k].tobytes())
