"""Restricted loader for torch .pt/.ckpt checkpoints — no torch, no eval.

The reference guards `torch.load` with a RestrictedUnpickler allowlist
(modules/safe.py:23,107).  We go further: the torch zip format is parsed
directly into numpy (pickle opcodes still run, but `find_class` resolves
ONLY allowlisted symbols to our own safe stand-ins, and storages are
rebuilt as numpy views over the zip entries), so arbitrary-code pickles
fail closed.
"""

from __future__ import annotations

import io
import pickle
import zipfile

import numpy as np

try:
    import ml_dtypes

    _BF16 = np.dtype(ml_dtypes.bfloat16)
except ImportError:  # pragma: no cover
    _BF16 = np.dtype(np.float32)

_STORAGE_DTYPES = {
    "FloatStorage": np.dtype("<f4"), "HalfStorage": np.dtype("<f2"),
    "BFloat16Storage": _BF16, "DoubleStorage": np.dtype("<f8"),
    "LongStorage": np.dtype("<i8"), "IntStorage": np.dtype("<i4"),
    "ShortStorage": np.dtype("<i2"), "CharStorage": np.dtype("i1"),
    "ByteStorage": np.dtype("u1"), "BoolStorage": np.dtype("?"),
}


class UnsafePickleError(Exception):
    pass


class _StorageType:
    def __init__(self, name):
        self.name = name
        self.dtype = _STORAGE_DTYPES[name]


class _LazyStorage:
    def __init__(self, dtype, key, numel):
        self.dtype = dtype
        self.key = key
        self.numel = numel
        self.data = None  # filled by loader


class _LazyTensor:
    """Recorded during unpickling; materialized once storages are read."""

    def __init__(self, storage, offset, size, stride):
        self.storage = storage
        self.offset = offset
        self.size = tuple(size)
        self.stride = tuple(stride)

    def materialize(self) -> np.ndarray:
        a = self.storage.data
        if not self.size:
            return a[self.offset].copy() if a.size else a
        strides = tuple(s * a.itemsize for s in self.stride)
        return np.lib.stride_tricks.as_strided(
            a[self.offset:], shape=self.size, strides=strides)


def _rebuild_tensor_v2(storage: _LazyStorage, storage_offset, size, stride,
                       requires_grad=False, backward_hooks=None, metadata=None):
    return _LazyTensor(storage, storage_offset, size, stride)


def _rebuild_parameter(data, requires_grad=False, backward_hooks=None):
    return data


_SAFE_CLASSES = {
    ("collections", "OrderedDict"): dict,
    ("torch._utils", "_rebuild_tensor_v2"): _rebuild_tensor_v2,
    ("torch._utils", "_rebuild_parameter"): _rebuild_parameter,
    ("numpy.core.multiarray", "scalar"): lambda dtype, raw: np.frombuffer(raw, dtype=dtype)[0],
    ("numpy", "dtype"): np.dtype,
    ("_codecs", "encode"): lambda s, enc: s.encode(enc),
}


class _RestrictedUnpickler(pickle.Unpickler):
    def __init__(self, file, storages):
        super().__init__(file, encoding="latin1")
        self._storages = storages

    def find_class(self, module, name):
        if module == "torch" and name in _STORAGE_DTYPES:
            return _StorageType(name)
        if module == "torch" and name.endswith("Tensor"):
            return _StorageType("FloatStorage")  # dtype comes from storage
        if (module, name) in _SAFE_CLASSES:
            return _SAFE_CLASSES[(module, name)]
        if module == "torch" and name in ("Size",):
            return tuple
        raise UnsafePickleError(
            f"global '{module}.{name}' is forbidden in checkpoints")

    def persistent_load(self, pid):
        if not isinstance(pid, tuple) or pid[0] != "storage":
            raise UnsafePickleError(f"unknown persistent id {pid!r}")
        storage_type, key, _location, numel = pid[1], pid[2], pid[3], pid[4]
        dtype = storage_type.dtype if isinstance(storage_type, _StorageType) \
            else np.dtype("<f4")
        st = _LazyStorage(dtype, key, numel)
        self._storages.append(st)
        return st


def load_torch_checkpoint(path: str) -> dict:
    """.pt/.ckpt (torch zip format) → {key: np.ndarray}. Raises
    UnsafePickleError on any non-allowlisted global."""
    with zipfile.ZipFile(path) as zf:
        names = zf.namelist()
        pkl_name = next(n for n in names if n.endswith("data.pkl"))
        prefix = pkl_name[: -len("data.pkl")]

        storages: list[_LazyStorage] = []
        with zf.open(pkl_name) as f:
            obj = _RestrictedUnpickler(io.BytesIO(f.read()), storages).load()

        for st in storages:
            entry = f"{prefix}data/{st.key}"
            raw = zf.read(entry)
            st.data = np.frombuffer(raw, dtype=st.dtype)

    sd = obj.get("state_dict", obj) if isinstance(obj, dict) else obj
    if not isinstance(sd, dict):
        raise ValueError(f"unexpected checkpoint structure in {path}")
    out = {}

    def collect(d: dict, prefix: str):
        for k, v in d.items():
            key = f"{prefix}{k}"
            if isinstance(v, _LazyTensor):
                out[key] = v.materialize()
            elif isinstance(v, np.ndarray):
                out[key] = v
            elif isinstance(v, dict):
                # nested wrappers ("params_ema"/"params" in BSRGAN/SwinIR
                # releases, "callbacks" metadata, ...) — flatten with prefix
                collect(v, key + ".")
            elif isinstance(v, list) and v and \
                    all(isinstance(s, str) for s in v):
                # plain string lists are data, not code (DeepDanbooru's
                # in-checkpoint "tags")
                out[key] = v

    collect(sd, "")
    return out
