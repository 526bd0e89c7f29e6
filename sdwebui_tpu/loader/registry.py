"""Checkpoint discovery/registry (reference modules/sd_models.py:56-180):
scan model dirs for .safetensors/.ckpt, lazy sha256 with cache, title
resolution, and selection by title/name/hash."""

from __future__ import annotations

import dataclasses
import glob
import hashlib
import json
import os


@dataclasses.dataclass
class CheckpointInfo:
    filename: str
    name: str
    sha256: str | None = None

    @property
    def title(self) -> str:
        if self.sha256:
            return f"{self.name} [{self.sha256[:10]}]"
        return self.name

    @property
    def model_name(self) -> str:
        return os.path.splitext(self.name)[0]

    def calculate_sha256(self, cache_path: str | None = None) -> str:
        if self.sha256:
            return self.sha256
        self.sha256 = file_sha256(self.filename, cache_path)
        return self.sha256


def file_sha256(path: str, cache_path: str | None = None) -> str:
    """sha256 of a file with the mtime+size-keyed json cache (reference
    modules/hashes.py sha256 + cache.json; also used for VAE infotext
    hashes)."""
    cache = {}
    if cache_path and os.path.exists(cache_path):
        try:
            with open(cache_path) as f:
                cache = json.load(f)
        except Exception:
            cache = {}
    st = os.stat(path)
    cache_key = f"{path}:{st.st_mtime}:{st.st_size}"
    if cache_key in cache:
        return cache[cache_key]
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 22), b""):
            h.update(chunk)
    digest = h.hexdigest()
    if cache_path:
        cache[cache_key] = digest
        os.makedirs(os.path.dirname(cache_path) or ".", exist_ok=True)
        with open(cache_path, "w") as f:
            json.dump(cache, f)
    return digest


class CheckpointRegistry:
    def __init__(self, model_dirs: list[str], cache_path: str | None = None):
        self.model_dirs = model_dirs
        self.cache_path = cache_path
        self.checkpoints: dict[str, CheckpointInfo] = {}
        self.refresh()

    def refresh(self):
        self.checkpoints = {}
        for d in self.model_dirs:
            if not os.path.isdir(d):
                continue
            for ext in ("*.safetensors", "*.ckpt", "*.pt"):
                import sys

                hidden_kw = ({"include_hidden": True}
                             if sys.version_info >= (3, 11) else {})
                for path in sorted(glob.glob(os.path.join(d, "**", ext),
                                             recursive=True, **hidden_kw)):
                    if ".vae." in os.path.basename(path).lower():
                        continue   # sibling VAE files are not checkpoints
                    from sdwebui_tpu.utils.fs import visible

                    if not visible(path):
                        continue   # opts.list_hidden_files
                    name = os.path.relpath(path, d)
                    self.checkpoints[name] = CheckpointInfo(path, name)

    def list(self) -> list[CheckpointInfo]:
        return list(self.checkpoints.values())

    def find(self, name_or_title: str | None) -> CheckpointInfo | None:
        if not name_or_title:
            return next(iter(self.checkpoints.values()), None)
        base = name_or_title.split(" [")[0]
        for info in self.checkpoints.values():
            if name_or_title in (info.name, info.title, info.model_name) \
                    or base in (info.name, info.model_name):
                return info
        # hash lookup
        if "[" in name_or_title:
            h = name_or_title.split("[")[1].rstrip("]")
            for info in self.checkpoints.values():
                if info.sha256 and info.sha256.startswith(h):
                    return info
        return None
