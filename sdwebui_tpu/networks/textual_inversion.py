"""Textual-inversion embedding registry + tokenize-time splicing.

Reference: modules/textual_inversion/textual_inversion.py (EmbeddingDatabase,
load_from_file :157, find_embedding_at_position :245).  Embeddings load from
.pt ({'string_to_param': {'*': (V,D)}} — via our restricted unpickler),
.safetensors ({'emb_params'} or SDXL {'clip_l','clip_g'}), and .bin
(diffusers {name: tensor}).  Trigger matching happens on token ids at
tokenize time (TextConditioner.embedding_db hook)."""

from __future__ import annotations

import dataclasses
import os

import numpy as np


@dataclasses.dataclass
class Embedding:
    name: str
    vec: np.ndarray            # (vectors, dim); SDXL: dict handled upstream
    vec_g: np.ndarray | None = None   # SDXL bigG branch
    step: int | None = None
    shorthash: str | None = None

    @property
    def vectors(self) -> int:
        return int(self.vec.shape[0])


def load_embedding_file(path: str, name: str | None = None) -> Embedding:
    name = name or os.path.splitext(os.path.basename(path))[0]
    emb = _load_embedding_file(path, name)
    if emb.shorthash is None:
        # reference textual_inversion.py Embedding.set_hash: short sha256 of
        # the file, surfaced in the "TI hashes" infotext field
        import hashlib

        h = hashlib.sha256()
        with open(path, "rb") as f:
            for chunk in iter(lambda: f.read(1 << 20), b""):
                h.update(chunk)
        emb.shorthash = h.hexdigest()[:10]
    return emb


def _load_embedding_file(path: str, name: str) -> Embedding:
    if path.lower().endswith((".png", ".webp")):
        # PNG embedding card (reference image_embedding.py data panels,
        # or 'sd-ti-embedding' text chunk)
        from PIL import Image

        from sdwebui_tpu.training.image_embedding import (
            embedding_from_b64, extract_image_data_embed)

        with Image.open(path) as im:
            data = None
            text_chunks = getattr(im, "text", None) or {}
            if "sd-ti-embedding" in text_chunks:
                data = embedding_from_b64(text_chunks["sd-ti-embedding"])
            if data is None:
                data = extract_image_data_embed(im)
        if not data:
            raise ValueError(f"no embedded embedding data in {path}")
        vec = np.atleast_2d(np.asarray(
            next(iter(data["string_to_param"].values())), np.float32))
        return Embedding(data.get("name", name), vec,
                         step=data.get("step"))
    if path.endswith(".safetensors"):
        from sdwebui_tpu.loader.safetensors_io import read_state_dict

        sd = read_state_dict(path)
        if "emb_params" in sd:
            vec = np.asarray(sd["emb_params"], np.float32)
            return Embedding(name, np.atleast_2d(vec))
        if "clip_l" in sd:   # SDXL dual embedding
            return Embedding(name, np.atleast_2d(np.asarray(sd["clip_l"], np.float32)),
                             vec_g=np.atleast_2d(np.asarray(sd["clip_g"], np.float32)))
        # single-tensor fallback
        key = next(iter(sd))
        return Embedding(name, np.atleast_2d(np.asarray(sd[key], np.float32)))

    from sdwebui_tpu.loader.torch_ckpt import load_torch_checkpoint

    data = load_torch_checkpoint(path)
    # load_torch_checkpoint flattens to arrays only; probe known layouts
    if "emb_params" in data:
        return Embedding(name, np.atleast_2d(np.asarray(data["emb_params"], np.float32)))
    if data:
        key = next(iter(data))
        return Embedding(name, np.atleast_2d(np.asarray(data[key], np.float32)))
    raise ValueError(f"no embedding tensor found in {path}")


class EmbeddingDatabase:
    """Token-sequence-triggered embedding registry."""

    def __init__(self, tokenizer=None, expected_dim: int | None = None):
        self.tokenizer = tokenizer
        self.expected_dim = expected_dim   # conditioner hidden size
        self.embeddings: dict[str, Embedding] = {}
        self.ids_lookup: dict[int, list] = {}
        self.skipped: list[str] = []

    def register(self, emb: Embedding):
        if self.expected_dim is not None and \
                emb.vec.shape[1] != self.expected_dim:
            # wrong model family (e.g. SDXL embedding on SD1) — skip with a
            # name instead of a broadcast error mid-generation (reference
            # textual_inversion.py skipped_embeddings)
            self.skipped.append(
                f"{emb.name} (dim {emb.vec.shape[1]} != {self.expected_dim})")
            return
        self.embeddings[emb.name] = emb
        if self.tokenizer is None:
            return
        ids = self.tokenizer.encode(emb.name)
        if not ids:
            return
        first = ids[0]
        self.ids_lookup.setdefault(first, [])
        self.ids_lookup[first] = sorted(
            self.ids_lookup[first] + [(ids, emb)],
            key=lambda x: len(x[0]), reverse=True)

    def load_from_dir(self, dirpath: str):
        if not os.path.isdir(dirpath):
            return
        n_before = len(self.embeddings)
        for fn in sorted(os.listdir(dirpath)):
            if not fn.lower().endswith((".pt", ".safetensors", ".bin",
                                        ".png", ".webp")):
                continue
            path = os.path.join(dirpath, fn)
            try:
                self.register(load_embedding_file(path))
            except Exception:
                self.skipped.append(fn)
        from sdwebui_tpu.utils.options import opts as _opts

        if _opts.get("textual_inversion_print_at_load", False):
            names = sorted(set(self.embeddings) )
            print(f"Textual inversion embeddings loaded"
                  f"({len(self.embeddings) - n_before} new, "
                  f"{len(self.embeddings)} total): {', '.join(names)}",
                  flush=True)

    def find_at(self, ids: list, position: int):
        """(embedding, consumed_token_count) at ids[position], else (None, 0)
        — the TextConditioner hook (reference find_embedding_at_position)."""
        token = ids[position]
        candidates = self.ids_lookup.get(token)
        if not candidates:
            return None, 0
        for trigger_ids, emb in candidates:
            if ids[position: position + len(trigger_ids)] == trigger_ids:
                # usage log feeds the "TI hashes" infotext field (reference
                # sd_hijack embedding_db.embeddings_used)
                if not hasattr(self, "used_names"):
                    self.used_names = set()
                self.used_names.add(emb.name)
                return emb, len(trigger_ids)
        return None, 0
