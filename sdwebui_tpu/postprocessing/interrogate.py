"""CLIP interrogator, rank-only mode (reference modules/interrogate.py).

The reference produces "<BLIP caption>, <top category items>"; BLIP weights
are not obtainable in this zero-egress deployment, so this implements the
category-ranking half with the user-supplied CLIP model: image features
from the ViT tower (models/clip_vision.py), text features from the same
file's text tower, cosine ranking over interrogate/<category>.txt files
(same data files the reference downloads from clip-interrogator;
`.topN` filename suffix selects how many items a category contributes).
"""

from __future__ import annotations

import glob
import os
import re

import jax.numpy as jnp
import numpy as np

_TOPN_RE = re.compile(r"\.top(\d+)$")


def load_categories(dirpath: str = "interrogate"):
    """[(name, topn, [items])] from <dirpath>/*.txt (reference
    categories())."""
    out = []
    for path in sorted(glob.glob(os.path.join(dirpath, "*.txt"))):
        stem = os.path.splitext(os.path.basename(path))[0]
        m = _TOPN_RE.search(stem)
        topn = int(m.group(1)) if m else 1
        name = _TOPN_RE.sub("", stem)
        with open(path, encoding="utf-8") as f:
            items = [line.strip() for line in f if line.strip()]
        if items:
            out.append((name, topn, items))
    return out


class ClipInterrogator:
    """Loads a full CLIP model file once; ranks category items per image."""

    def __init__(self, model_path: str, category_dir: str = "interrogate"):
        from sdwebui_tpu.loader.convert import convert_clip_hf
        from sdwebui_tpu.loader.load import read_checkpoint
        from sdwebui_tpu.models.clip_vision import convert_clip_vision
        from sdwebui_tpu.text.tokenizer import get_tokenizer

        sd = read_checkpoint(model_path)
        self.vision, self.vcfg = convert_clip_vision(sd)
        self.text, self.tcfg = convert_clip_hf(sd, "text_model.")
        if "text_projection.weight" in sd:
            self.text["text_projection"] = {
                "weight": np.ascontiguousarray(
                    np.asarray(sd["text_projection.weight"]).T)}
        self.tokenizer = get_tokenizer()
        self.categories = load_categories(category_dir)
        self._text_cache: dict = {}

    def image_features(self, image):
        from sdwebui_tpu.models import clip_vision

        px = jnp.asarray(clip_vision.preprocess(image,
                                                size=self.vcfg.image_size))
        return clip_vision.apply(self.vision, self.vcfg, px)

    def text_features(self, texts):
        from sdwebui_tpu.models import clip as clip_model

        ids = []
        for t in texts:
            tok = self.tokenizer.encode(t)[:75]
            row = [self.tokenizer.bos_token_id, *tok, self.tokenizer.eos_token_id]
            row += [self.tokenizer.eos_token_id] * (77 - len(row))
            ids.append(row)
        _, pooled = clip_model.encode(self.text, self.tcfg,
                                      jnp.asarray(ids, jnp.int32))
        return pooled / jnp.linalg.norm(pooled, axis=-1, keepdims=True)

    def interrogate(self, image, max_flavors: int = 3,
                    captioner=None) -> str:
        """Reference output shape: "<BLIP caption>, <ranked category items>"
        (modules/interrogate.py:204-219); rank-only when no captioner is
        loaded.  Honors interrogate_clip_skip_categories,
        interrogate_clip_dict_limit, and interrogate_return_ranks
        ("(item:score)" formatting like the reference)."""
        from sdwebui_tpu.models.clip_vision import rank
        from sdwebui_tpu.utils.options import opts as _opts

        skip = set(_opts.get("interrogate_clip_skip_categories", []) or [])
        limit = int(_opts.get("interrogate_clip_dict_limit", 1500) or 0)
        ranks = bool(_opts.get("interrogate_return_ranks", False))

        img_feat = self.image_features(image)
        parts = []
        if captioner is not None:
            parts.append(captioner.caption(image))
        for name, topn, items in self.categories:
            if name in skip:
                continue
            if limit:
                items = items[:limit]
            key = (name, limit)
            if key not in self._text_cache:
                self._text_cache[key] = self.text_features(items)
            for idx, score in rank(img_feat, self._text_cache[key],
                                   top_count=topn):
                parts.append(f"({items[idx]}:{score / 100:.3f})" if ranks
                             else items[idx])
        return ", ".join(p for p in parts if p)


class BlipCaptioner:
    """BLIP caption generator (reference generate_caption,
    modules/interrogate.py:181): prompt "a picture of", greedy decode,
    prompt stripped from the output."""

    PROMPT = "a picture of "

    def __init__(self, model_path: str, vocab_path: str):
        from sdwebui_tpu.models import blip

        self.params, self.cfg = blip.load_blip(model_path)
        self.tok = blip.WordPiece(vocab_path)

    def caption(self, image, max_new_tokens: int | None = None) -> str:
        from sdwebui_tpu.models import blip
        from sdwebui_tpu.utils.options import opts as _opts

        if max_new_tokens is None:
            max_new_tokens = int(_opts.get("interrogate_clip_max_length", 48))
        px = jnp.asarray(blip.preprocess(image, self.cfg.image_size))
        prompt_ids = [self.cfg.bos_token_id] + self.tok.encode(self.PROMPT)
        ids = blip.generate(
            self.params, self.cfg, px, prompt_ids,
            max_new_tokens=max_new_tokens,
            min_new_tokens=int(_opts.get("interrogate_clip_min_length", 24)),
            num_beams=int(_opts.get("interrogate_clip_num_beams", 1)))
        return self.tok.decode(ids[len(prompt_ids):])


def find_clip_model(dirpath: str = "models/clip_vision"):
    for ext in ("*.safetensors", "*.bin", "*.pt"):
        hit = sorted(glob.glob(os.path.join(dirpath, ext)))
        if hit:
            return hit[0]
    return None


def find_blip_model(dirpath: str = "models/BLIP"):
    """→ (weights path, vocab path) or None. The vocab.txt (BERT wordpiece)
    sits next to the weights — text data the user supplies."""
    vocab = os.path.join(dirpath, "vocab.txt")
    if not os.path.isfile(vocab):
        return None
    for ext in ("*.safetensors", "*.pth", "*.pt", "*.ckpt"):
        hit = sorted(glob.glob(os.path.join(dirpath, ext)))
        if hit:
            return hit[0], vocab
    return None
