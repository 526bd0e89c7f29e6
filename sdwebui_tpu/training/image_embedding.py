"""PNG-embedded textual-inversion embeddings.

Byte-format compatible with the reference
(modules/textual_inversion/image_embedding.py): the embedding dict is
JSON-encoded (tensors as {'TORCHTENSOR': nested list}), zlib-compressed,
nibble-split into two RGB side panels that are LCG-XOR-scrambled and
dot-styled, and pasted left/right of the preview image with 1px black
separators.  extract reverses it.  Interchange is oracle-tested against
the reference's own implementation (importable in-image) in
tests/test_training_dataset.py.
"""

from __future__ import annotations

import base64
import json
import zlib

import numpy as np


def _tensor_hook(d):
    if "TORCHTENSOR" in d:
        return np.asarray(d["TORCHTENSOR"], np.float32)
    return d


class _NumpyEncoder(json.JSONEncoder):
    def default(self, obj):
        if isinstance(obj, np.ndarray):
            return {"TORCHTENSOR": obj.tolist()}
        if isinstance(obj, (np.floating, np.integer)):
            return obj.item()
        try:
            import torch
            if isinstance(obj, torch.Tensor):
                return {"TORCHTENSOR": obj.cpu().detach().numpy().tolist()}
        except ImportError:
            pass
        return json.JSONEncoder.default(self, obj)


def embedding_to_b64(data: dict) -> bytes:
    return base64.b64encode(json.dumps(data, cls=_NumpyEncoder).encode())


def embedding_from_b64(data) -> dict:
    return json.loads(base64.b64decode(data), object_hook=_tensor_hook)


def _lcg_block(shape, m=2 ** 32, a=1664525, c=1013904223, seed=0):
    n = int(np.prod(shape))
    out = np.empty(n, np.uint8)
    s = seed
    for i in range(n):
        s = (a * s + c) % m
        out[i] = s % 255
    return out.reshape(shape)


def xor_block(block: np.ndarray) -> np.ndarray:
    rand = _lcg_block(block.shape)
    return np.bitwise_xor(block.astype(np.uint8), rand & 0x0F)


def style_block(block: np.ndarray, sequence) -> np.ndarray:
    from PIL import Image, ImageDraw

    im = Image.new("RGB", (block.shape[1], block.shape[0]))
    draw = ImageDraw.Draw(im)
    i = 0
    for x in range(-6, im.size[0], 8):
        for yi, y in enumerate(range(-6, im.size[1], 8)):
            offset = 4 if yi % 2 == 0 else 0
            shade = int(sequence[i % len(sequence)])
            i += 1
            draw.ellipse((x + offset, y, x + 6 + offset, y + 6),
                         fill=(shade, shade, shade))
    fg = np.asarray(im, np.uint8) & 0xF0
    return block ^ fg


def insert_image_data_embed(image, data: dict):
    """preview PIL image + embedding dict → card image with data panels."""
    from PIL import Image

    d = 3
    compressed = zlib.compress(
        json.dumps(data, cls=_NumpyEncoder).encode(), level=9)
    data_np = np.frombuffer(compressed, np.uint8).copy()
    high, low = data_np >> 4, data_np & 0x0F

    h = image.size[1]
    next_size = low.shape[0] + (h - (low.shape[0] % h))
    next_size = next_size + ((h * d) - (next_size % (h * d)))
    low = np.resize(low, next_size).reshape((h, -1, d))
    high = np.resize(high, next_size).reshape((h, -1, d))

    vec = np.asarray(list(data["string_to_param"].values())[0],
                     np.float32).reshape(-1)[:1024]
    edge = (np.abs(vec) / max(np.max(np.abs(vec)), 1e-12) * 255) \
        .astype(np.uint8)
    if edge.size == 0:
        edge = np.zeros(1, np.uint8)

    low = xor_block(style_block(low, sequence=edge.tolist()))
    high = xor_block(style_block(high, sequence=edge.tolist()[::-1]))

    im_low = Image.fromarray(low, mode="RGB")
    im_high = Image.fromarray(high, mode="RGB")
    bg = Image.new("RGB", (image.size[0] + im_low.size[0]
                           + im_high.size[0] + 2, image.size[1]), (0, 0, 0))
    bg.paste(im_low, (0, 0))
    bg.paste(image, (im_low.size[0] + 1, 0))
    bg.paste(im_high, (im_low.size[0] + 1 + image.size[0] + 1, 0))
    return bg


def _crop_black(img: np.ndarray, tol=0) -> np.ndarray:
    mask = (img > tol).all(2)
    mask0, mask1 = mask.any(0), mask.any(1)
    col_start = int(mask0.argmax())
    col_end = int(mask.shape[1] - mask0[::-1].argmax())
    row_start = int(mask1.argmax())
    row_end = int(mask.shape[0] - mask1[::-1].argmax())
    return img[row_start:row_end, col_start:col_end]


def extract_image_data_embed(image):
    """card image → embedding dict, or None when no data panels exist."""
    d = 3
    arr = _crop_black(
        np.asarray(image.convert("RGB"), np.uint8).reshape(
            image.size[1], image.size[0], d)) & 0x0F
    black_cols = np.where(np.sum(arr, axis=(0, 2)) == 0)
    if black_cols[0].shape[0] < 2:
        return None
    lower = xor_block(arr[:, : black_cols[0].min(), :].astype(np.uint8))
    upper = xor_block(arr[:, black_cols[0].max() + 1:, :].astype(np.uint8))
    data = ((upper << 4) | lower).flatten().tobytes()
    return json.loads(zlib.decompress(data), object_hook=_tensor_hook)
