"""Training-dataset preprocessing (reference
extensions-builtin/postprocessing-for-training/scripts/*): split oversized
images, auto-sized center crop, focal crop, flipped copies, and caption
sidecars — driven as one directory → directory pass instead of the
reference's per-image Extras-tab scripts."""

from __future__ import annotations

import math
import os

from PIL import Image

IMAGE_EXTS = (".png", ".jpg", ".jpeg", ".webp", ".bmp")


def split_oversized(image: Image.Image, width: int, height: int,
                    overlap_ratio: float = 0.2, threshold: float = 2.0):
    """reference postprocessing_split_oversized.py split_pic: when one side
    exceeds `threshold`x the target ratio, cut overlapping strips.
    Returns a list of crops ([image] when no split applies)."""
    iw, ih = image.size
    if ih > iw and ih / iw > threshold:
        inverse_xy = False
    elif iw > ih and iw / ih > threshold:
        inverse_xy = True
    else:
        return [image]
    if inverse_xy:
        from_w, from_h = image.height, image.width
        to_w, to_h = height, width
    else:
        from_w, from_h = image.width, image.height
        to_w, to_h = width, height
    h = from_h * to_w // from_w
    image = image.resize((h, to_w) if inverse_xy else (to_w, h))
    split_count = math.ceil((h - to_h * overlap_ratio)
                            / (to_h * (1.0 - overlap_ratio)))
    if split_count < 2:
        return [image]
    y_step = (h - to_h) / (split_count - 1)
    out = []
    for i in range(split_count):
        y = int(y_step * i)
        box = (y, 0, y + to_h, to_w) if inverse_xy else (0, y, to_w, y + to_h)
        out.append(image.crop(box))
    return out


def center_crop(image: Image.Image, w: int, h: int) -> Image.Image:
    """reference postprocessing_autosized_crop.py center_crop."""
    iw, ih = image.size
    if ih / h < iw / w:
        sw = w * ih / h
        box = ((iw - sw) / 2, 0, iw - (iw - sw) / 2, ih)
    else:
        sh = h * iw / w
        box = (0, (ih - sh) / 2, iw, ih - (ih - sh) / 2)
    return image.resize((w, h), Image.LANCZOS, box)


def autosized_crop(image: Image.Image, mindim: int = 384, maxdim: int = 768,
                   minarea: int = 64 * 64, maxarea: int = 640 * 640,
                   objective: str = "Maximize area",
                   threshold: float = 0.15):
    """reference multicrop_pic: pick the (w, h) grid size minimizing aspect
    error under the area/dim bounds; None when nothing qualifies."""
    iw, ih = image.size

    def err(w, h):
        x = iw / ih / (w / h)
        return 1 - (x if x < 1 else 1 / x)

    candidates = [(w, h) for w in range(mindim, maxdim + 1, 64)
                  for h in range(mindim, maxdim + 1, 64)
                  if minarea <= w * h <= maxarea and err(w, h) <= threshold]
    if not candidates:
        return None
    rev = 1 if objective == "Maximize area" else -1
    wh = max(candidates, key=lambda p: (p[0] * p[1] * rev, -err(*p) * rev))
    return center_crop(image, *wh)


def preprocess_dir(input_dir: str, output_dir: str, width: int = 512,
                   height: int = 512, split: bool = False,
                   split_threshold: float = 2.0, overlap_ratio: float = 0.2,
                   flip: bool = False, focal_crop: bool = False,
                   auto_size_crop: bool = False,
                   caption_deepbooru: bool = False,
                   existing_caption_action: str = "ignore") -> list[str]:
    """Directory pass combining the reference's five for-training scripts in
    their UI order (split 4000 → focal 4010 → autosized 4020 → flip 4030 →
    caption 4040); returns the written file paths."""
    os.makedirs(output_dir, exist_ok=True)
    booru = None
    if caption_deepbooru:
        import glob

        from sdwebui_tpu.models import deepbooru as db

        files = sorted(glob.glob("models/torch_deepdanbooru/*.pt")) + \
            sorted(glob.glob("models/torch_deepdanbooru/*.pth"))
        if files:
            booru = db.load_deepbooru(files[0])

    written = []
    for fn in sorted(os.listdir(input_dir)):
        if not fn.lower().endswith(IMAGE_EXTS):
            continue
        src_path = os.path.join(input_dir, fn)
        with Image.open(src_path) as im:
            img = im.convert("RGB")
        existing_txt = os.path.splitext(src_path)[0] + ".txt"
        caption = ""
        if os.path.exists(existing_txt) \
                and existing_caption_action != "ignore":
            with open(existing_txt, encoding="utf8") as f:
                caption = f.read().strip()

        crops = split_oversized(img, width, height, overlap_ratio,
                                split_threshold) if split else [img]
        outs = []
        for c in crops:
            if focal_crop:
                from sdwebui_tpu.training.dataset import autocrop_image

                c = autocrop_image(c, width, height)
            elif auto_size_crop:
                c = autosized_crop(c) or c
            outs.append(c)
            if flip:
                outs.append(c.transpose(Image.FLIP_LEFT_RIGHT))

        stem = os.path.splitext(fn)[0]
        for i, c in enumerate(outs):
            suffix = f"-{i}" if len(outs) > 1 else ""
            out_path = os.path.join(output_dir, f"{stem}{suffix}.png")
            c.save(out_path)
            written.append(out_path)
            text = caption
            if booru is not None:
                from sdwebui_tpu.models import deepbooru as db
                from sdwebui_tpu.utils.options import opts as _opts

                tags = db.tag_image(
                    booru[0], booru[1], c,
                    threshold=float(_opts.get(
                        "interrogate_deepbooru_score_threshold", 0.5)))
                if text and existing_caption_action == "prepend":
                    text = f"{text}, {tags}"
                elif text and existing_caption_action == "append":
                    text = f"{tags}, {text}"
                elif not text or existing_caption_action == "copy":
                    text = tags
            if text:
                with open(os.path.splitext(out_path)[0] + ".txt", "w",
                          encoding="utf8") as f:
                    f.write(text)
    return written
