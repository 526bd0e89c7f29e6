"""Face restoration: align → restore (GFPGAN / CodeFormer) → paste back.

Replaces the reference's facexlib-based helper (modules/
face_restoration_utils.py: detect 5 landmarks, similarity-align each face to
the FFHQ 512 template, run the restorer on the crop, inverse-warp with a
feathered mask).  The geometry (umeyama similarity fit, affine warps,
feathered paste-back) is pure numpy+PIL — no cv2 in this image.

Face *detection* weights (facexlib RetinaFace) are not shippable in the
zero-egress container, so the detector is pluggable (`set_face_detector`);
without one, the whole frame is treated as a single aligned face (the
dominant SD use-case is a portrait crop already).  Restorer weights load
from models/GFPGAN and models/Codeformer like the reference's directories.
"""

from __future__ import annotations

import os

import numpy as np
from PIL import Image, ImageFilter

# FFHQ 5-point template for a 512x512 crop (facexlib convention)
FACE_TEMPLATE_512 = np.array([
    [192.98138, 239.94708], [318.90277, 240.19360], [256.63416, 314.01935],
    [201.26117, 371.41043], [313.08905, 371.15118]], np.float64)

_detector = None        # callable: PIL → list[(5,2) landmarks]
_models = {}            # name → loaded (apply_fn)
_dirs = {"GFPGAN": ["models/GFPGAN"], "CodeFormer": ["models/Codeformer"]}


def set_face_detector(fn):
    """fn(PIL.Image) → list of (5,2) float landmark arrays (eyes, nose,
    mouth corners), one per face."""
    global _detector
    _detector = fn


def set_model_dirs(name: str, dirs):
    _dirs[name] = list(dirs)
    _models.pop(name, None)


def _find_model(name: str) -> str | None:
    for d in _dirs.get(name, []):
        if not os.path.isdir(d):
            continue
        for fn in sorted(os.listdir(d)):
            if fn.endswith((".pth", ".pt", ".safetensors", ".ckpt")):
                return os.path.join(d, fn)
    return None


def available_restorers() -> list[str]:
    names = ["None"]
    for name in ("CodeFormer", "GFPGAN"):
        if _find_model(name):
            names.append(name)
    return names


# --------------------------------------------------------------------------
# geometry
# --------------------------------------------------------------------------

def similarity_transform(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """Umeyama least-squares similarity (rotation+scale+translation) fit:
    2x3 matrix M with dst ≈ src @ M[:, :2].T + M[:, 2]."""
    src = np.asarray(src, np.float64)
    dst = np.asarray(dst, np.float64)
    src_mean = src.mean(0)
    dst_mean = dst.mean(0)
    src_c = src - src_mean
    dst_c = dst - dst_mean
    cov = dst_c.T @ src_c / len(src)
    u, s, vt = np.linalg.svd(cov)
    d = np.sign(np.linalg.det(u) * np.linalg.det(vt))
    diag = np.diag([1.0, d])
    var_src = (src_c ** 2).sum() / len(src)
    scale = np.trace(np.diag(s) @ diag) / var_src
    rot = scale * (u @ diag @ vt)
    t = dst_mean - rot @ src_mean
    return np.concatenate([rot, t[:, None]], axis=1)        # (2,3)


def _invert_affine(m: np.ndarray) -> np.ndarray:
    rot_inv = np.linalg.inv(m[:, :2])
    t_inv = -rot_inv @ m[:, 2]
    return np.concatenate([rot_inv, t_inv[:, None]], axis=1)


def _warp(image: Image.Image, m: np.ndarray, size: tuple) -> Image.Image:
    """Warp so that out(x) = in(M⁻¹ x): PIL transform takes the inverse."""
    inv = _invert_affine(m)
    coeffs = (inv[0, 0], inv[0, 1], inv[0, 2], inv[1, 0], inv[1, 1], inv[1, 2])
    return image.transform(size, Image.AFFINE, coeffs,
                           resample=Image.BILINEAR)


# --------------------------------------------------------------------------
# restorers
# --------------------------------------------------------------------------

def _load_restorer(name: str):
    if name in _models:
        return _models[name]
    path = _find_model(name)
    if path is None:
        raise FileNotFoundError(
            f"no {name} weights under {_dirs.get(name)} — download the "
            f"official checkpoint there")
    from sdwebui_tpu.loader.load import read_checkpoint

    sd = read_checkpoint(path)
    if name == "GFPGAN":
        from sdwebui_tpu.models import gfpgan

        tree, cfg = gfpgan.convert_gfpgan(sd)
        size = cfg.out_size

        def run(x, w):  # x (1,S,S,3) in [-1,1]
            return gfpgan.apply(tree, cfg, x)
    else:
        from sdwebui_tpu.models import codeformer

        tree, cfg = codeformer.convert_codeformer(sd)
        size = cfg.img_size

        def run(x, w):
            return codeformer.apply(tree, cfg, x, w=w, adain=True)
    _models.clear()     # one resident face model (HBM budget)
    _models[name] = (run, size)
    return _models[name]


def _restore_crop(crop: Image.Image, name: str, weight: float) -> Image.Image:
    import jax.numpy as jnp

    run, _ = _load_restorer(name)
    x = np.asarray(crop, np.float32)[None] / 127.5 - 1.0
    out = np.asarray(run(jnp.asarray(x), float(weight))[0], np.float32)
    out = np.clip((out + 1.0) * 127.5 + 0.5, 0, 255).astype(np.uint8)
    return Image.fromarray(out)


# --------------------------------------------------------------------------
# public API
# --------------------------------------------------------------------------

def restore_faces(image: Image.Image, restorer: str = "CodeFormer",
                  weight: float = 0.5, visibility: float = 1.0,
                  crop_size: int | None = None) -> Image.Image:
    """The reference restore_with_helper flow (face_restoration_utils.py):
    per detected face, align/restore/paste-back; blends the final result
    with the original by `visibility` (extras-tab sliders).  crop_size
    defaults to the loaded model's native face size (512 for the official
    checkpoints)."""
    if restorer in (None, "", "None") or visibility <= 0:
        return image
    image = image.convert("RGB")
    if crop_size is None:
        crop_size = _load_restorer(restorer)[1]

    faces = _detector(image) if _detector is not None else None
    result = image.copy()

    if not faces:
        # no detector (or none found): treat the full frame as one face
        crop = image.resize((crop_size, crop_size), Image.LANCZOS)
        restored = _restore_crop(crop, restorer, weight)
        result = restored.resize(image.size, Image.LANCZOS)
    else:
        for lm in faces:
            m = similarity_transform(np.asarray(lm, np.float64),
                                     FACE_TEMPLATE_512 * (crop_size / 512.0))
            crop = _warp(image, m, (crop_size, crop_size))
            restored = _restore_crop(crop, restorer, weight)
            # paste back: inverse warp + feathered mask
            inv = _invert_affine(m)
            back = _warp(restored, inv, image.size)
            mask = Image.new("L", (crop_size, crop_size), 255)
            mask = _warp(mask, inv, image.size)
            mask = mask.filter(ImageFilter.MinFilter(9))        # erode edges
            mask = mask.filter(ImageFilter.GaussianBlur(8))     # feather
            result = Image.composite(back, result, mask)

    if visibility < 1.0:
        result = Image.blend(image, result, visibility)
    return result
