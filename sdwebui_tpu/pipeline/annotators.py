"""ControlNet annotators (hint preprocessors).

The reference ecosystem's sd-webui-controlnet extension preprocesses the
control image with a `module` (canny/depth/pose/...).  The cv2-only ones
are implemented directly here; the model-based ones (depth_midas /
openpose / hed + scribble_hed) run the NHWC JAX ports in `models/` with
user-supplied weights discovered under `models/Annotators/` (the
extension's download directory — ControlNetHED.pth, body_pose_model.pth,
dpt_hybrid-*.pt).  All are exposed both as the `ControlNetUnit.module`
field and the extension-compatible `POST /controlnet/detect` route
(server/api.py).

Every annotator: np.uint8 RGB (H,W,3) → np.uint8 (H,W) or (H,W,3) hint
whose WHITE pixels are the feature (the convention the control towers are
trained on).
"""

from __future__ import annotations

import numpy as np

try:
    import cv2
except ImportError:      # pragma: no cover - cv2 is present in this image
    cv2 = None


def _require_cv2():
    if cv2 is None:
        raise RuntimeError("annotator requires cv2, which is unavailable")


def _resize_for_detect(img: np.ndarray, res: int) -> np.ndarray:
    """Short-side resize to `res` (extension's processor_res semantics),
    keeping aspect, dims rounded to /8."""
    if not res:
        return img
    h, w = img.shape[:2]
    k = res / min(h, w)
    nh, nw = int(round(h * k / 8)) * 8, int(round(w * k / 8)) * 8
    interp = cv2.INTER_AREA if k < 1 else cv2.INTER_LANCZOS4
    return cv2.resize(img, (nw, nh), interpolation=interp)


def canny(img, res: int = 512, low: float = 100, high: float = 200):
    """cv2.Canny edges (the reference ecosystem's default module)."""
    _require_cv2()
    img = _resize_for_detect(img, res)
    return cv2.Canny(img, int(low), int(high))


def invert(img, res: int = 0, a: float = 0, b: float = 0):
    """White-background lineart → white-on-black hint."""
    return 255 - np.asarray(img)


def blur_gaussian(img, res: int = 512, sigma: float = 9, b: float = 0):
    """Gaussian blur (tile/blur control models)."""
    _require_cv2()
    img = _resize_for_detect(img, res)
    return cv2.GaussianBlur(img, (0, 0), float(sigma) or 9)


def threshold(img, res: int = 512, thr: float = 127, b: float = 0):
    _require_cv2()
    img = _resize_for_detect(img, res)
    gray = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY)
    _, out = cv2.threshold(gray, int(thr), 255, cv2.THRESH_BINARY)
    return out


def scribble_xdog(img, res: int = 512, xdog_threshold: float = 32, b: float = 0):
    """XDoG sketch extraction (extension scribble_xdog): difference of
    Gaussians over channels, thresholded to a white-on-black scribble."""
    _require_cv2()
    img = _resize_for_detect(img, res)
    g1 = cv2.GaussianBlur(img.astype(np.float32), (0, 0), 0.5)
    g2 = cv2.GaussianBlur(img.astype(np.float32), (0, 0), 5.0)
    dog = np.clip(255 - np.min(g2 - g1, axis=2), 0, 255)
    return ((2 * (255 - dog) > float(xdog_threshold)) * 255).astype(np.uint8)


def shuffle(img, res: int = 512, a: float = 0, b: float = 0, seed: int = 0):
    """Content shuffle via random flow warp (extension's shuffle module)."""
    _require_cv2()
    img = _resize_for_detect(img, res)
    h, w = img.shape[:2]
    rng = np.random.RandomState(seed)
    f = 256
    fx = cv2.resize(rng.uniform(-1, 1, (h // 8 + 1, w // 8 + 1))
                    .astype(np.float32), (w, h)) * f
    fy = cv2.resize(rng.uniform(-1, 1, (h // 8 + 1, w // 8 + 1))
                    .astype(np.float32), (w, h)) * f
    xs = np.clip(np.arange(w)[None, :] + fx, 0, w - 1).astype(np.float32)
    ys = np.clip(np.arange(h)[:, None] + fy, 0, h - 1).astype(np.float32)
    return cv2.remap(img, xs, ys, cv2.INTER_LINEAR)


# --------------------------------------------------------------------------
# model-based annotators (weights user-supplied under models/Annotators)
# --------------------------------------------------------------------------

_model_dirs = ["models/Annotators", "models/annotator"]
_loaded: dict = {}


def set_annotator_dirs(dirs):
    _model_dirs[:] = list(dirs)
    _loaded.clear()


def _find_weights(*substrings) -> str | None:
    import os
    for d in _model_dirs:
        if not os.path.isdir(d):
            continue
        for fn in sorted(os.listdir(d)):
            low = fn.lower()
            if any(s in low for s in substrings) and \
                    low.endswith((".pth", ".pt", ".safetensors", ".ckpt")):
                return os.path.join(d, fn)
    return None


def _load(name: str, substrings, convert):
    if name not in _loaded:
        path = _find_weights(*substrings)
        if path is None:
            raise RuntimeError(
                f"annotator '{name}' needs weights matching {substrings} "
                f"under {_model_dirs} — download the extension's model "
                f"file there")
        from sdwebui_tpu.loader.load import read_checkpoint
        _loaded[name] = convert(read_checkpoint(path))
    return _loaded[name]


def hed(img, res: int = 512, a: float = 0, b: float = 0):
    """HED soft edges (models/hed.py; ControlNetHED.pth weights)."""
    from sdwebui_tpu.models import hed as hed_model
    _require_cv2()
    img = _resize_for_detect(img, res)
    params = _load("hed", ("controlnethed", "hed"), hed_model.convert_hed)
    edge = hed_model.estimate(params, img)
    return (edge * 255.0).clip(0, 255).astype(np.uint8)


def hed_safe(img, res: int = 512, a: float = 0, b: float = 0):
    from sdwebui_tpu.models.hed import safe_step
    return (safe_step(hed(img, res) / 255.0) * 255).clip(0, 255) \
        .astype(np.uint8)


def scribble_hed(img, res: int = 512, a: float = 0, b: float = 0):
    """HED → directional NMS → binary scribble (the extension's post)."""
    from sdwebui_tpu.models.hed import nms
    detected = nms(hed(img, res), 127, 3.0)
    detected[detected > 4] = 255
    detected[detected < 255] = 0
    return detected


def depth_midas(img, res: int = 512, a: float = 0, b: float = 0):
    """MiDaS DPT-hybrid inverse depth, min-max normalized (white = near)."""
    from sdwebui_tpu.models import midas
    import jax
    import jax.numpy as jnp
    _require_cv2()
    img = _resize_for_detect(img, res)
    params, cfg = _load(
        "depth_midas", ("dpt_hybrid", "midas"),
        lambda sd: midas.convert_dpt(sd, prefix=""))
    h, w = img.shape[:2]
    x = jnp.asarray(img, jnp.float32)[None] / 127.5 - 1.0
    x = jax.image.resize(x, (1, cfg.image_size, cfg.image_size, 3),
                         "bicubic")
    depth = np.asarray(midas.apply(params, cfg, x))[0, :, :, 0]
    depth = cv2.resize(depth, (w, h), interpolation=cv2.INTER_CUBIC)
    lo, hi = float(depth.min()), float(depth.max())
    return ((depth - lo) / max(hi - lo, 1e-8) * 255).astype(np.uint8)


def openpose(img, res: int = 512, a: float = 0, b: float = 0):
    """Body-pose skeleton rendering (models/openpose.py;
    body_pose_model.pth weights)."""
    from sdwebui_tpu.models import openpose as pose
    _require_cv2()
    img = _resize_for_detect(img, res)
    params = _load("openpose", ("body_pose",), pose.convert_openpose)
    candidate, subset = pose.estimate(params, img)
    return pose.draw_bodypose(img.shape[0], img.shape[1], candidate, subset)


ANNOTATORS = {
    "none": None,
    "canny": canny,
    "invert": invert,
    "invert (from white bg & black line)": invert,
    "blur_gaussian": blur_gaussian,
    "threshold": threshold,
    "scribble_xdog": scribble_xdog,
    "shuffle": shuffle,
    "hed": hed,
    "hed_safe": hed_safe,
    "softedge_hed": hed,
    "scribble_hed": scribble_hed,
    "depth": depth_midas,
    "depth_midas": depth_midas,
    "openpose": openpose,
}


def list_modules() -> list[str]:
    return list(ANNOTATORS)


def run_annotator(module: str, image: np.ndarray, res: int = 512,
                  threshold_a: float | None = None,
                  threshold_b: float | None = None) -> np.ndarray:
    """Dispatch by module name; unknown/model-based modules raise KeyError.
    threshold_a/b follow the extension's per-module meaning (canny low/high,
    blur sigma, xdog threshold)."""
    fn = ANNOTATORS[module]
    if fn is None:
        return np.asarray(image)
    img = np.asarray(image)
    if img.ndim == 2:
        img = np.stack([img] * 3, axis=-1)
    if img.dtype != np.uint8:
        img = (np.clip(img, 0, 1) * 255).astype(np.uint8)
    args = []
    if threshold_a is not None:
        args.append(threshold_a)
    if threshold_b is not None:
        args.append(threshold_b)
    return fn(img, res, *args)
