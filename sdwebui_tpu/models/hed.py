"""HED soft-edge estimator — the `hed` / `scribble_hed` ControlNet annotator.

The reference ecosystem's sd-webui-controlnet extension preprocesses control
images with a retrained Holistically-nested Edge Detection network
("ControlNetHED", Apache-2 weights, `ControlNetHED.pth`); this is the
TPU-native NHWC port of that checkpoint layout (Xie & Tu, ICCV 2015 for the
architecture).  Weights are user-supplied under `models/Annotators/`.

Layout (state-dict keys under ``netNetwork.``):

  norm                     (1,3,1,1) learned per-channel input shift
  block1..block5           VGG16-style double/triple 3x3 conv stacks
                           (64,128,256,512,512 ch; maxpool /2 before 2..5)
  blockN.projection        1x1 conv → 1-channel side edge map per scale

Forward: 5 side maps at strides 1,2,4,8,16 → bilinear-resize to input size
→ mean → sigmoid.  The scribble variant then non-maximum-suppresses and
binarizes (the extension's `nms` + threshold post-pass).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_BLOCK_CONVS = {"block1": 2, "block2": 2, "block3": 3, "block4": 3,
                "block5": 3}


def _conv(x, p, stride=1):
    w = p["weight"]
    kh = w.shape[0]
    pad = kh // 2
    out = jax.lax.conv_general_dilated(
        x, w, (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out + p["bias"]


def _max_pool(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


def apply(params: dict, x: jnp.ndarray) -> list:
    """x: (N,H,W,3) float RGB in 0..255 (the annotator feeds raw pixels).
    Returns the 5 pre-sigmoid side maps, (N,h_i,w_i,1) each."""
    h = x - params["norm"].reshape(1, 1, 1, -1)
    sides = []
    for name, n_convs in _BLOCK_CONVS.items():
        blk = params[name]
        if name != "block1":
            h = _max_pool(h)
        for i in range(n_convs):
            h = jax.nn.relu(_conv(h, blk["convs"][i]))
        sides.append(_conv(h, blk["projection"]))
    return sides


def convert_hed(sd: dict) -> dict:
    """Raw torch state dict (ControlNetHED layout) → param tree, conv
    weights OIHW → HWIO."""
    params: dict = {}
    for k, v in sd.items():
        k = k.removeprefix("netNetwork.")
        v = np.asarray(v)
        if k == "norm":
            params["norm"] = v.reshape(-1)
            continue
        if k.endswith(".weight") and v.ndim == 4:
            v = np.ascontiguousarray(v.transpose(2, 3, 1, 0))
        parts = k.split(".")          # blockN . convs . i . weight
        node = params
        for p in parts[:-1]:
            node = node.setdefault(int(p) if p.isdigit() else p, {})
        node[parts[-1]] = v
    return params


def estimate(params: dict, image_u8: np.ndarray) -> np.ndarray:
    """uint8 RGB (H,W,3) → float edge map (H,W) in 0..1 (post-sigmoid mean
    of the five resized side maps, the extension's exact reduction)."""
    h, w = image_u8.shape[:2]
    x = jnp.asarray(image_u8, jnp.float32)[None]
    sides = apply(params, x)
    maps = [jax.image.resize(s[0, :, :, 0], (h, w), "bilinear")
            for s in sides]
    edge = jax.nn.sigmoid(jnp.mean(jnp.stack(maps), axis=0))
    return np.asarray(edge)


def safe_step(x: np.ndarray, step: int = 2) -> np.ndarray:
    """The extension's quantizing "safe" post-pass (annotator/util.py)."""
    y = x.astype(np.float32) * float(step + 1)
    y = y.astype(np.int32).astype(np.float32) / float(step)
    return y


def nms(x: np.ndarray, threshold: float, sigma: float) -> np.ndarray:
    """Directional non-maximum suppression (the extension's `nms`): keep
    pixels that are maxima of a 3-px line dilation in any of 4 orientations,
    then binarize at `threshold`.  uint8/float (H,W) in 0..255 → uint8."""
    import cv2
    x = cv2.GaussianBlur(x.astype(np.float32), (0, 0), sigma)
    kernels = [
        np.array([[0, 0, 0], [1, 1, 1], [0, 0, 0]], np.uint8),
        np.array([[0, 1, 0], [0, 1, 0], [0, 1, 0]], np.uint8),
        np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1]], np.uint8),
        np.array([[0, 0, 1], [0, 1, 0], [1, 0, 0]], np.uint8),
    ]
    y = np.zeros_like(x)
    for f in kernels:
        np.putmask(y, cv2.dilate(x, kernel=f) == x, x)
    z = np.zeros_like(y, dtype=np.uint8)
    z[y > threshold] = 255
    return z
