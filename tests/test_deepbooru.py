"""DeepDanbooru ResNet: wiring parity vs a torch twin, full-plan shapes."""

import pytest

pytestmark = pytest.mark.slow  # heavyweight: excluded from `-m 'not slow'` quick runs

import numpy as np
import jax.numpy as jnp
import pytest

from sdwebui_tpu.models import deepbooru as db

TINY_PLAN = [
    ("stage", 2, 4, 16, 1),
    ("stage", 2, 8, 32, 2),
    ("mid_down", 8, 32, 2),
    ("blocks", 1, 8, 32),
]


def _tiny_sd(n_tags=5, seed=0):
    """torch-layout state dict for TINY_PLAN."""
    rng = np.random.default_rng(seed)
    sd = {}

    def conv(i, cin, cout, k, bias=True):
        sd[f"n_Conv_{i}.weight"] = (rng.standard_normal((cout, cin, k, k))
                                    * 0.1).astype(np.float32)
        if bias:
            sd[f"n_Conv_{i}.bias"] = (rng.standard_normal(cout)
                                      * 0.05).astype(np.float32)

    conv(0, 3, 4, 7)
    i, c = 1, 4
    for item in TINY_PLAN:
        if item[0] == "stage":
            _, n, mid, out, stride = item
            conv(i, c, out, 1)
            conv(i + 1, c, mid, 1); conv(i + 2, mid, mid, 3); conv(i + 3, mid, out, 1)
            i += 4
            for _ in range(n - 1):
                conv(i, out, mid, 1); conv(i + 1, mid, mid, 3); conv(i + 2, mid, out, 1)
                i += 3
            c = out
        elif item[0] == "mid_down":
            _, mid, out, stride = item
            conv(i, c, mid, 1); conv(i + 1, mid, mid, 3); conv(i + 2, mid, out, 1)
            conv(i + 3, c, out, 1)
            i += 4
            c = out
        else:
            _, n, mid, out = item
            for _ in range(n):
                conv(i, out, mid, 1); conv(i + 1, mid, mid, 3); conv(i + 2, mid, out, 1)
                i += 3
    conv(i, c, n_tags, 1, bias=False)
    # stem width differs from the real model — pass plan to skip that assert
    return sd


def _torch_forward(sd, x_nhwc, plan):
    """Independent torch implementation of the same wiring."""
    import torch
    import torch.nn.functional as F

    t = {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}

    def conv(i, x, stride=1, pad=None):
        if pad is not None:
            x = F.pad(x, pad)
        return F.conv2d(x, t[f"n_Conv_{i}.weight"],
                        t.get(f"n_Conv_{i}.bias"), stride=stride)

    def triplet(i, x, stride):
        h = F.relu(conv(i, x))
        pad = (0, 1, 0, 1) if stride == 2 else (1, 1, 1, 1)
        h = F.relu(conv(i + 1, h, stride=stride, pad=pad))
        return conv(i + 2, h)

    x = torch.from_numpy(x_nhwc).permute(0, 3, 1, 2)
    h = F.relu(conv(0, x, stride=2, pad=(2, 3, 2, 3)))
    h = F.max_pool2d(F.pad(h, (0, 1, 0, 1), value=float("-inf")), 3, 2)
    i = 1
    for item in plan:
        if item[0] == "stage":
            _, n, mid, out, stride = item
            sc = conv(i, h, stride=stride)
            h = F.relu(triplet(i + 1, h, stride) + sc)
            i += 4
            n -= 1
        elif item[0] == "mid_down":
            _, mid, out, stride = item
            body = triplet(i, h, stride)
            h = F.relu(body + conv(i + 3, h, stride=stride))
            i += 4
            n = 0
        else:
            _, n, mid, out = item
        for _ in range(n):
            h = F.relu(triplet(i, h, 1) + h)
            i += 3
    logits = conv(i, h)
    return torch.sigmoid(logits.mean(dim=(2, 3))).numpy()


def test_wiring_parity_with_torch_twin():
    sd = _tiny_sd()
    params, _ = db.convert_deepbooru(sd, plan=TINY_PLAN)
    x = np.random.default_rng(1).random((2, 64, 64, 3)).astype(np.float32)
    want = _torch_forward(sd, x, TINY_PLAN)
    got = np.asarray(db.apply(params, jnp.asarray(x), plan=TINY_PLAN))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-4)


def test_full_plan_shapes():
    """Full 179-conv plan: random weights, convert + forward once."""
    rng = np.random.default_rng(2)
    sd = {}

    def conv(i, cin, cout, k, bias=True):
        sd[f"n_Conv_{i}.weight"] = np.zeros((cout, cin, k, k), np.float32)
        if bias:
            sd[f"n_Conv_{i}.bias"] = np.zeros(cout, np.float32)

    conv(0, 3, 64, 7)
    i, c = 1, 64
    for item in db._PLAN:
        if item[0] == "stage":
            _, n, mid, out, stride = item
            conv(i, c, out, 1)
            conv(i + 1, c, mid, 1); conv(i + 2, mid, mid, 3); conv(i + 3, mid, out, 1)
            i += 4
            for _ in range(n - 1):
                conv(i, out, mid, 1); conv(i + 1, mid, mid, 3); conv(i + 2, mid, out, 1)
                i += 3
            c = out
        elif item[0] == "mid_down":
            _, mid, out, stride = item
            conv(i, c, mid, 1); conv(i + 1, mid, mid, 3); conv(i + 2, mid, out, 1)
            conv(i + 3, c, out, 1)
            i += 4
        else:
            _, n, mid, out = item
            for _ in range(n):
                conv(i, out, mid, 1); conv(i + 1, mid, mid, 3); conv(i + 2, mid, out, 1)
                i += 3
    conv(i, c, 9176, 1, bias=False)
    assert i == 178   # matches the reference's n_Conv_178 head
    params, _ = db.convert_deepbooru(sd)
    out = db.apply(params, jnp.zeros((1, 128, 128, 3)))
    assert out.shape == (1, 9176)


def test_tag_image_threshold():
    sd = _tiny_sd()
    params, _ = db.convert_deepbooru(sd, plan=TINY_PLAN)
    from PIL import Image

    img = Image.new("RGB", (40, 40), (120, 60, 90))
    import unittest.mock as mock

    with mock.patch.object(db, "apply",
                           lambda p, a, plan=None: jnp.asarray([[0.9, 0.2, 0.8, 0.6, 0.1]])):
        out = db.tag_image(params, ["tag_a", "rating:safe", "tag(c)", "tag_d", "e"],
                           img, threshold=0.5)
    assert out == "tag a, tag\\(c\\), tag d"   # sorted by prob, rating dropped


def test_tags_survive_restricted_loader(tmp_path):
    import torch

    from sdwebui_tpu.loader.torch_ckpt import load_torch_checkpoint

    sd = {"n_Conv_0.weight": torch.zeros(2, 3, 1, 1),
          "tags": ["a", "b", "c"]}
    p = str(tmp_path / "m.pt")
    torch.save(sd, p)
    out = load_torch_checkpoint(p)
    assert out["tags"] == ["a", "b", "c"]
    assert out["n_Conv_0.weight"].shape == (2, 3, 1, 1)


def test_tag_image_filter_and_ranks():
    """deepbooru_filter_tags exclusion + interrogate_return_ranks formatting
    (reference deepbooru.py tag_multi)."""
    sd = _tiny_sd()
    params, _ = db.convert_deepbooru(sd, plan=TINY_PLAN)
    from PIL import Image

    img = Image.new("RGB", (40, 40), (120, 60, 90))
    import unittest.mock as mock

    with mock.patch.object(db, "apply",
                           lambda p, a, plan=None: jnp.asarray([[0.9, 0.2, 0.8, 0.6, 0.1]])):
        out = db.tag_image(params, ["tag_a", "rating:safe", "tag(c)", "tag_d", "e"],
                           img, threshold=0.5, filter_tags="tag(c), nothing")
        assert out == "tag a, tag d"
        ranked = db.tag_image(params, ["tag_a", "rating:safe", "tag(c)", "tag_d", "e"],
                              img, threshold=0.5, include_ranks=True,
                              use_escape=False)
        assert ranked == "(tag a:0.900), (tag(c):0.800), (tag d:0.600)"
