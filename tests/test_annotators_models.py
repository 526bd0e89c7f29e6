"""Model-based ControlNet annotators: HED + OpenPose torch-twin parity,
PAF pose assembly on synthetic fields, and weight discovery through the
annotator registry (torch-saved checkpoint end-to-end).

The annotator networks live in the sd-webui-controlnet extension (not the
reference repo), so the oracles are torch twins of the public layouts
(ControlNetHED_Apache2; CMU bodypose, Cao et al. CVPR 2017).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from sdwebui_tpu.models import hed as hed_model  # noqa: E402
from sdwebui_tpu.models import openpose as pose  # noqa: E402

torch.manual_seed(0)


# --------------------------------------------------------------------------
# HED
# --------------------------------------------------------------------------

class _DoubleConvBlock(nn.Module):
    def __init__(self, cin, cout, n):
        super().__init__()
        self.convs = nn.Sequential(*[
            nn.Conv2d(cin if i == 0 else cout, cout, 3, padding=1)
            for i in range(n)])
        self.projection = nn.Conv2d(cout, 1, 1)

    def forward(self, h, down=False):
        if down:
            h = F.max_pool2d(h, 2, 2)
        for c in self.convs:
            h = F.relu(c(h))
        return h, self.projection(h)


class _HedTwin(nn.Module):
    def __init__(self, widths=(8, 12, 16, 16, 16)):
        super().__init__()
        self.norm = nn.Parameter(torch.randn(1, 3, 1, 1))
        counts = [2, 2, 3, 3, 3]
        cin = 3
        for i, (w, n) in enumerate(zip(widths, counts), start=1):
            setattr(self, f"block{i}", _DoubleConvBlock(cin, w, n))
            cin = w

    def forward(self, x):
        h = x - self.norm
        sides = []
        for i in range(1, 6):
            h, proj = getattr(self, f"block{i}")(h, down=(i > 1))
            sides.append(proj)
        return sides


def test_hed_twin_parity():
    twin = _HedTwin().eval()
    sd = {k: v.detach().numpy() for k, v in twin.state_dict().items()}
    params = hed_model.convert_hed(sd)
    x = np.random.RandomState(0).rand(1, 32, 48, 3).astype(np.float32) * 255
    with torch.no_grad():
        want = twin(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    got = hed_model.apply(params, jnp.asarray(x))
    assert len(got) == 5
    for g, w in zip(got, want):
        np.testing.assert_allclose(
            np.asarray(g)[0, :, :, 0], w.numpy()[0, 0], atol=2e-4)


def test_hed_estimate_and_posts():
    twin = _HedTwin().eval()
    sd = {k: v.detach().numpy() for k, v in twin.state_dict().items()}
    params = hed_model.convert_hed(sd)
    img = (np.random.RandomState(1).rand(40, 56, 3) * 255).astype(np.uint8)
    edge = hed_model.estimate(params, img)
    assert edge.shape == (40, 56) and 0 <= edge.min() and edge.max() <= 1
    stepped = hed_model.safe_step(edge)
    assert set(np.round(np.unique(stepped * 2)).astype(int)) <= {0, 1, 2, 3}
    binary = hed_model.nms((edge * 255).astype(np.uint8), 127, 3.0)
    assert set(np.unique(binary)) <= {0, 255}


# --------------------------------------------------------------------------
# OpenPose network
# --------------------------------------------------------------------------

class _PoseTwin(nn.Module):
    """Tiny-width bodypose with the shipped checkpoint's flat layer names."""

    def __init__(self, feat=8, paf_ch=6, heat_ch=7):
        super().__init__()
        specs = [
            ("conv1_1", 3, 8, 3), ("conv1_2", 8, 8, 3),
            ("conv2_1", 8, 8, 3), ("conv2_2", 8, 8, 3),
            ("conv3_1", 8, 12, 3), ("conv3_2", 12, 12, 3),
            ("conv3_3", 12, 12, 3), ("conv3_4", 12, 12, 3),
            ("conv4_1", 12, 16, 3), ("conv4_2", 16, 16, 3),
            ("conv4_3_CPM", 16, 12, 3), ("conv4_4_CPM", 12, feat, 3),
        ]
        for L, out in ((1, paf_ch), (2, heat_ch)):
            specs += [
                (f"conv5_1_CPM_L{L}", feat, 8, 3),
                (f"conv5_2_CPM_L{L}", 8, 8, 3), (f"conv5_3_CPM_L{L}", 8, 8, 3),
                (f"conv5_4_CPM_L{L}", 8, 16, 1),
                (f"conv5_5_CPM_L{L}", 16, out, 1)]
            for t in range(2, 7):
                cat = paf_ch + heat_ch + feat
                specs += [(f"Mconv1_stage{t}_L{L}", cat, 8, 7)]
                specs += [(f"Mconv{i}_stage{t}_L{L}", 8, 8, 7)
                          for i in range(2, 6)]
                specs += [(f"Mconv6_stage{t}_L{L}", 8, 8, 1),
                          (f"Mconv7_stage{t}_L{L}", 8, out, 1)]
        for name, cin, cout, k in specs:
            setattr(self, name, nn.Conv2d(cin, cout, k, padding=k // 2))
        self.paf_ch, self.heat_ch = paf_ch, heat_ch

    def forward(self, x):
        h = x
        for name in pose._BACKBONE:
            h = F.max_pool2d(h, 2, 2) if name == "pool" \
                else F.relu(getattr(self, name)(h))
        feat = h

        def branch(stage, L, inp):
            if stage == 1:
                for i in range(1, 4):
                    inp = F.relu(getattr(self, f"conv5_{i}_CPM_L{L}")(inp))
                inp = F.relu(getattr(self, f"conv5_4_CPM_L{L}")(inp))
                return getattr(self, f"conv5_5_CPM_L{L}")(inp)
            for i in range(1, 7):
                inp = F.relu(getattr(self, f"Mconv{i}_stage{stage}_L{L}")(inp))
            return getattr(self, f"Mconv7_stage{stage}_L{L}")(inp)

        paf, heat = branch(1, 1, feat), branch(1, 2, feat)
        for t in range(2, 7):
            inp = torch.cat([paf, heat, feat], dim=1)
            paf, heat = branch(t, 1, inp), branch(t, 2, inp)
        return paf, heat


def test_openpose_twin_parity():
    twin = _PoseTwin().eval()
    sd = {k: v.detach().numpy() for k, v in twin.state_dict().items()}
    params = pose.convert_openpose(sd)
    x = np.random.RandomState(2).rand(1, 32, 40, 3).astype(np.float32) - 0.5
    with torch.no_grad():
        want_paf, want_heat = twin(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    got_paf, got_heat = pose.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(got_paf)[0].transpose(2, 0, 1), want_paf.numpy()[0],
        atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(got_heat)[0].transpose(2, 0, 1), want_heat.numpy()[0],
        atol=2e-4)


def test_openpose_prefixed_keys_accepted():
    twin = _PoseTwin()
    sd = {("model0." if "CPM_L" not in k and "stage" not in k
           else "model9.") + k: v.detach().numpy()
          for k, v in twin.state_dict().items()}
    params = pose.convert_openpose(sd)
    assert "conv1_1" in params and params["conv1_1"]["weight"].ndim == 4


# --------------------------------------------------------------------------
# PAF decoding on synthetic fields
# --------------------------------------------------------------------------

def _blob(canvas, x, y, r=3):
    canvas[y - r:y + r + 1, x - r:x + r + 1] = 1.0


def test_paf_assembly_synthetic_person():
    pytest.importorskip("scipy")
    h, w = 64, 96
    heat = np.zeros((h, w, 19), np.float64)
    paf = np.zeros((h, w, 38), np.float64)
    # joints 2,3,4,5 (1-indexed) on one row: a right arm chain
    joints = {2: (10, 20), 3: (34, 20), 4: (58, 20), 5: (82, 20)}
    for j, (x, y) in joints.items():
        _blob(heat[:, :, j - 1], x, y)
    # limbs [2,3],[3,4],[4,5] are k=0,2,3 → paf x-channels 12,14,16
    for k in (0, 2, 3):
        paf[:, :, pose.MAP_IDX[k][0] - 19] = 1.0   # +x direction everywhere
    peaks = pose._find_peaks(heat)
    assert [len(p) for p in peaks[:5]] == [0, 1, 1, 1, 1]
    conns, special = pose._match_limbs(paf, peaks, h)
    assert len(conns[0]) == 1 and len(conns[2]) == 1 and len(conns[3]) == 1
    candidate, subset = pose._assemble(peaks, conns, special)
    assert len(subset) == 1
    assert int(subset[0][-1]) == 4            # 4 parts found
    # joints 2..5 occupy subset slots 1..4 (0-indexed part ids 1..4)
    for j, (x, y) in joints.items():
        cid = int(subset[0][j - 1])
        assert cid >= 0 and tuple(candidate[cid][:2]) == (x, y)


def test_draw_bodypose_renders():
    candidate = np.array([
        [10, 20, 1.0, 0], [34, 20, 1.0, 1], [58, 20, 1.0, 2]], np.float64)
    subset = -1 * np.ones((1, 20))
    subset[0, 1], subset[0, 2], subset[0, 3] = 0, 1, 2   # joints 2,3,4
    subset[0, -1], subset[0, -2] = 3, 3.0
    canvas = pose.draw_bodypose(64, 96, candidate, subset)
    assert canvas.shape == (64, 96, 3) and canvas.sum() > 0
    # limb 2-3 midpoint is colored
    assert canvas[20, 22].sum() > 0


# --------------------------------------------------------------------------
# registry + weight discovery (torch-saved checkpoint end-to-end)
# --------------------------------------------------------------------------

def test_annotator_registry_lists_model_modules():
    from sdwebui_tpu.pipeline import annotators
    for m in ("hed", "scribble_hed", "depth_midas", "openpose"):
        assert m in annotators.list_modules()


def test_hed_via_registry_from_saved_checkpoint(tmp_path, monkeypatch):
    from sdwebui_tpu.pipeline import annotators
    twin = _HedTwin().eval()
    wdir = tmp_path / "Annotators"
    wdir.mkdir()
    torch.save({"netNetwork." + k: v for k, v in twin.state_dict().items()},
               wdir / "ControlNetHED.pth")
    monkeypatch.setattr(annotators, "_model_dirs", [str(wdir)])
    monkeypatch.setattr(annotators, "_loaded", {})
    img = (np.random.RandomState(3).rand(64, 64, 3) * 255).astype(np.uint8)
    out = annotators.run_annotator("hed", img, res=0)
    assert out.shape == (64, 64) and out.dtype == np.uint8
    scrib = annotators.run_annotator("scribble_hed", img, res=0)
    assert set(np.unique(scrib)) <= {0, 255}


def test_missing_weights_raise_actionable_error(tmp_path, monkeypatch):
    from sdwebui_tpu.pipeline import annotators
    monkeypatch.setattr(annotators, "_model_dirs", [str(tmp_path)])
    monkeypatch.setattr(annotators, "_loaded", {})
    img = np.zeros((32, 32, 3), np.uint8)
    with pytest.raises(RuntimeError, match="openpose"):
        annotators.run_annotator("openpose", img, res=0)
