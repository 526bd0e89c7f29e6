"""RetinaFace: torch-twin forward parity (ResNet50+FPN+SSH at reduced
width), anchor decode/NMS units, and detector → face-restore integration."""

import pytest

pytestmark = pytest.mark.slow  # heavyweight: excluded from `-m 'not slow'` quick runs

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from sdwebui_tpu.models import retinaface as rf  # noqa: E402


def lrelu_for(c):
    return nn.LeakyReLU(0.1) if c <= 64 else nn.LeakyReLU(0.0)


def conv_bn(cin, cout, k, stride=1, pad=0, act=True):
    mods = [nn.Conv2d(cin, cout, k, stride, pad, bias=False),
            nn.BatchNorm2d(cout)]
    if act:
        mods.append(lrelu_for(cout))
    return nn.Sequential(*mods)


class TBottleneck(nn.Module):
    def __init__(self, cin, mid, cout, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, mid, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(mid)
        self.conv2 = nn.Conv2d(mid, mid, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(mid)
        self.conv3 = nn.Conv2d(mid, cout, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(cout)
        if cin != cout or stride != 1:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride, bias=False),
                nn.BatchNorm2d(cout))

    def forward(self, x):
        out = F.relu(self.bn1(self.conv1(x)))
        out = F.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if hasattr(self, "downsample"):
            x = self.downsample(x)
        return F.relu(x + out)


class TSSH(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv3X3 = conv_bn(c, c // 2, 3, pad=1, act=False)
        self.conv5X5_1 = conv_bn(c, c // 4, 3, pad=1)
        self.conv5X5_2 = conv_bn(c // 4, c // 4, 3, pad=1, act=False)
        self.conv7X7_2 = conv_bn(c // 4, c // 4, 3, pad=1)
        self.conv7x7_3 = conv_bn(c // 4, c // 4, 3, pad=1, act=False)

    def forward(self, x):
        c3 = self.conv3X3(x)
        c5_1 = self.conv5X5_1(x)
        c5 = self.conv5X5_2(c5_1)
        c7 = self.conv7x7_3(self.conv7X7_2(c5_1))
        return F.relu(torch.cat([c3, c5, c7], dim=1))


class TRetina(nn.Module):
    def __init__(self, wm=0.25):
        super().__init__()
        ch = lambda c: max(int(c * wm), 4)
        body = nn.Module()
        body.conv1 = nn.Conv2d(3, ch(64), 7, 2, 3, bias=False)
        body.bn1 = nn.BatchNorm2d(ch(64))
        cin = ch(64)
        for li, (n, mid) in enumerate(zip((3, 4, 6, 3), (64, 128, 256, 512)),
                                      start=1):
            blocks = nn.ModuleList()
            cout = ch(mid * 4)
            for b in range(n):
                blocks.append(TBottleneck(cin if b == 0 else cout, ch(mid),
                                          cout, stride=2 if (b == 0 and li > 1) else 1))
                # torchvision names blocks layerN.{i}; ModuleList matches
            setattr(body, f"layer{li}", blocks)
            cin = cout
        self.body = body
        fc = ch(256)
        fpn = nn.Module()
        fpn.output1 = conv_bn(ch(512), fc, 1)
        fpn.output2 = conv_bn(ch(1024), fc, 1)
        fpn.output3 = conv_bn(ch(2048), fc, 1)
        fpn.merge1 = conv_bn(fc, fc, 3, pad=1)
        fpn.merge2 = conv_bn(fc, fc, 3, pad=1)
        self.fpn = fpn
        self.ssh1, self.ssh2, self.ssh3 = TSSH(fc), TSSH(fc), TSSH(fc)

        def heads(n_out):
            return nn.ModuleList([
                nn.Module() for _ in range(3)])

        for name, n_out in (("ClassHead", 2), ("BboxHead", 4),
                            ("LandmarkHead", 10)):
            hl = nn.ModuleList()
            for _ in range(3):
                m = nn.Module()
                m.conv1x1 = nn.Conv2d(fc, 2 * n_out, 1)
                hl.append(m)
            setattr(self, name, hl)
        self.fc = fc

    def forward(self, x):
        body = self.body
        x = F.relu(body.bn1(body.conv1(x)))
        x = F.max_pool2d(x, 3, 2, 1)
        taps = []
        for li in range(1, 5):
            for blk in getattr(body, f"layer{li}"):
                x = blk(x)
            if li >= 2:
                taps.append(x)
        f1, f2, f3 = taps
        out1 = self.fpn.output1(f1)
        out2 = self.fpn.output2(f2)
        out3 = self.fpn.output3(f3)
        out2 = self.fpn.merge2(out2 + F.interpolate(
            out3, size=out2.shape[2:], mode="nearest"))
        out1 = self.fpn.merge1(out1 + F.interpolate(
            out2, size=out1.shape[2:], mode="nearest"))
        feats = [self.ssh1(out1), self.ssh2(out2), self.ssh3(out3)]
        locs, confs, landms = [], [], []
        for i, f in enumerate(feats):
            b = f.shape[0]
            locs.append(self.BboxHead[i].conv1x1(f)
                        .permute(0, 2, 3, 1).reshape(b, -1, 4))
            confs.append(self.ClassHead[i].conv1x1(f)
                         .permute(0, 2, 3, 1).reshape(b, -1, 2))
            landms.append(self.LandmarkHead[i].conv1x1(f)
                          .permute(0, 2, 3, 1).reshape(b, -1, 10))
        return (torch.cat(locs, 1)[0], torch.cat(confs, 1)[0].softmax(-1),
                torch.cat(landms, 1)[0])


def test_retinaface_forward_parity():
    torch.manual_seed(0)
    m = TRetina(0.25).eval()
    # randomize BN stats so folding is actually exercised
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, nn.BatchNorm2d):
                mod.running_mean.normal_(0, 0.3)
                mod.running_var.uniform_(0.5, 1.5)
    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    tree = rf.convert_retinaface(sd)

    x = np.random.RandomState(0).rand(1, 64, 64, 3).astype(np.float32) * 255
    # the jax side subtracts BGR means internally; feed the twin the same
    xt = torch.from_numpy(x[..., ::-1].copy() - rf.MEAN_BGR) \
        .permute(0, 3, 1, 2).float()
    with torch.no_grad():
        loc_r, conf_r, landm_r = m(xt)
    loc, conf, landm = rf.apply(tree, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(loc), loc_r.numpy(),
                               rtol=1e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(conf), conf_r.numpy(),
                               rtol=1e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(landm), landm_r.numpy(),
                               rtol=1e-3, atol=2e-4)
    # anchor count = Σ ceil(H/step)·ceil(W/step)·2
    n = sum(int(np.ceil(64 / s)) ** 2 * 2 for s in rf.STEPS)
    assert loc.shape == (n, 4)
    assert rf.priors(64, 64).shape == (n, 4)


def test_decode_and_nms():
    pri = np.array([[0.5, 0.5, 0.2, 0.2], [0.25, 0.25, 0.1, 0.1]], np.float32)
    loc = np.zeros((2, 4), np.float32)
    boxes = rf.decode_boxes(loc, pri)
    np.testing.assert_allclose(boxes[0], [0.4, 0.4, 0.6, 0.6], atol=1e-6)
    # exp scaling
    loc2 = np.array([[0, 0, np.log(2.0) / rf.VARIANCES[1], 0]], np.float32)
    b2 = rf.decode_boxes(loc2, pri[:1])
    np.testing.assert_allclose(b2[0, 2] - b2[0, 0], 0.4, atol=1e-5)
    # landmarks land on prior center at zero offsets
    lm = rf.decode_landms(np.zeros((1, 10), np.float32), pri[:1])
    np.testing.assert_allclose(lm[0], np.tile([0.5, 0.5], (5, 1)), atol=1e-6)
    # NMS drops the overlapping lower-score box, keeps the distant one
    bxs = np.array([[0, 0, 10, 10], [1, 1, 10.5, 10.5], [20, 20, 30, 30]],
                   np.float32)
    keep = rf.nms(bxs, np.array([0.9, 0.8, 0.7], np.float32), 0.4)
    assert keep == [0, 2]


def test_detector_plugs_into_face_restore(tmp_path):
    import sys
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    from test_gfpgan import CFG, TGFPGAN, _twin_state_dict

    from sdwebui_tpu.loader.safetensors_io import write_safetensors
    from sdwebui_tpu.postprocessing import faces

    torch.manual_seed(2)
    m = TRetina(0.25).eval()
    # bias the class head toward "face" so random weights produce detections
    with torch.no_grad():
        for h in m.ClassHead:
            h.conv1x1.bias.zero_()
            h.conv1x1.bias[1::2] = 4.0
    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    write_safetensors(str(tmp_path / "detection_Resnet50_Final.safetensors"),
                      sd)

    gm = TGFPGAN(CFG).eval()
    gsd = {"params_ema." + k: v for k, v in _twin_state_dict(gm).items()}
    d = tmp_path / "GFPGAN"
    d.mkdir()
    write_safetensors(str(d / "GFPGANv1.4.safetensors"), gsd)
    faces.set_model_dirs("GFPGAN", [str(d)])
    try:
        from sdwebui_tpu.models.retinaface import install_detector

        det = install_detector(str(tmp_path / "detection_Resnet50_Final.safetensors"))
        from PIL import Image

        img = Image.fromarray((np.random.RandomState(1).rand(64, 64, 3) * 255)
                              .astype(np.uint8))
        found = det(img)
        assert len(found) >= 1            # biased head → detections exist
        out = faces.restore_faces(img, "GFPGAN")
        assert out.size == img.size
    finally:
        faces.set_face_detector(None)
        faces.set_model_dirs("GFPGAN", ["models/GFPGAN"])
