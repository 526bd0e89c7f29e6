"""RetinaFace face detector (ResNet50 + FPN + SSH) — NHWC JAX port.

The reference detects faces through facexlib's RetinaFace
(modules/face_restoration_utils.py via gfpgan/codeformer helpers; arch =
the public Pytorch_Retinaface ResNet50 config: torchvision-style ResNet50
trunk (layer2/3/4 taps), 3-level FPN at 256ch, SSH context modules, and
2-anchor class/bbox/5-landmark heads; anchors with min_sizes
[[16,32],[64,128],[256,512]], steps [8,16,32], variances [0.1,0.2]).

Param tree mirrors the facexlib checkpoint (`detection_Resnet50_Final.pth`):

    body.conv1/bn1, body.layer{1..4}.{i}.conv{1,2,3}/bn{1,2,3}(+downsample)
    fpn.output{1,2,3}.{0,1}, fpn.merge{1,2}.{0,1}
    ssh{1,2,3}.conv3X3.{0,1}, .conv5X5_{1,2}.*, .conv7X7_2.*, .conv7x7_3.*
    ClassHead.{i}.conv1x1, BboxHead.{i}.conv1x1, LandmarkHead.{i}.conv1x1

BatchNorms run in inference form (folded running stats).  The detector
plugs into postprocessing/faces.py (`install_detector`) to complete the
restore-faces pipeline: detect 5 landmarks → umeyama align → GFPGAN /
CodeFormer → paste back.  Weights are user-supplied (zero-egress image).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

MEAN_BGR = np.asarray([104.0, 117.0, 123.0], np.float32)
MIN_SIZES = ((16, 32), (64, 128), (256, 512))
STEPS = (8, 16, 32)
VARIANCES = (0.1, 0.2)
RESNET50_LAYERS = (3, 4, 6, 3)


def _conv(p, x, stride=1, pad=0):
    if pad:
        x = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    out = jax.lax.conv_general_dilated(
        x, p["weight"].astype(x.dtype), (stride, stride), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if "bias" in p:
        out = out + p["bias"].astype(x.dtype)
    return out


def _bn(p, x, eps=1e-5):
    scale = p["weight"] / np.sqrt(p["running_var"] + eps)
    return x * scale.astype(x.dtype) \
        + (p["bias"] - p["running_mean"] * scale).astype(x.dtype)


def _conv_bn(p, x, stride=1, pad=0, act="relu"):
    x = _bn(p["1"], _conv(p["0"], x, stride=stride, pad=pad))
    if act == "lrelu":
        # Pytorch_Retinaface conv_bn: LeakyReLU(0.1) when ≤64 out channels
        slope = 0.1 if x.shape[-1] <= 64 else 0.0
        return jnp.where(x >= 0, x, x * slope)
    if act == "relu":
        return jax.nn.relu(x)
    return x


def _bottleneck(p, x, stride=1):
    out = jax.nn.relu(_bn(p["bn1"], _conv(p["conv1"], x)))
    out = jax.nn.relu(_bn(p["bn2"], _conv(p["conv2"], out, stride=stride,
                                          pad=1)))
    out = _bn(p["bn3"], _conv(p["conv3"], out))
    if "downsample" in p:
        x = _bn(p["downsample"]["1"], _conv(p["downsample"]["0"], x,
                                            stride=stride))
    return jax.nn.relu(x + out)


def _resnet50_taps(p, x):
    """→ (layer2, layer3, layer4) feature maps."""
    x = jax.nn.relu(_bn(p["bn1"], _conv(p["conv1"], x, stride=2, pad=3)))
    # maxpool 3x3/2 pad 1
    x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                constant_values=-np.inf)
    x = jax.lax.reduce_window(x, -np.inf, jax.lax.max, (1, 3, 3, 1),
                              (1, 2, 2, 1), "VALID")
    taps = []
    for li, n_blocks in enumerate(RESNET50_LAYERS, start=1):
        lp = p[f"layer{li}"]
        for b in range(n_blocks):
            x = _bottleneck(lp[str(b)], x, stride=2 if (b == 0 and li > 1) else 1)
        if li >= 2:
            taps.append(x)
    return taps


def _ssh(p, x):
    c3 = _conv_bn(p["conv3X3"], x, pad=1, act=None)
    c5_1 = _conv_bn(p["conv5X5_1"], x, pad=1, act="lrelu")
    c5 = _conv_bn(p["conv5X5_2"], c5_1, pad=1, act=None)
    c7_2 = _conv_bn(p["conv7X7_2"], c5_1, pad=1, act="lrelu")
    c7 = _conv_bn(p["conv7x7_3"], c7_2, pad=1, act=None)
    return jax.nn.relu(jnp.concatenate([c3, c5, c7], axis=-1))


def _upsample_to(x, h, w):
    return jax.image.resize(x, (x.shape[0], h, w, x.shape[3]), "nearest")


def apply(params, x):
    """x: (1,H,W,3) RGB float [0,255] → (loc (N,4), conf (N,2), landm (N,10))
    raw head outputs over the anchor grid (priors/decode below)."""
    bgr = x[..., ::-1] - jnp.asarray(MEAN_BGR)
    f1, f2, f3 = _resnet50_taps(params["body"], bgr)
    out1 = _conv_bn(params["fpn"]["output1"], f1, act="lrelu")
    out2 = _conv_bn(params["fpn"]["output2"], f2, act="lrelu")
    out3 = _conv_bn(params["fpn"]["output3"], f3, act="lrelu")
    out2 = out2 + _upsample_to(out3, out2.shape[1], out2.shape[2])
    out2 = _conv_bn(params["fpn"]["merge2"], out2, pad=1, act="lrelu")
    out1 = out1 + _upsample_to(out2, out1.shape[1], out1.shape[2])
    out1 = _conv_bn(params["fpn"]["merge1"], out1, pad=1, act="lrelu")
    feats = [_ssh(params["ssh1"], out1), _ssh(params["ssh2"], out2),
             _ssh(params["ssh3"], out3)]

    locs, confs, landms = [], [], []
    for i, f in enumerate(feats):
        b = f.shape[0]
        locs.append(_conv(params["BboxHead"][str(i)]["conv1x1"], f)
                    .reshape(b, -1, 4))
        confs.append(_conv(params["ClassHead"][str(i)]["conv1x1"], f)
                     .reshape(b, -1, 2))
        landms.append(_conv(params["LandmarkHead"][str(i)]["conv1x1"], f)
                      .reshape(b, -1, 10))
    return (jnp.concatenate(locs, axis=1)[0],
            jax.nn.softmax(jnp.concatenate(confs, axis=1)[0], axis=-1),
            jnp.concatenate(landms, axis=1)[0])


# --------------------------------------------------------------------------
# anchors / decode / nms (pure numpy)
# --------------------------------------------------------------------------

def priors(height: int, width: int) -> np.ndarray:
    """(N,4) anchor boxes (cx,cy,w,h) normalized to [0,1]."""
    out = []
    for sizes, step in zip(MIN_SIZES, STEPS):
        fh = int(np.ceil(height / step))
        fw = int(np.ceil(width / step))
        for i in range(fh):
            for j in range(fw):
                for m in sizes:
                    out.append([(j + 0.5) * step / width,
                                (i + 0.5) * step / height,
                                m / width, m / height])
    return np.asarray(out, np.float32)


def decode_boxes(loc: np.ndarray, pri: np.ndarray) -> np.ndarray:
    """→ (N,4) corner boxes, normalized."""
    cxcy = pri[:, :2] + loc[:, :2] * VARIANCES[0] * pri[:, 2:]
    wh = pri[:, 2:] * np.exp(loc[:, 2:] * VARIANCES[1])
    return np.concatenate([cxcy - wh / 2, cxcy + wh / 2], axis=1)


def decode_landms(landm: np.ndarray, pri: np.ndarray) -> np.ndarray:
    """→ (N,5,2) landmark points, normalized."""
    pts = landm.reshape(-1, 5, 2)
    return pri[:, None, :2] + pts * VARIANCES[0] * pri[:, None, 2:]


def nms(boxes: np.ndarray, scores: np.ndarray, thresh: float = 0.4):
    order = scores.argsort()[::-1]
    keep = []
    areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    while order.size:
        i = order[0]
        keep.append(int(i))
        if order.size == 1:
            break
        rest = order[1:]
        xx1 = np.maximum(boxes[i, 0], boxes[rest, 0])
        yy1 = np.maximum(boxes[i, 1], boxes[rest, 1])
        xx2 = np.minimum(boxes[i, 2], boxes[rest, 2])
        yy2 = np.minimum(boxes[i, 3], boxes[rest, 3])
        inter = np.maximum(xx2 - xx1, 0) * np.maximum(yy2 - yy1, 0)
        iou = inter / (areas[i] + areas[rest] - inter + 1e-9)
        order = rest[iou <= thresh]
    return keep


def detect_faces(params, image, conf_threshold: float = 0.8,
                 nms_threshold: float = 0.4):
    """PIL/array RGB image → list of ((5,2) landmarks, score, box), the
    contract postprocessing/faces.py consumes."""
    arr = np.asarray(image, np.float32)
    if arr.max() <= 1.0:
        arr = arr * 255.0
    h, w = arr.shape[:2]
    loc, conf, landm = apply(params, jnp.asarray(arr[None]))
    loc, conf, landm = map(np.asarray, (loc, conf, landm))
    pri = priors(h, w)
    scores = conf[:, 1]
    mask = scores > conf_threshold
    if not mask.any():
        return []
    boxes = decode_boxes(loc[mask], pri[mask]) * [w, h, w, h]
    pts = decode_landms(landm[mask], pri[mask]) * [w, h]
    scores = scores[mask]
    keep = nms(boxes, scores, nms_threshold)
    return [(pts[i], float(scores[i]), boxes[i]) for i in keep]


# --------------------------------------------------------------------------
# loading / init
# --------------------------------------------------------------------------

def convert_retinaface(sd: dict):
    from sdwebui_tpu.utils.pytree import unflatten

    flat = {}
    for k, v in sd.items():
        if k.endswith("num_batches_tracked"):
            continue
        arr = np.ascontiguousarray(v)
        if k.endswith(".weight") and arr.ndim == 4:
            arr = np.ascontiguousarray(np.transpose(arr, (2, 3, 1, 0)))
        flat[k] = arr
    return unflatten(flat)


def load_retinaface(path: str):
    from sdwebui_tpu.loader.load import read_checkpoint

    return convert_retinaface(read_checkpoint(path))


def install_detector(path: str):
    """Load weights and plug the detector into postprocessing/faces.py."""
    from sdwebui_tpu.postprocessing import faces

    params = load_retinaface(path)

    def detector(image):
        return [lm for lm, _score, _box in detect_faces(params, image)]

    faces.set_face_detector(detector)
    return detector


def init_params(seed: int = 0, width_mult: float = 0.25):
    """Random weights with the checkpoint layout. width_mult shrinks every
    channel count (tests use 0.125-width nets; real = 1.0)."""
    rng = np.random.RandomState(seed)
    f32 = np.float32

    def conv(cin, cout, k, bias=False):
        p = {"weight": (rng.randn(k, k, cin, cout) * 0.1).astype(f32)}
        if bias:
            p["bias"] = np.zeros(cout, f32)
        return p

    def bn(c):
        return {"weight": np.ones(c, f32), "bias": np.zeros(c, f32),
                "running_mean": np.zeros(c, f32),
                "running_var": np.ones(c, f32)}

    def cbn(cin, cout, k):
        return {"0": conv(cin, cout, k), "1": bn(cout)}

    def ch(c):
        return max(int(c * width_mult), 4)

    body = {"conv1": conv(3, ch(64), 7), "bn1": bn(ch(64))}
    cin = ch(64)
    for li, (n_blocks, mid) in enumerate(
            zip(RESNET50_LAYERS, (64, 128, 256, 512)), start=1):
        layer = {}
        cout = ch(mid * 4)
        for b in range(n_blocks):
            blk = {"conv1": conv(cin if b == 0 else cout, ch(mid), 1),
                   "bn1": bn(ch(mid)),
                   "conv2": conv(ch(mid), ch(mid), 3), "bn2": bn(ch(mid)),
                   "conv3": conv(ch(mid), cout, 1), "bn3": bn(cout)}
            if b == 0:
                blk["downsample"] = {"0": conv(cin, cout, 1), "1": bn(cout)}
            layer[str(b)] = blk
        body[f"layer{li}"] = layer
        cin = cout

    fc = ch(256)
    ins = (ch(512), ch(1024), ch(2048))
    fpn = {"output1": cbn(ins[0], fc, 1), "output2": cbn(ins[1], fc, 1),
           "output3": cbn(ins[2], fc, 1),
           "merge1": cbn(fc, fc, 3), "merge2": cbn(fc, fc, 3)}

    def ssh():
        return {"conv3X3": cbn(fc, fc // 2, 3),
                "conv5X5_1": cbn(fc, fc // 4, 3),
                "conv5X5_2": cbn(fc // 4, fc // 4, 3),
                "conv7X7_2": cbn(fc // 4, fc // 4, 3),
                "conv7x7_3": cbn(fc // 4, fc // 4, 3)}

    heads = lambda n_out: {str(i): {"conv1x1": conv(fc, 2 * n_out, 1,
                                                    bias=True)}
                           for i in range(3)}
    return {"body": body, "fpn": fpn,
            "ssh1": ssh(), "ssh2": ssh(), "ssh3": ssh(),
            "ClassHead": heads(2), "BboxHead": heads(4),
            "LandmarkHead": heads(10)}
