"""OpenPose body estimator — the `openpose` ControlNet annotator.

TPU-native NHWC port of the CMU two-branch body-pose CNN (Cao et al., CVPR
2017) in the checkpoint layout the reference ecosystem's sd-webui-controlnet
extension ships (`body_pose_model.pth`, flat layer-name keys like
``conv1_1.weight`` / ``Mconv7_stage6_L1.weight``).  Weights are
user-supplied under `models/Annotators/`.

  backbone  VGG19 conv1_1..conv4_2 + two CPM-specific convs → 128-ch
            feature map at stride 8
  stage 1   two 5-conv branches: L1 → 38-ch part-affinity fields (PAFs),
            L2 → 19-ch joint heatmaps (18 joints + background)
  stages 2-6  refinement branches over concat(PAF, heatmap, feature) with
            7x7 convs

Host-side postprocessing (pure numpy/scipy) follows the extension's
pipeline: gaussian-smoothed peak detection (thre1=0.1), greedy limb
matching by PAF line integrals over 10 midpoints (thre2=0.05, 80%
criterion, distance prior), person assembly, and the fixed-palette
stick-figure rendering the control models are trained on.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

N_JOINTS = 18        # + background channel in the heatmap
STRIDE = 8
BOXSIZE = 368
PAD_VALUE = 128
THRE1 = 0.1          # heatmap peak threshold
THRE2 = 0.05         # PAF midpoint score threshold

# limb k connects joints LIMB_SEQ[k] (1-indexed, the CMU convention);
# PAF channels for limb k are MAP_IDX[k] (x-component, y-component)
LIMB_SEQ = [
    [2, 3], [2, 6], [3, 4], [4, 5], [6, 7], [7, 8], [2, 9], [9, 10],
    [10, 11], [2, 12], [12, 13], [13, 14], [2, 1], [1, 15], [15, 17],
    [1, 16], [16, 18], [3, 17], [6, 18],
]
MAP_IDX = [
    [31, 32], [39, 40], [33, 34], [35, 36], [41, 42], [43, 44], [19, 20],
    [21, 22], [23, 24], [25, 26], [27, 28], [29, 30], [47, 48], [49, 50],
    [53, 54], [51, 52], [55, 56], [37, 38], [45, 46],
]
# joint/limb palette (the rendering the control models were trained against)
COLORS = [
    [255, 0, 0], [255, 85, 0], [255, 170, 0], [255, 255, 0], [170, 255, 0],
    [85, 255, 0], [0, 255, 0], [0, 255, 85], [0, 255, 170], [0, 255, 255],
    [0, 170, 255], [0, 85, 255], [0, 0, 255], [85, 0, 255], [170, 0, 255],
    [255, 0, 255], [255, 0, 170], [255, 0, 85],
]

_BACKBONE = [  # (name, relu) in order; "pool" entries are 2x2/2 maxpools
    "conv1_1", "conv1_2", "pool", "conv2_1", "conv2_2", "pool",
    "conv3_1", "conv3_2", "conv3_3", "conv3_4", "pool",
    "conv4_1", "conv4_2", "conv4_3_CPM", "conv4_4_CPM",
]


def _conv(x, p, relu=True):
    w = p["weight"]
    pad = w.shape[0] // 2
    out = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + p["bias"]
    return jax.nn.relu(out) if relu else out


def _max_pool(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


@functools.partial(jax.jit, static_argnames=())
def apply(params: dict, x: jnp.ndarray):
    """x: (N,H,W,3) float, BGR, normalized to [-0.5, 0.5) (im/256 - 0.5 —
    the extension's exact preprocessing).  H, W divisible by 8.
    Returns (paf (N,H/8,W/8,38), heatmap (N,H/8,W/8,19))."""
    h = x
    for name in _BACKBONE:
        h = _max_pool(h) if name == "pool" else _conv(h, params[name])
    feat = h

    def branch(stage: int, L: int, inp):
        if stage == 1:
            for i in range(1, 4):
                inp = _conv(inp, params[f"conv5_{i}_CPM_L{L}"])
            inp = _conv(inp, params[f"conv5_4_CPM_L{L}"])
            return _conv(inp, params[f"conv5_5_CPM_L{L}"], relu=False)
        for i in range(1, 7):
            inp = _conv(inp, params[f"Mconv{i}_stage{stage}_L{L}"])
        return _conv(inp, params[f"Mconv7_stage{stage}_L{L}"], relu=False)

    paf, heat = branch(1, 1, feat), branch(1, 2, feat)
    for stage in range(2, 7):
        inp = jnp.concatenate([paf, heat, feat], axis=-1)
        paf, heat = branch(stage, 1, inp), branch(stage, 2, inp)
    return paf, heat


def convert_openpose(sd: dict) -> dict:
    """Raw `body_pose_model.pth` state dict (flat layer-name keys) →
    {layer_name: {"weight","bias"}}, conv weights OIHW → HWIO.  Tolerates a
    `modelX.` prefix (keys as they appear on the module rather than in the
    shipped file)."""
    params: dict = {}
    for k, v in sd.items():
        parts = k.split(".")
        if parts[0].startswith("model") and len(parts) == 3:
            parts = parts[1:]
        name, leaf = parts
        v = np.asarray(v)
        if leaf == "weight" and v.ndim == 4:
            v = np.ascontiguousarray(v.transpose(2, 3, 1, 0))
        params.setdefault(name, {})[leaf] = jnp.asarray(v)
    return params


# --------------------------------------------------------------------------
# host-side decoding
# --------------------------------------------------------------------------

def _pad_right_down(img: np.ndarray, stride: int, value: int):
    h, w = img.shape[:2]
    pad_d = (stride - h % stride) % stride
    pad_r = (stride - w % stride) % stride
    out = np.pad(img, ((0, pad_d), (0, pad_r), (0, 0)), mode="constant",
                 constant_values=value)
    return out, (pad_d, pad_r)


def _find_peaks(heatmap: np.ndarray):
    """Per-joint local maxima of the gaussian-smoothed map above THRE1.
    Returns list (per joint) of (x, y, score, global_id)."""
    from scipy.ndimage import gaussian_filter
    all_peaks = []
    peak_id = 0
    for part in range(N_JOINTS):
        map_ori = heatmap[:, :, part]
        smoothed = gaussian_filter(map_ori, sigma=3)
        m = np.zeros_like(smoothed, dtype=bool)
        m[1:-1, 1:-1] = (
            (smoothed[1:-1, 1:-1] >= smoothed[:-2, 1:-1])
            & (smoothed[1:-1, 1:-1] >= smoothed[2:, 1:-1])
            & (smoothed[1:-1, 1:-1] >= smoothed[1:-1, :-2])
            & (smoothed[1:-1, 1:-1] >= smoothed[1:-1, 2:])
            & (smoothed[1:-1, 1:-1] > THRE1))
        ys, xs = np.nonzero(m)
        peaks = [(int(x), int(y), float(map_ori[y, x]), peak_id + i)
                 for i, (x, y) in enumerate(zip(xs, ys))]
        peak_id += len(peaks)
        all_peaks.append(peaks)
    return all_peaks


def _match_limbs(paf: np.ndarray, all_peaks, img_h: int):
    """PAF line-integral scoring + greedy unique matching per limb type."""
    connection_all = []
    special_k = []
    for k in range(len(MAP_IDX)):
        score_mid = paf[:, :, [i - 19 for i in MAP_IDX[k]]]
        cand_a = all_peaks[LIMB_SEQ[k][0] - 1]
        cand_b = all_peaks[LIMB_SEQ[k][1] - 1]
        if not cand_a or not cand_b:
            special_k.append(k)
            connection_all.append([])
            continue
        candidates = []
        for i, a in enumerate(cand_a):
            for j, b in enumerate(cand_b):
                vec = np.array([b[0] - a[0], b[1] - a[1]], np.float64)
                norm = max(math.hypot(*vec), 1e-8)
                vec = vec / norm
                xs = np.linspace(a[0], b[0], num=10)
                ys = np.linspace(a[1], b[1], num=10)
                mids = np.array([
                    score_mid[int(round(y)), int(round(x))]
                    for x, y in zip(xs, ys)])          # (10, 2)
                scores = mids[:, 0] * vec[0] + mids[:, 1] * vec[1]
                prior = min(0.5 * img_h / norm - 1, 0)
                score = float(scores.mean()) + prior
                if (scores > THRE2).sum() > 0.8 * len(scores) and score > 0:
                    candidates.append((i, j, score, a[3], b[3]))
        candidates.sort(key=lambda c: c[2], reverse=True)
        connection = []
        used_a, used_b = set(), set()
        for i, j, score, ida, idb in candidates:
            if i not in used_a and j not in used_b:
                connection.append([ida, idb, score, i, j])
                used_a.add(i)
                used_b.add(j)
                if len(connection) >= min(len(cand_a), len(cand_b)):
                    break
        connection_all.append(np.array(connection).reshape(-1, 5))
    return connection_all, special_k


def _assemble(all_peaks, connection_all, special_k):
    """Greedy person assembly over limb connections (the CMU algorithm).
    subset rows: 18 candidate ids (-1 absent), [18]=score, [19]=#parts."""
    candidate = np.array(
        [p for peaks in all_peaks for p in peaks], np.float64).reshape(-1, 4)
    subset = np.empty((0, 20))
    for k in range(len(MAP_IDX)):
        if k in special_k or len(connection_all[k]) == 0:
            continue
        part_as = connection_all[k][:, 0]
        part_bs = connection_all[k][:, 1]
        idx_a, idx_b = np.array(LIMB_SEQ[k]) - 1
        for i in range(len(connection_all[k])):
            found = []
            for j in range(len(subset)):
                if subset[j][idx_a] == part_as[i] or \
                        subset[j][idx_b] == part_bs[i]:
                    found.append(j)
            if len(found) == 1:
                j = found[0]
                if subset[j][idx_b] != part_bs[i]:
                    subset[j][idx_b] = part_bs[i]
                    subset[j][-1] += 1
                    subset[j][-2] += (candidate[int(part_bs[i]), 2]
                                      + connection_all[k][i][2])
            elif len(found) == 2:
                j1, j2 = found
                membership = ((subset[j1] >= 0).astype(int)
                              + (subset[j2] >= 0).astype(int))[:-2]
                if (membership == 2).sum() == 0:   # disjoint → merge
                    subset[j1][:-2] += subset[j2][:-2] + 1
                    subset[j1][-2:] += subset[j2][-2:]
                    subset[j1][-2] += connection_all[k][i][2]
                    subset = np.delete(subset, j2, 0)
                else:
                    subset[j1][idx_b] = part_bs[i]
                    subset[j1][-1] += 1
                    subset[j1][-2] += (candidate[int(part_bs[i]), 2]
                                       + connection_all[k][i][2])
            elif k < 17:
                row = -1 * np.ones(20)
                row[idx_a] = part_as[i]
                row[idx_b] = part_bs[i]
                row[-1] = 2
                row[-2] = (candidate[connection_all[k][i, :2].astype(int), 2]
                           .sum() + connection_all[k][i][2])
                subset = np.vstack([subset, row])
    keep = [i for i in range(len(subset))
            if subset[i][-1] >= 4 and subset[i][-2] / subset[i][-1] >= 0.4]
    return candidate, subset[keep]


def estimate(params: dict, image_rgb_u8: np.ndarray,
             scales=(0.5,)) -> tuple:
    """uint8 RGB (H,W,3) → (candidate (n,4) [x,y,score,id],
    subset (people, 20)).  Coordinates are in input-image pixels."""
    import cv2
    ori = image_rgb_u8[:, :, ::-1]            # network was trained on BGR
    h, w = ori.shape[:2]
    heat_avg = np.zeros((h, w, 19))
    paf_avg = np.zeros((h, w, 38))
    for s in scales:
        scale = s * BOXSIZE / h
        resized = cv2.resize(ori, (0, 0), fx=scale, fy=scale,
                             interpolation=cv2.INTER_CUBIC)
        padded, (pad_d, pad_r) = _pad_right_down(resized, STRIDE, PAD_VALUE)
        x = jnp.asarray(padded, jnp.float32)[None] / 256.0 - 0.5
        paf, heat = apply(params, x)
        paf, heat = np.asarray(paf[0]), np.asarray(heat[0])

        def up(m):
            m = cv2.resize(m, (0, 0), fx=STRIDE, fy=STRIDE,
                           interpolation=cv2.INTER_CUBIC)
            m = m[:padded.shape[0] - pad_d, :padded.shape[1] - pad_r]
            return cv2.resize(m, (w, h), interpolation=cv2.INTER_CUBIC)

        heat_avg += up(heat) / len(scales)
        paf_avg += up(paf) / len(scales)
    all_peaks = _find_peaks(heat_avg)
    connections, special_k = _match_limbs(paf_avg, all_peaks, h)
    return _assemble(all_peaks, connections, special_k)


def draw_bodypose(h: int, w: int, candidate: np.ndarray,
                  subset: np.ndarray) -> np.ndarray:
    """Render the pose skeleton the control models expect: colored 4-px
    stick ellipses for the first 17 limb types + joint circles on black."""
    import cv2
    canvas = np.zeros((h, w, 3), np.uint8)
    stickwidth = 4
    for k in range(17):
        for person in subset:
            idx = person[np.array(LIMB_SEQ[k]) - 1]
            if -1 in idx:
                continue
            ys = candidate[idx.astype(int), 1]
            xs = candidate[idx.astype(int), 0]
            m_x, m_y = xs.mean(), ys.mean()
            length = math.hypot(xs[0] - xs[1], ys[0] - ys[1])
            angle = math.degrees(math.atan2(ys[0] - ys[1], xs[0] - xs[1]))
            poly = cv2.ellipse2Poly(
                (int(m_x), int(m_y)), (int(length / 2), stickwidth),
                int(angle), 0, 360, 1)
            cv2.fillConvexPoly(canvas, poly, COLORS[k])
    canvas = (canvas * 0.6).astype(np.uint8)
    for i in range(N_JOINTS):
        for person in subset:
            idx = int(person[i])
            if idx == -1:
                continue
            x, y = candidate[idx][:2]
            cv2.circle(canvas, (int(x), int(y)), 4, COLORS[i], thickness=-1)
    return canvas
