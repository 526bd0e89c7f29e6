"""Training dataset pipeline for TI / hypernetwork training.

Reference: modules/textual_inversion/dataset.py (PersonalizedBase — dir
scan, captions from sidecar .txt / filename, [name]/[filewords] template
expansion, aspect buckets, alpha-channel loss weights),
learn_schedule.py (piecewise "lr:step, ..." schedules — oracle-tested
against the reference's own parser) and autocrop.py (focal-point crop).

TPU-first differences: images are VAE-encoded once up front in batched
device calls (the reference encodes one-by-one under autocast), latents
stay in host RAM as one array per bucket, and the per-step batch is a pure
numpy gather — no torch DataLoader machinery.
"""

from __future__ import annotations

import dataclasses
import os
import re
from collections import defaultdict

import numpy as np

re_numbers_at_start = re.compile(r"^[-\d]+\s*")

# the standard TI prompt-template corpus (data contract, reference
# textual_inversion_templates/*.txt, originally from the textual-inversion
# paper's repo)
_TEMPLATES = {
    "none": ["picture"],
    "subject": [
        "a photo of a [name]", "a rendering of a [name]",
        "a cropped photo of the [name]", "the photo of a [name]",
        "a photo of a clean [name]", "a photo of a dirty [name]",
        "a dark photo of the [name]", "a photo of my [name]",
        "a photo of the cool [name]", "a close-up photo of a [name]",
        "a bright photo of the [name]", "a cropped photo of a [name]",
        "a photo of the [name]", "a good photo of the [name]",
        "a photo of one [name]", "a close-up photo of the [name]",
        "a rendition of the [name]", "a photo of the clean [name]",
        "a rendition of a [name]", "a photo of a nice [name]",
        "a good photo of a [name]", "a photo of the nice [name]",
        "a photo of the small [name]", "a photo of the weird [name]",
        "a photo of the large [name]", "a photo of a cool [name]",
        "a photo of a small [name]",
    ],
    "style": [
        "a painting, art by [name]", "a rendering, art by [name]",
        "a cropped painting, art by [name]", "the painting, art by [name]",
        "a clean painting, art by [name]", "a dirty painting, art by [name]",
        "a dark painting, art by [name]", "a picture, art by [name]",
        "a cool painting, art by [name]", "a close-up painting, art by [name]",
        "a bright painting, art by [name]", "a cropped painting, art by [name]",
        "a good painting, art by [name]", "a close-up painting, art by [name]",
        "a rendition, art by [name]", "a nice painting, art by [name]",
        "a small painting, art by [name]", "a weird painting, art by [name]",
        "a large painting, art by [name]",
    ],
}
_TEMPLATES["subject_filewords"] = [
    t.replace("[name]", "[name], [filewords]").replace("a [name]",
                                                       "a [name]")
    for t in _TEMPLATES["subject"]]
_TEMPLATES["style_filewords"] = [
    t.replace(", art by [name]", " of [filewords], art by [name]")
    for t in _TEMPLATES["style"]]
_TEMPLATES["hypernetwork"] = ["a photo of a [filewords]",
                              "a painting of a [filewords]"]


def load_template(name_or_path: str) -> list[str]:
    """Template set by registry name or a user template file path
    (reference shared.opts training template files)."""
    if name_or_path in _TEMPLATES:
        return list(_TEMPLATES[name_or_path])
    if os.path.isfile(name_or_path):
        with open(name_or_path, encoding="utf8") as f:
            lines = [x.strip() for x in f.readlines() if x.strip()]
        if lines:
            return lines
    raise ValueError(f"unknown training template: {name_or_path!r}")


def filename_caption(path: str, word_regex: str = "",
                     join_string: str = " ") -> str:
    """Caption for one image: sidecar .txt wins; else the filename with
    leading numbers stripped (+ optional word-regex re-join) — reference
    dataset.py:74-86."""
    text_filename = os.path.splitext(path)[0] + ".txt"
    if os.path.exists(text_filename):
        with open(text_filename, encoding="utf8") as f:
            return f.read().strip()
    name = os.path.splitext(os.path.basename(path))[0]
    name = re_numbers_at_start.sub("", name)
    if word_regex:
        tokens = re.compile(word_regex).findall(name)
        name = (join_string or "").join(tokens)
    return name


def create_text(template_line: str, filename_text: str, placeholder: str,
                tag_drop_out: float = 0.0, shuffle_tags: bool = False,
                rng: np.random.Generator | None = None) -> str:
    """[filewords]/[name] expansion with tag dropout/shuffle
    (reference dataset.py create_text)."""
    tags = filename_text.split(",")
    if tag_drop_out and rng is not None:
        tags = [t for t in tags if rng.random() > tag_drop_out]
    if shuffle_tags and rng is not None:
        tags = list(tags)
        rng.shuffle(tags)
    text = template_line.replace("[filewords]", ",".join(tags))
    return text.replace("[name]", placeholder)


# --------------------------------------------------------------------------
# learn-rate schedule (reference learn_schedule.py semantics)
# --------------------------------------------------------------------------

class LearnRateScheduler:
    """Piecewise schedule: "0.001:100, 0.00001:1000, 1e-5:10000" → rate
    0.001 until step 100, then 1e-5 afterwards; a bare number is constant;
    step -1 means max_steps.  Parity-tested against the reference's own
    LearnScheduleIterator (tests/test_training_dataset.py)."""

    def __init__(self, learn_rate: str | float, max_steps: int,
                 cur_step: int = 0):
        self.rates: list[tuple[float, int]] = []
        for pair in str(learn_rate).split(","):
            if not pair.strip():
                continue
            parts = pair.split(":")
            try:
                if len(parts) == 2:
                    step = int(parts[1])
                    if step > cur_step:
                        self.rates.append((float(parts[0]),
                                           min(step, max_steps)))
                        if step > max_steps:
                            break
                    elif step == -1:
                        self.rates.append((float(parts[0]), max_steps))
                        break
                else:
                    self.rates.append((float(parts[0]), max_steps))
                    break
            except ValueError as e:
                raise ValueError(
                    "Invalid learning rate schedule — use a number or "
                    '"0.001:100, 0.00001:1000"') from e
        if not self.rates:
            raise ValueError("Invalid learning rate schedule (empty)")
        self._it = 0
        self.learn_rate, self.end_step = self.rates[0]
        self.finished = False

    def rate_at(self, step_number: int) -> float:
        """Advance to `step_number` and return the active rate."""
        while step_number >= self.end_step:
            if self._it + 1 < len(self.rates):
                self._it += 1
                self.learn_rate, self.end_step = self.rates[self._it]
            else:
                self.finished = True
                break
        return self.learn_rate


# --------------------------------------------------------------------------
# dataset
# --------------------------------------------------------------------------

@dataclasses.dataclass
class DatasetEntry:
    filename: str
    filename_text: str
    bucket: tuple          # (w, h)
    latent: np.ndarray     # (h/8, w/8, C) scaled latent
    weight: np.ndarray | None = None   # same shape, alpha-derived


IMAGE_EXTS = (".png", ".jpg", ".jpeg", ".webp", ".bmp")


class PersonalizedDataset:
    """Directory of images → pre-encoded latents grouped in aspect buckets.

    model: SDModel (VAE used for encoding). width/height: target size; with
    varsize=True each image keeps its own (multiple-of-64) size and batches
    are drawn within a bucket (reference GroupedBatchSampler)."""

    def __init__(self, data_root: str, model, width: int = 512,
                 height: int = 512, placeholder: str = "*",
                 template: str = "subject", flip_p: float = 0.5,
                 varsize: bool = False, use_weight: bool = False,
                 shuffle_tags: bool = False, tag_drop_out: float = 0.0,
                 word_regex: str | None = None, join_string: str | None = None,
                 latent_sampling_method: str = "once",
                 seed: int = 0, encode_batch: int = 8):
        from PIL import Image

        from sdwebui_tpu.pipeline.processing import encode_first_stage
        from sdwebui_tpu.utils.options import opts as _opts

        # reference shared_options training section: filename-word regex +
        # join string feed filename_text extraction (dataset.py:141)
        if word_regex is None:
            word_regex = str(_opts.get("dataset_filename_word_regex", ""))
        if join_string is None:
            join_string = str(_opts.get("dataset_filename_join_string", " "))

        assert os.path.isdir(data_root), \
            f"Dataset directory doesn't exist: {data_root}"
        paths = sorted(
            os.path.join(data_root, f) for f in os.listdir(data_root)
            if f.lower().endswith(IMAGE_EXTS))
        assert paths, "No images found in the dataset directory."

        self.placeholder = placeholder
        self.lines = load_template(template)
        self.shuffle_tags = shuffle_tags
        self.tag_drop_out = tag_drop_out
        self.rng = np.random.default_rng(seed)
        self.entries: list[DatasetEntry] = []

        # decode + group by size
        pending = defaultdict(list)    # (w,h) -> [(path, text, arr, alpha)]
        for path in paths:
            try:
                with Image.open(path) as im:
                    alpha = None
                    if use_weight and "A" in im.getbands():
                        alpha = im.getchannel("A").copy()
                    img = im.convert("RGB")
            except Exception:
                continue
            if varsize:
                w = max((img.width // 64) * 64, 64)
                h = max((img.height // 64) * 64, 64)
            else:
                w, h = width, height
            if img.size != (w, h):
                img = img.resize((w, h), Image.BICUBIC)
                if alpha is not None:
                    alpha = alpha.resize((w, h), Image.BICUBIC)
            if flip_p and self.rng.random() < flip_p:
                img = img.transpose(Image.FLIP_LEFT_RIGHT)
                if alpha is not None:
                    alpha = alpha.transpose(Image.FLIP_LEFT_RIGHT)
            arr = np.asarray(img, np.float32) / 255.0
            text = filename_caption(path, word_regex, join_string)
            pending[(w, h)].append((path, text, arr, alpha))

        # batched VAE encode per bucket
        import jax.numpy as jnp
        for size, items in pending.items():
            for lo in range(0, len(items), encode_batch):
                chunk = items[lo: lo + encode_batch]
                batch = np.stack([c[2] for c in chunk])
                if latent_sampling_method == "random":
                    from sdwebui_tpu.pipeline.sd_model import encode_images
                    from sdwebui_tpu.rng.philox import PhiloxGenerator

                    lat_shape = (batch.shape[0], size[1] // 8, size[0] // 8,
                                 model.latent_channels)
                    noise = np.asarray(
                        PhiloxGenerator(seed + lo).randn(lat_shape),
                        np.float32)
                    lats = encode_images(model, jnp.asarray(batch),
                                         sample_noise=jnp.asarray(noise))
                else:                      # "once"/"deterministic": the mean
                    lats = encode_first_stage(model, jnp.asarray(batch))
                lats = np.asarray(lats, np.float32)
                for (path, text, _arr, alpha), lat in zip(chunk, lats):
                    weight = None
                    if use_weight:
                        if alpha is not None:
                            wmap = np.asarray(
                                alpha.resize((lat.shape[1], lat.shape[0])),
                                np.float32)
                            wmap = wmap - wmap.min()
                            mean = wmap.mean()
                            wmap = wmap / mean if mean > 0 else \
                                np.ones_like(wmap)
                            weight = np.repeat(wmap[..., None],
                                               lat.shape[-1], axis=-1)
                        else:
                            weight = np.ones_like(lat)
                    self.entries.append(DatasetEntry(
                        filename=path, filename_text=text, bucket=size,
                        latent=lat, weight=weight))

        self.buckets = defaultdict(list)
        for i, e in enumerate(self.entries):
            self.buckets[e.bucket].append(i)

    def __len__(self):
        return len(self.entries)

    def caption_for(self, entry: DatasetEntry) -> str:
        line = self.lines[int(self.rng.integers(0, len(self.lines)))]
        return create_text(line, entry.filename_text, self.placeholder,
                           self.tag_drop_out, self.shuffle_tags, self.rng)

    def sample_batch(self, batch_size: int):
        """One training batch drawn within a single aspect bucket →
        (latents (B,h,w,C), texts list, weights (B,h,w,C) | None)."""
        sizes = list(self.buckets)
        counts = np.asarray([len(self.buckets[s]) for s in sizes],
                            np.float64)
        bucket = sizes[int(self.rng.choice(len(sizes),
                                           p=counts / counts.sum()))]
        ids = self.rng.choice(self.buckets[bucket],
                              size=min(batch_size, len(self.buckets[bucket])),
                              replace=len(self.buckets[bucket]) < batch_size)
        entries = [self.entries[int(i)] for i in np.atleast_1d(ids)]
        latents = np.stack([e.latent for e in entries])
        texts = [self.caption_for(e) for e in entries]
        weights = None
        if entries[0].weight is not None:
            weights = np.stack([e.weight for e in entries])
        return latents, texts, weights


# --------------------------------------------------------------------------
# autocrop (reference autocrop.py: entropy + corner focal points; faces
# when a cv2 cascade is available — the reference's DNN models need a
# download, impossible in a zero-egress image)
# --------------------------------------------------------------------------

def autocrop_image(image, crop_width: int = 512, crop_height: int = 512,
                   corner_points_weight: float = 0.5,
                   entropy_points_weight: float = 0.5,
                   face_points_weight: float = 0.5):
    """Crop to (crop_width, crop_height) around the focal point."""
    from PIL import Image

    img = image.convert("RGB")
    scale = max(crop_width / img.width, crop_height / img.height)
    img = img.resize((max(int(img.width * scale), crop_width),
                      max(int(img.height * scale), crop_height)),
                     Image.BICUBIC)
    pois = []
    try:
        import cv2

        gray = cv2.cvtColor(np.asarray(img), cv2.COLOR_RGB2GRAY)
        corners = cv2.goodFeaturesToTrack(gray, maxCorners=50,
                                          qualityLevel=0.04, minDistance=10)
        if corners is not None:
            for c in corners.reshape(-1, 2):
                pois.append((float(c[0]), float(c[1]),
                             corner_points_weight))
        cascade_path = os.path.join(
            getattr(getattr(cv2, "data", None), "haarcascades", ""),
            "haarcascade_frontalface_default.xml")
        if cascade_path and os.path.isfile(cascade_path):
            faces = cv2.CascadeClassifier(cascade_path).detectMultiScale(
                gray, 1.1, 4)
            for (x, y, w, h) in faces:
                pois.append((x + w / 2.0, y + h / 2.0,
                             face_points_weight * 4))
    except Exception:
        pass
    # entropy focal point: the tile with maximum grayscale entropy
    arr = np.asarray(img.convert("L"), np.float64)
    tile = 64
    best, best_e = (img.width / 2, img.height / 2), -1.0
    for y0 in range(0, max(arr.shape[0] - tile, 1), tile // 2):
        for x0 in range(0, max(arr.shape[1] - tile, 1), tile // 2):
            block = arr[y0: y0 + tile, x0: x0 + tile]
            hist, _ = np.histogram(block, bins=64, range=(0, 255))
            p = hist / max(hist.sum(), 1)
            e = -np.sum(p[p > 0] * np.log2(p[p > 0]))
            if e > best_e:
                best_e, best = e, (x0 + tile / 2, y0 + tile / 2)
    pois.append((best[0], best[1], entropy_points_weight))

    wsum = sum(p[2] for p in pois)
    fx = sum(p[0] * p[2] for p in pois) / wsum
    fy = sum(p[1] * p[2] for p in pois) / wsum
    left = int(min(max(fx - crop_width / 2, 0), img.width - crop_width))
    top = int(min(max(fy - crop_height / 2, 0), img.height - crop_height))
    return img.crop((left, top, left + crop_width, top + crop_height))
