"""CLIP vision tower + similarity ranking (reference modules/interrogate.py
loads OpenAI ViT-L/14 for category ranking; BLIP captioning is a separate,
weight-gated feature).

Implements the ViT image encoder (patch conv → class token + position
embeddings → pre-LN transformer → post-LN → projected class embedding) in
NHWC JAX, converted from the HF CLIPVisionModel(+projection) layout or a
full HF CLIPModel state dict.  Parity-tested against transformers.

Weights are user-supplied (zero-egress): place a CLIP model safetensors /
state dict under models/clip_vision/.  Text features for ranking come from
the model's own text tower (also in the file).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from sdwebui_tpu.ops.attention import attention
from sdwebui_tpu.ops.norms import layer_norm

# OpenAI CLIP preprocessing constants
_MEAN = np.asarray([0.48145466, 0.4578275, 0.40821073], np.float32)
_STD = np.asarray([0.26862954, 0.26130258, 0.27577711], np.float32)


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    image_size: int = 224
    patch_size: int = 14
    width: int = 1024
    layers: int = 24
    heads: int = 16
    projection_dim: int = 768


def _mlp(p, x):
    h = x @ p["fc1"]["weight"] + p["fc1"]["bias"]
    h = h * jax.nn.sigmoid(1.702 * h)        # quick_gelu (OpenAI CLIP)
    return h @ p["fc2"]["weight"] + p["fc2"]["bias"]


def _block(p, x, heads):
    h = layer_norm(x, p["layer_norm1"]["weight"], p["layer_norm1"]["bias"])
    q = h @ p["self_attn"]["q_proj"]["weight"] + p["self_attn"]["q_proj"]["bias"]
    k = h @ p["self_attn"]["k_proj"]["weight"] + p["self_attn"]["k_proj"]["bias"]
    v = h @ p["self_attn"]["v_proj"]["weight"] + p["self_attn"]["v_proj"]["bias"]
    o = attention(q, k, v, num_heads=heads)
    x = x + (o @ p["self_attn"]["out_proj"]["weight"]
             + p["self_attn"]["out_proj"]["bias"])
    h = layer_norm(x, p["layer_norm2"]["weight"], p["layer_norm2"]["bias"])
    return x + _mlp(p["mlp"], h)


def apply(params, cfg: CLIPVisionConfig, pixels, normalize: bool = True):
    """pixels: (B, 224, 224, 3) CLIP-normalized → (B, projection_dim)
    image features; L2-normalized for similarity ranking (default), raw
    projected embeddings for the unclip adm conditioner (normalize=False —
    open_clip's visual() returns the unnormalized projection)."""
    emb = params["embeddings"]
    x = jax.lax.conv_general_dilated(
        pixels, emb["patch_embedding"]["weight"].astype(pixels.dtype),
        (cfg.patch_size, cfg.patch_size), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    b = x.shape[0]
    x = x.reshape(b, -1, cfg.width)
    cls = jnp.broadcast_to(emb["class_embedding"].astype(x.dtype),
                           (b, 1, cfg.width))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + emb["position_embedding"]["weight"].astype(x.dtype)[None]
    x = layer_norm(x, params["pre_layrnorm"]["weight"],
                   params["pre_layrnorm"]["bias"])
    for i in range(cfg.layers):
        x = _block(params["encoder"]["layers"][str(i)], x, cfg.heads)
    pooled = layer_norm(x[:, 0], params["post_layernorm"]["weight"],
                        params["post_layernorm"]["bias"])
    feat = pooled @ params["visual_projection"]["weight"]
    if not normalize:
        return feat
    return feat / jnp.linalg.norm(feat, axis=-1, keepdims=True)


def preprocess(image, size: int = 224) -> np.ndarray:
    """PIL → (1, size, size, 3) CLIP normalization (bicubic resize +
    center crop, reference clip.load's preprocess)."""
    from PIL import Image

    img = image.convert("RGB")
    s = size / min(img.size)
    img = img.resize((max(round(img.width * s), size),
                      max(round(img.height * s), size)), Image.BICUBIC)
    left = (img.width - size) // 2
    top = (img.height - size) // 2
    img = img.crop((left, top, left + size, top + size))
    arr = np.asarray(img, np.float32) / 255.0
    return ((arr - _MEAN) / _STD)[None]


# --------------------------------------------------------------------------
# conversion (HF CLIPModel / CLIPVisionModelWithProjection layouts)
# --------------------------------------------------------------------------

def convert_clip_vision(sd: dict):
    from sdwebui_tpu.loader.convert import convert_leaf
    from sdwebui_tpu.utils.pytree import unflatten

    flat = {}
    for k, v in sd.items():
        if k.startswith("vision_model."):
            kk = k[len("vision_model."):]
        elif k.startswith("visual_projection"):
            kk = k
        else:
            continue
        arr = np.asarray(v)
        if kk == "embeddings.class_embedding":
            flat[kk] = arr
            continue
        if kk.endswith("position_embedding.weight") or \
                "token_embedding" in kk:
            flat[kk] = arr
            continue
        flat[kk] = convert_leaf(kk, arr)
    tree = unflatten(flat)
    w = tree["embeddings"]["patch_embedding"]["weight"]
    width = w.shape[-1]
    # head count is not in the weights: real CLIP ViTs use 64-channel heads
    # (ViT-L 1024/16, ViT-B 768/12); sub-256 test models use 16-channel
    heads = width // 64 if width >= 256 else max(width // 16, 1)
    cfg = CLIPVisionConfig(
        patch_size=w.shape[0], width=width,
        layers=1 + max(int(i) for i in tree["encoder"]["layers"]),
        heads=heads,
        projection_dim=tree["visual_projection"]["weight"].shape[-1],
        image_size=int((tree["embeddings"]["position_embedding"]["weight"]
                        .shape[0] - 1) ** 0.5) * w.shape[0])
    return tree, cfg


def convert_openclip_vision(sd: dict, prefix: str = "embedder.model.visual."):
    """open_clip VisionTransformer state dict (the unclip checkpoint's
    FrozenOpenCLIPImageEmbedder tower, keys `embedder.model.visual.*`) →
    the tree layout `apply` consumes.  Same resblock mapping as the text
    tower (loader/convert.py convert_clip_openclip)."""
    import re

    from sdwebui_tpu.loader.convert import convert_leaf
    from sdwebui_tpu.utils.pytree import unflatten

    flat = {}
    proj = None
    for k, v in sd.items():
        if not k.startswith(prefix):
            continue
        sub = k[len(prefix):]
        arr = np.asarray(v)
        if sub == "class_embedding":
            flat["embeddings.class_embedding"] = arr
        elif sub == "positional_embedding":
            flat["embeddings.position_embedding.weight"] = arr
        elif sub == "conv1.weight":                    # (D,3,P,P) → HWIO
            flat["embeddings.patch_embedding.weight"] = \
                np.ascontiguousarray(arr.transpose(2, 3, 1, 0))
        elif sub.startswith("ln_pre."):
            flat["pre_layrnorm." + sub[len("ln_pre."):]] = arr
        elif sub.startswith("ln_post."):
            flat["post_layernorm." + sub[len("ln_post."):]] = arr
        elif sub == "proj":                            # applied as x @ W
            proj = np.ascontiguousarray(arr)
        else:
            m = re.match(r"transformer\.resblocks\.(\d+)\.(.+)", sub)
            if not m:
                continue
            base = f"encoder.layers.{m.group(1)}."
            rest = m.group(2)
            if rest == "attn.in_proj_weight":
                for name, part in zip(("q", "k", "v"),
                                      np.split(arr, 3, axis=0)):
                    flat[base + f"self_attn.{name}_proj.weight"] = \
                        np.ascontiguousarray(part.T)
            elif rest == "attn.in_proj_bias":
                for name, part in zip(("q", "k", "v"),
                                      np.split(arr, 3, axis=0)):
                    flat[base + f"self_attn.{name}_proj.bias"] = \
                        np.ascontiguousarray(part)
            elif rest.startswith("attn.out_proj."):
                suffix = rest[len("attn.out_proj."):]
                flat[base + "self_attn.out_proj." + suffix] = convert_leaf(
                    "out_proj." + suffix, arr)
            elif rest.startswith("ln_1."):
                flat[base + "layer_norm1." + rest[5:]] = arr
            elif rest.startswith("ln_2."):
                flat[base + "layer_norm2." + rest[5:]] = arr
            elif rest.startswith("mlp.c_fc."):
                flat[base + "mlp.fc1." + rest[9:]] = convert_leaf(
                    "fc1." + rest[9:], arr)
            elif rest.startswith("mlp.c_proj."):
                flat[base + "mlp.fc2." + rest[11:]] = convert_leaf(
                    "fc2." + rest[11:], arr)
    tree = unflatten(flat)
    if proj is None:
        raise ValueError("open_clip visual tower missing 'proj'")
    tree["visual_projection"] = {"weight": proj}
    w = tree["embeddings"]["patch_embedding"]["weight"]
    width = w.shape[-1]
    # head count is absent from the weights; open_clip vision towers:
    # ViT-B 768/12, ViT-L 1024/16, ViT-H 1280/16 (80ch), ViT-bigG 1664/16
    known_heads = {768: 12, 1024: 16, 1280: 16, 1664: 16}
    cfg = CLIPVisionConfig(
        patch_size=w.shape[0], width=width,
        layers=1 + max(int(i) for i in tree["encoder"]["layers"]),
        heads=known_heads.get(width,
                              width // 64 if width >= 256
                              else max(width // 16, 1)),
        projection_dim=proj.shape[-1],
        image_size=int((tree["embeddings"]["position_embedding"]["weight"]
                        .shape[0] - 1) ** 0.5) * w.shape[0])
    return tree, cfg


def rank(image_features, text_features, top_count: int = 1):
    """Similarity ranking (reference InterrogateModels.rank,
    modules/interrogate.py:152): softmax over 100·cosine, scores returned
    as probability·100 like the reference's top_probs*100."""
    sims = np.asarray(image_features @ text_features.T)[0] * 100.0
    e = np.exp(sims - sims.max())
    probs = e / e.sum()
    order = np.argsort(-probs)[:top_count]
    return [(int(i), float(probs[i] * 100.0)) for i in order]
