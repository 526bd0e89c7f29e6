"""BLIP image captioner (vision ViT + BERT cross-attention decoder).

The reference interrogator (modules/interrogate.py:15-60) captions with the
BLIP repo's `blip_decoder` (model_base_caption_capfilt_large.pth) and then
ranks CLIP categories; the ranking half already lives in
models/clip_vision.py.  This module supplies the caption half: a functional
NHWC/JAX BLIP whose param tree mirrors the HF `BlipForConditionalGeneration`
layout (vision_model.* / text_decoder.*); the original BLIP-repo checkpoint
layout (timm `visual_encoder.*`) converts into it.

Greedy decoding recomputes the (short) prefix each step inside one jit —
at caption length ≤ 32 and BERT-base size the decoder is a trivial fraction
of the vision tower, so a KV cache would only add state-threading
complexity.  Tokenization is WordPiece (vocab.txt next to the weights —
text data, user-supplied in this zero-egress image).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

# ImageNet-ish normalization the BLIP preprocessing uses
_MEAN = np.asarray([0.48145466, 0.4578275, 0.40821073], np.float32)
_STD = np.asarray([0.26862954, 0.26130258, 0.27577711], np.float32)


@dataclasses.dataclass(frozen=True)
class BlipConfig:
    # vision
    hidden_size: int = 768
    layers: int = 12
    heads: int = 12
    intermediate: int = 3072
    image_size: int = 384
    patch_size: int = 16
    vision_eps: float = 1e-5
    # text decoder (BERT)
    text_hidden: int = 768
    text_layers: int = 12
    text_heads: int = 12
    text_intermediate: int = 3072
    vocab_size: int = 30524
    max_positions: int = 512
    # special ids (BERT tokenizer + BLIP's [DEC])
    bos_token_id: int = 30522
    sep_token_id: int = 102
    pad_token_id: int = 0


def _ln(p, x, eps):
    x32 = x.astype(jnp.float32)
    m = x32.mean(-1, keepdims=True)
    v = x32.var(-1, keepdims=True)
    return ((x32 - m) * jax.lax.rsqrt(v + eps)) * p["weight"] + p["bias"]


def _lin(p, x):
    return x @ p["weight"].astype(x.dtype).T + p["bias"].astype(x.dtype)


def _gelu(x):
    return jax.nn.gelu(x, approximate=False)


def _heads_attn(q, k, v, heads, mask=None):
    b, sq, d = q.shape
    sk = k.shape[1]
    hd = d // heads
    qh = q.reshape(b, sq, heads, hd).transpose(0, 2, 1, 3)
    kh = k.reshape(b, sk, heads, hd).transpose(0, 2, 1, 3)
    vh = v.reshape(b, sk, heads, hd).transpose(0, 2, 1, 3)
    att = (qh * (hd ** -0.5)) @ kh.transpose(0, 1, 3, 2)
    if mask is not None:
        att = att + mask
    att = jax.nn.softmax(att.astype(jnp.float32), axis=-1).astype(q.dtype)
    return (att @ vh).transpose(0, 2, 1, 3).reshape(b, sq, d)


# --------------------------------------------------------------------------
# vision tower
# --------------------------------------------------------------------------

def vision_apply(params, cfg: BlipConfig, pixels):
    """pixels: (B,H,W,3) already normalized → (B, 1+N, D) encoder states."""
    p = params["vision_model"]
    emb = p["embeddings"]
    patches = jax.lax.conv_general_dilated(
        pixels, emb["patch_embedding"]["weight"].astype(pixels.dtype),
        (cfg.patch_size, cfg.patch_size), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    patches = patches + emb["patch_embedding"]["bias"].astype(pixels.dtype)
    b, gh, gw, d = patches.shape
    x = patches.reshape(b, gh * gw, d)
    cls = jnp.broadcast_to(emb["class_embedding"].astype(x.dtype)[0],
                           (b, 1, d))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + emb["position_embedding"].astype(x.dtype)[0, : x.shape[1]]
    for i in range(cfg.layers):
        lp = p["encoder"]["layers"][str(i)]
        h = _ln(lp["layer_norm1"], x, cfg.vision_eps).astype(x.dtype)
        qkv = _lin(lp["self_attn"]["qkv"], h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        x = x + _lin(lp["self_attn"]["projection"],
                     _heads_attn(q, k, v, cfg.heads))
        h = _ln(lp["layer_norm2"], x, cfg.vision_eps).astype(x.dtype)
        x = x + _lin(lp["mlp"]["fc2"], _gelu(_lin(lp["mlp"]["fc1"], h)))
    return _ln(p["post_layernorm"], x, cfg.vision_eps)


# --------------------------------------------------------------------------
# text decoder (BERT with cross-attention, post-LN)
# --------------------------------------------------------------------------

def decoder_logits(params, cfg: BlipConfig, ids, enc, attn_mask=None):
    """ids: (B,L) int32; enc: (B,S,D) vision states → (B,L,vocab) logits."""
    eps = 1e-12
    p = params["text_decoder"]
    emb = p["bert"]["embeddings"]
    b, l = ids.shape
    x = jnp.asarray(emb["word_embeddings"]["weight"])[ids] \
        + jnp.asarray(emb["position_embeddings"]["weight"])[:l][None]
    x = _ln(emb["LayerNorm"], x, eps)

    causal = jnp.where(
        jnp.arange(l)[None, :] <= jnp.arange(l)[:, None], 0.0, -1e9)
    mask = causal[None, None]
    if attn_mask is not None:   # padding mask (B,L): 1 = real token
        mask = mask + jnp.where(attn_mask[:, None, None, :] > 0, 0.0, -1e9)

    for i in range(cfg.text_layers):
        lp = p["bert"]["encoder"]["layer"][str(i)]
        a = lp["attention"]
        q = _lin(a["self"]["query"], x)
        k = _lin(a["self"]["key"], x)
        v = _lin(a["self"]["value"], x)
        att = _heads_attn(q, k, v, cfg.text_heads, mask=mask)
        x = _ln(a["output"]["LayerNorm"], x + _lin(a["output"]["dense"], att),
                eps)
        c = lp["crossattention"]
        q = _lin(c["self"]["query"], x)
        k = _lin(c["self"]["key"], enc)
        v = _lin(c["self"]["value"], enc)
        att = _heads_attn(q, k, v, cfg.text_heads)
        x = _ln(c["output"]["LayerNorm"], x + _lin(c["output"]["dense"], att),
                eps)
        h = _gelu(_lin(lp["intermediate"]["dense"], x))
        x = _ln(lp["output"]["LayerNorm"], x + _lin(lp["output"]["dense"], h),
                eps)

    cls = p["cls"]["predictions"]
    h = _gelu(_lin(cls["transform"]["dense"], x))
    h = _ln(cls["transform"]["LayerNorm"], h, eps)
    return h @ cls["decoder"]["weight"].astype(h.dtype).T \
        + cls["bias"].astype(h.dtype)


# --------------------------------------------------------------------------
# greedy captioning
# --------------------------------------------------------------------------

def generate(params, cfg: BlipConfig, pixels, prompt_ids,
             max_new_tokens: int = 20, min_new_tokens: int = 0,
             num_beams: int = 1):
    """Caption decode: prompt_ids (list[int], starting with bos) →
    np.int32 ids (prompt + generated, stopped at [SEP]).

    num_beams=1 is token-exact greedy (HF-parity-tested); num_beams>1 is
    standard beam search with length penalty 1.0 like the reference's
    transformers call (modules/interrogate.py:188 num_beams=
    opts.interrogate_clip_num_beams); min_new_tokens suppresses [SEP]
    (reference min_length)."""
    enc = vision_apply(params, cfg, pixels)

    @jax.jit
    def step_logits(ids_j):
        return decoder_logits(params, cfg, ids_j, enc)[:, -1]

    if num_beams <= 1:
        ids = np.asarray([list(prompt_ids)], np.int32)
        for t in range(max_new_tokens):
            logits = np.array(step_logits(jnp.asarray(ids))[0])
            if t < min_new_tokens:
                logits[cfg.sep_token_id] = -np.inf
            nxt = int(np.argmax(logits))
            ids = np.concatenate([ids, [[nxt]]], axis=1)
            if nxt == cfg.sep_token_id:
                break
        return ids[0]

    beams = [(list(prompt_ids), 0.0, False)]   # (ids, logprob, finished)
    for t in range(max_new_tokens):
        if all(f for _, _, f in beams):
            break
        cand = []
        for ids, lp, fin in beams:
            if fin:
                cand.append((ids, lp, True))
                continue
            logits = np.array(step_logits(jnp.asarray([ids], jnp.int32))[0])
            logp = logits - np.logaddexp.reduce(logits)
            if t < min_new_tokens:
                logp[cfg.sep_token_id] = -np.inf
            for tok in np.argpartition(-logp, num_beams)[:num_beams]:
                cand.append((ids + [int(tok)], lp + float(logp[tok]),
                             int(tok) == cfg.sep_token_id))
        cand.sort(key=lambda b: b[1], reverse=True)
        beams = cand[:num_beams]
    # length penalty 1.0: normalize by generated length
    n0 = len(prompt_ids)
    best = max(beams, key=lambda b: b[1] / max(len(b[0]) - n0, 1))
    return np.asarray(best[0], np.int32)


def preprocess(image, image_size: int) -> np.ndarray:
    """PIL → (1,S,S,3) normalized float32 (BLIP transform: bicubic resize)."""
    from PIL import Image as _Image

    img = image.convert("RGB").resize((image_size, image_size),
                                      _Image.BICUBIC)
    arr = np.asarray(img, np.float32) / 255.0
    return ((arr - _MEAN) / _STD)[None]


# --------------------------------------------------------------------------
# WordPiece tokenizer (BERT vocab.txt, user-supplied)
# --------------------------------------------------------------------------

class WordPiece:
    def __init__(self, vocab_path: str):
        with open(vocab_path, encoding="utf-8") as f:
            self.tokens = [line.rstrip("\n") for line in f]
        self.ids = {t: i for i, t in enumerate(self.tokens)}

    def encode_word(self, word: str) -> list[int]:
        out = []
        start = 0
        while start < len(word):
            end = len(word)
            piece = None
            while start < end:
                sub = word[start:end]
                if start > 0:
                    sub = "##" + sub
                if sub in self.ids:
                    piece = sub
                    break
                end -= 1
            if piece is None:
                return [self.ids.get("[UNK]", 100)]
            out.append(self.ids[piece])
            start = end
        return out

    def encode(self, text: str) -> list[int]:
        ids = []
        for w in text.lower().split():
            ids += self.encode_word(w)
        return ids

    def decode(self, ids) -> str:
        words = []
        for i in ids:
            t = self.tokens[int(i)]
            if t.startswith("["):       # special tokens
                continue
            if t.startswith("##") and words:
                words[-1] += t[2:]
            else:
                words.append(t)
        return " ".join(words)


# --------------------------------------------------------------------------
# loading
# --------------------------------------------------------------------------

def _translate_original(sd: dict) -> dict:
    """BLIP-repo layout (timm `visual_encoder.*` + `text_decoder.*`) →
    HF-style keys. The BERT half is named identically already."""
    out = {}
    for k, v in sd.items():
        if k.startswith("text_decoder."):
            out[k] = v
        elif k == "visual_encoder.cls_token":
            out["vision_model.embeddings.class_embedding"] = v
        elif k == "visual_encoder.pos_embed":
            out["vision_model.embeddings.position_embedding"] = v
        elif k.startswith("visual_encoder.patch_embed.proj."):
            out["vision_model.embeddings.patch_embedding."
                + k.rsplit(".", 1)[1]] = v
        elif k.startswith("visual_encoder.norm."):
            out["vision_model.post_layernorm." + k.rsplit(".", 1)[1]] = v
        elif k.startswith("visual_encoder.blocks."):
            parts = k.split(".")
            i, rest = parts[2], ".".join(parts[3:])
            base = f"vision_model.encoder.layers.{i}."
            rest = rest.replace("norm1.", "layer_norm1.") \
                       .replace("norm2.", "layer_norm2.") \
                       .replace("attn.qkv.", "self_attn.qkv.") \
                       .replace("attn.proj.", "self_attn.projection.")
            out[base + rest] = v
    return out


def convert_blip(sd: dict):
    from sdwebui_tpu.utils.pytree import unflatten

    if "model" in sd and isinstance(sd["model"], dict):
        sd = sd["model"]
    if any(k.startswith("visual_encoder.") for k in sd):
        sd = _translate_original(sd)
    flat = {}
    for k, v in sd.items():
        if ".position_ids" in k or k.startswith("text_encoder."):
            continue
        arr = np.ascontiguousarray(v)
        if k.endswith("patch_embedding.weight"):
            arr = np.ascontiguousarray(np.transpose(arr, (2, 3, 1, 0)))
        flat[k] = arr
    tree = unflatten(flat)
    vm = tree["vision_model"]
    d = vm["embeddings"]["class_embedding"].shape[-1]
    n_pos = vm["embeddings"]["position_embedding"].shape[1]
    layers = len(vm["encoder"]["layers"])
    inter = vm["encoder"]["layers"]["0"]["mlp"]["fc1"]["weight"].shape[0]
    patch = vm["embeddings"]["patch_embedding"]["weight"].shape[0]
    image_size = int(np.sqrt(n_pos - 1)) * patch
    td = tree["text_decoder"]["bert"]
    vocab = td["embeddings"]["word_embeddings"]["weight"].shape[0]
    t_layers = len(td["encoder"]["layer"])
    t_hidden = td["embeddings"]["word_embeddings"]["weight"].shape[1]
    cfg = BlipConfig(hidden_size=d, layers=layers, heads=max(d // 64, 1),
                     intermediate=inter, image_size=image_size,
                     patch_size=patch,
                     text_hidden=t_hidden, text_layers=t_layers,
                     text_heads=max(t_hidden // 64, 1),
                     text_intermediate=td["encoder"]["layer"]["0"][
                         "intermediate"]["dense"]["weight"].shape[0],
                     vocab_size=vocab)
    return tree, cfg


def load_blip(path: str):
    from sdwebui_tpu.loader.load import read_checkpoint

    return convert_blip(read_checkpoint(path))
