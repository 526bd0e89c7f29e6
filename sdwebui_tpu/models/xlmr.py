"""XLM-RoBERTa text encoder for AltDiffusion (reference modules/xlmr.py
BertSeriesModelWithTransformation: XLM-R large + a 1024→768 projection whose
output is the UNet's cross-attention context).

BERT-style post-LN blocks; position ids offset past the pad token
(reference transformers create_position_ids_from_input_ids).  The
SentencePiece tokenizer's vocab file is data this zero-egress image doesn't
carry — encode-from-text is gated on a user-supplied tokenizer; `apply`
takes raw ids (parity-tested against transformers XLMRobertaModel).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from sdwebui_tpu.ops.norms import layer_norm


@dataclasses.dataclass(frozen=True)
class XLMRConfig:
    vocab_size: int = 250002
    hidden: int = 1024
    layers: int = 24
    heads: int = 16
    intermediate: int = 4096
    project_dim: int = 768
    # AltDiffusion-m18 (reference modules/xlmr_m18.py): project the
    # PENULTIMATE hidden state through pre_LN + transformation_pre
    pre_transformation: bool = False
    pad_token_id: int = 1
    eps: float = 1e-5


def _linear(p, x):
    return x @ p["weight"] + p["bias"]


def _mha(q, k, v, heads, bias):
    """masked multi-head attention (bias: (B,1,1,S) additive)."""
    b, s, hd = q.shape
    d = hd // heads
    qh = q.reshape(b, s, heads, d).transpose(0, 2, 1, 3)
    kh = k.reshape(b, s, heads, d).transpose(0, 2, 1, 3)
    vh = v.reshape(b, s, heads, d).transpose(0, 2, 1, 3)
    scores = (qh * (d ** -0.5)) @ kh.transpose(0, 1, 3, 2) + bias
    p = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    return (p @ vh).transpose(0, 2, 1, 3).reshape(b, s, hd)


def _block(p, x, heads, mask_bias, eps):
    a = p["attention"]
    q = _linear(a["self"]["query"], x)
    k = _linear(a["self"]["key"], x)
    v = _linear(a["self"]["value"], x)
    o = _mha(q, k, v, heads, mask_bias)
    x = layer_norm(x + _linear(a["output"]["dense"], o),
                   a["output"]["LayerNorm"]["weight"],
                   a["output"]["LayerNorm"]["bias"], eps=eps)
    h = jax.nn.gelu(_linear(p["intermediate"]["dense"], x), approximate=False)
    return layer_norm(x + _linear(p["output"]["dense"], h),
                      p["output"]["LayerNorm"]["weight"],
                      p["output"]["LayerNorm"]["bias"], eps=eps)


def apply(params, cfg: XLMRConfig, ids, attention_mask=None):
    """ids (B, S) int32 → projected context (B, S, project_dim)."""
    if attention_mask is None:
        attention_mask = (ids != cfg.pad_token_id).astype(jnp.int32)
    emb = params["roberta"]["embeddings"]
    # positions count non-pad tokens, offset by pad_token_id (HF roberta)
    pos = jnp.cumsum(attention_mask, axis=1) * attention_mask \
        + cfg.pad_token_id
    x = emb["word_embeddings"]["weight"][ids] \
        + emb["position_embeddings"]["weight"][pos] \
        + emb["token_type_embeddings"]["weight"][jnp.zeros_like(ids)]
    x = layer_norm(x, emb["LayerNorm"]["weight"], emb["LayerNorm"]["bias"],
                   eps=cfg.eps)
    bias = (1.0 - attention_mask[:, None, None, :].astype(jnp.float32)) \
        * -1e9
    penult = None
    for i in range(cfg.layers):
        if cfg.pre_transformation and i == cfg.layers - 1:
            penult = x   # hidden_states[-2] in the reference m18 forward
        x = _block(params["roberta"]["encoder"]["layer"][str(i)], x,
                   cfg.heads, bias, cfg.eps)
    if cfg.pre_transformation:
        h = layer_norm(penult, params["pre_LN"]["weight"],
                       params["pre_LN"]["bias"], eps=cfg.eps)
        return _linear(params["transformation_pre"], h)
    return _linear(params["transformation"], x)


# --------------------------------------------------------------------------
# conversion
# --------------------------------------------------------------------------

def convert_xlmr(sd: dict, prefix: str = "cond_stage_model."):
    from sdwebui_tpu.loader.convert import convert_leaf
    from sdwebui_tpu.utils.pytree import unflatten

    flat = {}
    for k, v in sd.items():
        if not k.startswith(prefix):
            continue
        kk = k[len(prefix):]
        if kk.startswith(("roberta.pooler", "pooler",
                          "roberta.embeddings.position_ids")):
            continue   # rank-pooling head unused for conditioning
        if kk.startswith("pre_LN") and not any(
                k2.startswith(prefix + "transformation_pre")
                for k2 in sd):
            continue   # pre_LN only matters for the m18 variant
        arr = np.asarray(v)
        if "embeddings" in kk and kk.endswith(".weight"):
            flat[kk] = arr
        else:
            flat[kk] = convert_leaf(kk, arr)
    tree = unflatten(flat)
    emb = tree["roberta"]["embeddings"]["word_embeddings"]["weight"]
    cfg = XLMRConfig(
        vocab_size=emb.shape[0], hidden=emb.shape[1],
        layers=1 + max(int(i) for i in tree["roberta"]["encoder"]["layer"]),
        # 64-channel heads on real XLM-R (large: 1024/16); tiny test
        # models use 16-channel heads
        heads=emb.shape[1] // 64 if emb.shape[1] >= 256
              else max(emb.shape[1] // 16, 1),
        intermediate=tree["roberta"]["encoder"]["layer"]["0"]["intermediate"]
                         ["dense"]["weight"].shape[-1],
        project_dim=(tree["transformation_pre"]["weight"].shape[-1]
                     if "transformation_pre" in tree
                     else tree["transformation"]["weight"].shape[-1]),
        pre_transformation="transformation_pre" in tree)
    return tree, cfg


class AltConditioner:
    """Minimal AltDiffusion conditioner: tokenizer (user-pluggable,
    SentencePiece) → XLM-R → projected 77-token context.  The reference
    reuses its prompt-chunking hijack; emphasis/chunking are not applied
    here (documented simplification — AltDiffusion ignores CLIP tokens)."""

    def __init__(self, params, cfg: XLMRConfig, tokenizer=None,
                 max_length: int = 77):
        self.params = params
        self.cfg = cfg
        self.tokenizer = tokenizer     # callable: text -> list[int]
        self.max_length = max_length
        self.embedding_db = None
        self.emphasis = "None"
        self.comma_padding_backtrack = 0

    def encode(self, texts, target_chunks=None):
        if self.tokenizer is None:
            raise RuntimeError(
                "AltDiffusion needs an XLM-R SentencePiece tokenizer; "
                "assign conditioner.tokenizer (text -> ids) to enable "
                "(the vocab file is not shipped in this image)")
        rows = []
        for t in texts:
            ids = list(self.tokenizer(t))[: self.max_length - 2]
            row = [0, *ids, 2] + [self.cfg.pad_token_id] * \
                (self.max_length - 2 - len(ids))
            rows.append(row)
        ctx = apply(self.params, self.cfg, jnp.asarray(rows, jnp.int32))
        return ctx, None
