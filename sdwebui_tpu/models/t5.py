"""T5 v1.1 encoder (T5-XXL) for SD3 conditioning — NHWC-free token model.

Reference: SD3 uses google/t5-v1_1-xxl's encoder as its third text encoder
(modules/models/sd3/other_impls.py T5XXLModel; weights bundled in SD3
checkpoints under text_encoders.t5xxl.*).  Architecture (Raffel et al.):
RMSNorm pre-norm blocks, relative-position bucket bias added to UNSCALED
q·k logits (no 1/√d), gated-GELU feed-forward, no biases anywhere, shared
relative bias table owned by block 0.

TPU notes: the relative-position bias is a host-precomputed (S, S) bucket
gather — static for a fixed context length (SD3 pads T5 context to 77),
so it folds into the compiled program as a constant gather.

The SentencePiece tokenizer's vocab file is DATA the zero-egress image
doesn't carry — encode-from-text is gated on a user-supplied tokenizer;
`apply` takes raw token ids (parity-tested against HF T5EncoderModel).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    d_model: int = 4096
    d_kv: int = 64
    d_ff: int = 10240
    num_layers: int = 24
    num_heads: int = 64
    rel_buckets: int = 32
    rel_max_distance: int = 128


def relative_position_bucket(rel: np.ndarray, num_buckets: int = 32,
                             max_distance: int = 128) -> np.ndarray:
    """Bidirectional T5 bucket mapping (HF _relative_position_bucket)."""
    ret = np.zeros_like(rel)
    n = -rel
    num_buckets //= 2
    ret += (n < 0).astype(np.int64) * num_buckets
    n = np.abs(n)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_large = max_exact + (
        np.log(np.maximum(n, 1) / max_exact)
        / np.log(max_distance / max_exact) * (num_buckets - max_exact)
    ).astype(np.int64)
    val_large = np.minimum(val_large, num_buckets - 1)
    return ret + np.where(is_small, n, val_large)


def _position_bias(table, seq_len: int, cfg: T5Config):
    """(heads, S, S) additive bias from the block-0 bucket table."""
    pos = np.arange(seq_len)
    rel = pos[None, :] - pos[:, None]          # memory_pos - query_pos
    buckets = relative_position_bucket(rel, cfg.rel_buckets,
                                       cfg.rel_max_distance)
    bias = table[jnp.asarray(buckets.reshape(-1))]       # (S·S, heads)
    return bias.reshape(seq_len, seq_len, -1).transpose(2, 0, 1)


def _rms_norm(x, w, eps: float = 1e-6):
    var = jnp.mean(x.astype(jnp.float32) ** 2, axis=-1, keepdims=True)
    return (x * jax.lax.rsqrt(var + eps)).astype(x.dtype) * w


def _attention(p, x, bias, cfg: T5Config):
    b, s, _ = x.shape
    h, d = cfg.num_heads, cfg.d_kv
    q = (x @ p["q"]["weight"]).reshape(b, s, h, d).transpose(0, 2, 1, 3)
    k = (x @ p["k"]["weight"]).reshape(b, s, h, d).transpose(0, 2, 1, 3)
    v = (x @ p["v"]["weight"]).reshape(b, s, h, d).transpose(0, 2, 1, 3)
    scores = q @ k.transpose(0, 1, 3, 2) + bias[None]   # T5: NO 1/sqrt(d)
    attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(x.dtype)
    out = (attn @ v).transpose(0, 2, 1, 3).reshape(b, s, h * d)
    return out @ p["o"]["weight"]


def _ffn(p, x):
    gate = jax.nn.gelu(x @ p["wi_0"]["weight"], approximate=True)
    return (gate * (x @ p["wi_1"]["weight"])) @ p["wo"]["weight"]


def apply(params, cfg: T5Config, tokens):
    """tokens: (B, S) int32 → (B, S, d_model) final hidden states."""
    x = params["shared"]["weight"][tokens]
    table = params["encoder"]["block"]["0"]["layer"]["0"]["SelfAttention"][
        "relative_attention_bias"]["weight"]
    bias = _position_bias(table, tokens.shape[1], cfg)
    for i in range(cfg.num_layers):
        blk = params["encoder"]["block"][str(i)]["layer"]
        att = blk["0"]
        h = _rms_norm(x, att["layer_norm"]["weight"])
        x = x + _attention(att["SelfAttention"], h, bias, cfg)
        ff = blk["1"]
        h = _rms_norm(x, ff["layer_norm"]["weight"])
        x = x + _ffn(ff["DenseReluDense"], h)
    return _rms_norm(x, params["encoder"]["final_layer_norm"]["weight"])


# --------------------------------------------------------------------------
# conversion
# --------------------------------------------------------------------------

def derive_t5_config(sd: dict) -> T5Config:
    shape = lambda k: tuple(np.asarray(sd[k]).shape)
    vocab, d_model = shape("shared.weight")
    n_layers = 1 + max(int(k.split(".")[2]) for k in sd
                       if k.startswith("encoder.block."))
    buckets, heads = shape(
        "encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight")
    inner = shape("encoder.block.0.layer.0.SelfAttention.q.weight")[0]
    d_ff = shape("encoder.block.0.layer.1.DenseReluDense.wi_0.weight")[0]
    return T5Config(vocab_size=vocab, d_model=d_model, d_kv=inner // heads,
                    d_ff=d_ff, num_layers=n_layers, num_heads=heads,
                    rel_buckets=buckets)


def convert_t5(sd: dict):
    """HF/SD3-bundled T5 state dict → (tree, cfg). Strips the SD3 wrapper
    prefix; linear weights transpose to (in, out); embeddings/bias tables
    keep their (rows, cols) layout."""
    from sdwebui_tpu.utils.pytree import unflatten

    for pre in ("text_encoders.t5xxl.transformer.", "t5xxl.transformer.",
                "transformer."):
        if any(k.startswith(pre + "shared.") for k in sd):
            sd = {k[len(pre):]: v for k, v in sd.items() if k.startswith(pre)}
            break
    cfg = derive_t5_config(sd)
    flat = {}
    for k, v in sd.items():
        arr = np.asarray(v)
        if k.endswith(".weight") and arr.ndim == 2 and \
                "shared" not in k and "relative_attention_bias" not in k \
                and "embed_tokens" not in k:
            arr = np.ascontiguousarray(arr.T)
        if "embed_tokens" in k:
            continue   # alias of shared.weight
        flat[k] = arr
    return unflatten(flat), cfg


def init_params(cfg: T5Config, seed: int = 0):
    """Random T5 for tests."""
    from sdwebui_tpu.models.init_utils import HostInit

    ini = HostInit(seed)
    f32 = jnp.float32
    inner = cfg.num_heads * cfg.d_kv

    def block(first):
        att = {"q": ini.linear(cfg.d_model, inner, f32, bias=False),
               "k": ini.linear(cfg.d_model, inner, f32, bias=False),
               "v": ini.linear(cfg.d_model, inner, f32, bias=False),
               "o": ini.linear(inner, cfg.d_model, f32, bias=False)}
        if first:
            att["relative_attention_bias"] = {
                "weight": ini._normal((cfg.rel_buckets, cfg.num_heads),
                                      0.02, f32)}
        return {"layer": {
            "0": {"SelfAttention": att,
                  "layer_norm": {"weight": np.ones(cfg.d_model, np.float32)}},
            "1": {"DenseReluDense": {
                      "wi_0": ini.linear(cfg.d_model, cfg.d_ff, f32, bias=False),
                      "wi_1": ini.linear(cfg.d_model, cfg.d_ff, f32, bias=False),
                      "wo": ini.linear(cfg.d_ff, cfg.d_model, f32, bias=False)},
                  "layer_norm": {"weight": np.ones(cfg.d_model, np.float32)}},
        }}

    return {
        "shared": {"weight": ini._normal((cfg.vocab_size, cfg.d_model),
                                         0.02, f32)},
        "encoder": {
            "block": {str(i): block(i == 0) for i in range(cfg.num_layers)},
            "final_layer_norm": {"weight": np.ones(cfg.d_model, np.float32)},
        },
    }
