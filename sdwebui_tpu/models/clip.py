"""Text-encoder transformers (CLIP-L / OpenCLIP-H / OpenCLIP-bigG).

Functional rebuild of the conditioning models the reference drives via
`transformers`/`open_clip` (hijacked in modules/sd_hijack_clip.py).  The
param tree mirrors the *HF CLIPTextModel* state-dict layout
(`text_model.embeddings / encoder.layers.N / final_layer_norm`); the loader
re-keys SD2/SDXL open_clip checkpoints (``resblocks.N.attn.in_proj_*``)
into this same layout so one forward covers all three encoders.

Returns all hidden states needed for the webui's clip-skip semantics
(reference sd_hijack_clip.py:352-359): ``encode`` takes the layer to stop
at, and whether to apply the final layer norm (SD1: yes; SDXL's CLIP-L
branch: no).
"""

from __future__ import annotations

import jax.numpy as jnp
import jax

from sdwebui_tpu.models.configs import CLIPTextConfig
from sdwebui_tpu.models.layers import embedding, gelu, layer_norm_p, linear, quick_gelu
from sdwebui_tpu.ops import attention


def _mlp(p, x, act):
    return linear(p["fc2"], act(linear(p["fc1"], x)))


def _self_attn(p, x, heads, causal_mask):
    b, s, c = x.shape
    d = c // heads
    q = linear(p["q_proj"], x).reshape(b, s, heads, d).transpose(0, 2, 1, 3)
    k = linear(p["k_proj"], x).reshape(b, s, heads, d).transpose(0, 2, 1, 3)
    v = linear(p["v_proj"], x).reshape(b, s, heads, d).transpose(0, 2, 1, 3)
    # 77-token sequences: plain XLA attention with additive causal mask is
    # optimal (flash kernel dispatch threshold is far above this length)
    scale = 1.0 / jnp.sqrt(d).astype(jnp.float32)
    s_mat = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                       preferred_element_type=jnp.float32) * scale
    s_mat = s_mat + causal_mask
    pattn = jax.nn.softmax(s_mat, axis=-1).astype(x.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", pattn, v)
    out = out.transpose(0, 2, 1, 3).reshape(b, s, c)
    return linear(p["out_proj"], out)


import functools


@functools.partial(jax.jit, static_argnames=("cfg", "stop_at_layer", "apply_final_norm"))
def encode(params, cfg: CLIPTextConfig, tokens, stop_at_layer: int = 0,
           apply_final_norm: bool = True, inputs_embeds=None):
    """tokens (B, S) int32 → (hidden (B,S,width), pooled (B,width)|None).

    stop_at_layer: 0 = run all layers (clip_skip=1); n>0 = stop n layers
    before the end (clip_skip = n+1), matching
    `hidden_states[-clip_skip]` in the reference.
    pooled: hidden state at the EOT token position of the FINAL layer,
    after final LN (and text_projection when present) — the SDXL/bigG
    pooled embedding.  EOT = argmax of token ids (highest id is
    endoftext), the standard CLIP pooling rule.
    """
    emb = params["embeddings"]
    x = embedding(emb["token_embedding"], tokens) if inputs_embeds is None else inputs_embeds
    pos = emb["position_embedding"]["weight"][: tokens.shape[1]]
    x = x + pos.astype(x.dtype)

    act = quick_gelu if cfg.activation == "quick_gelu" else gelu
    s = tokens.shape[1]
    causal = jnp.triu(jnp.full((s, s), -1e9, jnp.float32), k=1)[None, None]

    n_run_full = cfg.layers
    hidden_at_stop = None
    stop_idx = cfg.layers - stop_at_layer  # layer count to run for the cond output

    for i in range(n_run_full):
        p = params["encoder"]["layers"][str(i)]
        h = layer_norm_p(p["layer_norm1"], x)
        x = x + _self_attn(p["self_attn"], h, cfg.heads, causal)
        h = layer_norm_p(p["layer_norm2"], x)
        x = x + _mlp(p["mlp"], h, act)
        if i + 1 == stop_idx:
            hidden_at_stop = x

    hidden = hidden_at_stop if hidden_at_stop is not None else x
    if apply_final_norm:
        hidden = layer_norm_p(params["final_layer_norm"], hidden)

    final = layer_norm_p(params["final_layer_norm"], x)
    eot = jnp.argmax(tokens, axis=-1)
    pooled = jnp.take_along_axis(final, eot[:, None, None], axis=1)[:, 0]
    if "text_projection" in params:
        pooled = linear(params["text_projection"], pooled)
    return hidden, pooled


def encode_with_fixes(params, cfg: CLIPTextConfig, tokens, fixes_per_item,
                      stop_at_layer: int = 0, apply_final_norm: bool = True):
    """`encode` with textual-inversion embedding rows spliced in after token
    embedding (the reference's EmbeddingsWithFixes, modules/sd_hijack.py:340).

    fixes_per_item: per batch row, list of (chunk_position, embedding) where
    embedding has `.vectors` (row count) and `.vec` (vectors, width) data;
    chunk_position is 0-based within the 75-token payload (BOS offset +1
    applied here).
    """
    if not any(fixes_per_item or []):
        return encode(params, cfg, tokens, stop_at_layer, apply_final_norm)

    emb_table = params["embeddings"]["token_embedding"]["weight"]
    x = jnp.take(emb_table, tokens, axis=0)
    for i, fixes in enumerate(fixes_per_item):
        for pos, emb in fixes or []:
            vec = jnp.asarray(emb.vec)[:, : x.shape[-1]].astype(x.dtype)
            x = x.at[i, pos + 1: pos + 1 + emb.vectors].set(vec)
    return encode(params, cfg, tokens, stop_at_layer, apply_final_norm,
                  inputs_embeds=x)


# --------------------------------------------------------------------------
# init
# --------------------------------------------------------------------------

def init_params(cfg: CLIPTextConfig, key, dtype=jnp.float32, ini=None):
    from sdwebui_tpu.models.init_utils import HostInit

    ini = ini or HostInit(key)
    lin = lambda cin, cout, bias=True: ini.linear(cin, cout, dtype, bias=bias)
    norm = lambda c: ini.norm(c, dtype)

    w = cfg.width
    layers = {}
    for i in range(cfg.layers):
        layers[str(i)] = {
            "layer_norm1": norm(w), "layer_norm2": norm(w),
            "self_attn": {"q_proj": lin(w, w), "k_proj": lin(w, w),
                          "v_proj": lin(w, w), "out_proj": lin(w, w)},
            "mlp": {"fc1": lin(w, w * 4), "fc2": lin(w * 4, w)},
        }
    params = {
        "embeddings": {
            "token_embedding": ini.embedding(cfg.vocab_size, w, dtype, scale=0.02),
            "position_embedding": ini.embedding(cfg.max_length, w, dtype, scale=0.01),
        },
        "encoder": {"layers": layers},
        "final_layer_norm": norm(w),
    }
    if cfg.projection_dim:
        params["text_projection"] = lin(w, cfg.projection_dim, bias=False)
    return params
