"""Token merging (ToMe for SD) — static-shape JAX implementation.

Reference: modules/sd_hijack_optimizations + the tomesd package applied via
opts.token_merging_ratio (modules/processing.py applies it per generation).
Algorithm (Bolya & Hoffman 2023, "Token Merging for Fast Stable Diffusion"):
split the h×w token grid into dst (one per sx×sy block) and src (the rest),
find each src's most-similar dst, merge the top-r src tokens into their dst
by averaging, run self-attention on the reduced set, then unmerge (merged
positions read their dst's output).

TPU notes: r = int(N·ratio) is static, so every shape in the merged path is
static (argsort/argmax produce dynamic *indices*, not shapes) — the whole
thing jits into the fused sampling program.  dst selection is deterministic
(block top-left), matching tomesd's no_rand mode, so results are
reproducible under jit.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _grid_split(h: int, w: int, sx: int = 2, sy: int = 2):
    """Static (dst_pos, src_pos) index arrays over the flat h·w grid."""
    ys, xs = np.meshgrid(np.arange(0, h, sy), np.arange(0, w, sx),
                         indexing="ij")
    dst = (ys * w + xs).reshape(-1)
    mask = np.ones(h * w, bool)
    mask[dst] = False
    src = np.nonzero(mask)[0]
    return dst, src


def build_merge(x, h: int, w: int, ratio: float, sx: int = 2, sy: int = 2):
    """Returns (merge, unmerge, merged_len) for tokens x: (B, h·w, C), or
    None when the ratio/grid makes merging a no-op."""
    n = h * w
    if x.shape[1] != n or h % sy or w % sx:
        return None
    dst_pos, src_pos = _grid_split(h, w, sx, sy)
    r = min(int(n * ratio), len(src_pos))
    if r <= 0:
        return None

    metric = x / jnp.maximum(
        jnp.linalg.norm(x.astype(jnp.float32), axis=-1, keepdims=True), 1e-6)
    a = metric[:, src_pos]                      # (B, S, C)
    b = metric[:, dst_pos]                      # (B, D, C)
    scores = a @ b.transpose(0, 2, 1)           # (B, S, D)
    node_max = scores.max(-1)
    node_idx = scores.argmax(-1)                # (B, S) best dst per src
    order = jnp.argsort(-node_max, axis=-1)     # most similar first
    merged_src = order[:, :r]                   # (B, r) indices into src set
    kept_src = order[:, r:]                     # (B, S-r)
    tgt = jnp.take_along_axis(node_idx, merged_src, axis=1)   # (B, r)

    dst_pos_j = jnp.asarray(dst_pos)
    src_pos_j = jnp.asarray(src_pos)
    n_dst = len(dst_pos)
    s_kept = len(src_pos) - r

    def merge(t):
        tsrc = t[:, src_pos_j]
        tdst = t[:, dst_pos_j]
        kept = jnp.take_along_axis(
            tsrc, kept_src[..., None].repeat(t.shape[-1], -1), axis=1)
        mvals = jnp.take_along_axis(
            tsrc, merged_src[..., None].repeat(t.shape[-1], -1), axis=1)
        # scatter-mean including the original dst value (tomesd mode="mean")
        b_idx = jnp.arange(t.shape[0])[:, None].repeat(r, 1)
        summed = tdst.at[b_idx, tgt].add(mvals)
        counts = jnp.ones((t.shape[0], n_dst), t.dtype) \
            .at[b_idx, tgt].add(1.0)
        tdst = summed / counts[..., None]
        return jnp.concatenate([kept, tdst], axis=1)   # (B, S-r+D, C)

    def unmerge(t):
        kept, tdst = t[:, :s_kept], t[:, s_kept:]
        c = t.shape[-1]
        out = jnp.zeros((t.shape[0], n, c), t.dtype)
        b_all = jnp.arange(t.shape[0])[:, None]
        out = out.at[b_all.repeat(n_dst, 1), dst_pos_j[None].repeat(t.shape[0], 0)].set(tdst)
        kept_abs = jnp.take_along_axis(
            src_pos_j[None].repeat(t.shape[0], 0), kept_src, axis=1)
        out = out.at[b_all.repeat(s_kept, 1), kept_abs].set(kept)
        merged_abs = jnp.take_along_axis(
            src_pos_j[None].repeat(t.shape[0], 0), merged_src, axis=1)
        merged_out = jnp.take_along_axis(
            tdst, tgt[..., None].repeat(c, -1), axis=1)
        out = out.at[b_all.repeat(r, 1), merged_abs].set(merged_out)
        return out

    return merge, unmerge, s_kept + n_dst
