"""Checkpoint merger (reference run_modelmerger, modules/extras.py:88):
weighted-sum / add-difference over raw state dicts, optional VAE bake,
fp16 save, merge-recipe metadata."""

from __future__ import annotations

import os

import numpy as np


def _interp_weighted_sum(a, b, _c, alpha):
    return a * (1.0 - alpha) + b * alpha


def _interp_add_difference(a, b, c, alpha):
    return a + (b - c) * alpha


INTERP_METHODS = {
    "Weighted sum": _interp_weighted_sum,
    "Add difference": _interp_add_difference,
    "No interpolation": None,
}

_SKIP_VAE_PREFIX = "first_stage_model."


def merge_checkpoints(primary: dict, secondary: dict | None = None,
                      tertiary: dict | None = None,
                      method: str = "Weighted sum", multiplier: float = 0.5,
                      save_as_half: bool = False, vae: dict | None = None,
                      discard_weights: str = "") -> dict:
    """state dicts → merged state dict (torch layout, numpy arrays)."""
    import re

    fn = INTERP_METHODS.get(method)
    if method == "Add difference" and tertiary is None:
        raise ValueError("Add difference requires a tertiary model")

    out = {}
    for key, a in primary.items():
        a = np.asarray(a)
        if fn is not None and secondary is not None and key in secondary \
                and not key.startswith("model_ema."):
            b = np.asarray(secondary[key])
            c = np.asarray(tertiary[key]) if tertiary is not None and key in tertiary else 0
            if a.shape == np.shape(b):
                af = a.astype(np.float32)
                bf = np.asarray(b, np.float32)
                cf = np.asarray(c, np.float32)
                out[key] = fn(af, bf, cf, multiplier)
            elif a.ndim == 4 and np.ndim(b) == 4 and a.shape[1] != b.shape[1]:
                # inpaint(9ch)+normal(4ch) conv_in merge: blend shared channels
                af = a.astype(np.float32).copy()
                bf = np.asarray(b, np.float32)
                n = min(a.shape[1], bf.shape[1])
                cf = np.asarray(c, np.float32) if np.ndim(c) == 4 else 0
                af[:, :n] = fn(af[:, :n], bf[:, :n],
                               cf[:, :n] if np.ndim(cf) == 4 else 0, multiplier)
                out[key] = af
            else:
                out[key] = a
        else:
            out[key] = a

    if vae is not None:  # bake external VAE
        for k, v in vae.items():
            out[_SKIP_VAE_PREFIX + k] = np.asarray(v)

    if discard_weights:
        pat = re.compile(discard_weights)
        out = {k: v for k, v in out.items() if not pat.search(k)}

    if save_as_half:
        out = {k: (np.asarray(v).astype(np.float16)
                   if np.issubdtype(np.asarray(v).dtype, np.floating) else v)
               for k, v in out.items()}
    return out


def run_modelmerger(primary_path: str, secondary_path: str | None,
                    tertiary_path: str | None, method: str,
                    multiplier: float, save_as_half: bool,
                    output_name: str, output_dir: str = "models/Stable-diffusion",
                    bake_in_vae_path: str | None = None,
                    discard_weights: str = "") -> str:
    from sdwebui_tpu.loader.load import read_checkpoint
    from sdwebui_tpu.loader.safetensors_io import write_safetensors

    primary = read_checkpoint(primary_path)
    secondary = read_checkpoint(secondary_path) if secondary_path else None
    tertiary = read_checkpoint(tertiary_path) if tertiary_path else None
    vae = read_checkpoint(bake_in_vae_path) if bake_in_vae_path else None

    merged = merge_checkpoints(primary, secondary, tertiary, method,
                               multiplier, save_as_half, vae, discard_weights)
    os.makedirs(output_dir, exist_ok=True)
    out_path = os.path.join(output_dir, f"{output_name}.safetensors")
    write_safetensors(out_path, merged, metadata={
        "sd_merge_recipe": f"{method} {multiplier} "
                           f"{os.path.basename(primary_path)} + "
                           f"{os.path.basename(secondary_path or '')}",
        "format": "pt"})
    return out_path
