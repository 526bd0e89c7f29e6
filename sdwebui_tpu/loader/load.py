"""Checkpoint → SDModel (the reference's load_model, modules/sd_models.py:786).

One pass: read (safetensors mmap or restricted .ckpt) → sniff family →
derive configs from shapes → convert layouts → cast per dtype policy
(UNet bf16, VAE fp32, CLIP fp32) → ONE `jax.device_put` per component
(batched transfer — per-leaf uploads through the TPU tunnel cost ~0.5s
each, SURVEY finding) → assemble conditioners + discretization.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from sdwebui_tpu.loader import convert, sniff
from sdwebui_tpu.loader.safetensors_io import read_state_dict
from sdwebui_tpu.loader.torch_ckpt import load_torch_checkpoint
from sdwebui_tpu.pipeline.sd_model import SDModel
from sdwebui_tpu.sampling.discretization import Discretization, make_alphas_cumprod
from sdwebui_tpu.text.conditioner import TextConditioner
from sdwebui_tpu.text.tokenizer import get_tokenizer
from sdwebui_tpu.utils import devices


_SD_CACHE: dict = {}


def read_checkpoint(path: str, cache_opt: str = "sd_checkpoint_cache") -> dict:
    """File → state dict, with an optional host-RAM LRU keyed by (path,
    mtime) sized by opts.sd_checkpoint_cache / sd_vae_checkpoint_cache
    (reference sd_models.py checkpoints_loaded, sd_vae.py vae_dict cache) —
    switching skips the re-read+unpickle."""
    from sdwebui_tpu.utils.options import opts as _opts

    cache_n = int(_opts.get(cache_opt, 0) or 0)
    key = None
    if cache_n > 0:
        try:
            key = (path, os.path.getmtime(path))
        except OSError:
            key = None
        if key is not None and key in _SD_CACHE:
            _SD_CACHE[key] = _SD_CACHE.pop(key)   # LRU touch
            return _SD_CACHE[key]
    if path.endswith(".safetensors"):
        sd = read_state_dict(path)
    else:
        sd = load_torch_checkpoint(path)
    if key is not None:
        _SD_CACHE[key] = sd
        while len(_SD_CACHE) > cache_n:
            _SD_CACHE.pop(next(iter(_SD_CACHE)))
    return sd


def load_model(path: str, prediction_type: str | None = None,
               title: str | None = None, sha256: str = "",
               embedding_db=None) -> SDModel:
    sd = read_checkpoint(path)
    return model_from_state_dict(
        sd, prediction_type=prediction_type,
        title=title or os.path.basename(path), sha256=sha256,
        embedding_db=embedding_db)


def resolve_vae(checkpoint_path: str, vae_dirs=("models/VAE",)) -> str | None:
    """The reference's VAE selection chain (modules/sd_vae.py resolve_vae):
    1) opts.sd_vae == "None" → embedded VAE;  2) an explicit sd_vae name is
    looked up in models/VAE;  3) "Automatic" prefers a same-basename
    .vae.{pt,ckpt,safetensors} next to the checkpoint, then models/VAE."""
    import glob

    from sdwebui_tpu.utils.options import opts

    choice = opts.get("sd_vae", "Automatic")
    if choice == "None":
        return None
    exts = (".vae.safetensors", ".vae.pt", ".vae.ckpt", ".safetensors", ".pt",
            ".ckpt")

    def near_checkpoint():
        base_ = os.path.splitext(checkpoint_path)[0]
        for ext_ in (".vae.safetensors", ".vae.pt", ".vae.ckpt"):
            if os.path.isfile(base_ + ext_):
                return base_ + ext_
        return None

    if choice not in ("Automatic", None, "") \
            and not opts.get("sd_vae_overrides_per_model_preferences", True):
        # reference sd_vae.py:162: with the override option off, a VAE found
        # near the checkpoint beats the explicit setting
        near = near_checkpoint()
        if near is not None:
            return near
    if choice not in ("Automatic", None, ""):
        for d in vae_dirs:
            for ext in exts:
                cand = os.path.join(d, choice if choice.endswith(ext)
                                    else choice + ext)
                if os.path.isfile(cand):
                    return cand
            hit = glob.glob(os.path.join(d, choice))
            if hit:
                return hit[0]
        return None
    base = os.path.splitext(checkpoint_path)[0]
    for ext in (".vae.safetensors", ".vae.pt", ".vae.ckpt"):
        if os.path.isfile(base + ext):
            return base + ext
    name = os.path.basename(base)
    for d in vae_dirs:
        for ext in (".vae.safetensors", ".vae.pt", ".vae.ckpt"):
            cand = os.path.join(d, name + ext)
            if os.path.isfile(cand):
                return cand
    return None


loaded_vae_file: str | None = None
"""Path of the external VAE currently merged into the live model (the
reference tracks this as sd_vae.loaded_vae_file; [vae_filename] pattern)."""


def load_external_vae(path: str, scale_factor: float = 0.18215):
    """Standalone .vae.pt/.safetensors → (vae_tree, VAEConfig) — the
    reference's VAE selection chain (modules/sd_vae.py:168 resolve_vae →
    load_vae). Keys may carry the first_stage_model prefix or be bare."""
    global loaded_vae_file
    loaded_vae_file = path
    sd = read_checkpoint(path, cache_opt="sd_vae_checkpoint_cache")
    prefix = "first_stage_model." if any(
        k.startswith("first_stage_model.") for k in sd) else ""
    if prefix:
        sd = {k: v for k, v in sd.items() if k.startswith(prefix)}
    else:
        sd = {"first_stage_model." + k: v for k, v in sd.items()
              if k.startswith(("encoder.", "decoder.", "quant_conv.",
                               "post_quant_conv."))}
    tree, cfg = convert.convert_vae(sd, scale_factor=scale_factor)
    policy = devices.get_policy()
    return jax.device_put(convert.cast_tree(tree, policy.vae_dtype)), cfg


def model_from_state_dict(sd: dict, prediction_type: str | None = None,
                          title: str = "checkpoint", sha256: str = "",
                          embedding_db=None) -> SDModel:
    info = sniff.sniff(sd)
    policy = devices.get_policy()
    tok = get_tokenizer()

    if info.family == "sd3":
        unet_tree, unet_cfg = convert.convert_mmdit(sd)
    else:
        unet_tree, unet_cfg = convert.convert_unet(sd)
    unet_tree = jax.device_put(convert.cast_tree(unet_tree, policy.param_dtype))

    scale = 0.13025 if info.family.startswith("sdxl") else \
        (1.5305 if info.family == "sd3" else 0.18215)
    vae_tree, vae_cfg = convert.convert_vae(sd, scale_factor=scale)
    if info.family == "sd3":
        import dataclasses as _dc

        vae_cfg = _dc.replace(vae_cfg, shift_factor=0.0609)
    vae_tree = jax.device_put(convert.cast_tree(vae_tree, policy.vae_dtype))

    cond2 = None
    if info.family == "sd1":
        tree, ccfg = convert.convert_clip_hf(
            sd, "cond_stage_model.transformer.text_model.")
        cond = TextConditioner(convert.cast_tree(tree, jnp.float32), ccfg, tok,
                               embedding_db=embedding_db)
    elif info.family == "sd2":
        tree, ccfg = convert.convert_clip_openclip(sd, "cond_stage_model.model.")
        # SD2 conditions on the penultimate layer (open_clip layer="penultimate")
        cond = TextConditioner(convert.cast_tree(tree, jnp.float32), ccfg, tok,
                               clip_skip=2, embedding_db=embedding_db)
    elif info.family == "sdxl":
        tree1, ccfg1 = convert.convert_clip_hf(
            sd, "conditioner.embedders.0.transformer.text_model.")
        tree2, ccfg2 = convert.convert_clip_openclip(
            sd, "conditioner.embedders.1.model.")
        # sgm: CLIP-L 'hidden' layer 11, NO final LN; bigG penultimate, no LN
        cond = TextConditioner(convert.cast_tree(tree1, jnp.float32), ccfg1, tok,
                               clip_skip=2, apply_final_norm=False,
                               embedding_db=embedding_db)
        cond2 = TextConditioner(convert.cast_tree(tree2, jnp.float32), ccfg2, tok,
                                clip_skip=2, apply_final_norm=False,
                                embedding_db=embedding_db)
    elif info.family == "sdxl-refiner":
        tree2, ccfg2 = convert.convert_clip_openclip(
            sd, "conditioner.embedders.0.model.")
        cond = TextConditioner(convert.cast_tree(tree2, jnp.float32), ccfg2, tok,
                               clip_skip=2, apply_final_norm=False,
                               embedding_db=embedding_db)
    elif info.family == "sd3":
        # bundled encoders (text_encoders.clip_l / clip_g); bundled T5-XXL
        # converted when present and opts.sd3_enable_t5 (reference default
        # False); encode-from-text additionally needs a tokenizer
        tree1, ccfg1 = convert.convert_clip_hf(
            sd, "text_encoders.clip_l.transformer.text_model.")
        tree2, ccfg2 = convert.convert_clip_openclip(
            sd, "text_encoders.clip_g.model.")
        cond = TextConditioner(convert.cast_tree(tree1, jnp.float32), ccfg1, tok,
                               clip_skip=2, apply_final_norm=False,
                               embedding_db=embedding_db)
        cond2 = TextConditioner(convert.cast_tree(tree2, jnp.float32), ccfg2, tok,
                                clip_skip=2, apply_final_norm=False,
                                embedding_db=embedding_db)
    elif info.family == "alt":
        # AltDiffusion: XLM-R conditioner (reference modules/xlmr.py);
        # generation additionally needs a user-supplied SentencePiece
        # tokenizer plugged into AltConditioner (zero-egress image carries
        # no XLM-R vocab file)
        from sdwebui_tpu.models.xlmr import AltConditioner, convert_xlmr

        alt_tree, alt_cfg = convert_xlmr(sd)
        cond = AltConditioner(
            convert.cast_tree(alt_tree, jnp.float32), alt_cfg)
        cond2 = None
    else:
        raise NotImplementedError(f"family {info.family} not yet supported")

    pred = prediction_type or info.prediction_type
    if info.family == "sd3":
        from sdwebui_tpu.sampling.discretization import FlowDiscretization

        disc = FlowDiscretization(shift=3.0)
    else:
        # ldm betas live in the checkpoint for some models; default else
        disc = Discretization(make_alphas_cumprod(), prediction_type=pred)

    t5_tree = t5_cfg = t5_tok = None
    if info.family == "sd3":
        from sdwebui_tpu.utils.options import opts as _opts

        has_t5 = any(k.startswith("text_encoders.t5xxl.") for k in sd)
        if has_t5 and _opts.get("sd3_enable_t5", False):
            from sdwebui_tpu.models.t5 import convert_t5

            t5_tree, t5_cfg = convert_t5(sd)
            t5_tree = jax.device_put(
                convert.cast_tree(t5_tree, policy.param_dtype))
            t5_tok = find_spm_tokenizer("models/T5", make="t5")
    elif info.family == "alt" and cond.tokenizer is None:
        cond.tokenizer = find_spm_tokenizer("models/XLM-R", make="xlmr")

    # SD2 conditioning variants: unclip (CLIP-vision embedder +
    # noise-augmentor stats → crossattn-adm) and depth2img (MiDaS tower →
    # hybrid 5ch concat) ship their towers inside the checkpoint
    emb_tree = emb_cfg = aug_stats = None
    depth_tree = depth_cfg = None
    if info.variant == "unclip":
        from sdwebui_tpu.models.clip_vision import convert_openclip_vision

        emb_tree, emb_cfg = convert_openclip_vision(sd)
        emb_tree = jax.device_put(convert.cast_tree(emb_tree, jnp.float32))
        aug_stats = {
            "mean": np.asarray(sd["noise_augmentor.data_mean"],
                               np.float32).reshape(-1),
            "std": np.asarray(sd["noise_augmentor.data_std"],
                              np.float32).reshape(-1),
        }
    elif info.variant == "depth":
        from sdwebui_tpu.models.midas import convert_dpt

        depth_tree, depth_cfg = convert_dpt(sd, prefix="depth_model.model.")
        depth_tree = jax.device_put(
            convert.cast_tree(depth_tree, jnp.float32))

    return SDModel(kind=info.family, unet_params=unet_tree, unet_cfg=unet_cfg,
                   vae_params=vae_tree, vae_cfg=vae_cfg, disc=disc,
                   conditioner=cond, conditioner2=cond2,
                   title=f"{title} [{sha256[:10]}]" if sha256 else title,
                   sha256=sha256, t5_params=t5_tree, t5_cfg=t5_cfg,
                   t5_tokenizer=t5_tok,
                   image_embedder_params=emb_tree, image_embedder_cfg=emb_cfg,
                   noise_aug_stats=aug_stats,
                   depth_params=depth_tree, depth_cfg=depth_cfg)


def find_spm_tokenizer(dirpath: str, make: str = "t5"):
    """Load a user-supplied SentencePiece .model / tokenizer.json from
    `dirpath` (pure-python reader, text/sentencepiece.py); None when the
    directory has no tokenizer data."""
    import glob

    hits = sorted(glob.glob(os.path.join(dirpath, "*.model"))) + \
        sorted(glob.glob(os.path.join(dirpath, "tokenizer.json")))
    if not hits:
        return None
    from sdwebui_tpu.text.sentencepiece import (make_t5_tokenizer,
                                                make_xlmr_tokenizer)

    maker = make_t5_tokenizer if make == "t5" else make_xlmr_tokenizer
    return maker(hits[0])
