"""Checkpoint key-layout contract tests (VERDICT r2 item 3).

The manifests under tests/fixtures/key_manifests/ are authored by
generate_manifests.py — a standalone script replaying the module-composition
rules of the code that PRODUCES public checkpoints (ldm/sgm UNetModel,
AutoencoderKL, transformers CLIPTextModel, open_clip towers) without
importing any repo code.  These tests feed full-size synthetic state dicts
built from the manifests through the loader and assert:

  1. the architecture sniffer classifies each family correctly,
  2. the converted UNet/VAE/CLIP param trees mirror the checkpoint key
     inventory exactly (renaming any repo param breaks this; a checkpoint
     key the loader ignores breaks it too),
  3. derived configs match the family constants,
  4. a missing checkpoint weight fails LOUDLY at load time
     (loader/convert.verify_tree_names), never a silent random layer, and
  5. unknown junk keys are dropped with a warning, not crashed on
     (the reference's load_state_dict(strict=False) tolerance).

Full-size shapes (SD1.5 ≈ 1.1B params, SDXL ≈ 3.5B) are materialized as
fp16 zeros; the heavyweight families carry the `slow` marker.
"""

import json
import os

import numpy as np
import pytest

from sdwebui_tpu.loader import convert, sniff
from sdwebui_tpu.utils.pytree import flatten

MANIFEST_DIR = os.path.join(os.path.dirname(__file__), "fixtures",
                            "key_manifests")

# Non-weight keys the loader legitimately never maps into param trees:
# ldm DDPM schedule buffers (the schedule is recomputed from the betas
# formula — reference repair_config does the same normalization), EMA
# bookkeeping scalars, the transformers-era position_ids int buffer
# (positions are implicit), and open_clip's contrastive-training scalar.
IGNORABLE = {
    "betas", "alphas_cumprod", "alphas_cumprod_prev", "sqrt_alphas_cumprod",
    "sqrt_one_minus_alphas_cumprod", "log_one_minus_alphas_cumprod",
    "sqrt_recip_alphas_cumprod", "sqrt_recipm1_alphas_cumprod",
    "posterior_variance", "posterior_log_variance_clipped",
    "posterior_mean_coef1", "posterior_mean_coef2", "logvar",
    "model_ema.decay", "model_ema.num_updates",
}


def ignorable(key: str) -> bool:
    base = key.split(".")[-1]
    return key in IGNORABLE or base in ("position_ids", "logit_scale")


def load_manifest(name):
    with open(os.path.join(MANIFEST_DIR, f"{name}.json")) as f:
        return json.load(f)


def synth_state_dict(manifest):
    out = {}
    for key, shape in manifest.items():
        if key.split(".")[-1] in ("position_ids", "num_updates"):
            out[key] = np.zeros(shape, np.int64)
        else:
            out[key] = np.zeros(shape, np.float16)
    return out


def _openclip_expected_leaves(manifest, prefix, layers):
    """Key count after the documented open_clip → HF re-keying: logit_scale
    dropped; each fused in_proj weight+bias pair becomes 3 q/k/v pairs."""
    n = sum(1 for k in manifest if k.startswith(prefix))
    return n - 1 + 4 * layers


FAMILIES = [
    # (manifest, sniff family, unet cfg probes, text encoder spec)
    pytest.param("sd15", "sd1",
                 dict(model_channels=320, in_channels=4, context_dim=768,
                      adm_in_channels=0, use_linear_in_transformer=False),
                 [("hf", "cond_stage_model.transformer.text_model.",
                   768, 12)], id="sd15"),
    pytest.param("sd15_inpaint", "sd1",
                 dict(model_channels=320, in_channels=9, context_dim=768),
                 [("hf", "cond_stage_model.transformer.text_model.",
                   768, 12)], id="sd15_inpaint"),
    pytest.param("sd21", "sd2",
                 dict(model_channels=320, context_dim=1024,
                      use_linear_in_transformer=True),
                 [("openclip", "cond_stage_model.model.", 1024, 23)],
                 id="sd21"),
    pytest.param("sdxl_base", "sdxl",
                 dict(model_channels=320, context_dim=2048,
                      adm_in_channels=2816, channel_mult=(1, 2, 4),
                      transformer_depth=(0, 2, 10)),
                 [("hf", "conditioner.embedders.0.transformer.text_model.",
                   768, 12),
                  ("openclip", "conditioner.embedders.1.model.", 1280, 32)],
                 marks=pytest.mark.slow, id="sdxl_base"),
    pytest.param("sdxl_refiner", "sdxl-refiner",
                 dict(model_channels=384, context_dim=1280,
                      adm_in_channels=2560),
                 [("openclip", "conditioner.embedders.0.model.", 1280, 32)],
                 marks=pytest.mark.slow, id="sdxl_refiner"),
]


@pytest.mark.parametrize("name,family,unet_probes,text_specs", FAMILIES)
def test_manifest_roundtrip(name, family, unet_probes, text_specs):
    manifest = load_manifest(name)
    sd = synth_state_dict(manifest)

    info = sniff.sniff(sd)
    assert info.family == family

    # UNet: config derivation + exact key mirror
    unet_tree, unet_cfg = convert.convert_unet(sd)
    for field, expected in unet_probes.items():
        assert getattr(unet_cfg, field) == expected, field
    unet_prefix = "model.diffusion_model."
    manifest_unet = {k for k in manifest if k.startswith(unet_prefix)}
    tree_keys = {unet_prefix + k for k in flatten(unet_tree)}
    assert tree_keys == manifest_unet, (
        sorted(manifest_unet - tree_keys)[:5],
        sorted(tree_keys - manifest_unet)[:5])
    del unet_tree

    # VAE: exact key mirror
    vae_tree, vae_cfg = convert.convert_vae(sd)
    assert (vae_cfg.ch, tuple(vae_cfg.ch_mult), vae_cfg.embed_dim) == \
        (128, (1, 2, 4, 4), 4)
    vae_prefix = "first_stage_model."
    manifest_vae = {k for k in manifest if k.startswith(vae_prefix)}
    assert {vae_prefix + k for k in flatten(vae_tree)} == manifest_vae
    del vae_tree

    # text encoders: exact mirror for HF layout; exact re-keyed leaf count
    # + config for open_clip (documented q/k/v split of in_proj)
    for kind, prefix, width, layers in text_specs:
        if kind == "hf":
            tree, ccfg = convert.convert_clip_hf(sd, prefix)
            manifest_clip = {k for k in manifest if k.startswith(prefix)
                             and not ignorable(k)}
            assert {prefix + k for k in flatten(tree)} == manifest_clip
        else:
            tree, ccfg = convert.convert_clip_openclip(sd, prefix)
            got = len(flatten(tree))
            manifest_n = sum(1 for k in manifest if k.startswith(prefix))
            assert got == manifest_n - 1 + 4 * layers  # see helper docstring
        assert (ccfg.width, ccfg.layers) == (width, layers), prefix
        del tree

    # every manifest key is either mapped into a tree (asserted above by
    # the exact mirrors) or documented-ignorable
    prefixes = [unet_prefix, vae_prefix] + [p for _, p, _, _ in text_specs]
    stray = {k for k in manifest
             if not any(k.startswith(p) for p in prefixes)
             and not ignorable(k)}
    assert not stray, sorted(stray)[:10]


@pytest.mark.parametrize("victim", [
    "model.diffusion_model.input_blocks.1.1.transformer_blocks.0.attn2.to_k.weight",
    "model.diffusion_model.out.2.weight",
    "first_stage_model.decoder.up.2.block.1.conv1.weight",
    "cond_stage_model.transformer.text_model.encoder.layers.7.mlp.fc1.weight",
])
def test_missing_key_fails_loudly(victim):
    """Deleting any weight must raise at load, never silently random-init
    (loader/convert.verify_tree_names)."""
    manifest = load_manifest("sd15")
    sd = synth_state_dict(manifest)
    del sd[victim]
    with pytest.raises(ValueError, match="missing"):
        if victim.startswith("model.diffusion_model."):
            convert.convert_unet(sd)
        elif victim.startswith("first_stage_model."):
            convert.convert_vae(sd)
        else:
            convert.convert_clip_hf(
                sd, "cond_stage_model.transformer.text_model.")


def test_junk_keys_dropped_with_warning(caplog):
    """Unknown extra tensors (merge junk) are dropped, not crashed on —
    mirroring the reference's strict=False tolerance — and logged."""
    import logging

    manifest = load_manifest("sd15")
    sd = synth_state_dict(manifest)
    sd["model.diffusion_model.middle_block.0.bogus_extra.weight"] = \
        np.zeros((8, 8), np.float16)
    with caplog.at_level(logging.WARNING, logger="sdwebui_tpu"):
        tree, _ = convert.convert_unet(sd)
    assert "bogus_extra" not in str(flatten(tree).keys())
    assert any("unexpected" in r.message for r in caplog.records)


def test_ssd_style_pruned_groups_still_load():
    """SSD-1B-style pruning removes whole transformer blocks / the middle
    attention — those must keep loading (reference convert_sdxl_to_ssd)."""
    manifest = load_manifest("sd15")
    sd = synth_state_dict(manifest)
    pruned_prefixes = (
        "model.diffusion_model.middle_block.1.",
        "model.diffusion_model.middle_block.2.",
        "model.diffusion_model.input_blocks.4.1.transformer_blocks.0.",
    )
    for k in [k for k in sd if k.startswith(pruned_prefixes)]:
        del sd[k]
    tree, cfg = convert.convert_unet(sd)
    assert "1" not in tree["middle_block"]


def test_manifests_regenerate_identically():
    """The checked-in JSONs match the generator's output (auditability:
    the generator is the authored spec, the JSONs the committed contract)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "gen_manifests",
        os.path.join(MANIFEST_DIR, "generate_manifests.py"))
    gen = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(gen)
    for name, fn in gen.FAMILIES.items():
        assert fn() == load_manifest(name), name


def test_sd15_full_model_from_state_dict():
    """End to end through model_from_state_dict: full-size SD1.5 synthetic
    checkpoint loads into a complete SDModel with the family constants."""
    from sdwebui_tpu.loader.load import model_from_state_dict
    from sdwebui_tpu.models.configs import SD15_UNET

    manifest = load_manifest("sd15")
    sd = synth_state_dict(manifest)
    model = model_from_state_dict(sd, title="manifest-sd15")
    assert model.kind == "sd1"
    assert model.unet_cfg.model_channels == SD15_UNET.model_channels
    assert model.latent_channels == 4
    assert model.conditioner.cfg.width == 768
