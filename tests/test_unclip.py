"""SD2.1-unclip (crossattn-adm) support: sniffing, open_clip vision
conversion, noise-augmented adm vectors, end-to-end generation.

Reference behavior: modules/processing.py:113 (txt2img zero adm),
:328-334 (unclip_image_conditioning), sd_models_config.py yaml pick of
v2-1-stable-unclip; the checkpoint bundles the FrozenOpenCLIPImageEmbedder
tower and CLIPEmbeddingNoiseAugmentation data stats.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from sdwebui_tpu.loader import convert, sniff  # noqa: E402
from sdwebui_tpu.models import unet as unet_model  # noqa: E402
from sdwebui_tpu.models.clip_vision import (  # noqa: E402
    CLIPVisionConfig, convert_clip_vision, convert_openclip_vision,
)
from sdwebui_tpu.models.configs import UNetConfig  # noqa: E402
from sdwebui_tpu.utils.pytree import flatten  # noqa: E402

VIS_WIDTH, VIS_LAYERS, VIS_PATCH, VIS_IMG, VIS_PROJ = 64, 2, 16, 32, 32


def _openclip_visual_sd(rng, prefix="embedder.model.visual."):
    """Random open_clip-layout VisionTransformer state dict (torch key
    names/orientations) + the equivalent HF CLIPVisionModel layout."""
    n_tok = (VIS_IMG // VIS_PATCH) ** 2 + 1
    oc, hf = {}, {}

    def both(oc_key, hf_key, arr):
        oc[prefix + oc_key] = arr
        if hf_key:
            hf["vision_model." + hf_key] = arr

    both("class_embedding", "embeddings.class_embedding",
         rng.standard_normal(VIS_WIDTH).astype(np.float32))
    both("positional_embedding", "embeddings.position_embedding.weight",
         rng.standard_normal((n_tok, VIS_WIDTH)).astype(np.float32))
    both("conv1.weight", "embeddings.patch_embedding.weight",
         rng.standard_normal((VIS_WIDTH, 3, VIS_PATCH, VIS_PATCH))
         .astype(np.float32) * 0.02)
    for oc_ln, hf_ln in (("ln_pre", "pre_layrnorm"),
                         ("ln_post", "post_layernorm")):
        both(f"{oc_ln}.weight", f"{hf_ln}.weight",
             np.ones(VIS_WIDTH, np.float32))
        both(f"{oc_ln}.bias", f"{hf_ln}.bias",
             np.zeros(VIS_WIDTH, np.float32))
    for i in range(VIS_LAYERS):
        o = f"transformer.resblocks.{i}."
        h = f"encoder.layers.{i}."
        qkv_w = rng.standard_normal((3 * VIS_WIDTH, VIS_WIDTH)) \
            .astype(np.float32) * 0.02
        qkv_b = rng.standard_normal(3 * VIS_WIDTH).astype(np.float32) * 0.02
        oc[prefix + o + "attn.in_proj_weight"] = qkv_w
        oc[prefix + o + "attn.in_proj_bias"] = qkv_b
        for j, n in enumerate("qkv"):
            hf["vision_model." + h + f"self_attn.{n}_proj.weight"] = \
                qkv_w[j * VIS_WIDTH:(j + 1) * VIS_WIDTH]
            hf["vision_model." + h + f"self_attn.{n}_proj.bias"] = \
                qkv_b[j * VIS_WIDTH:(j + 1) * VIS_WIDTH]
        for oc_n, hf_n, shape in (
                ("attn.out_proj", "self_attn.out_proj",
                 (VIS_WIDTH, VIS_WIDTH)),
                ("mlp.c_fc", "mlp.fc1", (VIS_WIDTH * 4, VIS_WIDTH)),
                ("mlp.c_proj", "mlp.fc2", (VIS_WIDTH, VIS_WIDTH * 4))):
            w = rng.standard_normal(shape).astype(np.float32) * 0.02
            b = rng.standard_normal(shape[0]).astype(np.float32) * 0.02
            oc[prefix + o + oc_n + ".weight"] = w
            oc[prefix + o + oc_n + ".bias"] = b
            hf["vision_model." + h + hf_n + ".weight"] = w
            hf["vision_model." + h + hf_n + ".bias"] = b
        for oc_ln, hf_ln in (("ln_1", "layer_norm1"), ("ln_2", "layer_norm2")):
            g = np.ones(VIS_WIDTH, np.float32)
            bb = np.zeros(VIS_WIDTH, np.float32)
            oc[prefix + o + oc_ln + ".weight"] = g
            oc[prefix + o + oc_ln + ".bias"] = bb
            hf["vision_model." + h + hf_ln + ".weight"] = g
            hf["vision_model." + h + hf_ln + ".bias"] = bb
    proj = rng.standard_normal((VIS_WIDTH, VIS_PROJ)).astype(np.float32) * 0.02
    oc[prefix + "proj"] = proj
    hf["visual_projection.weight"] = np.ascontiguousarray(proj.T)  # HF: (out,in)
    return oc, hf


def test_openclip_vision_conversion_matches_hf_path():
    """open_clip visual → our tree must equal HF CLIPVisionModel → our tree
    (the HF path is transformers-parity-tested in test_clip_vision.py)."""
    rng = np.random.default_rng(0)
    oc, hf = _openclip_visual_sd(rng)
    tree_oc, cfg_oc = convert_openclip_vision(oc)
    tree_hf, cfg_hf = convert_clip_vision(hf)
    assert (cfg_oc.width, cfg_oc.layers, cfg_oc.patch_size,
            cfg_oc.projection_dim, cfg_oc.image_size) == \
           (cfg_hf.width, cfg_hf.layers, cfg_hf.patch_size,
            cfg_hf.projection_dim, cfg_hf.image_size)
    a, b = flatten(tree_oc), flatten(tree_hf)
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_allclose(a[k], b[k], atol=1e-6, err_msg=k)


def test_known_head_counts():
    # ViT-H (the unclip-h tower) is 1280 wide with 16 heads, not 1280/64=20
    rng = np.random.default_rng(1)
    oc, _ = _openclip_visual_sd(rng)
    _, cfg = convert_openclip_vision(oc)
    assert cfg.heads == max(VIS_WIDTH // 16, 1)


# --------------------------------------------------------------------------
# full checkpoint: tiny unclip model end-to-end
# --------------------------------------------------------------------------

def _tiny_unclip_state_dict():
    from sdwebui_tpu.models import clip as clip_model
    from sdwebui_tpu.models import vae as vae_model
    from sdwebui_tpu.models.configs import CLIPTextConfig, VAEConfig

    rng = np.random.default_rng(7)
    adm = VIS_PROJ * 2                     # embed ⊕ timestep emb
    unet_cfg = UNetConfig(model_channels=32, channel_mult=(1, 2),
                          attention_resolutions=(2,), transformer_depth=(0, 1),
                          context_dim=64, num_heads=4,
                          use_linear_in_transformer=True,
                          adm_in_channels=adm)
    unet_params = unet_model.init_params(unet_cfg, 0, dtype=jnp.float32)
    vae_params = vae_model.init_params(
        VAEConfig(ch=32, ch_mult=(1, 2, 2, 2), num_res_blocks=1), 2)
    clip_cfg = CLIPTextConfig(vocab_size=49408, width=64, layers=2, heads=2)
    clip_params = clip_model.init_params(clip_cfg, 1)

    def inverse(key, arr):
        arr = np.asarray(jax.device_get(arr))
        if not key.endswith(".weight"):
            return arr
        if arr.ndim == 4:
            return np.ascontiguousarray(np.transpose(arr, (3, 2, 0, 1)))
        if arr.ndim == 2 and not any(
                t in key for t in ("token_embedding", "position_embedding")):
            return np.ascontiguousarray(arr.T)
        return arr

    sd = {}
    for k, v in flatten(unet_params).items():
        sd["model.diffusion_model." + k] = inverse(k, v)
    for k, v in flatten(vae_params).items():
        sd["first_stage_model." + k] = inverse(k, v)
    # open_clip TEXT tower (SD2 conditioner layout)
    flat = flatten(clip_params)
    pre = "cond_stage_model.model."
    sd[pre + "token_embedding.weight"] = flat["embeddings.token_embedding.weight"]
    sd[pre + "positional_embedding"] = flat["embeddings.position_embedding.weight"]
    sd[pre + "ln_final.weight"] = flat["final_layer_norm.weight"]
    sd[pre + "ln_final.bias"] = flat["final_layer_norm.bias"]
    for i in range(clip_cfg.layers):
        b = f"encoder.layers.{i}."
        o = pre + f"transformer.resblocks.{i}."
        sd[o + "attn.in_proj_weight"] = np.concatenate(
            [np.asarray(flat[b + f"self_attn.{n}_proj.weight"]).T
             for n in "qkv"], 0)
        sd[o + "attn.in_proj_bias"] = np.concatenate(
            [flat[b + f"self_attn.{n}_proj.bias"] for n in "qkv"], 0)
        sd[o + "attn.out_proj.weight"] = np.asarray(
            flat[b + "self_attn.out_proj.weight"]).T
        sd[o + "attn.out_proj.bias"] = flat[b + "self_attn.out_proj.bias"]
        for ours, theirs in (("layer_norm1", "ln_1"), ("layer_norm2", "ln_2")):
            sd[o + theirs + ".weight"] = flat[b + ours + ".weight"]
            sd[o + theirs + ".bias"] = flat[b + ours + ".bias"]
        sd[o + "mlp.c_fc.weight"] = np.asarray(flat[b + "mlp.fc1.weight"]).T
        sd[o + "mlp.c_fc.bias"] = flat[b + "mlp.fc1.bias"]
        sd[o + "mlp.c_proj.weight"] = np.asarray(flat[b + "mlp.fc2.weight"]).T
        sd[o + "mlp.c_proj.bias"] = flat[b + "mlp.fc2.bias"]
    # vision embedder + noise augmentor stats
    oc, _ = _openclip_visual_sd(rng)
    sd.update(oc)
    sd["noise_augmentor.data_mean"] = \
        rng.standard_normal((1, VIS_PROJ)).astype(np.float32)
    sd["noise_augmentor.data_std"] = \
        (np.abs(rng.standard_normal((1, VIS_PROJ))) + 0.5).astype(np.float32)
    return sd


@pytest.fixture(scope="module")
def unclip_model():
    from sdwebui_tpu.loader.load import model_from_state_dict

    return model_from_state_dict(_tiny_unclip_state_dict(), title="tiny-unclip")


def test_sniff_unclip(unclip_model):
    info = sniff.sniff(_tiny_unclip_state_dict())
    assert info.family == "sd2" and info.variant == "unclip"
    assert unclip_model.is_unclip
    assert unclip_model.unet_cfg.adm_in_channels == VIS_PROJ * 2
    assert unclip_model.noise_aug_stats["mean"].shape == (VIS_PROJ,)


def test_unclip_adm_vectors(unclip_model):
    from PIL import Image

    from sdwebui_tpu.pipeline.sd_model import unclip_adm

    zero = unclip_adm(unclip_model)
    assert zero.shape == (VIS_PROJ * 2,)
    assert float(jnp.abs(zero).max()) == 0.0

    img = Image.new("RGB", (48, 48), (200, 40, 40))
    v1 = unclip_adm(unclip_model, images=[img], seed=3)
    v2 = unclip_adm(unclip_model, images=[img], seed=3)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    assert float(jnp.abs(v1).max()) > 0.0
    # different source image → different embedding half
    other = unclip_adm(unclip_model,
                       images=[Image.new("RGB", (48, 48), (20, 200, 220))],
                       seed=3)
    assert not np.allclose(np.asarray(v1)[:VIS_PROJ],
                           np.asarray(other)[:VIS_PROJ])


def test_unclip_txt2img_and_img2img_end_to_end(unclip_model):
    from PIL import Image

    from sdwebui_tpu.pipeline.img2img import process_img2img
    from sdwebui_tpu.pipeline.params import GenerationParams
    from sdwebui_tpu.pipeline.processing import process_txt2img

    p = GenerationParams(prompt="a cat", seed=5, steps=2, width=64, height=64)
    res = process_txt2img(unclip_model, p)
    assert res.images[0].size == (64, 64)

    init = Image.new("RGB", (64, 64), (90, 120, 200))
    p2 = GenerationParams(prompt="a cat", seed=5, steps=2, width=64,
                          height=64, denoising_strength=0.7,
                          init_images=[init])
    res2 = process_img2img(unclip_model, p2)
    assert res2.images[0].size == (64, 64)
    # adm conditioning must influence the output: different init image,
    # same seed/noise → different result through the adm path alone
    res3 = process_img2img(
        unclip_model,
        GenerationParams(prompt="a cat", seed=5, steps=2, width=64,
                         height=64, denoising_strength=0.7,
                         init_images=[Image.new("RGB", (64, 64),
                                                (200, 30, 30))]))
    assert not np.array_equal(np.asarray(res2.images[0]),
                              np.asarray(res3.images[0]))
