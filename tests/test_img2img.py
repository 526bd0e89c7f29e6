"""img2img / inpainting / hires-fix tests (CI-size tiny model)."""

import numpy as np
import pytest
from PIL import Image

from sdwebui_tpu.pipeline.img2img import process_img2img, setup_img2img_steps
from sdwebui_tpu.pipeline.params import GenerationParams
from sdwebui_tpu.pipeline.processing import calculate_hr_target, process_txt2img
from sdwebui_tpu.pipeline.sd_model import create_tiny_sd
from sdwebui_tpu.utils import masking


@pytest.fixture(scope="module")
def model():
    return create_tiny_sd()


def _img(color=(200, 60, 60), size=(64, 64)):
    return Image.new("RGB", size, color)


def _mask(size=(64, 64)):
    m = Image.new("L", size, 0)
    for y in range(16, 48):
        for x in range(16, 48):
            m.putpixel((x, y), 255)
    return m


def test_setup_img2img_steps():
    assert setup_img2img_steps(20, 0.75) == (20, 15)
    assert setup_img2img_steps(20, 1.0) == (20, 19)
    assert setup_img2img_steps(10, 0.5, fix_steps=True) == (20, 9)


def test_img2img_basic(model):
    p = GenerationParams(prompt="a cat", seed=3, steps=4, width=64, height=64,
                         denoising_strength=0.75, init_images=[_img()])
    res = process_img2img(model, p)
    assert len(res.images) == 1
    assert res.images[0].size == (64, 64)
    assert "Denoising strength: 0.75" in res.infotext


def test_img2img_low_denoise_stays_close(model):
    """denoising_strength≈0 must return (nearly) the VAE round-trip of the
    input — the sampler barely runs."""
    src = _img((120, 120, 120))
    p = GenerationParams(prompt="x", seed=3, steps=8, width=64, height=64,
                         denoising_strength=0.05, init_images=[src])
    res = process_img2img(model, p)
    p2 = GenerationParams(prompt="x", seed=3, steps=8, width=64, height=64,
                          denoising_strength=0.9, init_images=[src])
    res2 = process_img2img(model, p2)
    d_low = np.mean(np.abs(np.asarray(res.images[0], int) - 120))
    d_high = np.mean(np.abs(np.asarray(res2.images[0], int) - 120))
    assert d_low < d_high  # more denoising → further from init


def test_img2img_deterministic(model):
    mk = lambda: GenerationParams(prompt="x", seed=5, steps=3, width=64,
                                  height=64, denoising_strength=0.6,
                                  init_images=[_img()])
    r1, r2 = process_img2img(model, mk()), process_img2img(model, mk())
    np.testing.assert_array_equal(np.asarray(r1.images[0]), np.asarray(r2.images[0]))


def test_inpaint_preserves_unmasked(model):
    """Outside the mask, the output equals the original (overlay paste)."""
    src = _img((50, 100, 150))
    p = GenerationParams(prompt="a dog", seed=7, steps=3, width=64, height=64,
                         denoising_strength=0.9, init_images=[src],
                         mask=_mask(), mask_blur=0, inpainting_fill=1)
    res = process_img2img(model, p)
    out = np.asarray(res.images[0])
    # corner (unmasked) must be the original color
    np.testing.assert_array_equal(out[0, 0], [50, 100, 150])
    np.testing.assert_array_equal(out[63, 63], [50, 100, 150])
    # center (masked) should have changed
    assert not np.array_equal(out[32, 32], [50, 100, 150])


@pytest.mark.parametrize("fill", [0, 1, 2, 3])
def test_inpaint_fill_modes(model, fill):
    p = GenerationParams(prompt="x", seed=7, steps=2, width=64, height=64,
                         denoising_strength=0.8, init_images=[_img()],
                         mask=_mask(), inpainting_fill=fill)
    res = process_img2img(model, p)
    assert len(res.images) == 1


def test_inpaint_full_res_crop(model):
    p = GenerationParams(prompt="x", seed=7, steps=2, width=64, height=64,
                         denoising_strength=0.8, init_images=[_img(size=(128, 128))],
                         mask=_mask((128, 128)), inpaint_full_res=True,
                         inpaint_full_res_padding=8)
    res = process_img2img(model, p)
    assert res.images[0].size == (128, 128)


def test_mask_invert(model):
    src = _img((50, 100, 150))
    p = GenerationParams(prompt="x", seed=7, steps=3, width=64, height=64,
                         denoising_strength=0.9, init_images=[src],
                         mask=_mask(), mask_blur=0, inpainting_mask_invert=1)
    res = process_img2img(model, p)
    out = np.asarray(res.images[0])
    # inverted: center preserved, corner repainted
    np.testing.assert_array_equal(out[32, 32], [50, 100, 150])


# --------------------------------------------------------------------------
# masking utils
# --------------------------------------------------------------------------

def test_get_crop_region():
    m = np.zeros((64, 64), bool)
    m[10:20, 30:40] = True
    assert masking.get_crop_region_v2(m, 0) == (30, 10, 40, 20)
    assert masking.get_crop_region_v2(m, 5) == (25, 5, 45, 25)
    assert masking.get_crop_region_v2(np.zeros((8, 8), bool)) == (0, 0, 8, 8)


def test_expand_crop_region_aspect():
    region = masking.expand_crop_region((30, 10, 40, 20), 64, 64, 64, 64)
    x1, y1, x2, y2 = region
    assert (x2 - x1) == (y2 - y1)  # square processing aspect


# --------------------------------------------------------------------------
# hires fix
# --------------------------------------------------------------------------

def test_hr_target_resolution():
    p = GenerationParams(width=64, height=64, hr_scale=2.0)
    assert calculate_hr_target(p) == (128, 128)
    p = GenerationParams(width=64, height=32, hr_resize_x=256, hr_resize_y=0)
    assert calculate_hr_target(p) == (256, 128)


def test_hires_latent_upscale(model):
    p = GenerationParams(prompt="x", seed=5, steps=2, width=64, height=64,
                         enable_hr=True, hr_scale=2.0, hr_upscaler="Latent",
                         denoising_strength=0.6, hr_second_pass_steps=2)
    res = process_txt2img(model, p)
    assert res.images[0].size == (128, 128)


def test_hires_image_upscaler(model):
    p = GenerationParams(prompt="x", seed=5, steps=2, width=64, height=64,
                         enable_hr=True, hr_scale=2.0, hr_upscaler="Lanczos",
                         denoising_strength=0.6, hr_second_pass_steps=2)
    res = process_txt2img(model, p)
    assert res.images[0].size == (128, 128)


def test_hires_different_sampler_and_prompt(model):
    p = GenerationParams(prompt="x", seed=5, steps=2, width=64, height=64,
                         enable_hr=True, hr_scale=2.0, hr_upscaler="Latent (nearest)",
                         denoising_strength=0.6, hr_second_pass_steps=2,
                         hr_sampler_name="DPM++ 2M", hr_prompt="different")
    res = process_txt2img(model, p)
    assert res.images[0].size == (128, 128)


def test_instruct_pix2pix_edit_model():
    """8-channel edit model: 3-way CFG with image conditioning."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from sdwebui_tpu.models import unet as unet_model
    from sdwebui_tpu.pipeline.sd_model import create_tiny_sd

    base = create_tiny_sd()
    cfg8 = dataclasses.replace(base.unet_cfg, in_channels=8)
    edit = dataclasses.replace(
        base, unet_cfg=cfg8,
        unet_params=jax.device_put(unet_model.init_params(cfg8, 7, dtype=jnp.float32)))

    src = _img((90, 90, 90))
    p = GenerationParams(prompt="make it red", seed=3, steps=3, width=64,
                         height=64, denoising_strength=0.9,
                         init_images=[src], image_cfg_scale=1.5)
    res = process_img2img(edit, p)
    assert len(res.images) == 1
    # image_cfg_scale changes the output
    p2 = GenerationParams(prompt="make it red", seed=3, steps=3, width=64,
                          height=64, denoising_strength=0.9,
                          init_images=[src], image_cfg_scale=3.0)
    res2 = process_img2img(edit, p2)
    assert not np.array_equal(np.asarray(res.images[0]), np.asarray(res2.images[0]))


def test_edit_cfg_combine_formula():
    import jax.numpy as jnp

    from sdwebui_tpu.sampling.cfg import CondSchedule, make_cfg_denoiser

    def denoise_fn(x, sigma, ctx, y, c_concat):
        # rows keyed by (ctx mean, concat mean): cond=2+img, uncond rows vary
        m = jnp.mean(ctx, axis=(1, 2)) + jnp.mean(c_concat, axis=(1, 2, 3))
        return jnp.ones_like(x) * m[:, None, None, None]

    sched = CondSchedule.simple(np.full((7, 3), 2.0, np.float32),
                                np.full((7, 3), 1.0, np.float32),
                                cond_scale=2.0, n_steps=1)
    sched.c_concat = jnp.full((1, 4, 4, 4), 0.5)
    sched.image_cfg_scale = jnp.asarray(1.5)
    model = make_cfg_denoiser(lambda *a: denoise_fn(*a), sched)
    out = model(jnp.zeros((1, 4, 4, 3)), jnp.asarray(1.0), 0)
    # rows: cond=2+0.5=2.5, img=1+0.5=1.5, uncond=1+0=1
    expect = 1 + 2.0 * (2.5 - 1.5) + 1.5 * (1.5 - 1)
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-5)


def test_soft_inpainting(model):
    """Continuous-mask soft inpainting: e2e smoke + latent-level divergence
    from hard blending (decoded random-weight images saturate, so compare
    sampled latents via a spy)."""
    import sdwebui_tpu.pipeline.img2img as i2i

    src = _img((50, 100, 150))
    # cfg_scale=1 keeps the random-weight model finite over the steps
    mk = lambda soft: GenerationParams(
        prompt="a dog", seed=7, steps=3, width=64, height=64, cfg_scale=1.0,
        denoising_strength=0.9, init_images=[src], mask=_mask(), mask_blur=8,
        inpainting_fill=1, soft_inpainting=soft)
    captured = []
    orig = i2i.sample_latents

    def spy(*a, **kw):
        out = orig(*a, **kw)
        captured.append(np.nan_to_num(np.asarray(out)))
        return out

    i2i.sample_latents = spy
    try:
        hard = process_img2img(model, mk(False))
        soft = process_img2img(model, mk(True))
    finally:
        i2i.sample_latents = orig
    assert len(hard.images) == len(soft.images) == 1
    assert not np.array_equal(captured[0], captured[1])


def test_soft_latent_blend_math():
    import jax.numpy as jnp

    from sdwebui_tpu.sampling.cfg import soft_latent_blend

    a = jnp.zeros((1, 1, 1, 4)).at[..., 0].set(2.0)   # (2,0,0,0)
    b = jnp.zeros((1, 1, 1, 4)).at[..., 1].set(2.0)   # (0,2,0,0)
    # t=0 → a exactly; t=1 → b exactly
    np.testing.assert_allclose(np.asarray(soft_latent_blend(a, b, jnp.zeros((1, 1, 1, 4)))),
                               np.asarray(a), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(soft_latent_blend(a, b, jnp.ones((1, 1, 1, 4)))),
                               np.asarray(b), rtol=1e-4, atol=1e-4)
    # t=0.5, orthogonal: magnitude preserved near 2 (a plain lerp gives √2)
    mid = np.asarray(soft_latent_blend(a, b, jnp.full((1, 1, 1, 4), 0.5)))
    assert np.linalg.norm(mid[0, 0, 0]) > 1.9


def test_img2img_multiple_init_images(model):
    """Two different init images → two outputs (API batch)."""
    p = GenerationParams(prompt="x", seed=3, steps=2, width=64, height=64,
                         denoising_strength=0.6,
                         init_images=[_img((200, 0, 0)), _img((0, 0, 200))])
    res = process_img2img(model, p)
    samples = res.images[res.index_of_first_image:]  # grid prepended by default
    assert len(samples) == 2
    assert not np.array_equal(np.asarray(samples[0]), np.asarray(samples[1]))
