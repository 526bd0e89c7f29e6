"""SDXL path tests: dual-encoder conds, adm vector banks, refiner switch."""

import pytest

pytestmark = pytest.mark.slow  # heavyweight: excluded from `-m 'not slow'` quick runs

import numpy as np
import jax.numpy as jnp
import pytest

from sdwebui_tpu.pipeline.params import GenerationParams
from sdwebui_tpu.pipeline.processing import process_txt2img
from sdwebui_tpu.pipeline.sd_model import create_tiny_sd, create_tiny_sdxl, sdxl_vector_maker


@pytest.fixture(scope="module")
def model():
    return create_tiny_sdxl()


def test_encode_texts_returns_pooled(model):
    cond, pooled = model.encode_texts(["a cat", "a dog"])
    assert cond.shape[-1] == 32 + 64      # CLIP-L ⊕ bigG widths
    assert pooled.shape == (2, 64)        # bigG projection_dim


def test_vector_maker_base_shapes(model):
    maker = sdxl_vector_maker(model, width=64, height=64)
    pooled = jnp.ones((3, 64))
    vec = maker(pooled, jnp.asarray([False, False, True]))
    assert vec.shape == (3, 64 + 6 * 256)


def test_vector_maker_refiner_aesthetic():
    import dataclasses

    model = create_tiny_sdxl()
    refiner_like = dataclasses.replace(model, kind="sdxl-refiner")
    maker = sdxl_vector_maker(refiner_like, 64, 64)
    pooled = jnp.zeros((2, 64))
    vec = maker(pooled, jnp.asarray([False, True]))
    assert vec.shape == (2, 64 + 5 * 256)
    # aesthetic-score slice differs between cond and uncond rows
    assert not np.allclose(np.asarray(vec[0, -256:]), np.asarray(vec[1, -256:]))
    np.testing.assert_allclose(np.asarray(vec[0, :64]), 0.0)


def test_sdxl_txt2img_end_to_end(model):
    p = GenerationParams(prompt="a cat", negative_prompt="bad", seed=3,
                         steps=3, width=64, height=64)
    res = process_txt2img(model, p)
    assert len(res.images) == 1
    assert res.images[0].size == (64, 64)


def test_sdxl_prompt_editing_with_vectors(model):
    """Scheduled prompts produce per-entry pooled vectors (bank gather)."""
    p = GenerationParams(prompt="a [cat:dog:0.5]", seed=3, steps=4,
                         width=64, height=64)
    res = process_txt2img(model, p)
    assert len(res.images) == 1


def test_refiner_switch(model):
    """Base → refiner handoff mid-schedule (both tiny models share VAE
    geometry)."""
    refiner = create_tiny_sdxl(seed=9)
    p = GenerationParams(prompt="a cat", seed=3, steps=4, width=64, height=64,
                         refiner_switch_at=0.5)
    base_only = process_txt2img(model, p)
    p2 = GenerationParams(prompt="a cat", seed=3, steps=4, width=64, height=64,
                          refiner_switch_at=0.5)
    with_refiner = process_txt2img(model, p2, refiner_model=refiner)
    assert not np.array_equal(np.asarray(base_only.images[0]),
                              np.asarray(with_refiner.images[0]))


def test_sd1_unaffected_by_vector_path():
    m = create_tiny_sd()
    p = GenerationParams(prompt="a cat", seed=3, steps=2, width=64, height=64)
    res = process_txt2img(m, p)
    assert len(res.images) == 1


def test_sdxl_hires_fix(model):
    """Hires second pass rebuilds vector conds at the hires resolution."""
    p = GenerationParams(prompt="a cat", seed=3, steps=2, width=64, height=64,
                         enable_hr=True, hr_scale=2.0, hr_upscaler="Latent",
                         denoising_strength=0.6, hr_second_pass_steps=2)
    res = process_txt2img(model, p)
    assert res.images[0].size == (128, 128)


def test_sdxl_img2img(model):
    from PIL import Image

    from sdwebui_tpu.pipeline.img2img import process_img2img

    p = GenerationParams(prompt="a cat", seed=3, steps=2, width=64, height=64,
                         denoising_strength=0.6,
                         init_images=[Image.new("RGB", (64, 64), (90, 90, 90))])
    res = process_img2img(model, p)
    assert len(res.images) == 1


def test_refiner_switch_sigma_domain(model):
    """The handoff index follows the reference's noise-domain rule
    (apply_refiner: completed_ratio = (999 - timestep(sigma))/1000), not
    int(steps * switch_at)."""
    import numpy as np

    from sdwebui_tpu.sampling.schedulers import get_schedule

    steps, switch_at = 20, 0.6
    sigmas = np.asarray(get_schedule("Automatic", steps, model.disc,
                                     is_sdxl=True))
    log_s = np.log(np.maximum(sigmas[:-1], 1e-12))
    t = np.argmin(np.abs(log_s[:, None]
                         - np.asarray(model.disc.log_sigmas)[None, :]),
                  axis=1)
    ratios = (999.0 - t) / 1000.0
    expected = int(np.nonzero(ratios >= switch_at)[0][0])
    # the schedule is nonlinear in t, so the sigma-domain boundary differs
    # from the naive step-count split for most schedules
    assert ratios[expected] >= switch_at
    assert expected == 0 or ratios[expected - 1] < switch_at


def test_hires_fix_refiner_pass_option(model, monkeypatch):
    """opts.hires_fix_refiner_pass routes the refiner to the chosen pass
    (reference sd_samplers_common.py:183); 'first pass'/'second pass'
    produce different images, both differ from no-refiner."""
    from sdwebui_tpu.utils.options import opts

    refiner = create_tiny_sdxl(seed=9)

    def run(pass_opt, with_refiner=True):
        monkeypatch.setitem(opts.data, "hires_fix_refiner_pass", pass_opt)
        p = GenerationParams(prompt="a cat", seed=3, steps=2, width=64,
                             height=64, enable_hr=True, hr_scale=2.0,
                             hr_upscaler="Latent", denoising_strength=0.6,
                             hr_second_pass_steps=2, refiner_switch_at=0.5)
        res = process_txt2img(model, p,
                              refiner_model=refiner if with_refiner else None)
        return np.asarray(res.images[-1])

    base = run("second pass", with_refiner=False)
    second = run("second pass")
    first = run("first pass")
    assert not np.array_equal(base, second)
    assert not np.array_equal(base, first)
    assert not np.array_equal(first, second)
