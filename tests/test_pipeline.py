"""End-to-end txt2img pipeline tests (tiny model, CI sizes — mirrors the
reference CI envelope: 64×64, 3-5 steps, random weights; SURVEY.md §4)."""

import numpy as np
import pytest

from sdwebui_tpu.pipeline.params import GenerationParams
from sdwebui_tpu.pipeline.processing import create_infotext, process_txt2img
from sdwebui_tpu.pipeline.sd_model import create_tiny_sd
from sdwebui_tpu.utils import infotext as infotext_util
from sdwebui_tpu.utils import images as images_util


@pytest.fixture(scope="module")
def model():
    return create_tiny_sd()


def test_txt2img_basic(model):
    p = GenerationParams(prompt="a photo of a cat", seed=42, steps=3,
                         width=64, height=64)
    res = process_txt2img(model, p)
    assert len(res.images) == 1
    assert res.images[0].size == (64, 64)
    assert res.seed == 42
    assert "Steps: 3" in res.infotext
    assert "Seed: 42" in res.infotext


def test_txt2img_deterministic_seed(model):
    p1 = GenerationParams(prompt="x", seed=7, steps=3, width=64, height=64)
    p2 = GenerationParams(prompt="x", seed=7, steps=3, width=64, height=64)
    r1 = process_txt2img(model, p1)
    r2 = process_txt2img(model, p2)
    np.testing.assert_array_equal(np.asarray(r1.images[0]), np.asarray(r2.images[0]))
    p3 = GenerationParams(prompt="x", seed=8, steps=3, width=64, height=64)
    r3 = process_txt2img(model, p3)
    assert not np.array_equal(np.asarray(r1.images[0]), np.asarray(r3.images[0]))


def test_txt2img_batch_and_iter(model):
    p = GenerationParams(prompt="x", seed=1, steps=2, width=64, height=64,
                         batch_size=2, n_iter=2)
    res = process_txt2img(model, p)
    # opts.return_grid (reference default on) prepends a 2x2 grid image
    assert res.index_of_first_image == 1
    assert len(res.images) == 5
    samples = res.images[res.index_of_first_image:]
    assert len(samples) == 4
    assert res.all_seeds == [1, 2, 3, 4]
    # each image distinct (different seeds)
    a, b = np.asarray(samples[0]), np.asarray(samples[1])
    assert not np.array_equal(a, b)


def test_txt2img_negative_and_attention_syntax(model):
    p = GenerationParams(prompt="a (red:1.3) cat [blue] AND dog :0.5",
                         negative_prompt="ugly, bad", seed=3, steps=3,
                         width=64, height=64)
    res = process_txt2img(model, p)
    assert len(res.images) == 1


def test_txt2img_prompt_editing_schedule(model):
    p = GenerationParams(prompt="a [cat:dog:0.5]", seed=3, steps=4,
                         width=64, height=64)
    res = process_txt2img(model, p)
    assert len(res.images) == 1


@pytest.mark.parametrize("sampler", ["Euler", "Euler a", "Heun", "DPM++ 2M",
                                     "DPM++ 2M SDE", "LMS", "DPM++ SDE"])
def test_txt2img_samplers(model, sampler):
    p = GenerationParams(prompt="x", seed=5, steps=2, width=64, height=64,
                         sampler_name=sampler)
    res = process_txt2img(model, p)
    arr = np.asarray(res.images[0])
    assert arr.shape == (64, 64, 3)


@pytest.mark.parametrize("scheduler", ["Karras", "Exponential", "SGM Uniform", "Beta"])
def test_txt2img_schedulers(model, scheduler):
    p = GenerationParams(prompt="x", seed=5, steps=2, width=64, height=64,
                         scheduler=scheduler)
    res = process_txt2img(model, p)
    assert len(res.images) == 1


def test_txt2img_nonsquare(model):
    p = GenerationParams(prompt="x", seed=5, steps=2, width=128, height=64)
    res = process_txt2img(model, p)
    assert res.images[0].size == (128, 64)


def test_subseed_variation(model):
    base = process_txt2img(model, GenerationParams(
        prompt="x", seed=5, steps=2, width=64, height=64))
    varied = process_txt2img(model, GenerationParams(
        prompt="x", seed=5, subseed=99, subseed_strength=0.5, steps=2,
        width=64, height=64))
    assert not np.array_equal(np.asarray(base.images[0]), np.asarray(varied.images[0]))


def test_random_seed_assigned(model):
    p = GenerationParams(prompt="x", seed=-1, steps=1, width=64, height=64)
    res = process_txt2img(model, p)
    assert res.seed >= 0


def test_save_and_infotext_roundtrip(model, tmp_path):
    p = GenerationParams(prompt="roundtrip test", negative_prompt="neg",
                         seed=11, steps=2, width=64, height=64)
    res = process_txt2img(model, p, outdir=str(tmp_path))
    images_util.flush_saves()   # saves are async by default
    # save_to_dirs defaults on (reference behavior): outdir/<[date]>/file.png
    files = [f for f in tmp_path.rglob("*")
             if f.is_file() and not f.name.endswith(".tmp")]
    assert len(files) == 1
    from PIL import Image

    im = Image.open(files[0])
    info = images_util.read_info_from_image(im)
    parsed = infotext_util.parse(info)
    assert parsed["Prompt"] == "roundtrip test"
    assert parsed["Negative prompt"] == "neg"
    assert parsed["Seed"] == "11"
    assert parsed["Size-1"] == 64


def test_infotext_quoting():
    p = GenerationParams(prompt="has, comma", seed=1)
    p.all_prompts = [p.prompt]
    p.all_negative_prompts = [""]
    p.all_seeds = [1]
    p.all_subseeds = [1]
    from sdwebui_tpu.pipeline.sd_model import create_tiny_sd as _cts

    info = create_infotext(p, _cts.__wrapped__() if hasattr(_cts, "__wrapped__") else _TinyStub(), 0)
    parsed = infotext_util.parse(info)
    assert parsed["Prompt"] == "has, comma"


class _TinyStub:
    sha256 = ""
    title = "m [abc]"


def test_callback_interrupt(model):
    calls = []

    def cb(kind, n, imgs):
        calls.append(kind)
        return False  # interrupt immediately

    p = GenerationParams(prompt="x", seed=1, steps=1, width=64, height=64, n_iter=3)
    res = process_txt2img(model, p, callback=cb)
    assert len(res.images) == 0
    assert calls == ["batch"]


def test_ddim_cfgpp_end_to_end(model):
    """DDIM CFG++ needs the stacked [cfg, uncond] denoiser; exercise both
    the fused scan path and the stepwise (live-preview) path."""
    p = GenerationParams(prompt="a cat", negative_prompt="bad", seed=5,
                         steps=3, width=64, height=64,
                         sampler_name="DDIM CFG++")
    res = process_txt2img(model, p)
    assert len(res.images) == 1

    seen = []
    p2 = GenerationParams(prompt="a cat", negative_prompt="bad", seed=5,
                          steps=3, width=64, height=64,
                          sampler_name="DDIM CFG++")
    res2 = process_txt2img(model, p2,
                           step_callback=lambda i, n, lat: seen.append(i) or True)
    assert seen and len(res2.images) == 1
    np.testing.assert_allclose(np.asarray(res.images[0]),
                               np.asarray(res2.images[0]), atol=1)


@pytest.mark.parametrize("name", ["DPM fast", "DPM adaptive"])
def test_dpm_fast_adaptive_end_to_end(model, name):
    """Custom-driver solvers through the full fused pipeline (and the
    stepwise entry point, which must fall back to fused)."""
    p = GenerationParams(prompt="a cat", seed=11, steps=6, width=64, height=64,
                         sampler_name=name)
    res = process_txt2img(model, p)
    assert len(res.images) == 1
    arr = np.asarray(res.images[0])
    assert arr.std() > 1.0   # not saturated/black

    p2 = GenerationParams(prompt="a cat", seed=11, steps=6, width=64,
                          height=64, sampler_name=name)
    res2 = process_txt2img(model, p2, step_callback=lambda i, n, lat: True)
    np.testing.assert_array_equal(np.asarray(res.images[0]),
                                  np.asarray(res2.images[0]))


def test_infotext_backcompat_versions():
    from sdwebui_tpu.utils.infotext import backcompat, parse_version

    assert parse_version("1.6.0") == (1, 6, 0, 0)
    assert parse_version("v1.7.0-225-gabcdef") == (1, 7, 0, 225)
    assert parse_version("garbage") is None

    d = {"Version": "1.5.2", "Prompt": "a [cat:dog:0.5]", "Sampler": "DDIM"}
    backcompat(d)
    assert d["Old prompt editing timelines"] is True
    assert d["Pad conds v0"] is True
    assert d["Downcast alphas_cumprod"] is True

    d2 = {"Version": "1.9.0", "Prompt": "x", "Sampler": "DDIM"}
    backcompat(d2)
    assert "Pad conds v0" not in d2

    # our own infotexts are never rewritten
    d3 = {"Version": "sdwebui-tpu-0.1.0", "Prompt": "a [x:y:0.5]",
          "Sampler": "DDIM"}
    backcompat(d3)
    assert "Old prompt editing timelines" not in d3


def test_infotext_hires_refiner_fields(model):
    """Round-2 infotext completeness: hires/refiner/eta/tiling fields
    (reference extra_generation_params at processing.py:1224-1305)."""
    p = GenerationParams(prompt="x", seed=1, steps=1, width=64, height=64,
                         enable_hr=True, hr_scale=2.0, hr_upscaler="Latent",
                         hr_second_pass_steps=3, denoising_strength=0.6,
                         eta=0.5, tiling=True)
    res = process_txt2img(model, p)
    info = res.infotexts[0]
    for frag in ["Hires upscale: 2.0", "Hires upscaler: Latent",
                 "Hires steps: 3", "Eta: 0.5", "Tiling: True"]:
        assert frag in info, (frag, info)
    parsed = infotext_util.parse(info)
    assert parsed["Hires upscaler"] == "Latent"


def test_infotext_hires_prompt_fields(model):
    """Hires prompt/negative recorded only when they differ from the main
    prompts (reference modules/processing.py:1267-1276 get_hr_prompt)."""
    p = GenerationParams(prompt="x", seed=1, steps=1, width=64, height=64,
                         enable_hr=True, hr_scale=2.0, hr_upscaler="Latent",
                         hr_prompt="a detailed x", denoising_strength=0.6)
    info = process_txt2img(model, p).infotexts[0]
    parsed = infotext_util.parse(info)
    assert parsed["Hires prompt"] == "a detailed x"
    assert "Hires negative prompt" not in parsed
    # same prompt -> not recorded
    p2 = GenerationParams(prompt="x", seed=1, steps=1, width=64, height=64,
                          enable_hr=True, hr_scale=2.0, hr_upscaler="Latent",
                          hr_prompt="x", denoising_strength=0.6)
    assert "Hires prompt" not in infotext_util.parse(
        process_txt2img(model, p2).infotexts[0])


def test_sd_vae_method_taesd_dispatch(model, monkeypatch):
    """opts.sd_vae_{decode,encode}_method='TAESD' must route first-stage
    decode/encode through the TAESD nets (reference
    modules/sd_samplers_common.py:75 decode_first_stage + :92
    images_tensor_to_samples dispatch), changing observable output."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import torch

    import reference_oracle as ro
    from sdwebui_tpu.loader.convert import convert_leaf
    from sdwebui_tpu.models import vae_approx as va
    from sdwebui_tpu.pipeline.processing import (decode_first_stage,
                                                 decode_first_stage_u8,
                                                 encode_first_stage)
    from sdwebui_tpu.utils.options import opts
    from sdwebui_tpu.utils.pytree import unflatten

    svt = ro.load("modules.sd_vae_taesd")
    torch.manual_seed(0)

    def tree(net):
        return unflatten({k: convert_leaf(k, v.detach().numpy())
                          for k, v in net.state_dict().items()})

    monkeypatch.setitem(va._TAESD_CACHE, (model.kind, "decoder", "models"),
                        tree(svt.decoder(4)))
    monkeypatch.setitem(va._TAESD_CACHE, (model.kind, "encoder", "models"),
                        tree(svt.encoder(4)))

    lat = np.random.default_rng(0).standard_normal((1, 8, 8, 4)).astype(np.float32)
    full = np.asarray(decode_first_stage(model, lat))
    opts.set("sd_vae_decode_method", "TAESD")
    opts.set("sd_vae_encode_method", "TAESD")
    try:
        ta = np.asarray(decode_first_stage(model, lat))
        assert ta.shape == (1, 64, 64, 3)
        assert ta.shape != full.shape or not np.allclose(ta, full)
        u8 = np.asarray(decode_first_stage_u8(model, lat))
        assert u8.dtype == np.uint8 and u8.shape == (1, 64, 64, 3)
        np.testing.assert_allclose(u8, (ta * 255.0 + 0.5).astype(np.uint8))
        img = np.random.default_rng(1).random((1, 64, 64, 3)).astype(np.float32)
        z = np.asarray(encode_first_stage(model, img))
        assert z.shape == (1, 8, 8, 4)
    finally:
        opts.set("sd_vae_decode_method", "Full")
        opts.set("sd_vae_encode_method", "Full")


def test_live_preview_fast_interrupt_decode(model):
    """opts.live_preview_fast_interrupt: an interrupted job decodes its
    final images with the live-preview approximator instead of the full
    VAE (reference modules/sd_samplers_common.py:41)."""
    from sdwebui_tpu.pipeline.processing import decode_first_stage_u8
    from sdwebui_tpu.runtime.state import state
    from sdwebui_tpu.utils.options import opts

    lat = np.random.default_rng(2).standard_normal((1, 8, 8, 4)).astype(np.float32)
    opts.set("live_preview_fast_interrupt", True)
    state.interrupted = True
    try:
        out = np.asarray(decode_first_stage_u8(model, lat))
        # default 'Approx NN' degrades to the cheap matrix (no weights in
        # image): latent-resolution output instead of the 8x VAE upsample
        assert out.shape == (1, 8, 8, 3)
        assert out.dtype == np.uint8
    finally:
        state.interrupted = False
        opts.set("live_preview_fast_interrupt", False)
    full = np.asarray(decode_first_stage_u8(model, lat))
    assert full.shape == (1, 64, 64, 3)


def test_upcast_attn_option(model):
    """opts.upcast_attn reaches UNetConfig (static jit key) and the run
    still produces images (reference --upcast-attn / shared option)."""
    from sdwebui_tpu.pipeline.processing import _apply_hypertile
    from sdwebui_tpu.utils.options import opts

    opts.set("upcast_attn", True)
    try:
        assert _apply_hypertile(model).unet_cfg.upcast_attn
        p = GenerationParams(prompt="x", seed=5, steps=1, width=64, height=64)
        res = process_txt2img(model, p)
        assert res.images[0].size == (64, 64)
    finally:
        opts.set("upcast_attn", False)
    assert not _apply_hypertile(model).unet_cfg.upcast_attn


def test_use_old_hires_fix_width_height(monkeypatch):
    """Old hires behavior: requested size becomes the target, first pass
    ~512^2 (reference old_hires_fix_first_pass_dimensions)."""
    from sdwebui_tpu.pipeline.processing import (apply_old_hires_behavior,
                                                 calculate_hr_target)
    from sdwebui_tpu.utils.options import opts

    p = GenerationParams(prompt="x", width=1024, height=768, enable_hr=True,
                         hr_scale=2.0)
    apply_old_hires_behavior(p)   # option off: nothing changes
    assert (p.width, p.height) == (1024, 768)

    monkeypatch.setitem(opts.data, "use_old_hires_fix_width_height", True)
    apply_old_hires_behavior(p)
    assert (p.hr_resize_x, p.hr_resize_y) == (1024, 768)
    assert (p.width, p.height) == (640, 448)   # ceil(512²-scaled / 64) * 64
    assert calculate_hr_target(p) == (1024, 768)


def test_persistent_cond_cache(model, monkeypatch):
    """Identical prompts across jobs reuse encoded cond banks (reference
    get_conds_with_caching via opts.persistent_cond_cache); results stay
    byte-identical and differing prompts miss the cache."""
    from sdwebui_tpu.pipeline import processing as proc

    proc._COND_CACHE.clear()
    calls = {"n": 0}
    orig = proc._build_conds_uncached

    def counted(*a, **kw):
        calls["n"] += 1
        return orig(*a, **kw)

    monkeypatch.setattr(proc, "_build_conds_uncached", counted)
    p = lambda: GenerationParams(prompt="a cat", seed=7, steps=2,
                                 width=64, height=64)
    r1 = process_txt2img(model, p())
    n_first = calls["n"]
    r2 = process_txt2img(model, p())
    assert calls["n"] == n_first          # cache hit: no re-encode
    np.testing.assert_array_equal(np.asarray(r1.images[0]),
                                  np.asarray(r2.images[0]))
    q = GenerationParams(prompt="a dog", seed=7, steps=2, width=64, height=64)
    process_txt2img(model, q)
    assert calls["n"] > n_first           # different prompt: miss
    proc._COND_CACHE.clear()


def test_decode_fetch_pils_matches_batched_decode(model):
    """The overlapped per-image decode+fetch path must be pixel-identical
    to the one-program batch decode (it runs the same VAE per image)."""
    import jax.numpy as jnp

    from sdwebui_tpu.pipeline.processing import (decode_fetch_pils,
                                                 decode_first_stage_u8)
    from sdwebui_tpu.utils.images import tensor_to_pil
    from sdwebui_tpu.utils.options import opts

    rng = np.random.default_rng(3)
    latents = jnp.asarray(rng.standard_normal((3, 8, 8, 4)), jnp.float32)
    overlapped = decode_fetch_pils(model, latents)
    with opts.override({"sdtpu_overlap_decode_fetch": False}):
        batched = tensor_to_pil(np.asarray(decode_first_stage_u8(model,
                                                                 latents)))
    assert len(overlapped) == len(batched) == 3
    for a, b in zip(overlapped, batched):
        assert np.array_equal(np.asarray(a), np.asarray(b))
