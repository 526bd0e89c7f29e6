"""Styles, tiling helpers, and built-in script tests."""

import numpy as np
import pytest
from PIL import Image

import sdwebui_tpu.scripts.builtin  # noqa: F401 — registers scripts
from sdwebui_tpu.pipeline.params import GenerationParams
from sdwebui_tpu.scripts.builtin import parse_axis_values
from sdwebui_tpu.scripts.framework import get_script, list_selectable_scripts
from sdwebui_tpu.server.app import Engine
from sdwebui_tpu.text.styles import (
    StyleDatabase, apply_styles_to_prompt, extract_original_prompt, merge_prompts,
)
from sdwebui_tpu.utils.images import combine_grid, image_grid, split_grid


@pytest.fixture(scope="module")
def engine():
    return Engine(test_model=True)


# --------------------------------------------------------------------------
# styles
# --------------------------------------------------------------------------

def test_merge_prompts():
    assert merge_prompts("by artist", "a cat") == "a cat, by artist"
    assert merge_prompts("photo of {prompt}, hd", "a cat") == "photo of a cat, hd"
    assert merge_prompts("solo style", "") == "solo style"


def test_extract_original_prompt():
    assert extract_original_prompt("by artist", "a cat, by artist") == ("a cat", True)
    assert extract_original_prompt("photo of {prompt}, hd", "photo of a cat, hd") == ("a cat", True)
    assert extract_original_prompt("by artist", "a cat") == ("a cat", False)


def test_style_database_roundtrip(tmp_path):
    path = str(tmp_path / "styles.csv")
    db = StyleDatabase(path)
    from sdwebui_tpu.text.styles import PromptStyle

    db.styles["anime"] = PromptStyle("anime", "anime style", "photo")
    db.save()
    db2 = StyleDatabase(path)
    assert db2.styles["anime"].prompt == "anime style"
    pos, neg = db2.apply("a cat", "ugly", ["anime"])
    assert pos == "a cat, anime style" and neg == "ugly, photo"


# --------------------------------------------------------------------------
# tiling
# --------------------------------------------------------------------------

def test_split_combine_grid_roundtrip():
    rng = np.random.default_rng(0)
    img = Image.fromarray(rng.integers(0, 255, (200, 300, 3), dtype=np.uint8))
    grid = split_grid(img, tile_w=128, tile_h=128, overlap=32)
    out = combine_grid(grid)
    assert out.size == img.size
    # feathered reassembly of untouched tiles reproduces the image closely
    diff = np.abs(np.asarray(out, int) - np.asarray(img, int))
    assert diff.mean() < 3


def test_split_grid_small_image():
    img = Image.new("RGB", (64, 64))
    grid = split_grid(img, tile_w=128, tile_h=128, overlap=32)
    assert len(grid.tiles) == 1 and len(grid.tiles[0][2]) == 1


def test_image_grid_rows():
    imgs = [Image.new("RGB", (8, 8)) for _ in range(6)]
    g = image_grid(imgs, rows=2)
    assert g.size == (24, 16)


# --------------------------------------------------------------------------
# built-in scripts
# --------------------------------------------------------------------------

def test_script_registry():
    names = list_selectable_scripts()
    for expected in ["x/y/z plot", "prompt matrix", "loopback", "sd upscale"]:
        assert expected in names
    assert get_script("X/Y/Z plot") is not None
    assert get_script("missing") is None


def test_parse_axis_values():
    assert parse_axis_values("Seed", "1-3") == [1, 2, 3]
    assert parse_axis_values("CFG Scale", "5, 7.5") == ["5", "7.5"]
    assert parse_axis_values("Nothing", "anything") == [None]
    assert parse_axis_values("Sampler", ["Euler", "Heun"]) == ["Euler", "Heun"]


def test_parse_axis_range_grammar():
    """Reference xyz_grid range syntax: step '(+S)' and count '[N]' on
    int and float axes (xyz_grid.py process_axis)."""
    assert parse_axis_values("Steps", "1-10 (+3)") == [1, 4, 7, 10]
    assert parse_axis_values("Steps", "1-10 [3]") == [1, 6, 10]
    assert parse_axis_values("CFG Scale", "1-3") == [1.0, 2.0, 3.0]
    assert parse_axis_values("CFG Scale", "1-2 (+0.5)") == [1.0, 1.5, 2.0]
    assert parse_axis_values("CFG Scale", "0-1 [5]") == [0.0, 0.25, 0.5,
                                                         0.75, 1.0]
    assert parse_axis_values("Denoising", "0.2-0.4 (+0.1)") == \
        [0.2, pytest.approx(0.3), pytest.approx(0.4)]
    # non-numeric axes never range-expand
    assert parse_axis_values("Prompt S/R", "a-b") == ["a-b"]


def test_bad_axis_values_named_error(engine):
    """Numbers-expected axes reject word values with the axis name in the
    error (VERDICT r2: user-facing script error contract)."""
    from sdwebui_tpu.scripts.framework import ScriptArgError

    p = GenerationParams(prompt="a cat", seed=1, steps=1, width=64,
                         height=64)
    with pytest.raises(ScriptArgError, match="Y values.*Var. seed"):
        engine.run_script("X/Y/Z plot", p,
                          ["Nothing", "", "Var. seed", "Euler a,DDIM",
                           "Nothing", "", False])


def test_xyz_plot_end_to_end(engine):
    p = GenerationParams(prompt="a cat", seed=1, steps=1, width=64, height=64)
    res = engine.run_script("X/Y/Z plot", p,
                            ["Seed", "1-2", "CFG Scale", "3,7", "Nothing", "",
                             False])
    # 1 grid + 4 cells (draw_legend off -> bare grid of exact cell size)
    assert len(res.images) == 5
    assert res.images[0].size == (128, 128)


def test_xyz_grid_size_guard(engine):
    """opts.img_max_size_mp bounds the resulting grid (reference
    xyz_grid.py:635)."""
    import pytest as _pytest

    from sdwebui_tpu.utils.options import opts as _opts

    p = GenerationParams(prompt="a cat", seed=1, steps=1, width=512,
                         height=512)
    with _opts.override({"img_max_size_mp": 1}):
        with _pytest.raises(Exception, match="too large"):
            engine.run_script("X/Y/Z plot", p,
                              ["Seed", "1-3", "CFG Scale", "3,7", "Nothing",
                               "", False])


def test_xyz_prompt_sr(engine):
    p = GenerationParams(prompt="a cat photo", seed=1, steps=1, width=64, height=64)
    res = engine.run_script("X/Y/Z plot", p,
                            ["Prompt S/R", "cat,dog", "Nothing", "", "Nothing", ""])
    assert len(res.images) == 3  # grid + 2 cells
    assert any("dog" in t for t in res.infotexts)


def test_prompt_matrix(engine):
    p = GenerationParams(prompt="a cat|red|blue", seed=1, steps=1,
                         width=64, height=64)
    res = engine.run_script("Prompt matrix", p, [])
    assert len(res.images) == 5  # grid + 4 combos
    assert "a cat, red, blue" in res.all_prompts


def test_prompts_from_file(engine):
    p = GenerationParams(seed=1, steps=1, width=64, height=64)
    res = engine.run_script("Prompts from file or textbox", p,
                            [False, False, "first prompt\n\nsecond prompt\n"])
    assert len(res.images) == 2


def test_loopback(engine):
    src = Image.new("RGB", (64, 64), (90, 90, 90))
    p = GenerationParams(prompt="x", seed=1, steps=2, width=64, height=64,
                         denoising_strength=0.4, init_images=[src])
    res = engine.run_script("Loopback", p, [3, 0.6])
    assert len(res.images) == 3


def test_sd_upscale(engine):
    src = Image.new("RGB", (64, 64), (90, 90, 90))
    p = GenerationParams(prompt="x", seed=1, steps=1, width=64, height=64,
                         denoising_strength=0.3, init_images=[src])
    res = engine.run_script("SD upscale", p, [16, "Lanczos", 2.0])
    assert res.images[0].size == (128, 128)


def test_api_script_dispatch(engine):
    """script_name through the HTTP layer."""
    import requests

    from sdwebui_tpu.server.api import ApiServer

    srv = ApiServer(engine, host="127.0.0.1", port=0)
    srv.start()
    try:
        r = requests.post(
            f"http://127.0.0.1:{srv.port}/sdapi/v1/txt2img",
            json={"prompt": "a cat", "seed": 1, "steps": 1, "width": 64,
                  "height": 64, "script_name": "X/Y/Z plot",
                  "script_args": ["Seed", "1-2", "Nothing", "", "Nothing", ""]})
        assert r.status_code == 200, r.text
        assert len(r.json()["images"]) == 3
        names = requests.get(
            f"http://127.0.0.1:{srv.port}/sdapi/v1/scripts").json()
        assert "x/y/z plot" in names["txt2img"]
    finally:
        srv.shutdown()


def test_timer():
    from sdwebui_tpu.utils.timer import Timer

    t = Timer()
    t.record("step1")
    with t.subcategory("sub"):
        t.record("inner")
    assert "step1" in t.records and "inner" in t.records
    assert isinstance(t.summary(), str)


def test_memory_monitor():
    from sdwebui_tpu.utils.profiling import memory_monitor

    r = memory_monitor.read()
    assert set(r) == {"used", "peak", "total", "free"}
    assert "HBM" in memory_monitor.summary()


def test_profile_context(tmp_path):
    from sdwebui_tpu.utils.profiling import profile

    with profile(enable=False) as p:
        assert p is None


def test_outpainting_scripts(engine):
    src = Image.new("RGB", (64, 64), (90, 120, 90))
    for name in ("Poor man's outpainting", "Outpainting mk2"):
        p = GenerationParams(prompt="x", seed=1, steps=2, width=64, height=64,
                             denoising_strength=0.6, init_images=[src])
        res = engine.run_script(name, p, [64, 4])
        assert res.images[0].size == (192, 192), name  # +64 on each side


def test_color_correction():
    from sdwebui_tpu.utils.color import (
        apply_color_correction, lab_to_rgb, rgb_to_lab, setup_color_correction,
    )

    rng = np.random.default_rng(0)
    rgb = rng.random((16, 16, 3)).astype(np.float32)
    lab = rgb_to_lab(rgb)
    back = lab_to_rgb(lab)
    np.testing.assert_allclose(back, rgb, atol=2e-3)

    target = Image.fromarray((rng.random((16, 16, 3)) * 120 + 60).astype(np.uint8))
    shifted = Image.fromarray((rng.random((16, 16, 3)) * 120 + 130).astype(np.uint8))
    corr = setup_color_correction(target)
    fixed = apply_color_correction(corr, shifted)
    # matched image mean moves toward the target's mean
    t_mean = np.asarray(target, np.float32).mean()
    s_mean = np.asarray(shifted, np.float32).mean()
    f_mean = np.asarray(fixed, np.float32).mean()
    assert abs(f_mean - t_mean) < abs(s_mean - t_mean)


def test_img2img_alternative_latent_inversion():
    """invert_noise contract on random weights (a chaotic denoiser makes
    reconstruction-accuracy assertions meaningless — the reference's own
    quality claims assume trained weights): output is finite, unit-std
    (the reference's `x / x.std()`), deterministic, and prompt-dependent."""
    import jax.numpy as jnp
    import numpy as np

    from sdwebui_tpu.pipeline.processing import invert_noise
    from sdwebui_tpu.pipeline.sd_model import create_tiny_sd
    from sdwebui_tpu.sampling.cfg import CondSchedule
    from sdwebui_tpu.sampling.schedulers import get_schedule

    model = create_tiny_sd()
    steps = 6
    sigmas = get_schedule("Automatic", steps, model.disc)
    cond = jnp.asarray(np.random.RandomState(0).randn(77, 64), jnp.float32)
    uncond = jnp.asarray(np.random.RandomState(1).randn(77, 64), jnp.float32)
    sched = CondSchedule.simple(cond, uncond, cond_scale=1.2, n_steps=steps)

    init_latent = jnp.asarray(
        np.random.RandomState(2).randn(1, 8, 8, 4) * 0.5, jnp.float32)
    rev = np.asarray(sigmas)[::-1].copy()
    a = invert_noise(model, sched, init_latent, rev)
    b = invert_noise(model, sched, init_latent, rev)
    assert np.all(np.isfinite(np.asarray(a)))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert abs(float(jnp.std(a)) - 1.0) < 1e-3        # x / x.std() contract

    sched2 = CondSchedule.simple(uncond, cond, cond_scale=1.2, n_steps=steps)
    c = invert_noise(model, sched2, init_latent, rev)
    assert not np.allclose(np.asarray(a), np.asarray(c))


def test_img2img_alternative_script_runs_deterministically(engine):
    import numpy as np
    from PIL import Image

    from sdwebui_tpu.pipeline.params import GenerationParams

    init = Image.fromarray(
        np.random.default_rng(0).integers(60, 200, (64, 64, 3), np.uint8))

    def run():
        p = GenerationParams(prompt="a cat", seed=5, width=64, height=64,
                             init_images=[init], denoising_strength=1.0)
        return engine.run_script("img2img alternative test", p,
                                 ["a cat", "", True, 6, 1.2])

    a, b = run(), run()
    assert len(a.images) == 1
    np.testing.assert_array_equal(np.asarray(a.images[0]),
                                  np.asarray(b.images[0]))


def test_alwayson_hook_lifecycle():
    """Full reference hook set fires in order through txt2img and img2img;
    postprocess_image can rewrite images."""
    import numpy as np
    from PIL import Image

    from sdwebui_tpu.pipeline.img2img import process_img2img
    from sdwebui_tpu.pipeline.params import GenerationParams
    from sdwebui_tpu.pipeline.processing import process_txt2img
    from sdwebui_tpu.pipeline.sd_model import create_tiny_sd
    from sdwebui_tpu.scripts.framework import Script, get_runner

    calls = []

    class Recorder(Script):
        name = "recorder-test"
        alwayson = True

        def setup(self, p, *a):
            calls.append("setup")

        def before_process(self, p, *a):
            calls.append("before_process")

        def process(self, p, *a):
            calls.append("process")

        def before_process_batch(self, p, *a, **kw):
            calls.append("before_process_batch")

        def after_extra_networks_activate(self, p, *a, **kw):
            calls.append("after_extra_networks_activate")

        def process_before_every_sampling(self, p, *a, **kw):
            calls.append("process_before_every_sampling")

        def process_batch(self, p, *a, **kw):
            calls.append("process_batch")

        def on_mask_blend(self, p, mba, *a):
            calls.append("on_mask_blend")

        def post_sample(self, p, ps, *a):
            calls.append("post_sample")
            assert ps.samples is not None

        def postprocess_batch(self, p, *a, images=None, batch_number=0):
            calls.append("postprocess_batch")

        def postprocess_batch_list(self, p, pp, *a, **kw):
            calls.append("postprocess_batch_list")

        def postprocess_image(self, p, image, *a):
            calls.append("postprocess_image")
            return Image.new("RGB", image.size, (255, 0, 0))

        def postprocess_maskoverlay(self, p, ppmo, *a):
            calls.append("postprocess_maskoverlay")

        def postprocess_image_after_composite(self, p, pp, *a):
            calls.append("postprocess_image_after_composite")

        def postprocess(self, p, processed, *a):
            calls.append("postprocess")

    runner = get_runner()
    rec = Recorder()
    runner.add(rec)
    try:
        model = create_tiny_sd()
        p = GenerationParams(prompt="x", seed=7, steps=2, width=64, height=64,
                             do_not_save_samples=True)
        res = process_txt2img(model, p)
        assert np.asarray(res.images[0])[0, 0, 0] == 255  # rewritten red
        order = [c for c in calls if calls.count(c) >= 1]
        for a, b in [("setup", "before_process"),
                     ("before_process", "process"),
                     ("process", "before_process_batch"),
                     ("process_batch", "post_sample"),
                     ("post_sample", "postprocess_batch"),
                     ("postprocess_batch", "postprocess_image"),
                     ("postprocess_image", "postprocess")]:
            assert order.index(a) < order.index(b), (a, b, order)

        calls.clear()
        init = Image.new("RGB", (64, 64), (10, 200, 30))
        mask = Image.new("L", (64, 64), 0)
        mask.paste(255, (16, 16, 48, 48))
        p2 = GenerationParams(prompt="x", seed=7, steps=2, width=64,
                              height=64, init_images=[init], mask=mask,
                              denoising_strength=0.6,
                              do_not_save_samples=True)
        process_img2img(model, p2)
        for name in ("on_mask_blend", "postprocess_maskoverlay",
                     "postprocess_image_after_composite"):
            assert name in calls, (name, calls)
    finally:
        runner.alwayson_scripts.remove(rec)


def test_xyz_opts_axis_and_override_restore(engine):
    """Option-backed XYZ axes sweep runtime opts per cell and restore them;
    ENSD values produce different images."""
    import numpy as np

    from sdwebui_tpu.pipeline.params import GenerationParams
    from sdwebui_tpu.utils.options import opts

    before = opts.get("eta_noise_seed_delta", 0)
    p = GenerationParams(prompt="a cat", seed=3, steps=2, width=64, height=64,
                         sampler_name="Euler a", do_not_save_samples=True)
    res = engine.run_script(
        "X/Y/Z plot", p,
        ["Eta noise seed delta", "0, 31337", "Nothing", "", "Nothing", ""])
    # grid + 2 cells
    assert len(res.images) == 3
    a, b = np.asarray(res.images[1]), np.asarray(res.images[2])
    assert not np.array_equal(a, b)
    assert opts.get("eta_noise_seed_delta", 0) == before


def test_xyz_field_axes_smoke(engine):
    from sdwebui_tpu.pipeline.params import GenerationParams

    p = GenerationParams(prompt="a cat, blue, fluffy", seed=3, steps=2,
                         width=64, height=64, do_not_save_samples=True)
    res = engine.run_script(
        "X/Y/Z plot", p,
        ["Sigma Churn", "0, 0.5", "Prompt order", "blue; fluffy",
         "Nothing", ""])
    assert len(res.images) == 1 + 2  # grid + 2 cells (y axis single value)


def test_xyz_checkpoint_axis(tmp_path):
    """'Checkpoint name' axis swaps the loaded model per cell via
    override_settings.sd_model_checkpoint."""
    import sys
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    from test_loader import _tiny_ldm_state_dict

    from sdwebui_tpu.loader.safetensors_io import write_safetensors

    _, sd_a = _tiny_ldm_state_dict()
    write_safetensors(str(tmp_path / "model-a.safetensors"), sd_a)
    sd_b = {k: (v * 1.1 if hasattr(v, "dtype") and v.dtype.kind == "f" else v)
            for k, v in sd_a.items()}
    write_safetensors(str(tmp_path / "model-b.safetensors"), sd_b)

    eng = Engine(model_dirs=[str(tmp_path)], ckpt="model-a")
    p = GenerationParams(prompt="a cat", seed=3, steps=1, width=64, height=64,
                         do_not_save_samples=True)
    res = eng.run_script(
        "X/Y/Z plot", p,
        ["Checkpoint name", "model-a, model-b", "Nothing", "", "Nothing", ""])
    assert len(res.images) == 3
    a, b = np.asarray(res.images[1]), np.asarray(res.images[2])
    assert not np.array_equal(a, b)        # the two checkpoints differ
    assert eng._model_key.startswith("model-b")


def test_custom_code_gated_and_runs(tmp_path):
    """Custom code: refused without --allow-code, exec's with display()
    when enabled (reference scripts/custom_code.py semantics)."""
    import pytest

    from sdwebui_tpu.pipeline.params import GenerationParams
    from sdwebui_tpu.scripts.framework import get_script
    from sdwebui_tpu.server import cmd_flags

    script = get_script("Custom code")
    assert script is not None
    p = GenerationParams(prompt="x", seed=1, steps=1, width=64, height=64,
                         do_not_save_samples=True)

    cmd_flags.cmd_opts = type(cmd_flags.cmd_opts)()   # reset
    with pytest.raises(RuntimeError):
        script.run(None, p, "display([])")

    cmd_flags.cmd_opts.allow_code = True
    try:
        from PIL import Image
        code = ("import numpy as np\n"
                "from PIL import Image\n"
                "img = Image.new('RGB', (8, 8), (255, 0, 0))\n"
                "display([img], s=p.seed, i='custom')\n")
        res = script.run(None, p, code)
        assert len(res.images) == 1
        assert res.infotexts == ["custom"]
        assert res.seed == 1
    finally:
        cmd_flags.cmd_opts = type(cmd_flags.cmd_opts)()


def test_matched_noise_properties():
    """Spectral noise fill: untouched pixels preserved; fill region gets
    histogram-matched texture in [0,1] (outpainting mk2 substrate)."""
    import numpy as np

    from sdwebui_tpu.postprocessing.noise_match import (match_histograms_1d,
                                                        matched_noise)

    rng = np.random.RandomState(0)
    src = rng.rand(32, 48, 3).astype(np.float64) * 0.5 + 0.25
    mask = np.zeros((32, 48, 3))
    mask[:, 32:] = 1.0          # outpaint the right strip
    out = matched_noise(src, mask, noise_q=1.0, color_variation=0.05)
    np.testing.assert_allclose(out[:, :32], src[:, :32], atol=1e-12)
    fill = out[:, 32:]
    assert fill.min() >= 0.0 and fill.max() <= 1.0
    # histogram matched to the source region → similar quantiles
    for c in range(3):
        q_fill = np.quantile(fill[..., c], [0.1, 0.5, 0.9])
        q_src = np.quantile(src[:, :32, c], [0.1, 0.5, 0.9])
        np.testing.assert_allclose(q_fill, q_src, atol=0.06)
    # deterministic
    out2 = matched_noise(src, mask, noise_q=1.0, color_variation=0.05)
    np.testing.assert_allclose(out, out2)

    # quantile mapping reproduces a linear transform exactly at the ends
    v = rng.rand(500)
    t = rng.rand(400) * 2 + 1
    m = match_histograms_1d(v, t)
    assert abs(m.min() - t.min()) < 1e-9 and abs(m.max() - t.max()) < 1e-9


def test_xyz_schedule_sigma_axis(engine):
    """Option-sweep axes actually change the schedule (sigma_max override).
    Applies to named schedulers; 'Automatic' spaces over the model's
    quantized t-table and ignores the overrides, as in the reference."""
    p = GenerationParams(prompt="a cat", seed=1, steps=2, width=64, height=64,
                         scheduler="Karras")
    res = engine.run_script("X/Y/Z plot", p,
                            ["Schedule max sigma", "5,14.6", "Nothing", "",
                             "Nothing", "", False])
    assert len(res.images) == 3   # 1 grid + 2 cells
    import numpy as np
    a, b = np.asarray(res.images[1]), np.asarray(res.images[2])
    assert not np.array_equal(a, b)


def test_xyz_unipc_order_axis(engine):
    p = GenerationParams(prompt="a cat", seed=1, steps=4, width=64, height=64,
                         sampler_name="UniPC")
    res = engine.run_script("X/Y/Z plot", p,
                            ["UniPC Order", "1,3", "Nothing", "",
                             "Nothing", "", False])
    import numpy as np
    assert not np.array_equal(np.asarray(res.images[1]),
                              np.asarray(res.images[2]))


def test_vae_axis_live_swap(tmp_path, monkeypatch):
    """The VAE axis / override_settings.sd_vae swaps VAE weights per request
    and restores the embedded VAE afterwards (reference sd_vae chain +
    xyz_grid VAE axis)."""
    import numpy as np

    from sdwebui_tpu.loader.safetensors_io import write_safetensors
    from sdwebui_tpu.models import vae as vae_model
    from sdwebui_tpu.models.configs import VAEConfig
    from sdwebui_tpu.utils.pytree import flatten

    monkeypatch.chdir(tmp_path)
    eng = Engine(test_model=True)
    base = eng.txt2img(GenerationParams(prompt="a cat", seed=3, steps=1,
                                        width=64, height=64))
    # an external VAE with different random weights, torch-layout keys
    params = vae_model.init_params(
        VAEConfig(ch=32, ch_mult=(1, 2, 2, 2), num_res_blocks=1), 99)
    sd = {}
    for k, v in flatten(params).items():
        arr = np.asarray(v)
        if k.endswith(".weight") and arr.ndim == 4:
            arr = np.ascontiguousarray(arr.transpose(3, 2, 0, 1))
        sd["first_stage_model." + k] = arr
    (tmp_path / "models" / "VAE").mkdir(parents=True)
    write_safetensors(str(tmp_path / "models" / "VAE" / "other.safetensors"),
                      sd)

    p = GenerationParams(prompt="a cat", seed=3, steps=1, width=64, height=64,
                         override_settings={"sd_vae": "other"})
    swapped = eng.txt2img(p)
    assert not np.array_equal(np.asarray(base.images[0]),
                              np.asarray(swapped.images[0]))

    # no override -> embedded VAE restored, matches the first run
    again = eng.txt2img(GenerationParams(prompt="a cat", seed=3, steps=1,
                                         width=64, height=64))
    np.testing.assert_array_equal(np.asarray(base.images[0]),
                                  np.asarray(again.images[0]))


def test_xyz_plot_reference_index_convention(engine):
    """The reference API passes axes as per-tab indices with values_dropdown
    lists (scripts/xyz_grid.py run signature); index 1='Seed', 6='CFG Scale'
    in the txt2img-filtered axis list."""
    from sdwebui_tpu.scripts.builtin import (REF_AXES_IMG2IMG,
                                             REF_AXES_TXT2IMG)

    assert REF_AXES_TXT2IMG[1] == "Seed"
    assert REF_AXES_TXT2IMG[6] == "CFG Scale"
    assert REF_AXES_TXT2IMG[9] == "Sampler"
    assert REF_AXES_TXT2IMG[41] == "Size"
    assert REF_AXES_IMG2IMG[6] == "Image CFG Scale"
    assert REF_AXES_IMG2IMG[27] == "Cond. Image Mask Weight"
    assert REF_AXES_IMG2IMG[40] == "Size"

    p = GenerationParams(prompt="a cat", seed=1, steps=1, width=64, height=64)
    res = engine.run_script(
        "X/Y/Z plot", p,
        [1, "1-2", [], 6, "3,7", [], 0, "", [], False, False, False, False])
    assert len(res.images) == 5
    assert res.images[0].size == (128, 128)

    # dropdown list takes precedence over the text field, like the reference
    p2 = GenerationParams(prompt="a cat", seed=1, steps=1, width=64, height=64)
    res2 = engine.run_script(
        "X/Y/Z plot", p2,
        [9, "", ["Euler", "Heun"], 0, "", [], 0, "", [], False, False,
         False, False])
    assert len(res2.images) == 3  # 1 grid + 2 sampler cells


def test_sd_upscale_batched_tiles(engine):
    """Tiles run batched (reference sd_upscale batches into p.batch_size);
    batch_size=4 must produce the same-size output as batch_size=1."""
    from PIL import Image as PILImage

    init = PILImage.new("RGB", (96, 96), (90, 120, 60))
    p = GenerationParams(prompt="x", seed=5, steps=1, width=64, height=64,
                         batch_size=4, init_images=[init],
                         denoising_strength=0.4)
    res = engine.run_script("SD upscale", p, [32, "Lanczos", 2.0])
    assert res.images[0].size == (192, 192)
