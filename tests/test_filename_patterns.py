"""FilenameGenerator + reference-faithful save_image behavior
(VERDICT round-1 item 5: options with behavior)."""

import os

import numpy as np
import pytest
from PIL import Image

from sdwebui_tpu.pipeline.params import GenerationParams
from sdwebui_tpu.utils.filename import FilenameGenerator, get_next_sequence_number
from sdwebui_tpu.utils.images import (flush_saves, read_info_from_image,
                                      save_image)
from sdwebui_tpu.utils.options import opts


def _img(w=32, h=24):
    return Image.fromarray(
        (np.random.RandomState(0).rand(h, w, 3) * 255).astype(np.uint8))


def _p(**kw):
    p = GenerationParams(prompt="a red cat, masterpiece", seed=42,
                         steps=20, cfg_scale=7.5, sampler_name="Euler a",
                         batch_size=2, n_iter=1)
    p.all_seeds = [42, 43]
    p.sd_model_name = "test-model"
    p.sd_model_hash = "deadbeef01"
    for k, v in kw.items():
        setattr(p, k, v)
    return p


def gen(pattern, p=None, seed=42, prompt="a red cat, masterpiece", image=None):
    g = FilenameGenerator(p if p is not None else _p(), seed, prompt,
                          image or _img())
    return g.apply(pattern)


def test_basic_tokens():
    assert gen("[seed]") == "42"
    assert gen("[steps]-[cfg]") == "20-7.5"
    assert gen("[width]x[height]") == "32x24"
    assert gen("[sampler]") == "Euler a"
    assert gen("[model_name]") == "test-model"
    assert gen("[model_hash]") == "deadbeef01"
    assert gen("[prompt]") == "a_red_cat,_masterpiece"
    assert gen("[prompt_spaces]") == "a red cat, masterpiece"
    assert gen("[prompt_words]") == "a red cat masterpiece"


def test_unknown_token_kept_verbatim():
    assert gen("x[not_a_token]y") == "x[not_a_token]y"


def test_skip_previous_text_semantics():
    # batch_number with batch_size=1 drops itself AND the preceding literal
    p = _p(batch_size=1)
    assert gen("[seed]-bn[batch_number]", p=p) == "42"
    p2 = _p(batch_size=2, batch_index=1)
    assert gen("[seed]-bn[batch_number]", p=p2) == "42-bn2"


def test_hash_tokens():
    out = gen("[prompt_hash]")
    assert len(out) == 8
    assert gen("[prompt_hash<4>]") == out[:4]


def test_hasprompt():
    assert gen("[hasprompt<cat|nope>]") == "cat"
    assert gen("[hasprompt<dog|nodog>]") == "nodog"


def test_datetime_format():
    out = gen("[datetime<%Y>]")
    assert out.isdigit() and len(out) == 4


def test_generation_number():
    p = _p(batch_size=2, n_iter=2, iteration=1, batch_index=0)
    assert gen("[generation_number]", p=p) == "3"


def test_get_next_sequence_number(tmp_path):
    assert get_next_sequence_number(str(tmp_path), "") == 0
    (tmp_path / "00004-x.png").touch()
    (tmp_path / "junk.txt").touch()
    assert get_next_sequence_number(str(tmp_path), "") == 5


@pytest.fixture()
def flat_save():
    """Disable save_to_dirs/async for deterministic single-dir layout."""
    with opts.override({"save_to_dirs": False, "grid_save_to_dirs": False,
                        "sdtpu_async_save": False, "export_for_4chan": False}):
        yield


def test_save_image_pattern_option(tmp_path, flat_save):
    with opts.override({"samples_filename_pattern": "[steps]s-[seed]"}):
        full = save_image(_img(), str(tmp_path), seed=42, prompt="x",
                          info="meta", p=_p())
    assert os.path.basename(full) == "00000-20s-42.png"
    assert read_info_from_image(Image.open(full)) == "meta"


def test_save_image_no_number(tmp_path, flat_save):
    with opts.override({"samples_filename_pattern": "fixed[seed]",
                        "save_images_add_number": False,
                        "save_images_replace_action": "Add number suffix"}):
        a = save_image(_img(), str(tmp_path), seed=1, prompt="x", p=_p())
        b = save_image(_img(), str(tmp_path), seed=1, prompt="x", p=_p())
    assert os.path.basename(a) == "fixed1.png"
    assert os.path.basename(b) == "fixed1-1.png"


def test_save_to_dirs_pattern(tmp_path):
    with opts.override({"save_to_dirs": True, "sdtpu_async_save": False,
                        "directories_filename_pattern": "[model_name]",
                        "export_for_4chan": False}):
        full = save_image(_img(), str(tmp_path), seed=7, prompt="x", p=_p())
    assert os.path.dirname(full) == str(tmp_path / "test-model")
    assert os.path.exists(full)


def test_save_jpg_with_exif(tmp_path, flat_save):
    full = save_image(_img(), str(tmp_path), seed=5, prompt="x",
                      info="jpeg meta", extension="jpg", p=_p())
    assert full.endswith(".jpg")
    assert read_info_from_image(Image.open(full)) == "jpeg meta"


def test_save_webp_with_exif(tmp_path, flat_save):
    full = save_image(_img(), str(tmp_path), seed=5, prompt="x",
                      info="webp meta", extension="webp", p=_p())
    assert read_info_from_image(Image.open(full)) == "webp meta"


def test_jpeg_quality_option_changes_bytes(tmp_path, flat_save):
    img = Image.fromarray(
        (np.random.RandomState(1).rand(128, 128, 3) * 255).astype(np.uint8))
    with opts.override({"jpeg_quality": 95}):
        hi = save_image(img, str(tmp_path), seed=1, prompt="hi",
                        extension="jpg", p=_p())
    with opts.override({"jpeg_quality": 10}):
        lo = save_image(img, str(tmp_path), seed=2, prompt="lo",
                        extension="jpg", p=_p())
    assert os.path.getsize(hi) > os.path.getsize(lo)


def test_save_txt_sidecar(tmp_path, flat_save):
    with opts.override({"save_txt": True}):
        full = save_image(_img(), str(tmp_path), seed=9, prompt="x",
                          info="sidecar", p=_p())
    txt = os.path.splitext(full)[0] + ".txt"
    assert open(txt).read() == "sidecar\n"


def test_export_for_4chan_downscale(tmp_path):
    big = Image.fromarray(
        (np.random.RandomState(2).rand(64, 96, 3) * 255).astype(np.uint8))
    with opts.override({"save_to_dirs": False, "sdtpu_async_save": False,
                        "export_for_4chan": True, "target_side_length": 48}):
        full = save_image(big, str(tmp_path), seed=3, prompt="x", p=_p())
    jpg = os.path.splitext(full)[0] + ".jpg"
    assert os.path.exists(jpg)
    w, h = Image.open(jpg).size
    assert max(w, h) == 48


def test_forced_filename(tmp_path, flat_save):
    full = save_image(_img(), str(tmp_path), seed=3, prompt="x",
                      forced_filename="exact-name", p=_p())
    assert os.path.basename(full) == "exact-name.png"


def test_async_save_flush(tmp_path):
    with opts.override({"save_to_dirs": False, "sdtpu_async_save": True,
                        "export_for_4chan": False}):
        paths = [save_image(_img(), str(tmp_path), seed=i, info="x", p=_p())
                 for i in range(3)]
    assert len(set(paths)) == 3
    flush_saves()
    for full in paths:
        assert read_info_from_image(Image.open(full)) == "x"


def test_before_image_saved_callback_can_rename(tmp_path, flat_save):
    from sdwebui_tpu.scripts import framework as fw

    def rename(params):
        params.filename = os.path.join(os.path.dirname(params.filename),
                                       "hooked.png")

    fw.on("before_image_saved", rename)
    try:
        full = save_image(_img(), str(tmp_path), seed=3, prompt="x", p=_p())
    finally:
        fw._callbacks["before_image_saved"].remove(rename)
    assert os.path.basename(full) == "hooked.png"
    assert os.path.exists(full)
