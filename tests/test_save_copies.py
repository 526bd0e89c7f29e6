"""save_images_before_* / save_mask* options change observable output
(reference modules/processing.py:1037-1090)."""

import numpy as np
import pytest
from PIL import Image

from sdwebui_tpu.pipeline.img2img import process_img2img
from sdwebui_tpu.pipeline.params import GenerationParams
from sdwebui_tpu.pipeline.processing import process_txt2img
from sdwebui_tpu.utils import images as images_util
from sdwebui_tpu.utils.options import opts


@pytest.fixture(scope="module")
def model():
    from sdwebui_tpu.pipeline.sd_model import create_tiny_sd

    return create_tiny_sd(seed=0)


def _files(tmp_path):
    images_util.flush_saves()
    return sorted(f.name for f in tmp_path.rglob("*")
                  if f.is_file() and not f.name.endswith(".tmp"))


def test_save_before_highres_fix(model, tmp_path):
    p = GenerationParams(prompt="x", seed=1, steps=1, width=64, height=64,
                         enable_hr=True, hr_scale=2.0,
                         denoising_strength=0.6, hr_second_pass_steps=1,
                         override_settings={
                             "save_images_before_highres_fix": True,
                             "save_to_dirs": False})
    process_txt2img(model, p, outdir=str(tmp_path))
    files = _files(tmp_path)
    assert any("before-highres-fix" in f for f in files), files
    assert len(files) == 2


def test_save_init_img(model, tmp_path):
    init = Image.new("RGB", (64, 64), (120, 60, 30))
    p = GenerationParams(prompt="x", seed=1, steps=1, width=64, height=64,
                         denoising_strength=0.6, init_images=[init],
                         override_settings={
                             "save_init_img": True,
                             "outdir_init_images": str(tmp_path / "init")})
    res = process_img2img(model, p, outdir=None)
    images_util.flush_saves()
    import hashlib

    h = hashlib.md5(init.tobytes()).hexdigest()
    files = sorted(f.name for f in (tmp_path / "init").glob("*"))
    assert files == [f"{h}.png"]
    # hash recorded in infotext (reference processing.py:794)
    assert f"Init image hash: {h}" in res.infotexts[res.index_of_first_image]


def test_save_mask_and_composite(model, tmp_path):
    mask = Image.new("L", (64, 64), 0)
    mask.paste(255, (16, 16, 48, 48))
    p = GenerationParams(prompt="x", seed=1, steps=1, width=64, height=64,
                         denoising_strength=0.7,
                         init_images=[Image.new("RGB", (64, 64), (90, 90, 90))],
                         mask=mask,
                         override_settings={"save_mask": True,
                                            "save_mask_composite": True,
                                            "save_to_dirs": False})
    process_img2img(model, p, outdir=str(tmp_path))
    files = _files(tmp_path)
    assert any(f.endswith("-mask.png") for f in files), files
    assert any("mask-composite" in f for f in files), files
    # the composite is transparent outside the mask
    comp = next(f for f in tmp_path.rglob("*") if "mask-composite" in f.name)
    im = Image.open(comp)
    assert im.mode == "RGBA"
    a = np.asarray(im)[..., 3]
    assert a[0, 0] == 0 and a[32, 32] > 0


def test_no_copies_by_default(model, tmp_path):
    p = GenerationParams(prompt="x", seed=1, steps=1, width=64, height=64,
                         enable_hr=True, hr_scale=2.0, hr_second_pass_steps=1,
                         denoising_strength=0.6,
                         override_settings={"save_to_dirs": False})
    process_txt2img(model, p, outdir=str(tmp_path))
    files = _files(tmp_path)
    assert len(files) == 1 and "before" not in files[0]
