"""Grid assembly/return/save stage (reference modules/processing.py:1118-1130
+ modules/images.py:36 image_grid): return_grid prepends the grid, grid_save
writes it to outpath_grids, n_rows/grid_prevent_empty_spots shape it."""

import numpy as np
import pytest
from PIL import Image

from sdwebui_tpu.pipeline.params import GenerationParams
from sdwebui_tpu.pipeline.processing import process_txt2img
from sdwebui_tpu.utils import images as images_util
from sdwebui_tpu.utils.options import opts


@pytest.fixture(scope="module")
def model():
    from sdwebui_tpu.pipeline.sd_model import create_tiny_sd

    return create_tiny_sd(seed=0)


def _imgs(n, w=8, h=8):
    return [Image.new("RGB", (w, h), (i * 20 % 255, 0, 0)) for i in range(n)]


# --------------------------------------------------------------------------
# image_grid rows logic (reference modules/images.py:36-50)
# --------------------------------------------------------------------------

def test_image_grid_near_square_default():
    g = images_util.image_grid(_imgs(6))  # rows=round(sqrt(6))=2 -> cols=3
    assert g.size == (3 * 8, 2 * 8)


def test_image_grid_n_rows_fixed():
    with opts.override({"n_rows": 3}):
        g = images_util.image_grid(_imgs(6))
    assert g.size == (2 * 8, 3 * 8)


def test_image_grid_n_rows_zero_uses_batch_size():
    with opts.override({"n_rows": 0}):
        g = images_util.image_grid(_imgs(6), batch_size=2)
    assert g.size == (3 * 8, 2 * 8)


def test_image_grid_prevent_empty_spots():
    # 6 imgs: floor(sqrt(6))=2 divides 6 -> 2 rows x 3 cols (no empty cells)
    with opts.override({"grid_prevent_empty_spots": True}):
        g = images_util.image_grid(_imgs(6))
    assert g.size == (3 * 8, 2 * 8)
    # 5 imgs: floor(sqrt(5))=2 doesn't divide 5 -> falls to 1 row
    with opts.override({"grid_prevent_empty_spots": True}):
        g = images_util.image_grid(_imgs(5))
    assert g.size == (5 * 8, 1 * 8)


def test_image_grid_background_and_centering():
    imgs = [Image.new("RGB", (8, 8), (10, 10, 10)),
            Image.new("RGB", (4, 4), (10, 10, 10))]
    with opts.override({"grid_background_color": "#00ff00", "n_rows": 1}):
        g = images_util.image_grid(imgs)
    assert g.size == (16, 8)
    a = np.asarray(g)
    # second cell: 4x4 image centered in an 8x8 cell, bg fills the border
    assert tuple(a[0, 8]) == (0, 255, 0)
    assert tuple(a[4, 12]) == (10, 10, 10)


def test_image_grid_callback_can_rewrite():
    from sdwebui_tpu.scripts import framework as fw

    seen = {}

    def cb(params):
        seen["cols"], seen["rows"] = params.cols, params.rows

    fw.on("image_grid", cb)
    try:
        images_util.image_grid(_imgs(4))
    finally:
        fw._callbacks["image_grid"].remove(cb)
    assert seen == {"cols": 2, "rows": 2}


# --------------------------------------------------------------------------
# pipeline grid stage
# --------------------------------------------------------------------------

def test_return_grid_prepends_and_indexes(model, tmp_path):
    p = GenerationParams(prompt="x", seed=1, steps=1, width=64, height=64,
                         batch_size=2, outpath_grids=str(tmp_path / "grids"),
                         override_settings={"save_to_dirs": False,
                                            "grid_save_to_dirs": False})
    res = process_txt2img(model, p, outdir=str(tmp_path / "samples"))
    images_util.flush_saves()
    assert res.index_of_first_image == 1
    assert len(res.images) == 3          # grid + 2 samples
    assert len(res.infotexts) == 3
    assert res.images[0].size == (128, 64)
    grids = list((tmp_path / "grids").glob("*.png"))
    assert len(grids) == 1 and grids[0].name.startswith("grid")
    # grid infotext embedded
    assert images_util.read_info_from_image(Image.open(grids[0]))


def test_grid_only_if_multiple_suppresses_single(model, tmp_path):
    p = GenerationParams(prompt="x", seed=1, steps=1, width=64, height=64,
                         outpath_grids=str(tmp_path / "grids"))
    res = process_txt2img(model, p, outdir=None)
    assert res.index_of_first_image == 0
    assert len(res.images) == 1
    assert not (tmp_path / "grids").exists()


def test_do_not_save_grid_suppresses(model, tmp_path):
    p = GenerationParams(prompt="x", seed=1, steps=1, width=64, height=64,
                         batch_size=2, do_not_save_grid=True,
                         outpath_grids=str(tmp_path / "grids"))
    res = process_txt2img(model, p, outdir=None)
    assert res.index_of_first_image == 0
    assert len(res.images) == 2


def test_grid_format_and_no_return(model, tmp_path):
    p = GenerationParams(prompt="x", seed=1, steps=1, width=64, height=64,
                         batch_size=2, outpath_grids=str(tmp_path / "grids"),
                         override_settings={"return_grid": False,
                                            "grid_format": "jpg",
                                            "grid_save_to_dirs": False})
    res = process_txt2img(model, p, outdir=None)
    images_util.flush_saves()
    assert res.index_of_first_image == 0
    assert len(res.images) == 2          # grid saved but not returned
    assert list((tmp_path / "grids").glob("*.jpg"))


def test_img2img_grid_stage(model, tmp_path):
    from sdwebui_tpu.pipeline.img2img import process_img2img

    p = GenerationParams(prompt="x", seed=1, steps=1, width=64, height=64,
                         batch_size=2, denoising_strength=0.6,
                         init_images=[Image.new("RGB", (64, 64), (90, 90, 90))],
                         outpath_grids=str(tmp_path / "grids"),
                         override_settings={"grid_save_to_dirs": False})
    res = process_img2img(model, p, outdir=None)
    images_util.flush_saves()
    assert res.index_of_first_image == 1
    assert len(res.images) == 3
    assert list((tmp_path / "grids").glob("grid*.png"))
