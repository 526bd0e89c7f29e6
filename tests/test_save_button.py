"""Save / Save-as-zip gallery action (reference modules/ui_common.py:64
save_files): outdir_save writes, log.csv rows, save_selected_only, zip
archive naming."""

import base64
import csv
import io
import os

from PIL import Image

from sdwebui_tpu.server.ui_actions import save_files, save_files_from_json
from sdwebui_tpu.utils.options import opts


def _imgs(n):
    return [Image.new("RGB", (16, 16), (i * 30 % 255, 10, 10)) for i in range(n)]


def _js(n, first=0):
    return {"prompt": "a test", "negative_prompt": "bad", "seed": 7,
            "all_seeds": [7 + i for i in range(n)], "width": 16, "height": 16,
            "sampler_name": "Euler", "cfg_scale": 7.0, "steps": 3,
            "batch_size": n, "index_of_first_image": first,
            "infotexts": [f"a test\nSteps: 3, Sampler: Euler, Seed: {7 + i}"
                          for i in range(n)],
            "sd_model_name": "tiny", "sd_model_hash": "abc123"}


def test_save_all_writes_files_and_log(tmp_path):
    out = str(tmp_path / "saved")
    with opts.override({"outdir_save": out, "save_write_log_csv": True,
                        "use_save_to_dirs_for_ui": False}):
        res = save_files(_js(2), _imgs(2))
    assert len(res["files"]) == 2
    assert all(os.path.exists(f) for f in res["files"])
    with open(os.path.join(out, "log.csv"), newline="") as f:
        rows = list(csv.reader(f))
    assert rows[0][0] == "prompt" and len(rows) == 2
    assert rows[1][0] == "a test" and rows[1][1] == "7"


def test_save_selected_only(tmp_path):
    out = str(tmp_path / "saved")
    with opts.override({"outdir_save": out, "save_selected_only": True,
                        "save_write_log_csv": False,
                        "use_save_to_dirs_for_ui": False}):
        res = save_files(_js(3, first=1), _imgs(3), index=2)
    assert len(res["files"]) == 1
    assert not os.path.exists(os.path.join(out, "log.csv"))


def test_save_grid_index_ignores_selected(tmp_path):
    # index 0 is the grid (index_of_first_image=1) -> selected-only does not
    # trigger; all images are saved (reference ui_common.py:84)
    out = str(tmp_path / "saved")
    with opts.override({"outdir_save": out, "save_selected_only": True,
                        "save_write_log_csv": False,
                        "use_save_to_dirs_for_ui": False}):
        res = save_files(_js(3, first=1), _imgs(3), index=0)
    assert len(res["files"]) == 3


def test_zip_archive(tmp_path):
    out = str(tmp_path / "saved")
    with opts.override({"outdir_save": out, "save_write_log_csv": False,
                        "use_save_to_dirs_for_ui": False,
                        "grid_zip_filename_pattern": "[seed]-archive"}):
        res = save_files(_js(2), _imgs(2), do_make_zip=True)
    assert res["zip"] and res["zip"].endswith("7-archive.zip")
    from zipfile import ZipFile

    with ZipFile(res["zip"]) as zf:
        assert len(zf.namelist()) == 2


def test_http_adapter_accepts_base64(tmp_path):
    out = str(tmp_path / "saved")
    buf = io.BytesIO()
    _imgs(1)[0].save(buf, "PNG")
    b64 = base64.b64encode(buf.getvalue()).decode()
    with opts.override({"outdir_save": out, "save_write_log_csv": True,
                        "use_save_to_dirs_for_ui": False}):
        res = save_files_from_json({"js_data": _js(1), "images": [b64],
                                    "do_make_zip": False, "index": -1})
    assert len(res["files"]) == 1 and os.path.exists(res["files"][0])
    assert os.path.exists(os.path.join(out, "log.csv"))
