"""Face restoration helper: similarity fit, warp/paste-back, restorer
registry, and pipeline integration."""

import numpy as np
import pytest
from PIL import Image

import jax.numpy as jnp

from sdwebui_tpu.postprocessing import faces


def test_similarity_transform_recovers_rst():
    rng = np.random.RandomState(0)
    src = rng.rand(5, 2) * 100
    theta, scale, t = 0.3, 1.7, np.array([12.0, -5.0])
    rot = scale * np.array([[np.cos(theta), -np.sin(theta)],
                            [np.sin(theta), np.cos(theta)]])
    dst = src @ rot.T + t
    m = faces.similarity_transform(src, dst)
    got = src @ m[:, :2].T + m[:, 2]
    np.testing.assert_allclose(got, dst, atol=1e-8)


def test_warp_identity():
    img = Image.fromarray((np.random.RandomState(0).rand(32, 32, 3) * 255)
                          .astype(np.uint8))
    m = np.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    out = faces._warp(img, m, (32, 32))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(img))


def _write_tiny_gfpgan(tmp_path):
    import sys
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    import torch  # noqa: F401  (twin needs it)
    from test_gfpgan import CFG, TGFPGAN, _twin_state_dict

    import torch as _t
    _t.manual_seed(3)
    m = TGFPGAN(CFG).eval()
    sd = {"params_ema." + k: v for k, v in _twin_state_dict(m).items()}
    d = tmp_path / "GFPGAN"
    d.mkdir()
    from sdwebui_tpu.loader.safetensors_io import write_safetensors

    write_safetensors(str(d / "GFPGANv1.4.safetensors"), sd)
    return str(d), CFG.out_size


def test_restore_full_frame_and_visibility(tmp_path):
    pytest.importorskip("torch")
    d, size = _write_tiny_gfpgan(tmp_path)
    faces.set_model_dirs("GFPGAN", [d])
    assert "GFPGAN" in faces.available_restorers()

    img = Image.fromarray((np.random.RandomState(1).rand(48, 40, 3) * 255)
                          .astype(np.uint8))
    out = faces.restore_faces(img, "GFPGAN", crop_size=size)
    assert out.size == img.size
    assert not np.array_equal(np.asarray(out), np.asarray(img))

    half = faces.restore_faces(img, "GFPGAN", visibility=0.5, crop_size=size)
    full = np.asarray(out, np.float32)
    orig = np.asarray(img, np.float32)
    np.testing.assert_allclose(np.asarray(half, np.float32),
                               np.round((orig + full) / 2), atol=1.0)

    # visibility 0 / "None" are no-ops
    assert faces.restore_faces(img, "None") is img
    assert faces.restore_faces(img, "GFPGAN", visibility=0.0) is img
    faces.set_model_dirs("GFPGAN", ["models/GFPGAN"])


def test_restore_with_detector_pastes_back(tmp_path):
    pytest.importorskip("torch")
    d, size = _write_tiny_gfpgan(tmp_path)
    faces.set_model_dirs("GFPGAN", [d])

    img = Image.fromarray(np.full((64, 64, 3), 128, np.uint8))
    # one face in the upper-left quadrant: landmarks = template scaled there
    lm = faces.FACE_TEMPLATE_512 / 512.0 * 24.0 + 4.0
    faces.set_face_detector(lambda im: [lm])
    try:
        out = faces.restore_faces(img, "GFPGAN", crop_size=size)
        diff = np.abs(np.asarray(out, np.int16) - 128).sum(axis=-1)
        # the face region changed, the far corner did not
        assert diff[:40, :40].sum() > 0
        assert diff[56:, 56:].sum() == 0
    finally:
        faces.set_face_detector(None)
        faces.set_model_dirs("GFPGAN", ["models/GFPGAN"])


def test_txt2img_restore_faces_missing_weights_is_graceful():
    from sdwebui_tpu.pipeline.params import GenerationParams
    from sdwebui_tpu.pipeline.processing import process_txt2img
    from sdwebui_tpu.pipeline.sd_model import create_tiny_sd

    model = create_tiny_sd()
    p = GenerationParams(prompt="x", seed=5, steps=2, width=64, height=64,
                         restore_faces=True, do_not_save_samples=True)
    res = process_txt2img(model, p)
    assert len(res.images) == 1
    assert "Face restoration" in res.infotexts[0]
