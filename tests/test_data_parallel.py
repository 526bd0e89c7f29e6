"""Data-parallel generation over the virtual 8-device CPU mesh: the batch
axis shards over `data`, outputs must match the single-device run."""

import numpy as np
import pytest

import jax

from sdwebui_tpu.parallel.mesh import MeshRuntime, get_runtime, set_runtime
from sdwebui_tpu.pipeline.params import GenerationParams
from sdwebui_tpu.pipeline.processing import process_txt2img
from sdwebui_tpu.pipeline.sd_model import create_tiny_sd


@pytest.fixture()
def dp_runtime():
    if jax.device_count() < 4:
        pytest.skip("needs multiple devices")
    old = get_runtime()
    rt = MeshRuntime.create(data=4, model=1, devices=jax.devices()[:4])
    set_runtime(rt)
    yield rt
    set_runtime(old)


def test_dp_batch_matches_single_device(dp_runtime):
    model = create_tiny_sd()
    p = lambda: GenerationParams(prompt="a cat", seed=7, steps=2,
                                 width=64, height=64, batch_size=4)

    replicated = model.replicate(dp_runtime)
    res_dp = process_txt2img(replicated, p())

    set_runtime(MeshRuntime.create(data=1, model=1, devices=jax.devices()[:1]))
    res_single = process_txt2img(model, p())

    assert len(res_dp.images) == 4
    for a, b in zip(res_dp.images, res_single.images):
        np.testing.assert_allclose(np.asarray(a, int), np.asarray(b, int),
                                   atol=2)  # cross-device reduction order


def test_dp_indivisible_batch_falls_back(dp_runtime):
    model = create_tiny_sd().replicate(dp_runtime)
    p = GenerationParams(prompt="x", seed=7, steps=1, width=64, height=64,
                         batch_size=3)  # 3 % 4 != 0 → unsharded path
    res = process_txt2img(model, p)
    assert len(res.images) == 3
