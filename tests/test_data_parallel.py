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

    dp_samples = res_dp.images[res_dp.index_of_first_image:]
    single_samples = res_single.images[res_single.index_of_first_image:]
    assert len(dp_samples) == 4
    for a, b in zip(dp_samples, single_samples):
        np.testing.assert_allclose(np.asarray(a, int), np.asarray(b, int),
                                   atol=2)  # cross-device reduction order


def test_dp_indivisible_batch_falls_back(dp_runtime):
    model = create_tiny_sd().replicate(dp_runtime)
    p = GenerationParams(prompt="x", seed=7, steps=1, width=64, height=64,
                         batch_size=3)  # 3 % 4 != 0 → unsharded path
    res = process_txt2img(model, p)
    assert len(res.images[res.index_of_first_image:]) == 3


def test_tensor_parallel_matches_single_device():
    """Megatron-sharded UNet projections over model=2 produce the same image
    as the single-device run (GSPMD collectives)."""
    if jax.device_count() < 2:
        pytest.skip("needs 2 devices")
    old = get_runtime()
    rt = MeshRuntime.create(data=1, model=2, devices=jax.devices()[:2])
    set_runtime(rt)
    try:
        model = create_tiny_sd()
        p = lambda: GenerationParams(prompt="a cat", seed=7, steps=2,
                                     width=64, height=64)
        sharded = model.replicate(rt)
        # verify something actually sharded
        from sdwebui_tpu.utils.pytree import flatten

        specs = {k: v.sharding.spec for k, v in flatten(sharded.unet_params).items()
                 if hasattr(v, "sharding")}
        assert any("model" in str(s) for s in specs.values())

        # single-forward numeric parity (end-image comparison amplifies
        # reduction-order noise chaotically over steps on random weights)
        import jax.numpy as jnp

        from sdwebui_tpu.models import unet as um

        x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 8, 8, 4)),
                        jnp.float32)
        t = jnp.array([500.0, 500.0])
        ctx = jnp.ones((2, 77, 64))
        base = np.asarray(um.apply(model.unet_params, model.unet_cfg, x, t, ctx))
        with rt.mesh:
            tp = np.asarray(jax.jit(
                lambda pr, xx, tt, cc: um.apply(pr, model.unet_cfg, xx, tt, cc))(
                sharded.unet_params, x, t, ctx))
        np.testing.assert_allclose(tp, base, atol=1e-4)

        # e2e smoke through the pipeline with the sharded tree
        res_tp = process_txt2img(sharded, p())
        assert len(res_tp.images) == 1
    finally:
        set_runtime(old)
