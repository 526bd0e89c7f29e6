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


def test_tensor_parallel_txt2img_byte_identical_f32():
    """END-TO-END tp=2 txt2img == single-device, byte-identical (VERDICT r4
    #5 / SURVEY §2.6 "TP for latency at batch=1").  Compared under f32
    compute: bf16 leaves ~1% reassociation noise between differently-
    partitioned XLA programs (measured: max|Δ|=24/255 on the tiny twin),
    which would mask real partitioning bugs; f32 pins the arithmetic so any
    nonzero delta is a semantics bug in the sharding."""
    import dataclasses

    import jax.numpy as jnp

    from sdwebui_tpu.utils import devices as dv

    if jax.device_count() < 2:
        pytest.skip("needs 2 devices")
    old = get_runtime()
    old_pol = dv.get_policy()
    dv.set_policy(dataclasses.replace(old_pol, compute_dtype=jnp.float32))
    try:
        model = create_tiny_sd()
        p = lambda: GenerationParams(prompt="a cat", seed=21, steps=2,
                                     width=64, height=64, batch_size=1)
        rt = MeshRuntime.create(data=1, model=2, devices=jax.devices()[:2])
        set_runtime(rt)
        res_tp = process_txt2img(model.replicate(rt), p())
        set_runtime(MeshRuntime.create(data=1, model=1,
                                       devices=jax.devices()[:1]))
        res_single = process_txt2img(model, p())
        a = np.asarray(res_tp.images[0], int)
        b = np.asarray(res_single.images[0], int)
        np.testing.assert_array_equal(a, b)
    finally:
        dv.set_policy(old_pol)
        set_runtime(old)


def test_replicate_does_not_mutate_source_model():
    """SDModel.replicate must not re-place the ORIGINAL model's conditioner
    params (regression: dataclasses.replace shares the conditioner object,
    and the old in-place params assignment moved both models' conds)."""
    if jax.device_count() < 2:
        pytest.skip("needs 2 devices")
    model = create_tiny_sd()
    rt = MeshRuntime.create(data=2, model=1, devices=jax.devices()[:2])
    before = model.conditioner.params
    rep = model.replicate(rt)
    assert model.conditioner.params is before
    assert rep.conditioner is not model.conditioner


def test_hybrid_dp_tp_txt2img_byte_identical_f32():
    """COMBINED data+tensor parallelism: a (data=2, model=2) mesh running
    batch_size=2 txt2img — batch sharded over `data`, UNet projections
    Megatron-sharded over `model` — must reproduce the single-device images
    byte-for-byte under f32 compute (same rationale as the tp=2 test)."""
    import dataclasses

    import jax.numpy as jnp

    from sdwebui_tpu.utils import devices as dv

    if jax.device_count() < 4:
        pytest.skip("needs 4 devices")
    old = get_runtime()
    old_pol = dv.get_policy()
    dv.set_policy(dataclasses.replace(old_pol, compute_dtype=jnp.float32))
    try:
        model = create_tiny_sd()
        p = lambda: GenerationParams(prompt="a cat", seed=23, steps=2,
                                     width=64, height=64, batch_size=2)
        rt = MeshRuntime.create(data=2, model=2, devices=jax.devices()[:4])
        set_runtime(rt)
        res_h = process_txt2img(model.replicate(rt), p())
        set_runtime(MeshRuntime.create(data=1, model=1,
                                       devices=jax.devices()[:1]))
        res_s = process_txt2img(model, p())
        h_imgs = res_h.images[res_h.index_of_first_image:]
        s_imgs = res_s.images[res_s.index_of_first_image:]
        assert len(h_imgs) == 2
        for a, b in zip(h_imgs, s_imgs):
            np.testing.assert_array_equal(np.asarray(a, int),
                                          np.asarray(b, int))
    finally:
        dv.set_policy(old_pol)
        set_runtime(old)
