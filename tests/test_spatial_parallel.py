"""Context-parallel VAE: spatially-sharded decode/encode must match the
single-device ops to float tolerance (halo exchange + psum'd GroupNorm +
gathered mid-attention are all exactness-critical)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdwebui_tpu.models import vae as vae_model
from sdwebui_tpu.models.configs import VAEConfig
from sdwebui_tpu.parallel.spatial import decode_spatial, encode_spatial

CFG = VAEConfig(ch=32, ch_mult=(1, 2, 2, 2), num_res_blocks=1)


@pytest.fixture(scope="module")
def rt8():
    from sdwebui_tpu.parallel.mesh import MeshRuntime

    if jax.device_count() < 8:
        pytest.skip("needs 8 devices")
    return MeshRuntime.create(data=8, model=1)


def test_decode_spatial_matches_single_device(rt8):
    params = vae_model.init_params(CFG, 0)
    z = jnp.asarray(np.random.RandomState(0).randn(1, 32, 24, 4) * 0.7,
                    jnp.float32)
    ref = np.asarray(vae_model.decode(params, CFG, z))
    got = np.asarray(decode_spatial(params, CFG, z, rt8))
    assert got.shape == ref.shape == (1, 256, 192, 3)
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_encode_spatial_matches_single_device(rt8):
    params = vae_model.init_params(CFG, 1)
    x = jnp.asarray(np.random.RandomState(1).rand(1, 128, 64, 3) * 2 - 1,
                    jnp.float32)
    ref = np.asarray(vae_model.encode_moments(params, CFG, x))
    got = np.asarray(encode_spatial(params, CFG, x, rt8))
    assert got.shape == ref.shape == (1, 16, 8, 8)
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_spatial_fallback_single_device():
    from sdwebui_tpu.parallel.mesh import MeshRuntime

    rt1 = MeshRuntime.create(data=1, model=1, devices=jax.devices()[:1])
    params = vae_model.init_params(CFG, 0)
    z = jnp.asarray(np.random.RandomState(0).randn(1, 8, 8, 4), jnp.float32)
    ref = np.asarray(vae_model.decode(params, CFG, z))
    got = np.asarray(decode_spatial(params, CFG, z, rt1))
    np.testing.assert_allclose(got, ref)
    # indivisible rows also fall back
    from sdwebui_tpu.parallel.mesh import MeshRuntime as MR

    z9 = jnp.asarray(np.random.RandomState(0).randn(1, 9, 8, 4), jnp.float32)
    out = decode_spatial(params, CFG, z9)   # default runtime, any size
    assert out.shape == (1, 72, 64, 3)


def test_pipeline_routes_large_decode_spatially(rt8, monkeypatch):
    """decode_first_stage_u8 uses the context-parallel path for a big
    single image on a multi-device mesh."""
    from sdwebui_tpu.parallel import mesh as mesh_mod
    from sdwebui_tpu.parallel import spatial as spatial_mod
    from sdwebui_tpu.pipeline import processing
    from sdwebui_tpu.pipeline.sd_model import create_tiny_sd

    model = create_tiny_sd()
    monkeypatch.setattr(mesh_mod, "_runtime", rt8)
    calls = []
    orig = spatial_mod.decode_spatial

    def spy(*a, **kw):
        calls.append(1)
        return orig(*a, **kw)

    monkeypatch.setattr(spatial_mod, "decode_spatial", spy)
    z = jnp.asarray(np.random.RandomState(0).randn(1, 128, 128, 4) * 0.5,
                    jnp.float32)
    u8 = processing.decode_first_stage_u8(model, z)
    assert u8.shape == (1, 1024, 1024, 3) and u8.dtype == jnp.uint8
    assert calls, "spatial decode was not used"
