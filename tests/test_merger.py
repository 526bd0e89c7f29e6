"""Checkpoint merger + external VAE + tiling tests."""

import numpy as np
import pytest

from sdwebui_tpu.postprocessing.merger import merge_checkpoints, run_modelmerger


def test_weighted_sum():
    a = {"w": np.full((4,), 1.0, np.float32)}
    b = {"w": np.full((4,), 3.0, np.float32)}
    out = merge_checkpoints(a, b, method="Weighted sum", multiplier=0.25)
    np.testing.assert_allclose(out["w"], 1.5)


def test_add_difference():
    a = {"w": np.full((4,), 1.0, np.float32)}
    b = {"w": np.full((4,), 3.0, np.float32)}
    c = {"w": np.full((4,), 2.0, np.float32)}
    out = merge_checkpoints(a, b, c, method="Add difference", multiplier=1.0)
    np.testing.assert_allclose(out["w"], 2.0)
    with pytest.raises(ValueError):
        merge_checkpoints(a, b, None, method="Add difference")


def test_inpaint_channel_mismatch_merge():
    a = {"w": np.ones((8, 9, 3, 3), np.float32)}  # inpaint conv_in
    b = {"w": np.full((8, 4, 3, 3), 3.0, np.float32)}
    out = merge_checkpoints(a, b, method="Weighted sum", multiplier=0.5)
    np.testing.assert_allclose(out["w"][:, :4], 2.0)
    np.testing.assert_allclose(out["w"][:, 4:], 1.0)


def test_save_half_and_vae_bake():
    a = {"model.w": np.ones((4,), np.float32)}
    vae = {"decoder.x": np.full((2,), 5.0, np.float32)}
    out = merge_checkpoints(a, None, method="No interpolation",
                            save_as_half=True, vae=vae)
    assert out["model.w"].dtype == np.float16
    np.testing.assert_allclose(out["first_stage_model.decoder.x"], 5.0)


def test_discard_weights():
    a = {"model_ema.decay": np.ones(1), "model.w": np.ones(1)}
    out = merge_checkpoints(a, None, method="No interpolation",
                            discard_weights="model_ema")
    assert "model_ema.decay" not in out and "model.w" in out


def test_run_modelmerger_end_to_end(tmp_path):
    from sdwebui_tpu.loader.safetensors_io import read_state_dict, write_safetensors

    p1 = str(tmp_path / "a.safetensors")
    p2 = str(tmp_path / "b.safetensors")
    write_safetensors(p1, {"w": np.zeros((4,), np.float32)})
    write_safetensors(p2, {"w": np.full((4,), 2.0, np.float32)})
    out = run_modelmerger(p1, p2, None, "Weighted sum", 0.5, False,
                          "merged-test", output_dir=str(tmp_path))
    got = read_state_dict(out)
    np.testing.assert_allclose(got["w"], 1.0)


def test_external_vae_load(tmp_path):
    """Bare-key VAE file swaps into a model."""
    import jax

    from sdwebui_tpu.loader.load import load_external_vae
    from sdwebui_tpu.loader.safetensors_io import write_safetensors
    from sdwebui_tpu.models import vae as vae_model
    from sdwebui_tpu.models.configs import VAEConfig
    from sdwebui_tpu.utils.pytree import flatten

    cfg = VAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1)
    params = vae_model.init_params(cfg, 5)
    # inverse-convert to torch-layout bare keys
    sd = {}
    for k, v in flatten(params).items():
        arr = np.asarray(jax.device_get(v))
        if k.endswith(".weight") and arr.ndim == 4:
            arr = np.transpose(arr, (3, 2, 0, 1))
        sd[k] = arr
    path = str(tmp_path / "ext.vae.safetensors")
    write_safetensors(path, sd)
    tree, got_cfg = load_external_vae(path)
    assert got_cfg.ch == 32 and tuple(got_cfg.ch_mult) == (1, 2)


def test_tiling_produces_seamless_edges():
    """Circular conv: output at left edge depends on right edge content."""
    import dataclasses

    import jax.numpy as jnp

    from sdwebui_tpu.models import unet
    from sdwebui_tpu.models.configs import UNetConfig

    cfg = UNetConfig(model_channels=32, channel_mult=(1, 2),
                     attention_resolutions=(2, 1), transformer_depth=(1, 1),
                     context_dim=64, num_heads=4)
    params = unet.init_params(cfg, 0, dtype=jnp.float32)
    x = jnp.zeros((1, 16, 16, 4)).at[0, 8, 15, :].set(10.0)  # right-edge spike
    t = jnp.array([5.0])
    ctx = jnp.ones((1, 77, 64))
    plain = np.asarray(unet.apply(params, cfg, x, t, ctx))
    tiled = np.asarray(unet.apply(params, dataclasses.replace(cfg, tiling=True),
                                  x, t, ctx))
    # with wrap padding the spike leaks across the boundary to column 0
    assert not np.allclose(plain[0, :, 0], tiled[0, :, 0])
