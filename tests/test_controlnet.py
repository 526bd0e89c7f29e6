"""ControlNet: tower forward, zero-init identity, loading (cldm + diffusers
key layouts), guidance gating, and end-to-end pipeline effect."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdwebui_tpu.models import controlnet as cn
from sdwebui_tpu.models import unet as unet_model
from sdwebui_tpu.models.configs import UNetConfig

TINY = UNetConfig(model_channels=32, channel_mult=(1, 2),
                  attention_resolutions=(2, 1), transformer_depth=(1, 1),
                  context_dim=64, num_heads=4)


def _inputs(b=2, hw=16, seed=0):
    r = np.random.RandomState(seed)
    x = jnp.asarray(r.randn(b, hw, hw, 4), jnp.float32)
    t = jnp.asarray([500.0] * b, jnp.float32)
    ctx = jnp.asarray(r.randn(b, 77, 64), jnp.float32)
    hint = jnp.asarray(r.rand(b, hw * 8, hw * 8, 3), jnp.float32)
    return x, t, ctx, hint


def test_residual_shapes_match_unet_blocks():
    params = cn.init_params(TINY, 3, dtype=jnp.float32)
    x, t, ctx, hint = _inputs()
    out = cn.apply(params, TINY, x, t, ctx, hint)
    shapes = cn.residual_shapes(TINY, 2, 16, 16)
    assert tuple(a.shape for a in out["input"]) == shapes["input"]
    assert out["middle"].shape == shapes["middle"]
    # residuals must add cleanly inside the UNet forward
    up = unet_model.init_params(TINY, 0, dtype=jnp.float32)
    y = unet_model.apply(up, TINY, x, t, ctx, control=out)
    assert y.shape == x.shape


def test_zero_init_is_identity():
    """Fresh (zero-conv) ControlNet must not change the UNet output — the
    cldm training-start invariant."""
    params = cn.init_params(TINY, 3, dtype=jnp.float32)
    x, t, ctx, hint = _inputs()
    out = cn.apply(params, TINY, x, t, ctx, hint)
    total = sum(float(jnp.abs(a).sum()) for a in out["input"])
    assert total == 0.0
    assert float(jnp.abs(out["middle"]).sum()) == 0.0


def test_nonzero_control_changes_unet_output():
    params = cn.init_params(TINY, 3, dtype=jnp.float32, zero_init=False)
    x, t, ctx, hint = _inputs()
    out = cn.apply(params, TINY, x, t, ctx, hint)
    assert sum(float(jnp.abs(a).sum()) for a in out["input"]) > 0
    up = unet_model.init_params(TINY, 0, dtype=jnp.float32)
    y0 = unet_model.apply(up, TINY, x, t, ctx)
    y1 = unet_model.apply(up, TINY, x, t, ctx, control=out)
    assert not np.allclose(np.asarray(y0), np.asarray(y1))


def test_hint_depends_on_image():
    params = cn.init_params(TINY, 3, dtype=jnp.float32, zero_init=False)
    x, t, ctx, hint = _inputs()
    a = cn.apply(params, TINY, x, t, ctx, hint)
    b = cn.apply(params, TINY, x, t, ctx, jnp.zeros_like(hint))
    assert not np.allclose(np.asarray(a["middle"]), np.asarray(b["middle"]))


# --------------------------------------------------------------------------
# loading
# --------------------------------------------------------------------------

def _flat_state_dict(params, prefix=""):
    """Invert the JAX layout back to a torch-style flat dict (tests only)."""
    flat = {}

    def walk(tree, path):
        if isinstance(tree, dict) and "weight" not in tree and "bias" not in tree:
            for k, v in tree.items():
                walk(v, path + (k,))
            return
        if isinstance(tree, dict):
            for k, v in tree.items():
                key = ".".join(path + (k,))
                arr = np.asarray(v)
                if k == "weight" and arr.ndim == 4:
                    arr = np.transpose(arr, (3, 2, 0, 1))
                elif k == "weight" and arr.ndim == 2:
                    arr = arr.T
                flat[prefix + key] = np.ascontiguousarray(arr)

    walk(params, ())
    return flat


def test_convert_controlnet_cldm_roundtrip():
    from sdwebui_tpu.loader.convert import convert_controlnet

    params = cn.init_params(TINY, 5, dtype=jnp.float32, zero_init=False)
    sd = _flat_state_dict(params, prefix="control_model.")
    tree, cfg, hint_ch = convert_controlnet(sd)
    assert hint_ch == 3
    assert cfg.model_channels == TINY.model_channels
    assert tuple(cfg.channel_mult) == tuple(TINY.channel_mult)
    x, t, ctx, hint = _inputs()
    a = cn.apply(params, TINY, x, t, ctx, hint)
    b = cn.apply(jax.tree_util.tree_map(jnp.asarray, tree), cfg, x, t, ctx, hint)
    np.testing.assert_allclose(np.asarray(a["middle"]), np.asarray(b["middle"]),
                               rtol=1e-5, atol=1e-5)


def test_convert_controlnet_bare_prefix():
    from sdwebui_tpu.loader.convert import convert_controlnet

    params = cn.init_params(TINY, 5, dtype=jnp.float32)
    sd = _flat_state_dict(params, prefix="")
    tree, cfg, hint_ch = convert_controlnet(sd)
    assert cfg.context_dim == 64


def test_convert_controlnet_diffusers_keys():
    """The diffusers re-keying must land tensors on the same tree slots as
    the cldm layout."""
    from sdwebui_tpu.loader.convert import convert_controlnet

    params = cn.init_params(TINY, 7, dtype=jnp.float32, zero_init=False)
    cldm = _flat_state_dict(params, prefix="")
    n_res = TINY.num_res_blocks

    diff = {}
    for k, v in cldm.items():
        if k.startswith("time_embed.0."):
            diff["time_embedding.linear_1." + k.rsplit(".", 1)[1]] = v
        elif k.startswith("time_embed.2."):
            diff["time_embedding.linear_2." + k.rsplit(".", 1)[1]] = v
        elif k.startswith("input_blocks.0.0."):
            diff["conv_in." + k.split(".", 3)[3]] = v
        elif k.startswith("middle_block_out.0."):
            diff["controlnet_mid_block." + k.rsplit(".", 1)[1]] = v
        elif k.startswith("zero_convs."):
            parts = k.split(".")
            diff[f"controlnet_down_blocks.{parts[1]}." + ".".join(parts[3:])] = v
        elif k.startswith("input_hint_block."):
            j = int(k.split(".")[1])
            tail = k.rsplit(".", 1)[1]
            if j == 0:
                diff["controlnet_cond_embedding.conv_in." + tail] = v
            elif j == 14:
                diff["controlnet_cond_embedding.conv_out." + tail] = v
            else:
                diff[f"controlnet_cond_embedding.blocks.{(j - 2) // 2}.{tail}"] = v
        elif k.startswith("middle_block."):
            parts = k.split(".")
            slot, rest = int(parts[1]), ".".join(parts[2:])
            if slot == 1:
                diff["mid_block.attentions.0." + rest] = v
            else:
                inv = {"in_layers.0": "norm1", "in_layers.2": "conv1",
                       "emb_layers.1": "time_emb_proj", "out_layers.0": "norm2",
                       "out_layers.3": "conv2", "skip_connection": "conv_shortcut"}
                name, tail = rest.rsplit(".", 1)
                diff[f"mid_block.resnets.{slot // 2}.{inv[name]}.{tail}"] = v
        elif k.startswith("input_blocks."):
            parts = k.split(".")
            idx, slot, rest = int(parts[1]), int(parts[2]), ".".join(parts[3:])
            level, off = (idx - 1) // (n_res + 1), (idx - 1) % (n_res + 1)
            if rest.startswith("op."):
                diff[f"down_blocks.{level}.downsamplers.0.conv." + rest[3:]] = v
            elif slot == 1:
                diff[f"down_blocks.{level}.attentions.{off}." + rest] = v
            else:
                inv = {"in_layers.0": "norm1", "in_layers.2": "conv1",
                       "emb_layers.1": "time_emb_proj", "out_layers.0": "norm2",
                       "out_layers.3": "conv2", "skip_connection": "conv_shortcut"}
                name, tail = rest.rsplit(".", 1)
                diff[f"down_blocks.{level}.resnets.{off}.{inv[name]}.{tail}"] = v
        else:
            raise AssertionError(f"unmapped test key {k}")

    tree, cfg, hint_ch = convert_controlnet(diff)
    x, t, ctx, hint = _inputs()
    a = cn.apply(params, TINY, x, t, ctx, hint)
    b = cn.apply(jax.tree_util.tree_map(jnp.asarray, tree), cfg, x, t, ctx, hint)
    np.testing.assert_allclose(np.asarray(a["middle"]), np.asarray(b["middle"]),
                               rtol=1e-5, atol=1e-5)


# --------------------------------------------------------------------------
# pipeline integration
# --------------------------------------------------------------------------

def _tiny_pipeline_setup(tmp_path):
    """Writes two tiny towers: random weights + a zero-init (zero-conv) one."""
    from sdwebui_tpu.loader.safetensors_io import write_safetensors
    from sdwebui_tpu.pipeline import control as control_mod
    from sdwebui_tpu.pipeline.sd_model import create_tiny_sd

    model = create_tiny_sd()
    for name, zero in (("tiny_canny", False), ("tiny_zero", True)):
        params = cn.init_params(model.unet_cfg, 9, dtype=jnp.float32,
                                zero_init=zero)
        sd = _flat_state_dict(params, prefix="control_model.")
        write_safetensors(str(tmp_path / f"{name}.safetensors"), sd)
    control_mod.set_model_dirs([str(tmp_path)])
    return model


def test_txt2img_with_controlnet(tmp_path):
    from PIL import Image

    from sdwebui_tpu.pipeline import control as control_mod
    from sdwebui_tpu.pipeline.params import GenerationParams
    from sdwebui_tpu.pipeline.processing import process_txt2img

    model = _tiny_pipeline_setup(tmp_path)
    assert control_mod.list_models() == ["tiny_canny", "tiny_zero"]

    hint = Image.fromarray(
        (np.random.RandomState(0).rand(64, 64, 3) * 255).astype(np.uint8))

    def run(units):
        p = GenerationParams(prompt="a cat", seed=1, steps=3, width=64,
                             height=64, sampler_name="Euler",
                             controlnet_units=units,
                             do_not_save_samples=True)
        res = process_txt2img(model, p)
        return np.asarray(res.images[0], np.float32)

    # same compiled program shape across all three runs → comparisons are
    # exact: a zero-conv tower at weight 1 and any tower gated to weight 0
    # both inject exactly zero residuals
    controlled = run([{"model": "tiny_canny", "image": hint, "weight": 1.0}])
    zero_weight = run([{"model": "tiny_canny", "image": hint, "weight": 0.0}])
    zero_tower = run([{"model": "tiny_zero", "image": hint, "weight": 1.0}])

    assert not np.allclose(zero_weight, controlled)
    np.testing.assert_allclose(zero_tower, zero_weight)
    control_mod.set_model_dirs(["models/ControlNet"])


def test_guidance_range_gates_steps(tmp_path):
    from sdwebui_tpu.pipeline import control as control_mod
    from sdwebui_tpu.pipeline.control import ControlNetUnit, prepare_controls

    model = _tiny_pipeline_setup(tmp_path)
    unit = ControlNetUnit(model="tiny_canny",
                          image=np.zeros((64, 64, 3), np.uint8),
                          weight=0.8, guidance_start=0.4, guidance_end=0.9)
    control, cfgs = prepare_controls([unit], 64, 64, 10, latent_channels=4)
    scales = np.asarray(control[0][2])
    frac = np.arange(10) / 9.0
    expect = np.where((frac >= 0.4 - 1e-6) & (frac <= 0.9 + 1e-6), 0.8, 0.0)
    np.testing.assert_allclose(scales, expect.astype(np.float32))
    assert cfgs[0].in_channels == 4
    control_mod.set_model_dirs(["models/ControlNet"])


def test_control_modes_produce_distinct_outputs(tmp_path):
    """control_mode 0/1/2 (Balanced / prompt-important soft decay /
    cfg-injected cond-only) change the residual application."""
    from PIL import Image

    from sdwebui_tpu.pipeline import control as control_mod
    from sdwebui_tpu.pipeline.params import GenerationParams
    from sdwebui_tpu.pipeline.processing import process_txt2img

    model = _tiny_pipeline_setup(tmp_path)
    hint = Image.fromarray(
        (np.random.RandomState(3).rand(64, 64, 3) * 255).astype(np.uint8))

    def run(mode):
        p = GenerationParams(prompt="a cat", seed=1, steps=3, width=64,
                             height=64, sampler_name="Euler",
                             controlnet_units=[{
                                 "model": "tiny_canny", "image": hint,
                                 "weight": 1.0, "control_mode": mode}],
                             do_not_save_samples=True)
        return np.asarray(process_txt2img(model, p).images[0], np.float32)

    balanced = run(0)
    prompt_first = run("My prompt is more important")
    control_first = run(2)
    assert not np.allclose(balanced, prompt_first)
    assert not np.allclose(balanced, control_first)
    assert not np.allclose(prompt_first, control_first)
    control_mod.set_model_dirs(["models/ControlNet"])


def test_control_mode_parsing():
    from sdwebui_tpu.pipeline.control import ControlNetUnit

    assert ControlNetUnit(control_mode="Balanced").mode_int == 0
    assert ControlNetUnit(
        control_mode="My prompt is more important").mode_int == 1
    assert ControlNetUnit(
        control_mode="ControlNet is more important").mode_int == 2
    assert ControlNetUnit.from_dict(
        {"model": "m", "control_mode": 2}).mode_int == 2


def test_annotators():
    pytest.importorskip("cv2")
    from sdwebui_tpu.pipeline import annotators

    img = np.zeros((64, 64, 3), np.uint8)
    img[16:48, 16:48] = 255                      # white square → edges
    edges = annotators.run_annotator("canny", img, res=0,
                                     threshold_a=100, threshold_b=200)
    assert edges.shape == (64, 64)
    assert edges.max() == 255 and (edges > 0).sum() > 50

    inv = annotators.run_annotator("invert", img)
    assert inv[0, 0, 0] == 255 and inv[20, 20, 0] == 0

    blur = annotators.run_annotator("blur_gaussian", img, res=0,
                                    threshold_a=3)
    assert blur.shape == img.shape
    assert 0 < blur[15, 15, 0] < 255             # softened edge

    thr = annotators.run_annotator("threshold", img, res=0, threshold_a=127)
    assert set(np.unique(thr)) <= {0, 255}

    xdog = annotators.run_annotator("scribble_xdog", img, res=0,
                                    threshold_a=32)
    assert xdog.shape == (64, 64)
    assert set(np.unique(xdog)) <= {0, 255}

    # processor_res resizes short side to /8-rounded multiple
    out = annotators.run_annotator("canny", img, res=32,
                                   threshold_a=100, threshold_b=200)
    assert out.shape == (32, 32)

    assert "canny" in annotators.list_modules()


def test_unit_module_preprocesses_hint(tmp_path):
    pytest.importorskip("cv2")
    from sdwebui_tpu.pipeline import control as control_mod
    from sdwebui_tpu.pipeline.control import ControlNetUnit, prepare_controls

    _tiny_pipeline_setup(tmp_path)
    img = np.zeros((64, 64, 3), np.uint8)
    img[16:48, 16:48] = 255
    unit = ControlNetUnit(model="tiny_canny", image=img, module="canny",
                          threshold_a=100, threshold_b=200)
    control, cfgs = prepare_controls([unit], 64, 64, 4, latent_channels=4)
    hint = np.asarray(control[0][1])[0]
    # canny output is sparse white edges, not the filled square
    assert hint.max() > 0.99 and hint.mean() < 0.2
    control_mod.set_model_dirs(["models/ControlNet"])
