"""Checkpoint loader tests: formats, safety, layout conversion, and real
numeric parity against torch/transformers reference implementations."""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from sdwebui_tpu.loader import convert, sniff
from sdwebui_tpu.loader.safetensors_io import (
    SafetensorsFile, read_state_dict, write_safetensors,
)
from sdwebui_tpu.loader.torch_ckpt import UnsafePickleError, load_torch_checkpoint
from sdwebui_tpu.utils.pytree import flatten

# --------------------------------------------------------------------------
# safetensors io
# --------------------------------------------------------------------------

def test_safetensors_roundtrip_own(tmp_path):
    t = {"a": np.arange(12, dtype=np.float32).reshape(3, 4),
         "b.c": np.ones((2, 2), np.float16)}
    p = str(tmp_path / "x.safetensors")
    write_safetensors(p, t, metadata={"format": "pt"})
    with SafetensorsFile(p) as f:
        assert set(f.keys()) == {"a", "b.c"}
        assert f.metadata["format"] == "pt"
        np.testing.assert_array_equal(f.tensor("a"), t["a"])
        np.testing.assert_array_equal(f.tensor("b.c"), t["b.c"])


def test_safetensors_cross_library(tmp_path):
    """Our reader parses files written by the official library and v.v."""
    from safetensors.numpy import load_file, save_file

    t = {"w": np.random.default_rng(0).standard_normal((4, 5)).astype(np.float32)}
    p1 = str(tmp_path / "lib.safetensors")
    save_file(t, p1)
    np.testing.assert_array_equal(read_state_dict(p1)["w"], t["w"])

    p2 = str(tmp_path / "ours.safetensors")
    write_safetensors(p2, t)
    np.testing.assert_array_equal(load_file(p2)["w"], t["w"])


def test_safetensors_bf16(tmp_path):
    import ml_dtypes

    t = {"w": np.ones((8,), np.float32).astype(ml_dtypes.bfloat16)}
    p = str(tmp_path / "bf.safetensors")
    write_safetensors(p, t)
    got = read_state_dict(p)["w"]
    assert got.dtype == np.dtype(ml_dtypes.bfloat16)


# --------------------------------------------------------------------------
# restricted torch checkpoint loading
# --------------------------------------------------------------------------

def test_torch_ckpt_loads_real_torch_save(tmp_path):
    import torch

    sd = {"state_dict": {
        "layer.weight": torch.arange(6, dtype=torch.float32).reshape(2, 3),
        "layer.bias": torch.ones(2, dtype=torch.float16),
        "emb": torch.randn(4, 8, dtype=torch.bfloat16),
    }}
    p = str(tmp_path / "m.ckpt")
    torch.save(sd, p)
    got = load_torch_checkpoint(p)
    np.testing.assert_array_equal(got["layer.weight"],
                                  np.arange(6, dtype=np.float32).reshape(2, 3))
    assert got["layer.bias"].dtype == np.float16
    assert str(got["emb"].dtype) == "bfloat16"


def test_torch_ckpt_rejects_malicious_pickle(tmp_path):
    import io
    import pickle
    import zipfile

    class Evil:
        def __reduce__(self):
            import os

            return (os.system, ("echo pwned",))

    p = str(tmp_path / "evil.ckpt")
    buf = io.BytesIO()
    pickle.dump({"state_dict": Evil()}, buf)
    with zipfile.ZipFile(p, "w") as zf:
        zf.writestr("archive/data.pkl", buf.getvalue())
    with pytest.raises(UnsafePickleError):
        load_torch_checkpoint(p)


def test_torch_ckpt_noncontiguous_tensor(tmp_path):
    import torch

    base = torch.arange(24, dtype=torch.float32).reshape(4, 6)
    sd = {"t": base.t()}  # transposed view → non-trivial strides
    p = str(tmp_path / "s.ckpt")
    torch.save(sd, p)
    got = load_torch_checkpoint(p)
    np.testing.assert_array_equal(got["t"], base.numpy().T)


# --------------------------------------------------------------------------
# layout conversion parity vs torch
# --------------------------------------------------------------------------

def test_conv_weight_conversion_matches_torch():
    import torch

    rng = np.random.default_rng(0)
    w = rng.standard_normal((6, 3, 3, 3)).astype(np.float32)  # OIHW
    b = rng.standard_normal(6).astype(np.float32)
    x = rng.standard_normal((2, 8, 8, 3)).astype(np.float32)  # NHWC

    ref = torch.nn.functional.conv2d(
        torch.from_numpy(x).permute(0, 3, 1, 2), torch.from_numpy(w),
        torch.from_numpy(b), padding=1).permute(0, 2, 3, 1).numpy()

    from sdwebui_tpu.models.layers import conv2d

    p = {"weight": jnp.asarray(convert.convert_leaf("x.weight", w)),
         "bias": jnp.asarray(b)}
    out = conv2d(p, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)


def test_linear_conversion_matches_torch():
    import torch

    rng = np.random.default_rng(1)
    w = rng.standard_normal((5, 8)).astype(np.float32)  # (out, in)
    x = rng.standard_normal((3, 8)).astype(np.float32)
    ref = torch.nn.functional.linear(torch.from_numpy(x), torch.from_numpy(w)).numpy()

    from sdwebui_tpu.models.layers import linear

    out = linear({"weight": jnp.asarray(convert.convert_leaf("l.weight", w))},
                 jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_clip_parity_vs_transformers():
    """REAL golden: HF CLIPTextModel (random init) vs our functional CLIP
    after state-dict conversion — hidden states and pooled output."""
    import torch
    from transformers import CLIPTextConfig as HFConfig, CLIPTextModel

    hf_cfg = HFConfig(vocab_size=500, hidden_size=64, intermediate_size=256,
                      num_hidden_layers=3, num_attention_heads=4,
                      max_position_embeddings=77, hidden_act="quick_gelu")
    torch.manual_seed(0)
    hf = CLIPTextModel(hf_cfg).eval()

    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    tree, cfg = convert.convert_clip_hf(sd, "text_model.")
    cfg = dataclasses.replace(cfg, heads=4)

    tokens = np.array([[1, 5, 9, 499] + [2] * 73], np.int64)
    with torch.no_grad():
        ref = hf(input_ids=torch.from_numpy(tokens)).last_hidden_state.numpy()

    from sdwebui_tpu.models import clip as clip_model

    hidden, pooled = clip_model.encode(jax.device_put(tree), cfg,
                                       jnp.asarray(tokens, jnp.int32))
    np.testing.assert_allclose(np.asarray(hidden), ref, atol=2e-4, rtol=1e-3)


def test_openclip_conversion_matches_hf_layout():
    """Composing HF→open_clip→ours yields the identical tree as HF→ours."""
    from sdwebui_tpu.models import clip as clip_model
    from sdwebui_tpu.models.configs import CLIPTextConfig

    cfg = CLIPTextConfig(vocab_size=100, width=32, layers=2, heads=2)
    params = clip_model.init_params(cfg, 0)
    flat = flatten(params)

    # build an open_clip-layout state dict from our tree
    oc = {}
    oc["model.token_embedding.weight"] = flat["embeddings.token_embedding.weight"]
    oc["model.positional_embedding"] = flat["embeddings.position_embedding.weight"]
    oc["model.ln_final.weight"] = flat["final_layer_norm.weight"]
    oc["model.ln_final.bias"] = flat["final_layer_norm.bias"]
    for i in range(cfg.layers):
        b = f"encoder.layers.{i}."
        o = f"model.transformer.resblocks.{i}."
        qw = flat[b + "self_attn.q_proj.weight"].T
        kw = flat[b + "self_attn.k_proj.weight"].T
        vw = flat[b + "self_attn.v_proj.weight"].T
        oc[o + "attn.in_proj_weight"] = np.concatenate([qw, kw, vw], 0)
        oc[o + "attn.in_proj_bias"] = np.concatenate(
            [flat[b + f"self_attn.{n}_proj.bias"] for n in "qkv"], 0)
        oc[o + "attn.out_proj.weight"] = flat[b + "self_attn.out_proj.weight"].T
        oc[o + "attn.out_proj.bias"] = flat[b + "self_attn.out_proj.bias"]
        oc[o + "ln_1.weight"] = flat[b + "layer_norm1.weight"]
        oc[o + "ln_1.bias"] = flat[b + "layer_norm1.bias"]
        oc[o + "ln_2.weight"] = flat[b + "layer_norm2.weight"]
        oc[o + "ln_2.bias"] = flat[b + "layer_norm2.bias"]
        oc[o + "mlp.c_fc.weight"] = flat[b + "mlp.fc1.weight"].T
        oc[o + "mlp.c_fc.bias"] = flat[b + "mlp.fc1.bias"]
        oc[o + "mlp.c_proj.weight"] = flat[b + "mlp.fc2.weight"].T
        oc[o + "mlp.c_proj.bias"] = flat[b + "mlp.fc2.bias"]

    tree, ccfg = convert.convert_clip_openclip(oc, "model.")
    got = flatten(tree)
    for k, v in flat.items():
        np.testing.assert_allclose(got[k], np.asarray(v), atol=1e-6, err_msg=k)
    assert ccfg.layers == 2 and ccfg.width == 32


# --------------------------------------------------------------------------
# sniffing + full checkpoint load
# --------------------------------------------------------------------------

def _tiny_ldm_state_dict():
    """Torch-layout ldm-named checkpoint assembled by inverse-converting a
    tiny model's param trees."""
    from sdwebui_tpu.pipeline.sd_model import create_tiny_sd

    model = create_tiny_sd(seed=3)

    def inverse(key, arr):
        arr = np.asarray(jax.device_get(arr))
        if not key.endswith(".weight"):
            return arr
        if arr.ndim == 4:
            return np.ascontiguousarray(np.transpose(arr, (3, 2, 0, 1)))
        if arr.ndim == 2 and not any(
                t in key for t in ("token_embedding", "position_embedding")):
            return np.ascontiguousarray(arr.T)
        return arr

    sd = {}
    for k, v in flatten(model.unet_params).items():
        sd["model.diffusion_model." + k] = inverse(k, v)
    for k, v in flatten(model.vae_params).items():
        sd["first_stage_model." + k] = inverse(k, v)
    for k, v in flatten(model.conditioner.params).items():
        sd["cond_stage_model.transformer.text_model." + k] = inverse(k, v)
    return model, sd


def test_sniff_families():
    _, sd = _tiny_ldm_state_dict()
    info = sniff.sniff(sd)
    assert info.family == "sd1" and info.in_channels == 4

    assert sniff.sniff({
        "model.diffusion_model.x_embedder.proj.weight": np.zeros((1, 1)),
    }).family == "sd3"
    with pytest.raises(ValueError):
        sniff.sniff({"random.key": np.zeros(1)})


def test_derive_unet_config_roundtrip():
    model, sd = _tiny_ldm_state_dict()
    cfg = convert.derive_unet_config(sd)
    assert cfg.model_channels == model.unet_cfg.model_channels
    assert tuple(cfg.channel_mult) == tuple(model.unet_cfg.channel_mult)
    assert cfg.context_dim == model.unet_cfg.context_dim
    assert cfg.num_res_blocks == model.unet_cfg.num_res_blocks
    assert tuple(cfg.transformer_depth)[:2] == (1, 1)


def test_full_checkpoint_load_and_generate(tmp_path):
    """safetensors checkpoint → load_model → image identical to the
    directly-constructed model."""
    from sdwebui_tpu.loader.load import load_model
    from sdwebui_tpu.pipeline.params import GenerationParams
    from sdwebui_tpu.pipeline.processing import process_txt2img
    from sdwebui_tpu.utils import devices as dv

    model, sd = _tiny_ldm_state_dict()
    p = str(tmp_path / "tiny.safetensors")
    write_safetensors(p, sd)

    # compare under an fp32 policy: the direct tiny model is fp32, and
    # random-weight nets amplify bf16 rounding chaotically
    old_policy = dv.get_policy()
    dv.set_policy(dv.DtypePolicy(jnp.float32, jnp.float32, jnp.float32, jnp.float32))
    try:
        loaded = load_model(p)
    finally:
        dv.set_policy(old_policy)
    assert loaded.kind == "sd1"

    gp = lambda: GenerationParams(prompt="a cat", seed=5, steps=2,
                                  width=64, height=64)
    img_direct = np.asarray(process_txt2img(model, gp()).images[0])
    img_loaded = np.asarray(process_txt2img(loaded, gp()).images[0])
    assert np.mean(np.abs(img_direct.astype(int) - img_loaded.astype(int))) < 1.0


def test_resolve_vae_chain(tmp_path, monkeypatch):
    """VAE selection: Automatic prefers sibling .vae file, then models/VAE;
    explicit name looked up in models/VAE; "None" forces embedded."""
    import os

    from sdwebui_tpu.loader.load import resolve_vae
    from sdwebui_tpu.utils.options import opts

    monkeypatch.chdir(tmp_path)
    ckpt = tmp_path / "mymodel.safetensors"
    ckpt.write_bytes(b"x")
    vaedir = tmp_path / "models" / "VAE"
    vaedir.mkdir(parents=True)

    assert resolve_vae(str(ckpt)) is None           # nothing to find
    shared = vaedir / "mymodel.vae.safetensors"
    shared.write_bytes(b"x")
    assert resolve_vae(str(ckpt)) == os.path.join('models', 'VAE',
        'mymodel.vae.safetensors')    # models/VAE by basename (relative dir)
    sibling = tmp_path / "mymodel.vae.safetensors"
    sibling.write_bytes(b"x")
    assert resolve_vae(str(ckpt)) == str(sibling)   # sibling wins

    named = vaedir / "special.vae.pt"
    named.write_bytes(b"x")
    opts.set("sd_vae", "special")
    try:
        assert resolve_vae(str(ckpt)) == os.path.join("models", "VAE",
                                                      "special.vae.pt")
        opts.set("sd_vae", "None")
        assert resolve_vae(str(ckpt)) is None
    finally:
        opts.set("sd_vae", "Automatic")


def test_list_hidden_files_option(tmp_path, monkeypatch):
    """opts.list_hidden_files=False hides models under dot-directories
    (reference modules/util.py:48 walk_files)."""
    from sdwebui_tpu.loader.registry import CheckpointRegistry
    from sdwebui_tpu.utils.options import opts

    (tmp_path / "visible").mkdir()
    (tmp_path / ".hidden").mkdir()
    (tmp_path / "visible" / "a.safetensors").write_bytes(b"x")
    (tmp_path / ".hidden" / "b.safetensors").write_bytes(b"x")

    reg = CheckpointRegistry([str(tmp_path)])
    names = set(reg.checkpoints)
    assert any("a.safetensors" in n for n in names)
    assert any("b.safetensors" in n for n in names)  # default: shown

    monkeypatch.setitem(opts.data, "list_hidden_files", False)
    reg.refresh()
    names = set(reg.checkpoints)
    assert any("a.safetensors" in n for n in names)
    assert not any("b.safetensors" in n for n in names)


def test_sd_vae_overrides_per_model_preferences(tmp_path, monkeypatch):
    """With the override option off, a .vae file beside the checkpoint beats
    an explicit sd_vae choice (reference sd_vae.py:162)."""
    from sdwebui_tpu.loader.load import resolve_vae
    from sdwebui_tpu.utils.options import opts

    ckpt = tmp_path / "model.safetensors"
    ckpt.write_bytes(b"x")
    near = tmp_path / "model.vae.safetensors"
    near.write_bytes(b"x")
    vdir = tmp_path / "VAE"
    vdir.mkdir()
    chosen = vdir / "picked.vae.safetensors"
    chosen.write_bytes(b"x")

    monkeypatch.setitem(opts.data, "sd_vae", "picked")
    # default: explicit setting wins
    assert resolve_vae(str(ckpt), vae_dirs=(str(vdir),)) == str(chosen)
    monkeypatch.setitem(opts.data, "sd_vae_overrides_per_model_preferences",
                        False)
    assert resolve_vae(str(ckpt), vae_dirs=(str(vdir),)) == str(near)


def test_sd_checkpoint_cache(tmp_path, monkeypatch):
    """opts.sd_checkpoint_cache: host-RAM state-dict LRU keyed by
    (path, mtime) — repeat loads skip the file read."""
    import numpy as np

    from sdwebui_tpu.loader import load as load_mod
    from sdwebui_tpu.loader.safetensors_io import write_safetensors
    from sdwebui_tpu.utils.options import opts

    p = tmp_path / "m.safetensors"
    write_safetensors(str(p), {"w": np.ones((2,), np.float32)})

    load_mod._SD_CACHE.clear()
    monkeypatch.setitem(opts.data, "sd_checkpoint_cache", 2)
    a = load_mod.read_checkpoint(str(p))
    b = load_mod.read_checkpoint(str(p))
    assert a is b                       # cache hit
    assert len(load_mod._SD_CACHE) == 1

    monkeypatch.setitem(opts.data, "sd_checkpoint_cache", 0)
    c = load_mod.read_checkpoint(str(p))
    assert c is not a                   # cache disabled
    load_mod._SD_CACHE.clear()
