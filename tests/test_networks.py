"""Extra-network tests: LoRA algebras vs hand-computed deltas, TI loading,
<lora:...> tag parsing, end-to-end activation."""

import numpy as np
import jax.numpy as jnp
import pytest

from sdwebui_tpu.networks import extra_networks, lora
from sdwebui_tpu.networks.textual_inversion import (
    Embedding, EmbeddingDatabase, load_embedding_file,
)
from sdwebui_tpu.utils.pytree import flatten

RNG = np.random.default_rng(0)


def make_params():
    """Mini tree with one linear and one conv, jax layouts."""
    return {
        "input_blocks": {"1": {"1": {"transformer_blocks": {"0": {"attn1": {
            "to_q": {"weight": jnp.zeros((8, 8), jnp.float32)},
        }}}}}},
        "out": {"2": {"weight": jnp.zeros((3, 3, 4, 6), jnp.float32),
                      "bias": jnp.zeros((6,), jnp.float32)}},
    }


def test_path_lookup_and_resolution():
    params = make_params()
    lookup = lora.build_path_lookup(params)
    assert lora.resolve_module(
        "input_blocks_1_1_transformer_blocks_0_attn1_to_q", lookup) == \
        "input_blocks.1.1.transformer_blocks.0.attn1.to_q"
    # diffusers-style name for the same module
    assert lora.resolve_module(
        "down_blocks_0_attentions_0_transformer_blocks_0_attn1_to_q", lookup) == \
        "input_blocks.1.1.transformer_blocks.0.attn1.to_q"
    assert lora.resolve_module("nonexistent_module", lookup) is None


def test_lora_linear_delta():
    params = make_params()
    up = RNG.standard_normal((8, 4)).astype(np.float32)    # (out, rank)
    down = RNG.standard_normal((4, 8)).astype(np.float32)  # (rank, in)
    sd = {
        "lora_unet_input_blocks_1_1_transformer_blocks_0_attn1_to_q.lora_up.weight": up,
        "lora_unet_input_blocks_1_1_transformer_blocks_0_attn1_to_q.lora_down.weight": down,
        "lora_unet_input_blocks_1_1_transformer_blocks_0_attn1_to_q.alpha": np.float32(2.0),
    }
    new, n, unmatched = lora.apply_loras(params, [(sd, 0.5)])
    assert n == 1 and not unmatched
    expected = (up @ down) * (2.0 / 4) * 0.5   # torch layout (out, in)
    got = np.asarray(flatten(new)["input_blocks.1.1.transformer_blocks.0.attn1.to_q.weight"])
    np.testing.assert_allclose(got, expected.T, atol=1e-5)  # jax (in, out)


def test_lora_conv_delta():
    params = make_params()
    down = RNG.standard_normal((2, 4, 3, 3)).astype(np.float32)  # (r, I, k, k)
    up = RNG.standard_normal((6, 2, 1, 1)).astype(np.float32)    # (O, r, 1, 1)
    sd = {"lora_unet_out_2.lora_up.weight": up,
          "lora_unet_out_2.lora_down.weight": down}
    new, n, _ = lora.apply_loras(params, [(sd, 1.0)])
    assert n == 1
    expected = np.einsum("or,rikl->oikl", up.reshape(6, 2), down)  # alpha=rank
    got = np.asarray(flatten(new)["out.2.weight"])
    np.testing.assert_allclose(got, np.transpose(expected, (2, 3, 1, 0)), atol=1e-5)


def test_hada_delta():
    params = make_params()
    mod = "lora_unet_input_blocks_1_1_transformer_blocks_0_attn1_to_q"
    w1a = RNG.standard_normal((8, 2)).astype(np.float32)
    w1b = RNG.standard_normal((2, 8)).astype(np.float32)
    w2a = RNG.standard_normal((8, 2)).astype(np.float32)
    w2b = RNG.standard_normal((2, 8)).astype(np.float32)
    sd = {f"{mod}.hada_w1_a": w1a, f"{mod}.hada_w1_b": w1b,
          f"{mod}.hada_w2_a": w2a, f"{mod}.hada_w2_b": w2b,
          f"{mod}.alpha": np.float32(2.0)}
    new, n, _ = lora.apply_loras(params, [(sd, 1.0)])
    assert n == 1
    expected = (w1a @ w1b) * (w2a @ w2b) * (2.0 / 2)
    got = np.asarray(flatten(new)["input_blocks.1.1.transformer_blocks.0.attn1.to_q.weight"])
    np.testing.assert_allclose(got, expected.T, atol=1e-5)


def test_full_and_ia3():
    params = make_params()
    mod = "lora_unet_input_blocks_1_1_transformer_blocks_0_attn1_to_q"
    diff = RNG.standard_normal((8, 8)).astype(np.float32)
    new, n, _ = lora.apply_loras(params, [({f"{mod}.diff": diff}, 0.5)])
    got = np.asarray(flatten(new)["input_blocks.1.1.transformer_blocks.0.attn1.to_q.weight"])
    np.testing.assert_allclose(got, diff.T * 0.5, atol=1e-6)

    base = {"m": {"weight": jnp.ones((4, 6), jnp.float32)}}
    v = np.asarray([2, 2, 2, 2, 2, 2], np.float32)
    new2, n2, _ = lora.apply_loras(
        base, [({"lora_unet_m.w": v, "lora_unet_m.on_input": np.asarray(0)}, 1.0)])
    np.testing.assert_allclose(np.asarray(new2["m"]["weight"]), 2.0, atol=1e-6)


def test_lokr_delta():
    base = {"m": {"weight": jnp.zeros((4, 6), jnp.float32)}}  # jax (in=4,out=6)
    # torch shape (out=6, in=4); kron((2,2),(3,2)) = (6,4)
    w1 = RNG.standard_normal((2, 2)).astype(np.float32)
    w2 = RNG.standard_normal((3, 2)).astype(np.float32)
    sd = {"lora_unet_m.lokr_w1": w1, "lora_unet_m.lokr_w2": w2}
    new, n, _ = lora.apply_loras(base, [(sd, 1.0)])
    assert n == 1
    np.testing.assert_allclose(np.asarray(new["m"]["weight"]),
                               np.kron(w1, w2).T, atol=1e-5)


def test_multiple_loras_stack():
    base = {"m": {"weight": jnp.zeros((4, 4), jnp.float32)}}
    d1 = np.eye(4, dtype=np.float32)
    d2 = 2 * np.eye(4, dtype=np.float32)
    new, n, _ = lora.apply_loras(
        base, [({"lora_unet_m.diff": d1}, 1.0), ({"lora_unet_m.diff": d2}, 0.5)])
    np.testing.assert_allclose(np.asarray(new["m"]["weight"]),
                               np.eye(4) * 2.0, atol=1e-6)


# --------------------------------------------------------------------------
# tag parsing
# --------------------------------------------------------------------------

def test_parse_prompt_tags():
    clean, nets = extra_networks.parse_prompt(
        "a cat <lora:style:0.8> walking <hypernet:hn:0.5:extra>")
    assert clean == "a cat  walking "
    assert [(n.kind, n.name) for n in nets] == [("lora", "style"), ("hypernet", "hn")]
    assert nets[0].mult() == 0.8
    assert nets[1].mult(2, 1.0) == 1.0  # 'extra' unparseable → default


def test_parse_prompt_no_tags():
    clean, nets = extra_networks.parse_prompt("plain prompt")
    assert clean == "plain prompt" and nets == []


def test_lora_te_unet_multipliers():
    n = extra_networks.ExtraNetworkParams("lora", ["name", "0.3", "0.9"])
    assert n.mult(1) == 0.3 and n.mult(2, n.mult(1)) == 0.9
    n2 = extra_networks.ExtraNetworkParams("lora", ["name", "0.3"])
    assert n2.mult(2, n2.mult(1)) == 0.3


# --------------------------------------------------------------------------
# textual inversion
# --------------------------------------------------------------------------

def test_embedding_safetensors_roundtrip(tmp_path):
    from sdwebui_tpu.loader.safetensors_io import write_safetensors

    vec = RNG.standard_normal((3, 64)).astype(np.float32)
    p = str(tmp_path / "myembed.safetensors")
    write_safetensors(p, {"emb_params": vec})
    emb = load_embedding_file(p)
    assert emb.name == "myembed" and emb.vectors == 3
    np.testing.assert_array_equal(emb.vec, vec)


def test_embedding_pt_roundtrip(tmp_path):
    import torch

    vec = torch.randn(2, 64)
    p = str(tmp_path / "other.pt")
    torch.save({"emb_params": vec}, p)
    emb = load_embedding_file(p)
    assert emb.vectors == 2


def test_embedding_db_trigger_matching(tmp_path):
    from sdwebui_tpu.text.tokenizer import FallbackTokenizer

    tok = FallbackTokenizer()
    db = EmbeddingDatabase(tok)
    db.register(Embedding("trigger", np.ones((2, 64), np.float32)))
    db.register(Embedding("triggerlong", np.ones((1, 64), np.float32)))

    ids = tok.encode("a triggerlong b")
    pos = len(tok.encode("a "))
    emb, consumed = db.find_at(ids, pos)
    assert emb.name == "triggerlong"  # longest match wins
    assert consumed == len(tok.encode("triggerlong"))

    ids2 = tok.encode("plain words")
    assert db.find_at(ids2, 0) == (None, 0)


def test_embedding_changes_generation(tmp_path):
    """End to end: a registered embedding alters the output image."""
    from sdwebui_tpu.pipeline.params import GenerationParams
    from sdwebui_tpu.pipeline.processing import process_txt2img
    from sdwebui_tpu.pipeline.sd_model import create_tiny_sd

    model = create_tiny_sd()
    db = EmbeddingDatabase(model.conditioner.tokenizer)
    db.register(Embedding("mytoken", RNG.standard_normal((2, 64)).astype(np.float32)))
    gp = lambda: GenerationParams(prompt="a mytoken photo", seed=3, steps=2,
                                  width=64, height=64)
    base = process_txt2img(model, gp())
    model.conditioner.embedding_db = db
    with_emb = process_txt2img(model, gp())
    assert not np.array_equal(np.asarray(base.images[0]),
                              np.asarray(with_emb.images[0]))


def test_lora_changes_generation(tmp_path, monkeypatch):
    """End to end: <lora:x:1> tag loads a file and alters the output."""
    from sdwebui_tpu.loader.safetensors_io import write_safetensors
    from sdwebui_tpu.pipeline.params import GenerationParams
    from sdwebui_tpu.pipeline.processing import process_txt2img
    from sdwebui_tpu.pipeline.sd_model import create_tiny_sd

    model = create_tiny_sd()
    # build a rank-2 lora for one attention projection of the tiny unet
    target = "lora_unet_input_blocks_1_1_transformer_blocks_0_attn1_to_q"
    w = np.asarray(flatten(model.unet_params)[
        "input_blocks.1.1.transformer_blocks.0.attn1.to_q.weight"])
    cin, cout = w.shape
    sd = {f"{target}.lora_up.weight": RNG.standard_normal((cout, 2)).astype(np.float32) * 5,
          f"{target}.lora_down.weight": RNG.standard_normal((2, cin)).astype(np.float32) * 5}
    lora_dir = tmp_path / "Lora"
    lora_dir.mkdir()
    write_safetensors(str(lora_dir / "testlora.safetensors"), sd)

    reg = extra_networks.LoraRegistry(dirs=[str(lora_dir)])
    monkeypatch.setattr(extra_networks, "_default_registry", reg)
    extra_networks._merge_cache.clear()

    # compare at the activation level (decoded images of a random-weight net
    # can saturate to black and hide differences)
    clean, merged, _hn = extra_networks.activate(model, "a photo <lora:testlora:1.0>")
    assert clean == "a photo "
    assert merged is not model
    w_base = np.asarray(flatten(model.unet_params)[
        "input_blocks.1.1.transformer_blocks.0.attn1.to_q.weight"])
    w_merged = np.asarray(flatten(merged.unet_params)[
        "input_blocks.1.1.transformer_blocks.0.attn1.to_q.weight"])
    assert not np.allclose(w_base, w_merged)
    # cache hit returns the same object
    _, merged2, _ = extra_networks.activate(model, "a photo <lora:testlora:1.0>")
    assert merged2 is merged
    # and the merged model still generates end-to-end
    res = process_txt2img(merged, GenerationParams(prompt="a photo", seed=3,
                                                   steps=2, width=64, height=64))
    assert len(res.images) == 1


def test_glora_delta():
    base_w = RNG.standard_normal((6, 4)).astype(np.float32)  # torch (out,in)
    base = {"m": {"weight": jnp.asarray(base_w.T)}}          # jax (in,out)
    a1 = RNG.standard_normal((2, 4)).astype(np.float32)
    a2 = RNG.standard_normal((4, 2)).astype(np.float32)
    b1 = RNG.standard_normal((2, 4)).astype(np.float32)
    b2 = RNG.standard_normal((6, 2)).astype(np.float32)
    sd = {"lora_unet_m.a1.weight": a1, "lora_unet_m.a2.weight": a2,
          "lora_unet_m.b1.weight": b1, "lora_unet_m.b2.weight": b2,
          "lora_unet_m.alpha": np.float32(2.0)}
    new, n, _ = lora.apply_loras(base, [(sd, 0.5)])
    assert n == 1
    expected = base_w + ((b2 @ b1) + (base_w @ a2) @ a1) * 0.5
    np.testing.assert_allclose(np.asarray(new["m"]["weight"]), expected.T,
                               rtol=1e-4, atol=1e-5)


def test_oft_identity_at_zero_blocks():
    base_w = RNG.standard_normal((8, 4)).astype(np.float32)
    base = {"m": {"weight": jnp.asarray(base_w.T)}}
    sd = {"lora_unet_m.oft_blocks": np.zeros((2, 4, 4), np.float32)}
    new, n, _ = lora.apply_loras(base, [(sd, 1.0)])
    assert n == 1
    np.testing.assert_allclose(np.asarray(new["m"]["weight"]), base_w.T, atol=1e-5)


def test_oft_rotation_preserves_row_norms():
    base_w = RNG.standard_normal((8, 4)).astype(np.float32)
    base = {"m": {"weight": jnp.asarray(base_w.T)}}
    blocks = RNG.standard_normal((2, 4, 4)).astype(np.float32) * 0.3
    sd = {"lora_unet_m.oft_blocks": blocks}
    new, n, _ = lora.apply_loras(base, [(sd, 1.0)])
    w_new = np.asarray(new["m"]["weight"]).T  # torch layout (8,4)
    # Cayley rotations are orthogonal: per-block output norms preserved
    for k in range(2):
        blk_old = base_w[k * 4:(k + 1) * 4]
        blk_new = w_new[k * 4:(k + 1) * 4]
        np.testing.assert_allclose(np.linalg.norm(blk_new),
                                   np.linalg.norm(blk_old), rtol=1e-4)


def test_sdxl_te2_lora_applies(tmp_path, monkeypatch):
    """lora_te2_ weights reach the SDXL second text encoder."""
    from sdwebui_tpu.loader.safetensors_io import write_safetensors
    from sdwebui_tpu.pipeline.sd_model import create_tiny_sdxl

    model = create_tiny_sdxl()
    w = flatten(model.conditioner2.params)["encoder.layers.0.self_attn.q_proj.weight"]
    cin, cout = np.asarray(w).shape
    sd = {"lora_unet_placeholder.diff": np.zeros((1, 1), np.float32),
          "lora_te2_text_model_encoder_layers_0_self_attn_q_proj.diff":
              np.full((cout, cin), 0.5, np.float32)}
    d = tmp_path / "Lora"; d.mkdir()
    write_safetensors(str(d / "te2lora.safetensors"), sd)
    reg = extra_networks.LoraRegistry(dirs=[str(d)])
    monkeypatch.setattr(extra_networks, "_default_registry", reg)
    extra_networks._merge_cache.clear()
    _, merged, _ = extra_networks.activate(model, "x <lora:te2lora:1.0>")
    w2 = flatten(merged.conditioner2.params)["encoder.layers.0.self_attn.q_proj.weight"]
    np.testing.assert_allclose(np.asarray(w2) - np.asarray(w), 0.5, atol=1e-6)


def test_dora_linear():
    """DoRA: merged weight rows renormalized to the learned magnitudes
    before the base weight is subtracted back out."""
    params = make_params()
    from sdwebui_tpu.utils.pytree import unflatten as _unflatten

    flat0 = dict(flatten(params))
    flat0["input_blocks.1.1.transformer_blocks.0.attn1.to_q.weight"] = \
        jnp.asarray(RNG.standard_normal((8, 8)).astype(np.float32))
    params = _unflatten(flat0)
    key = "lora_unet_input_blocks_1_1_transformer_blocks_0_attn1_to_q"
    up = RNG.standard_normal((8, 4)).astype(np.float32)
    down = RNG.standard_normal((4, 8)).astype(np.float32)
    w0 = np.asarray(flatten(params)[
        "input_blocks.1.1.transformer_blocks.0.attn1.to_q.weight"]).T  # torch
    dora = np.linalg.norm(w0, axis=1, keepdims=True) * 1.1
    sd = {f"{key}.lora_up.weight": up, f"{key}.lora_down.weight": down,
          f"{key}.alpha": np.float32(2.0), f"{key}.dora_scale": dora}
    new, n, unmatched = lora.apply_loras(params, [(sd, 1.0)])
    assert n == 1 and not unmatched

    delta = (up @ down) * (2.0 / 4)
    merged = w0 + delta
    expected = merged / np.linalg.norm(merged, axis=1, keepdims=True) * dora
    got = np.asarray(flatten(new)[
        "input_blocks.1.1.transformer_blocks.0.attn1.to_q.weight"])
    np.testing.assert_allclose(got, expected.T, atol=1e-5)

    # multiplier interpolates the decomposed delta
    half, _, _ = lora.apply_loras(params, [(sd, 0.5)])
    got_half = np.asarray(flatten(half)[
        "input_blocks.1.1.transformer_blocks.0.attn1.to_q.weight"])
    np.testing.assert_allclose(got_half, (w0 + 0.5 * (expected - w0)).T,
                               atol=1e-5)


def test_bundled_embedding_registration(tmp_path, monkeypatch):
    """kohya bundle_emb.* keys register trigger-word embeddings on LoRA
    activation."""
    from sdwebui_tpu.loader.safetensors_io import write_safetensors
    from sdwebui_tpu.pipeline.sd_model import create_tiny_sd

    model = create_tiny_sd()
    from sdwebui_tpu.networks.textual_inversion import EmbeddingDatabase

    model.conditioner.embedding_db = EmbeddingDatabase(
        model.conditioner.tokenizer)

    dim = model.conditioner.params["embeddings"]["token_embedding"]["weight"].shape[1]
    wq = model.unet_params["input_blocks"]["1"]["1"]["transformer_blocks"]["0"]["attn1"]["to_q"]["weight"]
    out_f, in_f = wq.shape[1], wq.shape[0]
    up = RNG.standard_normal((out_f, 2)).astype(np.float32)
    down = RNG.standard_normal((2, in_f)).astype(np.float32)
    sd = {
        "lora_unet_input_blocks_1_1_transformer_blocks_0_attn1_to_q.lora_up.weight": up,
        "lora_unet_input_blocks_1_1_transformer_blocks_0_attn1_to_q.lora_down.weight": down,
        "bundle_emb.mytrigger.emb_params":
            RNG.standard_normal((2, dim)).astype(np.float32),
    }
    d = tmp_path / "loras"
    d.mkdir()
    write_safetensors(str(d / "bundled.safetensors"), sd)
    reg = extra_networks.LoraRegistry(dirs=[str(d)])
    monkeypatch.setattr(extra_networks, "_default_registry", reg)

    clean, merged, _ = extra_networks.activate(model, "x <lora:bundled:1.0>")
    assert "mytrigger" in model.conditioner.embedding_db.embeddings
    assert model.conditioner.embedding_db.embeddings["mytrigger"].vectors == 2
    # bundle keys must not count as unmatched lora modules
    c1 = model.encode_texts(["a mytrigger photo"])
    c2 = model.encode_texts(["a photo"])
    assert not np.allclose(np.asarray(c1), np.asarray(c2))


def test_embedding_dim_mismatch_skipped():
    """Wrong-family embeddings are skipped by name, not crash later."""
    from sdwebui_tpu.networks.textual_inversion import (Embedding,
                                                        EmbeddingDatabase)

    db = EmbeddingDatabase(expected_dim=64)
    db.register(Embedding("good", np.zeros((2, 64), np.float32)))
    db.register(Embedding("bad", np.zeros((2, 1280), np.float32)))
    assert "good" in db.embeddings and "bad" not in db.embeddings
    assert any("bad" in s for s in db.skipped)


def test_sd_hypernetwork_global_option(tmp_path, monkeypatch):
    """opts.sd_hypernetwork applies a hypernetwork without a prompt tag
    (reference 'Add hypernetwork to prompt' option)."""
    import numpy as np

    from sdwebui_tpu.networks import extra_networks as en
    from sdwebui_tpu.networks.hypernetwork import (create_hypernetwork,
                                                   save_hypernetwork)
    from sdwebui_tpu.pipeline.sd_model import create_tiny_sd
    from sdwebui_tpu.utils.options import opts

    model = create_tiny_sd()
    dim = model.unet_cfg.context_dim
    hn = create_hypernetwork(dims=(dim,), seed=0)
    path = tmp_path / "globalnet.safetensors"
    save_hypernetwork(hn, str(path), name="globalnet")

    reg = en.hypernet_registry()
    monkeypatch.setitem(reg.files, "globalnet", str(path))
    monkeypatch.setitem(opts.data, "sd_hypernetwork", "globalnet")

    clean, _m, hypernet = en.activate(model, "a cat")
    assert clean == "a cat"
    assert hypernet is not None
    tree, (activation, mult, _ao) = hypernet
    assert mult == 1.0

    monkeypatch.setitem(opts.data, "sd_hypernetwork", "None")
    _c, _m2, hypernet2 = en.activate(model, "a cat")
    assert hypernet2 is None


def test_lora_metadata_surfaced(tmp_path, monkeypatch):
    """/sdapi/v1/loras carries safetensors __metadata__ (kohya ss_* fields)
    like the reference's NetworkOnDisk."""
    import numpy as np

    from sdwebui_tpu.loader.safetensors_io import (read_metadata,
                                                   write_safetensors)

    path = tmp_path / "mylora.safetensors"
    write_safetensors(str(path), {"w": np.zeros((2, 2), np.float32)},
                      metadata={"ss_output_name": "My LoRA",
                                "ss_network_dim": "16"})
    meta = read_metadata(str(path))
    assert meta == {"ss_output_name": "My LoRA", "ss_network_dim": "16"}
