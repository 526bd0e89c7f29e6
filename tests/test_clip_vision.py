"""CLIP vision tower: parity against HF transformers."""

import numpy as np
import jax.numpy as jnp
import pytest

from sdwebui_tpu.models.clip_vision import (CLIPVisionConfig, apply,
                                            convert_clip_vision, preprocess,
                                            rank)


def _hf_tiny():
    import torch
    from transformers import CLIPVisionConfig as HFCfg
    from transformers import CLIPVisionModelWithProjection

    torch.manual_seed(0)
    cfg = HFCfg(hidden_size=64, intermediate_size=128, num_hidden_layers=2,
                num_attention_heads=4, image_size=32, patch_size=8,
                projection_dim=16, hidden_act="quick_gelu")
    return CLIPVisionModelWithProjection(cfg).eval()


def test_parity_with_hf():
    import torch

    m = _hf_tiny()
    sd = {k: v.numpy() for k, v in m.state_dict().items()}
    tree, cfg = convert_clip_vision(sd)
    assert cfg.width == 64 and cfg.layers == 2 and cfg.patch_size == 8
    assert cfg.projection_dim == 16 and cfg.image_size == 32

    px = np.random.default_rng(0).standard_normal((2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        want = m(pixel_values=torch.from_numpy(
            px.transpose(0, 3, 1, 2))).image_embeds.numpy()
    want = want / np.linalg.norm(want, axis=-1, keepdims=True)
    got = np.asarray(apply(tree, cfg, jnp.asarray(px)))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_preprocess_shape_and_range():
    from PIL import Image

    img = Image.new("RGB", (300, 180), (128, 128, 128))
    arr = preprocess(img)
    assert arr.shape == (1, 224, 224, 3)
    # gray 0.5 is within ~1 std of the CLIP mean everywhere
    assert np.abs(arr).max() < 2.0


def test_rank_orders_by_similarity():
    img = jnp.asarray([[1.0, 0.0]])
    txt = jnp.asarray([[0.0, 1.0], [0.8, 0.6], [1.0, 0.0]])
    out = rank(img, txt, top_count=2)
    assert [i for i, _ in out] == [2, 1]
    assert out[0][1] == pytest.approx(100.0)


def test_clip_interrogator_end_to_end(tmp_path, monkeypatch):
    """Full rank-only interrogation from a saved CLIPModel file."""
    import torch
    from transformers import CLIPConfig, CLIPModel

    from sdwebui_tpu.loader.safetensors_io import write_safetensors
    from sdwebui_tpu.postprocessing.interrogate import (ClipInterrogator,
                                                        find_clip_model,
                                                        load_categories)

    torch.manual_seed(0)
    cfg = CLIPConfig(
        text_config=dict(vocab_size=49408, hidden_size=64,
                         intermediate_size=128, num_hidden_layers=2,
                         num_attention_heads=4, max_position_embeddings=77,
                         projection_dim=16, hidden_act="quick_gelu"),
        vision_config=dict(hidden_size=64, intermediate_size=128,
                           num_hidden_layers=2, num_attention_heads=4,
                           image_size=32, patch_size=8, projection_dim=16,
                           hidden_act="quick_gelu"),
        projection_dim=16)
    m = CLIPModel(cfg).eval()
    d = tmp_path / "models" / "clip_vision"
    d.mkdir(parents=True)
    write_safetensors(str(d / "tiny.safetensors"),
                      {k: v.numpy() for k, v in m.state_dict().items()})
    cat = tmp_path / "interrogate"
    cat.mkdir()
    (cat / "mediums.txt").write_text("oil painting\nphotograph\n")
    (cat / "flavors.top2.txt").write_text("red\nblue\ngreen\n")

    monkeypatch.chdir(tmp_path)
    assert find_clip_model() == str(d / "tiny.safetensors").replace(
        str(tmp_path) + "/", "")
    cats = load_categories(str(cat))
    assert [(n, t, len(i)) for n, t, i in cats] == \
        [("flavors", 2, 3), ("mediums", 1, 2)]

    from PIL import Image

    it = ClipInterrogator(str(d / "tiny.safetensors"), str(cat))
    out = it.interrogate(Image.new("RGB", (48, 48), (200, 30, 60)))
    parts = out.split(", ")
    assert len(parts) == 3                     # top2 flavors + top1 medium
    assert parts[2] in ("oil painting", "photograph")
    assert set(parts[:2]) <= {"red", "blue", "green"}
