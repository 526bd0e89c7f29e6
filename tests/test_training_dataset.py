"""Training data pipeline: dataset prep, learn schedules (reference-oracle),
PNG embedding interchange (reference-oracle), directory training e2e."""

import sys
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

sys.path.insert(0, str(Path(__file__).parent))
import reference_oracle as ro  # noqa: E402

from sdwebui_tpu.training.dataset import (  # noqa: E402
    LearnRateScheduler, PersonalizedDataset, create_text, filename_caption,
    load_template,
)


# --------------------------------------------------------------------------
# learn-rate schedule vs the reference's own parser
# --------------------------------------------------------------------------

@pytest.mark.parametrize("spec,max_steps", [
    ("0.005", 100),
    ("0.001:100, 0.00001:1000, 1e-5:10000", 20000),
    ("0.001:100, 0.00001:1000", 500),
    ("0.01:50", 100),
    ("5e-3:-1", 300),
    ("0.1:10,0.01:20,0.001:30", 100),
])
def test_learn_schedule_matches_reference(spec, max_steps):
    ref_mod = ro.load("modules.textual_inversion.learn_schedule")
    ref = ref_mod.LearnRateScheduler(spec, max_steps, verbose=False)
    ours = LearnRateScheduler(spec, max_steps)
    for step in range(0, max_steps, max(max_steps // 200, 1)):
        ref.step(step)
        assert ours.rate_at(step) == pytest.approx(ref.learn_rate), \
            f"step {step}"


def test_learn_schedule_invalid():
    with pytest.raises(ValueError):
        LearnRateScheduler("abc", 100)


# --------------------------------------------------------------------------
# captions + templates
# --------------------------------------------------------------------------

def test_filename_caption(tmp_path):
    p = tmp_path / "00012-a red fox.png"
    Image.new("RGB", (8, 8)).save(p)
    assert filename_caption(str(p)) == "a red fox"
    # sidecar txt wins
    (tmp_path / "00012-a red fox.txt").write_text("a painted fox, forest")
    assert filename_caption(str(p)) == "a painted fox, forest"
    # word regex re-join
    p2 = tmp_path / "3_fox_red.png"
    Image.new("RGB", (8, 8)).save(p2)
    assert filename_caption(str(p2), word_regex=r"[a-z]+",
                            join_string=" ") == "fox red"


def test_create_text():
    out = create_text("a photo of [filewords], by [name]", "fox, forest",
                      "mytok")
    assert out == "a photo of fox, forest, by mytok"
    rng = np.random.default_rng(0)
    dropped = create_text("[filewords]", ",".join(f"t{i}" for i in range(50)),
                          "x", tag_drop_out=0.9, rng=rng)
    assert len(dropped.split(",")) < 25


def test_templates_registry(tmp_path):
    for name in ("none", "subject", "style", "subject_filewords",
                 "style_filewords", "hypernetwork"):
        lines = load_template(name)
        assert lines
    f = tmp_path / "custom.txt"
    f.write_text("a [name] photo\nanother [name]\n")
    assert load_template(str(f)) == ["a [name] photo", "another [name]"]
    with pytest.raises(ValueError):
        load_template("no-such-template")


# --------------------------------------------------------------------------
# PNG embedding interchange vs the reference implementation
# --------------------------------------------------------------------------

def _embedding_dict(vec):
    return {"string_to_token": {"*": 265},
            "string_to_param": {"*": vec},
            "name": "interop-test", "step": 5,
            "sd_checkpoint": None, "sd_checkpoint_name": None}


def test_png_embedding_roundtrip_ours():
    from sdwebui_tpu.training.image_embedding import (
        extract_image_data_embed, insert_image_data_embed)

    vec = np.random.default_rng(0).standard_normal((2, 64)).astype(np.float32)
    card = insert_image_data_embed(Image.new("RGB", (256, 256), (40, 40, 60)),
                                   _embedding_dict(vec))
    out = extract_image_data_embed(card)
    np.testing.assert_allclose(out["string_to_param"]["*"], vec, atol=1e-6)
    assert out["name"] == "interop-test" and out["step"] == 5


def test_png_embedding_ours_to_reference():
    """A card we write must extract with the reference's own reader."""
    import torch

    from sdwebui_tpu.training.image_embedding import insert_image_data_embed

    ref = ro.load("modules.textual_inversion.image_embedding")
    vec = np.random.default_rng(1).standard_normal((1, 32)).astype(np.float32)
    card = insert_image_data_embed(Image.new("RGB", (128, 128), (10, 20, 30)),
                                   _embedding_dict(vec))
    data = ref.extract_image_data_embed(card)
    assert data is not None
    got = data["string_to_param"]["*"]
    got = got.numpy() if isinstance(got, torch.Tensor) else np.asarray(got)
    np.testing.assert_allclose(got, vec, atol=1e-6)


def test_png_embedding_reference_to_ours():
    """A reference-written card must load through our reader and the
    embedding DB file loader."""
    import torch

    from sdwebui_tpu.networks.textual_inversion import load_embedding_file
    from sdwebui_tpu.training.image_embedding import extract_image_data_embed

    ref = ro.load("modules.textual_inversion.image_embedding")
    vec = torch.randn(2, 48)
    card = ref.insert_image_data_embed(
        Image.new("RGB", (128, 128), (5, 5, 5)), _embedding_dict(vec))
    out = extract_image_data_embed(card)
    np.testing.assert_allclose(out["string_to_param"]["*"], vec.numpy(),
                               atol=1e-6)
    # and through the loader (as a file on disk)
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        p = f"{d}/interop-test.png"
        card.save(p)
        emb = load_embedding_file(p)
        np.testing.assert_allclose(emb.vec, vec.numpy(), atol=1e-6)


# --------------------------------------------------------------------------
# dataset + end-to-end directory training (tiny model)
# --------------------------------------------------------------------------

@pytest.fixture(scope="module")
def model():
    from sdwebui_tpu.pipeline.sd_model import create_tiny_sd

    return create_tiny_sd(seed=0)


@pytest.fixture()
def data_dir(tmp_path):
    rng = np.random.default_rng(0)
    for i, name in enumerate(["1-red fox.png", "2-blue bird.png",
                              "3-green frog.png"]):
        arr = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
        Image.fromarray(arr).save(tmp_path / name)
    return tmp_path


def test_personalized_dataset(model, data_dir):
    ds = PersonalizedDataset(str(data_dir), model, width=64, height=64,
                             placeholder="tok", template="subject",
                             flip_p=0.0, seed=1)
    assert len(ds) == 3
    assert all(e.latent.shape == (8, 8, 4) for e in ds.entries)
    captions = {e.filename_text for e in ds.entries}
    assert captions == {"red fox", "blue bird", "green frog"}
    lat, texts, weights = ds.sample_batch(2)
    assert lat.shape == (2, 8, 8, 4) and len(texts) == 2
    assert all("tok" in t for t in texts)
    assert weights is None


def test_personalized_dataset_varsize_buckets(model, tmp_path):
    rng = np.random.default_rng(0)
    Image.fromarray(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)) \
        .save(tmp_path / "a.png")
    Image.fromarray(rng.integers(0, 255, (64, 128, 3), dtype=np.uint8)) \
        .save(tmp_path / "b.png")
    ds = PersonalizedDataset(str(tmp_path), model, varsize=True,
                             flip_p=0.0, seed=1)
    assert set(ds.buckets) == {(64, 64), (128, 64)}
    lat, _, _ = ds.sample_batch(2)   # batch stays within one bucket
    assert lat.shape[0] >= 1
    assert lat.shape[1:3] in ((8, 8), (8, 16))


def test_personalized_dataset_alpha_weights(model, tmp_path):
    arr = np.zeros((64, 64, 4), np.uint8)
    arr[..., :3] = 128
    arr[:32, :, 3] = 255          # top half opaque
    Image.fromarray(arr, "RGBA").save(tmp_path / "w.png")
    ds = PersonalizedDataset(str(tmp_path), model, width=64, height=64,
                             use_weight=True, flip_p=0.0, seed=1)
    w = ds.entries[0].weight
    assert w is not None and w.shape == (8, 8, 4)
    assert w[:4].mean() > w[4:].mean()          # opaque half weighs more
    assert np.isclose(w.mean(), 1.0, atol=1e-5)  # normalized to mean 1


def test_train_embedding_from_dir(model, data_dir, tmp_path):
    from sdwebui_tpu.networks.textual_inversion import load_embedding_file
    from sdwebui_tpu.training.textual_inversion import \
        train_embedding_from_dir

    save = str(tmp_path / "out" / "tok.safetensors")
    import os

    os.makedirs(os.path.dirname(save), exist_ok=True)
    emb, losses = train_embedding_from_dir(
        model, "tok", str(data_dir), n_vectors=2, steps=12,
        learn_rate="0.05:6, 0.005:12", batch_size=2, width=64, height=64,
        template="subject", save_path=save, save_every=6, seed=0)
    assert emb.vec.shape == (2, model.conditioner.cfg.width)
    assert len(losses) == 12
    # the embedding moved and training is numerically sane
    assert np.isfinite(losses).all()
    assert np.abs(emb.vec).max() > 0.01
    # periodic + final saves: safetensors and the PNG card both load
    st = load_embedding_file(save)
    np.testing.assert_allclose(st.vec, emb.vec, atol=1e-6)
    card = load_embedding_file(str(tmp_path / "out" / "tok.png"))
    np.testing.assert_allclose(card.vec, emb.vec, atol=1e-4)


# --------------------------------------------------------------------------
# hypernetwork: structure options + directory training
# --------------------------------------------------------------------------

def test_hypernetwork_structure_options():
    from sdwebui_tpu.networks.hypernetwork import (
        apply_hypernetwork_module, create_hypernetwork, load_hypernetwork,
        save_hypernetwork)

    hn = create_hypernetwork(dims=(64,), layer_structure=(1, 1.5, 1),
                             weight_init="XavierNormal", add_layer_norm=True)
    k_mod, v_mod = hn["64"]
    assert len(k_mod) == 2
    assert k_mod[0]["weight"].shape == (64, 96)
    assert "ln_weight" in k_mod[0]
    x = np.random.default_rng(0).standard_normal((2, 7, 64)).astype(np.float32)
    out = apply_hypernetwork_module(k_mod, x, activation="swish")
    assert out.shape == x.shape
    assert not np.allclose(np.asarray(out), x)

    # layer-norm params survive a save/load roundtrip
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        save_hypernetwork(hn, f"{d}/hn.safetensors",
                          layer_structure=(1, 1.5, 1), activation="swish")
        loaded, activation = load_hypernetwork(f"{d}/hn.safetensors")
        assert activation == "swish"
        np.testing.assert_allclose(loaded["64"][0][0]["ln_weight"],
                                   k_mod[0]["ln_weight"])


@pytest.mark.parametrize("init", ["Normal", "KaimingUniform", "KaimingNormal",
                                  "XavierUniform", "XavierNormal"])
def test_hypernetwork_weight_inits(init):
    from sdwebui_tpu.networks.hypernetwork import init_module

    mod = init_module(64, (1, 2, 1), weight_init=init)
    w = mod[0]["weight"]
    assert w.shape == (64, 128) and np.abs(w).max() > 0


def test_train_hypernetwork_from_dir(model, data_dir, tmp_path):
    from sdwebui_tpu.networks.hypernetwork import load_hypernetwork
    from sdwebui_tpu.training.hypernetwork import train_hypernetwork_from_dir

    save = str(tmp_path / "hn.safetensors")
    hn, losses = train_hypernetwork_from_dir(
        model, "hn", str(data_dir), layer_structure=(1, 2, 1),
        activation="relu", steps=6, learn_rate="0.001:3, 0.0001:6",
        batch_size=2, width=64, height=64, save_path=save, seed=0)
    assert len(losses) == 6 and np.isfinite(losses).all()
    loaded, activation = load_hypernetwork(save)
    assert activation == "relu"
    assert str(model.unet_cfg.context_dim) in loaded


def test_train_embedding_preview_images(model, data_dir, tmp_path):
    """preview_every (reference create_image_every) samples with the
    in-training embedding and saves PNGs under <save dir>/images/."""
    import os

    from sdwebui_tpu.training.textual_inversion import \
        train_embedding_from_dir

    save = str(tmp_path / "out" / "tok.safetensors")
    os.makedirs(os.path.dirname(save), exist_ok=True)
    train_embedding_from_dir(
        model, "tok", str(data_dir), n_vectors=1, steps=4,
        learn_rate="0.05", batch_size=1, width=64, height=64,
        template="subject", save_path=save, seed=0,
        preview_every=2, preview_steps=2, preview_size=(64, 64))
    imgs = sorted(os.listdir(tmp_path / "out" / "images"))
    assert imgs == ["tok-2.png", "tok-4.png"], imgs


def test_train_hypernetwork_preview_images(model, data_dir, tmp_path):
    """Hypernetwork preview_every samples with the live net via
    hypernet_override (reference create_image_every)."""
    import os

    from sdwebui_tpu.training.hypernetwork import train_hypernetwork_from_dir

    save = str(tmp_path / "hn" / "net.safetensors")
    os.makedirs(os.path.dirname(save), exist_ok=True)
    train_hypernetwork_from_dir(
        model, "net", str(data_dir), steps=2, learn_rate="0.0001",
        batch_size=1, width=64, height=64, template="hypernetwork",
        save_path=save, seed=0, preview_every=2, preview_steps=2,
        preview_size=(64, 64))
    assert sorted(os.listdir(tmp_path / "hn" / "images")) == ["net-2.png"]


def test_training_persistence_options(model, data_dir, tmp_path, monkeypatch):
    """save_training_settings_to_txt, training_write_csv_every, and
    save_optimizer_state artifacts (reference textual_inversion.py:325/467,
    save_optimizer_state)."""
    import os

    from sdwebui_tpu.training.textual_inversion import (
        load_optim_state, make_ti_train_step, train_embedding_from_dir)
    from sdwebui_tpu.utils.options import opts

    monkeypatch.setitem(opts.data, "save_optimizer_state", True)
    monkeypatch.setitem(opts.data, "training_write_csv_every", 2)
    save = str(tmp_path / "t" / "tok.safetensors")
    os.makedirs(os.path.dirname(save), exist_ok=True)
    emb, _ = train_embedding_from_dir(
        model, "tok", str(data_dir), n_vectors=1, steps=4,
        learn_rate="0.05", batch_size=1, width=64, height=64,
        template="subject", save_path=save, save_every=2, seed=0)
    assert os.path.exists(str(tmp_path / "t" / "tok_settings.txt"))
    csv_path = str(tmp_path / "t" / "tok_loss.csv")
    assert os.path.exists(csv_path)
    lines = open(csv_path).read().strip().splitlines()
    assert lines[0] == "step,loss,learn_rate"
    assert len(lines) == 3  # steps 2 and 4
    assert os.path.exists(save + ".optim")

    # optim state round-trips into a fresh optimizer state
    import jax.numpy as jnp
    import numpy as np

    step_fn, init_fn = make_ti_train_step(model, n_vectors=1, lr=0.05)
    fresh = init_fn(jnp.asarray(np.asarray(emb.vec, np.float32)))
    restored = load_optim_state(fresh, save)
    import jax

    l_fresh = jax.tree_util.tree_leaves(fresh.inner_state)
    l_rest = jax.tree_util.tree_leaves(restored.inner_state)
    assert any(not np.allclose(a, b) for a, b in zip(l_fresh, l_rest))


def test_preprocess_dir(tmp_path):
    """Training preprocessing pass (reference postprocessing-for-training):
    split-oversized strips, flips, autosized crop, caption passthrough."""
    from PIL import Image

    from sdwebui_tpu.training.preprocess import (autosized_crop,
                                                 preprocess_dir,
                                                 split_oversized)

    src = tmp_path / "src"
    dst = tmp_path / "dst"
    src.mkdir()
    Image.new("RGB", (64, 256), (200, 30, 30)).save(src / "tall.png")
    Image.new("RGB", (96, 96), (30, 200, 30)).save(src / "square.png")
    (src / "square.txt").write_text("a green square")

    import os

    written = preprocess_dir(str(src), str(dst), width=64, height=64,
                             split=True, flip=True,
                             existing_caption_action="copy")
    # tall image splits into >=2 strips, each flipped; square → 2 (flip)
    names = sorted(os.path.basename(w) for w in written)
    assert sum(n.startswith("tall") for n in names) >= 4
    assert sum(n.startswith("square") for n in names) == 2
    # caption copied alongside outputs
    assert (dst / "square-0.txt").exists() or (dst / "square.txt").exists()

    # split geometry: strips match the target size
    strips = split_oversized(Image.new("RGB", (64, 256)), 64, 64)
    assert len(strips) >= 2 and all(s.size == (64, 64) for s in strips)

    # autosized crop picks a 64-multiple size within bounds
    out = autosized_crop(Image.new("RGB", (300, 200)), mindim=64, maxdim=192,
                         minarea=64 * 64, maxarea=192 * 192, threshold=0.5)
    assert out is not None
    assert out.width % 64 == 0 and out.height % 64 == 0
