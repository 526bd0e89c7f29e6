"""Training loops (TI + hypernetwork) + hypernetwork runtime tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from sdwebui_tpu.networks.hypernetwork import (
    apply_hypernetwork_module, create_hypernetwork, load_hypernetwork,
    save_hypernetwork,
)
from sdwebui_tpu.pipeline.sd_model import create_tiny_sd
from sdwebui_tpu.training.hypernetwork import train_hypernetwork
from sdwebui_tpu.training.textual_inversion import prepare_tokens, train_embedding


@pytest.fixture(scope="module")
def model():
    return create_tiny_sd()


def test_hypernetwork_module_identity_at_zero():
    layers = [{"weight": np.zeros((8, 16), np.float32), "bias": np.zeros(16, np.float32)},
              {"weight": np.zeros((16, 8), np.float32), "bias": np.zeros(8, np.float32)}]
    x = jnp.ones((2, 5, 8))
    out = apply_hypernetwork_module(layers, x, "relu", 1.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x))


def test_hypernetwork_save_load_roundtrip(tmp_path):
    hn = create_hypernetwork(dims=(64,), layer_structure=(1, 2, 1), seed=3)
    p = str(tmp_path / "hn.safetensors")
    save_hypernetwork(hn, p, name="test")
    loaded, activation = load_hypernetwork(p)
    assert activation == "linear"
    assert "64" in loaded
    np.testing.assert_allclose(loaded["64"][0][0]["weight"],
                               np.asarray(hn["64"][0][0]["weight"]))
    np.testing.assert_allclose(loaded["64"][1][1]["bias"],
                               np.asarray(hn["64"][1][1]["bias"]))


def test_hypernet_changes_unet_output(model):
    from sdwebui_tpu.models import unet as unet_model

    hn = create_hypernetwork(dims=(64,), seed=1)
    # inflate weights so the effect is visible
    hn = {k: ([{kk: vv * 50 for kk, vv in l.items()} for l in mods[0]],
              [{kk: vv * 50 for kk, vv in l.items()} for l in mods[1]])
          for k, mods in hn.items()}
    x = jnp.ones((1, 16, 16, 4))
    t = jnp.array([5.0])
    ctx = jnp.ones((1, 77, 64))
    import jax

    hn = jax.tree_util.tree_map(jnp.asarray, hn)
    base = unet_model.apply(model.unet_params, model.unet_cfg, x, t, ctx)
    with_hn = unet_model.apply(model.unet_params, model.unet_cfg, x, t, ctx,
                               hypernet=(hn, ("linear", 1.0, False)))
    assert not np.allclose(np.asarray(base), np.asarray(with_hn))


def test_prepare_tokens():
    from sdwebui_tpu.text.tokenizer import BOS, EOS, FallbackTokenizer

    tok = FallbackTokenizer()
    ids, pos = prepare_tokens(tok, "a photo of {}", 2)
    assert len(ids) == 77
    assert ids[0] == BOS and ids[-1] == EOS
    assert ids[pos] == 0 and ids[pos + 1] == 0  # placeholder slots


def test_ti_training_descends_on_fixed_batch(model):
    """Deterministic objective (fixed latents/noise/t) must descend."""
    from sdwebui_tpu.training.textual_inversion import make_ti_train_step, prepare_tokens

    rng = np.random.default_rng(0)
    tokens, pos = prepare_tokens(model.conditioner.tokenizer, "a photo of {}", 2)
    step_fn, init_fn = make_ti_train_step(model, tokens, pos, 2, lr=5e-3)
    emb = jnp.asarray(rng.standard_normal((2, 64)) * 0.01, jnp.float32)
    opt_state = init_fn(emb)
    latents = jnp.asarray(rng.standard_normal((2, 8, 8, 4)) * 0.2, jnp.float32)
    noise = jnp.asarray(rng.standard_normal((2, 8, 8, 4)), jnp.float32)
    t = jnp.asarray([100, 500], jnp.int32)
    losses = []
    for _ in range(25):
        emb, opt_state, loss = step_fn(emb, opt_state, latents, noise, t)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    assert all(np.isfinite(losses))


def test_ti_training_saves_and_reloads(model, tmp_path):
    rng = np.random.default_rng(0)
    latents = rng.standard_normal((4, 8, 8, 4)).astype(np.float32) * 0.2
    save = str(tmp_path / "learned.safetensors")
    emb, losses = train_embedding(model, "learned", latents, n_vectors=2,
                                  steps=8, lr=1e-2, batch_size=2,
                                  save_path=save)
    assert emb.vectors == 2 and all(np.isfinite(losses))
    from sdwebui_tpu.networks.textual_inversion import load_embedding_file

    loaded = load_embedding_file(save)
    np.testing.assert_allclose(loaded.vec, emb.vec, rtol=1e-6)


def test_ti_training_callback_interrupt(model):
    latents = np.zeros((2, 8, 8, 4), np.float32)
    calls = []
    emb, losses = train_embedding(model, "x", latents, steps=50,
                                  callback=lambda i, l: calls.append(i) or i < 3)
    assert len(losses) == 4  # steps 0..3; callback at i=3 returned False


def test_hypernetwork_training_runs(model, tmp_path):
    rng = np.random.default_rng(0)
    latents = rng.standard_normal((4, 8, 8, 4)).astype(np.float32) * 0.2
    conds = rng.standard_normal((4, 77, 64)).astype(np.float32)
    save = str(tmp_path / "hn.safetensors")
    hn, losses = train_hypernetwork(model, "hn", latents, conds, steps=10,
                                    batch_size=2, save_path=save)
    assert len(losses) == 10 and all(np.isfinite(losses))
    loaded, _ = load_hypernetwork(save)
    assert str(model.unet_cfg.context_dim) in loaded


def test_parse_dropout_structure_reference_rule():
    """Exact per-layer probabilities from the create-UI booleans
    (reference hypernetwork.py:129-141 incl. the documented examples)."""
    from sdwebui_tpu.networks.hypernetwork import parse_dropout_structure

    assert parse_dropout_structure((1, 2, 1), False, True) == [0, 0, 0]
    assert parse_dropout_structure((1, 2, 1), True, False) == [0, 0, 0]
    assert parse_dropout_structure((1, 2, 1), True, True) == [0, 0.3, 0]
    assert parse_dropout_structure((1, 2, 2, 1), True, True) == \
        [0, 0.3, 0.3, 0]
    assert parse_dropout_structure((1, 2, 2, 1), True, False) == \
        [0, 0.3, 0, 0]
    assert parse_dropout_structure(None, True, True) == [0, 0.3, 0]


def test_hypernetwork_dropout_training(model):
    """use_dropout regularizes the training forward only: losses differ
    from the no-dropout run on identical data, stay finite, and the mask
    varies per step (loss variance strictly positive even at lr→0)."""
    rng = np.random.default_rng(1)
    latents = rng.standard_normal((4, 8, 8, 4)).astype(np.float32) * 0.2
    conds = rng.standard_normal((4, 77, 64)).astype(np.float32)

    common = dict(dims=None, layer_structure=(1, 2, 2, 1), steps=8,
                  batch_size=2, seed=5)
    _, plain = train_hypernetwork(model, "hn", latents, conds,
                                  use_dropout=False, **common)
    _, dropped = train_hypernetwork(model, "hn", latents, conds,
                                    use_dropout=True, **common)
    assert all(np.isfinite(dropped))
    assert not np.allclose(plain, dropped)

    # at lr=0 params are frozen and both runs draw identical batches/t/noise
    # (same numpy seed), so any per-step loss difference comes from the
    # dropout mask alone — and the dropout run itself stays deterministic
    frozen = dict(dims=None, layer_structure=(1, 2, 2, 1), steps=6,
                  batch_size=4, seed=5, lr=0.0)
    _, frozen_plain = train_hypernetwork(model, "hn", latents, conds,
                                         use_dropout=False, **frozen)
    _, frozen_drop = train_hypernetwork(model, "hn", latents, conds,
                                        use_dropout=True, **frozen)
    _, frozen_drop2 = train_hypernetwork(model, "hn", latents, conds,
                                         use_dropout=True, **frozen)
    assert not np.allclose(frozen_plain, frozen_drop)   # masks active
    np.testing.assert_allclose(frozen_drop, frozen_drop2)  # seeded PRNG
    # masks re-drawn per step: the dropout-induced loss delta varies
    deltas = np.asarray(frozen_drop) - np.asarray(frozen_plain)
    assert np.std(deltas) > 1e-9


def test_hypernetwork_dropout_not_applied_at_inference(model):
    """Generation never drops: the inference forward ignores dropout
    metadata entirely (hypernet 2-tuple path)."""
    import jax.numpy as jnp

    from sdwebui_tpu.networks.hypernetwork import (create_hypernetwork,
                                                   parse_dropout_structure)
    from sdwebui_tpu.models import unet as unet_model

    hn = create_hypernetwork(dims=(model.unet_cfg.context_dim,),
                             layer_structure=(1, 2, 2, 1), seed=3)
    x = jnp.ones((1, 8, 8, 4), jnp.float32)
    t = jnp.array([10.0])
    ctx = jnp.ones((1, 77, model.unet_cfg.context_dim), jnp.float32)
    a = unet_model.apply(model.unet_params, model.unet_cfg, x, t, ctx,
                         hypernet=(hn, ("relu", 1.0, False)))
    b = unet_model.apply(model.unet_params, model.unet_cfg, x, t, ctx,
                         hypernet=(hn, ("relu", 1.0, False)))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
