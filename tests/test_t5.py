"""T5 v1.1 encoder: parity against HF transformers T5EncoderModel."""

import pytest

pytestmark = pytest.mark.slow  # heavyweight: excluded from `-m 'not slow'` quick runs

import numpy as np
import jax.numpy as jnp
import pytest

from sdwebui_tpu.models import t5 as t5_model
from sdwebui_tpu.models.t5 import (T5Config, apply, convert_t5,
                                   derive_t5_config, relative_position_bucket)


def _hf_tiny():
    import torch
    from transformers import T5Config as HFT5Config, T5EncoderModel

    torch.manual_seed(0)
    cfg = HFT5Config(vocab_size=96, d_model=32, d_kv=8, d_ff=64,
                     num_layers=3, num_heads=4,
                     feed_forward_proj="gated-gelu", dropout_rate=0.0)
    return T5EncoderModel(cfg).eval()


def test_bucket_matches_hf():
    import torch
    from transformers.models.t5.modeling_t5 import T5Attention

    pos = np.arange(16)
    rel = pos[None, :] - pos[:, None]
    want = T5Attention._relative_position_bucket(
        torch.from_numpy(rel), bidirectional=True, num_buckets=32,
        max_distance=128).numpy()
    got = relative_position_bucket(rel)
    np.testing.assert_array_equal(got, want)


def test_parity_with_hf_encoder():
    import torch

    m = _hf_tiny()
    sd = {k: v.numpy() for k, v in m.state_dict().items()}
    tree, cfg = convert_t5(sd)
    assert cfg == T5Config(vocab_size=96, d_model=32, d_kv=8, d_ff=64,
                           num_layers=3, num_heads=4)
    ids = np.array([[3, 17, 62, 9, 1, 0, 0, 0],
                    [44, 2, 7, 95, 31, 10, 1, 0]], np.int32)
    with torch.no_grad():
        want = m(input_ids=torch.from_numpy(ids.astype(np.int64))
                 ).last_hidden_state.numpy()
    got = np.asarray(apply(tree, cfg, jnp.asarray(ids)))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_init_params_roundtrip():
    cfg = T5Config(vocab_size=50, d_model=16, d_kv=4, d_ff=32,
                   num_layers=2, num_heads=4)
    params = t5_model.init_params(cfg, seed=1)
    out = apply(params, cfg, jnp.asarray([[1, 2, 3, 4]], jnp.int32))
    assert out.shape == (1, 4, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_sd3_bundled_prefix():
    m = _hf_tiny()
    sd = {f"text_encoders.t5xxl.transformer.{k}": v.numpy()
          for k, v in m.state_dict().items()}
    tree, cfg = convert_t5(sd)
    assert cfg.d_model == 32
    out = apply(tree, cfg, jnp.asarray([[5, 6, 1]], jnp.int32))
    assert out.shape == (1, 3, 32)


def test_sd3_encode_texts_with_t5(monkeypatch):
    """With T5 params + a tokenizer attached, SD3 conds grow along the
    token axis (lg 77 ⊕ t5 77 → 154) and change content."""
    import dataclasses

    from sdwebui_tpu.pipeline.sd_model import create_tiny_sd3

    model = create_tiny_sd3()
    cfg = T5Config(vocab_size=50, d_model=model.unet_cfg.context_dim,
                   d_kv=4, d_ff=32, num_layers=2, num_heads=4)
    params = t5_model.init_params(cfg, seed=2)
    tokenizer = lambda text: [min(len(text), 49)] * 8   # fake fixed-len ids
    m2 = dataclasses.replace(model, t5_params=params, t5_cfg=cfg,
                             t5_tokenizer=tokenizer)
    base, pooled_b = model.encode_texts(["a cat"])
    witht5, pooled_t = m2.encode_texts(["a cat"])
    assert witht5.shape[1] == base.shape[1] + 8
    np.testing.assert_allclose(np.asarray(pooled_b), np.asarray(pooled_t))
    np.testing.assert_allclose(np.asarray(witht5[:, :base.shape[1]]),
                               np.asarray(base), atol=1e-6)
