"""Swin2SR: forward parity against HF Swin2SRForImageSuperResolution
(random weights) — covers cosine attention, log-CPB bias, post-norm blocks,
HF→original key translation, and the pixelshuffle upsampler."""

import pytest

pytestmark = pytest.mark.slow  # heavyweight: excluded from `-m 'not slow'` quick runs

import numpy as np
import pytest

transformers = pytest.importorskip("transformers")
torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from sdwebui_tpu.models import swin2sr  # noqa: E402


def _tiny_hf():
    from transformers import Swin2SRConfig, Swin2SRForImageSuperResolution

    torch.manual_seed(0)
    cfg = Swin2SRConfig(embed_dim=16, depths=[2, 2], num_heads=[2, 2],
                        window_size=4, image_size=16, upscale=2,
                        mlp_ratio=2.0)
    return Swin2SRForImageSuperResolution(cfg).eval()


def test_swin2sr_forward_parity():
    m = _tiny_hf()
    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    tree, cfg = swin2sr.convert_swin2sr(sd)
    import dataclasses

    cfg = dataclasses.replace(cfg, window_size=4)   # tiny window (not 8)
    assert cfg.embed_dim == 16
    assert cfg.depths == (2, 2)
    assert cfg.scale == 2
    assert cfg.upsampler == "pixelshuffle"

    x = np.random.RandomState(0).rand(2, 16, 16, 3).astype(np.float32)
    with torch.no_grad():
        ref = m(torch.from_numpy(x).permute(0, 3, 1, 2)).reconstruction
    got = np.asarray(swin2sr.apply(
        {k: v for k, v in tree.items()}, cfg, jnp.asarray(x)))
    ref = ref.permute(0, 2, 3, 1).numpy()
    assert got.shape == ref.shape
    assert np.max(np.abs(got - np.clip(ref, 0, 1))) < 3e-5


def test_swin2sr_init_and_tiled():
    from PIL import Image

    cfg = swin2sr.Swin2SRConfig(embed_dim=16, depths=(2,), num_heads=(2,),
                                window_size=4, scale=2,
                                upsampler="pixelshuffledirect")
    p = swin2sr.init_params(cfg, 1)
    img = Image.fromarray((np.random.RandomState(2).rand(20, 26, 3) * 255)
                          .astype(np.uint8))
    out = swin2sr.upscale_image(p, cfg, img, tile=16, overlap=4)
    assert out.size == (26 * 2, 20 * 2)
