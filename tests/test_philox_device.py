"""Device-side Philox (randn_source="TPU") and the randn_source dispatch.

The device generator must carry the SAME Philox4x32-10 integer stream as
the host "NV" implementation (bit-exact words); the float outputs go
through a float32 Box–Muller (TPUs have no f64) and agree with the host
floats to ~2e-5 — the documented contract."""

import numpy as np
import jax.numpy as jnp
import pytest

from sdwebui_tpu.rng import philox as host
from sdwebui_tpu.rng import philox_jax as dev
from sdwebui_tpu.rng.image_rng import ImageRNG, TorchCPUGenerator, create_rng
from sdwebui_tpu.rng.philox_jax import DevicePhiloxRNG
from sdwebui_tpu.utils.options import opts


def test_philox_words_bit_exact_vs_host():
    rng = np.random.default_rng(0)
    c = [rng.integers(0, 2 ** 32, 2048, dtype=np.uint32) for _ in range(4)]
    k = [rng.integers(0, 2 ** 32, 2048, dtype=np.uint32) for _ in range(2)]
    hx0, hx1 = host._philox10(*[x.copy() for x in c], *[x.copy() for x in k])
    dx0, dx1 = dev.philox10_words(*[jnp.asarray(x) for x in c],
                                  *[jnp.asarray(x) for x in k])
    np.testing.assert_array_equal(hx0, np.asarray(dx0))
    np.testing.assert_array_equal(hx1, np.asarray(dx1))


def test_randn_close_to_host():
    seed, n = 987654321, 4 * 16 * 16
    offs = np.arange(8, dtype=np.uint32)
    h = host.randn_at(seed, offs, n)
    d = np.asarray(dev.randn_at_device(
        jnp.asarray(dev._seed_words(seed)), jnp.asarray(offs), n))
    np.testing.assert_allclose(h, d, atol=2e-5)


def test_device_rng_matches_host_image_rng_semantics():
    kw = dict(subseeds=[1, 2], subseed_strength=0.3)
    hr = ImageRNG((4, 8, 8), [7, 9], **kw)
    dr = DevicePhiloxRNG((4, 8, 8), [7, 9], **kw)
    np.testing.assert_allclose(hr.first(), np.asarray(dr.first()), atol=2e-5)
    # first() does not consume is_first (reference quirk) — next() replays
    np.testing.assert_allclose(hr.next(), np.asarray(dr.next()), atol=2e-5)
    np.testing.assert_allclose(hr.next_k(4), np.asarray(dr.next_k(4)),
                               atol=2e-5)


def test_device_rng_eta_noise_seed_delta():
    hr = ImageRNG((4, 8, 8), [7], eta_noise_seed_delta=31337)
    dr = DevicePhiloxRNG((4, 8, 8), [7], eta_noise_seed_delta=31337)
    for _ in range(3):
        np.testing.assert_allclose(hr.next(), np.asarray(dr.next()),
                                   atol=2e-5)


def test_create_rng_dispatch():
    r = create_rng((4, 8, 8), [1])
    assert isinstance(r, ImageRNG)            # NV default
    with opts.override({"randn_source": "TPU"}):
        assert isinstance(create_rng((4, 8, 8), [1]), DevicePhiloxRNG)
        # seed-resize: host fallback (numpy overlay path)
        r2 = create_rng((4, 8, 8), [1], seed_resize_from_h=128,
                        seed_resize_from_w=128)
        assert isinstance(r2, ImageRNG)
    with opts.override({"randn_source": "GPU"}):   # reference alias
        assert isinstance(create_rng((4, 8, 8), [1]), DevicePhiloxRNG)
    with opts.override({"randn_source": "CPU"}):
        r3 = create_rng((4, 8, 8), [1])
        assert isinstance(r3, ImageRNG)
        assert r3._gen_cls is TorchCPUGenerator


def test_torch_cpu_generator_matches_reference_stream():
    torch = pytest.importorskip("torch")
    g = TorchCPUGenerator(1234)
    ref = torch.randn((4, 8, 8),
                      generator=torch.Generator("cpu").manual_seed(1234),
                      device="cpu").numpy()
    np.testing.assert_array_equal(g.randn((4, 8, 8)), ref)
    # consecutive draws continue the stream exactly like sequential randn
    g2 = TorchCPUGenerator(1234)
    batch = g2.randn_batch(3, (2, 2))
    gen = torch.Generator("cpu").manual_seed(1234)
    want = np.stack([torch.randn((2, 2), generator=gen).numpy()
                     for _ in range(3)])
    np.testing.assert_array_equal(batch, want)


def test_tpu_source_fused_equals_stepwise_e2e():
    """randn_source=TPU through both sampling entry points (fused scan and
    the stepwise live-preview chunking) produces identical images — the
    device noise arrays slice/reshape the same either way."""
    from sdwebui_tpu.pipeline.params import GenerationParams
    from sdwebui_tpu.pipeline.processing import process_txt2img
    from sdwebui_tpu.pipeline.sd_model import create_tiny_sd

    model = create_tiny_sd()
    mk = lambda: GenerationParams(prompt="a cat", seed=5, steps=3, width=64,
                                  height=64, sampler_name="Euler a")
    with opts.override({"randn_source": "TPU"}):
        fused = process_txt2img(model, mk())
        seen = []
        stepwise = process_txt2img(
            model, mk(),
            step_callback=lambda i, n, lat: seen.append(i) or True)
    assert seen
    np.testing.assert_allclose(np.asarray(fused.images[0]),
                               np.asarray(stepwise.images[0]), atol=1)
