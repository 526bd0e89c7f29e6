"""Native (C++) helper tests: build, bit-exactness, speed sanity."""

import numpy as np
import pytest

from sdwebui_tpu import native
from sdwebui_tpu.rng.philox import randn_at


@pytest.fixture(scope="module", autouse=True)
def lib():
    if native.get_lib() is None:
        pytest.skip("native lib failed to build")


def test_native_builds_and_loads():
    assert native.available()


def test_philox_bit_exact_vs_numpy():
    got = native.philox_randn(31337, 0, 4, 1000, force_native=True)
    ref = randn_at(31337, np.arange(4), 1000).astype(np.float32)
    np.testing.assert_array_equal(got, ref)


def test_philox_big_seed():
    seed = 2 ** 63 + 12345
    got = native.philox_randn(seed, 7, 2, 333, force_native=True)
    ref = randn_at(seed, np.array([7, 8]), 333).astype(np.float32)
    np.testing.assert_array_equal(got, ref)


def test_convert_f16_roundtrips():
    import ml_dtypes

    rng = np.random.default_rng(0)
    x16 = rng.standard_normal(100000).astype(np.float16)
    f32 = native.convert(x16, "float32")
    np.testing.assert_array_equal(f32, x16.astype(np.float32))
    bf = native.convert(x16, "bfloat16")
    np.testing.assert_array_equal(
        bf.view(np.uint16), x16.astype(np.float32).astype(ml_dtypes.bfloat16).view(np.uint16))


def test_convert_f16_specials():
    import ml_dtypes

    x = np.array([0.0, -0.0, np.inf, -np.inf, np.nan, 6e-8, -6e-8, 65504.0],
                 np.float16)
    f32 = native.convert(x, "float32")
    ref = x.astype(np.float32)
    np.testing.assert_array_equal(np.isnan(f32), np.isnan(ref))
    np.testing.assert_array_equal(f32[~np.isnan(ref)], ref[~np.isnan(ref)])


def test_convert_f32_to_bf16_rne():
    """Round-to-nearest-even matches ml_dtypes exactly incl. ties."""
    import ml_dtypes

    rng = np.random.default_rng(1)
    x = rng.standard_normal(65536).astype(np.float32)
    # include exact tie patterns
    ties = np.array([1.0 + 2 ** -8, 1.0 + 3 * 2 ** -9], np.float32)
    x = np.concatenate([x, ties])
    got = native.convert(x, "bfloat16").view(np.uint16)
    ref = x.astype(ml_dtypes.bfloat16).view(np.uint16)
    np.testing.assert_array_equal(got, ref)


def test_bf16_to_f32():
    import ml_dtypes

    x = np.random.default_rng(2).standard_normal(4096).astype(ml_dtypes.bfloat16)
    got = native.convert(x, "float32")
    np.testing.assert_array_equal(got, x.astype(np.float32))


def test_philox_speed_vs_numpy():
    """The native path shouldn't be slower than vectorized numpy (it should
    be faster multi-threaded, but CI noise — just sanity-bound it)."""
    import time

    n = 4 * 64 * 64
    k = 50
    native.philox_randn(1, 0, 2, n, force_native=True)  # warm

    def best(fn, reps=3):
        # min-of-3: a single sample flakes under unrelated host load
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t_native = best(lambda: native.philox_randn(1, 0, k, n,
                                                force_native=True))
    t_numpy = best(lambda: randn_at(1, np.arange(k), n))
    assert t_native < t_numpy * 2.0, (t_native, t_numpy)
