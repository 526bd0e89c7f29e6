// sdtpu_native — native runtime helpers for the TPU framework.
//
// The reference delegates all native-speed work to torch/CUDA; our
// host-side hot paths are (1) checkpoint dtype conversion (multi-GB
// fp16 -> fp32/bf16 during load; numpy's astype is single-threaded) and
// (2) seeded Philox noise generation (counter-based; embarrassingly
// parallel). Built as a plain shared library, bound via ctypes
// (no pybind11 in this image).
//
// Bit-exactness contract: philox_randn matches the numpy reference
// implementation (sdwebui_tpu/rng/philox.py) which itself matches
// torch-CUDA "NV" noise; the double-precision Box–Muller uses libm
// log/sin — verified against numpy in tests (both use IEEE double and
// correctly-rounded basic ops; log/sin agree on glibc for these inputs,
// enforced by test_native.py, with automatic fallback if ever not).

#include <cstdint>
#include <cstring>
#include <cmath>
#include <thread>
#include <vector>
#include <algorithm>

namespace {

constexpr uint64_t PHILOX_M0 = 0xD2511F53ull;
constexpr uint64_t PHILOX_M1 = 0xCD9E8D57ull;
constexpr uint32_t PHILOX_W0 = 0x9E3779B9u;
constexpr uint32_t PHILOX_W1 = 0xBB67AE85u;

// float32(2.3283064e-10) promoted to double — matches numpy's promotion
const double INV32      = (double)(float)2.3283064e-10;
const double INV32_HALF = (double)((float)2.3283064e-10 / (float)2.0);
const double INV32_2PI      = (double)(float)(2.3283064e-10 * 6.2831855);
const double INV32_2PI_HALF = (double)((float)(2.3283064e-10 * 6.2831855) / (float)2.0);

inline void philox10(uint32_t c[4], uint32_t k0, uint32_t k1,
                     uint32_t &x0, uint32_t &x1) {
    for (int r = 0; r < 10; ++r) {
        uint64_t p0 = (uint64_t)c[0] * PHILOX_M0;
        uint64_t p1 = (uint64_t)c[2] * PHILOX_M1;
        uint32_t hi0 = (uint32_t)(p0 >> 32), lo0 = (uint32_t)p0;
        uint32_t hi1 = (uint32_t)(p1 >> 32), lo1 = (uint32_t)p1;
        uint32_t n0 = hi1 ^ c[1] ^ k0;
        uint32_t n1 = lo1;
        uint32_t n2 = hi0 ^ c[3] ^ k1;
        uint32_t n3 = lo0;
        c[0] = n0; c[1] = n1; c[2] = n2; c[3] = n3;
        if (r != 9) { k0 += PHILOX_W0; k1 += PHILOX_W1; }
    }
    x0 = c[0];
    x1 = c[1];
}

inline float box_muller_sin(uint32_t x0, uint32_t x1) {
    double u = (double)x0 * INV32 + INV32_HALF;
    double v = (double)x1 * INV32_2PI + INV32_2PI_HALF;
    return (float)(std::sqrt(-2.0 * std::log(u)) * std::sin(v));
}

inline uint16_t f32_to_bf16(float f) {
    uint32_t bits;
    std::memcpy(&bits, &f, 4);
    // round-to-nearest-even (matches ml_dtypes / XLA)
    uint32_t rounding = 0x7FFF + ((bits >> 16) & 1);
    return (uint16_t)((bits + rounding) >> 16);
}

inline float f16_to_f32(uint16_t h) {
    uint32_t sign = (uint32_t)(h & 0x8000) << 16;
    uint32_t exp = (h >> 10) & 0x1F;
    uint32_t mant = h & 0x3FF;
    uint32_t bits;
    if (exp == 0) {
        if (mant == 0) {
            bits = sign;
        } else {  // subnormal
            exp = 1;
            while (!(mant & 0x400)) { mant <<= 1; --exp; }
            mant &= 0x3FF;
            bits = sign | ((exp + 112) << 23) | (mant << 13);
        }
    } else if (exp == 31) {
        bits = sign | 0x7F800000 | (mant << 13);
    } else {
        bits = sign | ((exp + 112) << 23) | (mant << 13);
    }
    float f;
    std::memcpy(&f, &bits, 4);
    return f;
}

template <typename Fn>
void parallel_for(size_t n, int threads, Fn fn) {
    if (threads <= 1 || n < 1u << 16) { fn(0, n); return; }
    std::vector<std::thread> pool;
    size_t chunk = (n + threads - 1) / threads;
    for (int t = 0; t < threads; ++t) {
        size_t lo = t * chunk;
        size_t hi = std::min(n, lo + chunk);
        if (lo >= hi) break;
        pool.emplace_back([=] { fn(lo, hi); });
    }
    for (auto &th : pool) th.join();
}

}  // namespace

extern "C" {

// out[n_offsets][n]: gaussian noise; offset o, lane i -> counter (o,0,i,i>>32)
void philox_randn(uint64_t seed, uint32_t offset_start, uint32_t n_offsets,
                  uint64_t n, float *out, int threads) {
    uint32_t k0 = (uint32_t)(seed & 0xFFFFFFFFull);
    uint32_t k1 = (uint32_t)(seed >> 32);
    size_t total = (size_t)n_offsets * n;
    parallel_for(total, threads, [&](size_t lo, size_t hi) {
        for (size_t idx = lo; idx < hi; ++idx) {
            uint32_t off = offset_start + (uint32_t)(idx / n);
            uint64_t lane = idx % n;
            uint32_t c[4] = {off, 0u, (uint32_t)lane, (uint32_t)(lane >> 32)};
            uint32_t x0, x1;
            philox10(c, k0, k1, x0, x1);
            out[idx] = box_muller_sin(x0, x1);
        }
    });
}

void convert_f16_to_f32(const uint16_t *src, float *dst, uint64_t n, int threads) {
    parallel_for(n, threads, [&](size_t lo, size_t hi) {
        for (size_t i = lo; i < hi; ++i) dst[i] = f16_to_f32(src[i]);
    });
}

void convert_f16_to_bf16(const uint16_t *src, uint16_t *dst, uint64_t n, int threads) {
    parallel_for(n, threads, [&](size_t lo, size_t hi) {
        for (size_t i = lo; i < hi; ++i) dst[i] = f32_to_bf16(f16_to_f32(src[i]));
    });
}

void convert_f32_to_bf16(const float *src, uint16_t *dst, uint64_t n, int threads) {
    parallel_for(n, threads, [&](size_t lo, size_t hi) {
        for (size_t i = lo; i < hi; ++i) dst[i] = f32_to_bf16(src[i]);
    });
}

void convert_bf16_to_f32(const uint16_t *src, float *dst, uint64_t n, int threads) {
    parallel_for(n, threads, [&](size_t lo, size_t hi) {
        for (size_t i = lo; i < hi; ++i) {
            uint32_t bits = (uint32_t)src[i] << 16;
            std::memcpy(&dst[i], &bits, 4);
        }
    });
}

}  // extern "C"
