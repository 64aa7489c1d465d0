// Native group-wise quantizer: BF16/F32 → INT4 (split-half packed) / INT8.
//
// The load-time hot path: quantizing a 100+ GB checkpoint in Python/numpy
// is minutes of single-threaded work; the reference parallelizes this with
// rayon (reference src/weights/mod.rs streaming_build_cpu_cache /
// marlin.rs quantize_int4). This is the TPU build's equivalent: an
// OpenMP-parallel C++ kernel, bound via ctypes, with numerics EXACTLY
// matching krasis_tpu.quant.quantize_np:
//
//   scale_f32  = amax / qmax   (1.0 when the group is all-zero)
//   scale_bf16 = round-to-nearest-even bf16 of scale_f32
//   q          = clip(rint(x / scale_bf16), lo, hi)     (rint = half-to-even)
//   int4 pack: byte[k][n] = (q[k][n] & 0xF) | (q[k + K/2][n] << 4)
//
// Build: g++ -O3 -march=native -fopenmp -shared -fPIC quant.cpp -o libkrasisq.so

#include <cstdint>
#include <cmath>
#include <cstring>
#include <algorithm>
#include <vector>

#if defined(_OPENMP)
#include <omp.h>
#endif

static inline float bf16_to_f32(uint16_t h) {
    uint32_t u = static_cast<uint32_t>(h) << 16;
    float f;
    std::memcpy(&f, &u, 4);
    return f;
}

static inline uint16_t f32_to_bf16(float f) {
    uint32_t u;
    std::memcpy(&u, &f, 4);
    // round-to-nearest-even (matches numpy/ml_dtypes)
    uint32_t rounded = u + 0x7FFFu + ((u >> 16) & 1u);
    return static_cast<uint16_t>(rounded >> 16);
}

// Quantize one [K, N] tensor into q8 (int8 [K, N]) + scales (bf16 [K/gs, N]).
static void quantize_to_int8_rows(
    const void* src, int src_is_f32,
    int64_t K, int64_t N, float qmax, int lo, int hi, int gs,
    int8_t* q8, uint16_t* scales_out)
{
    const int64_t n_groups = K / gs;
    const uint16_t* sb = static_cast<const uint16_t*>(src);
    const float* sf = static_cast<const float*>(src);

#pragma omp parallel
    {
        std::vector<float> inv(N);
#pragma omp for schedule(dynamic, 1)
        for (int64_t g = 0; g < n_groups; ++g) {
            const int64_t k0 = g * gs;
            for (int64_t n = 0; n < N; ++n) inv[n] = 0.0f;
            for (int64_t k = k0; k < k0 + gs; ++k) {
                if (src_is_f32) {
                    const float* row = sf + k * N;
                    for (int64_t n = 0; n < N; ++n) {
                        float a = std::fabs(row[n]);
                        if (a > inv[n]) inv[n] = a;
                    }
                } else {
                    const uint16_t* row = sb + k * N;
                    for (int64_t n = 0; n < N; ++n) {
                        float a = std::fabs(bf16_to_f32(row[n]));
                        if (a > inv[n]) inv[n] = a;
                    }
                }
            }
            uint16_t* srow = scales_out + g * N;
            for (int64_t n = 0; n < N; ++n) {
                float scale = (inv[n] == 0.0f) ? 1.0f : inv[n] / qmax;
                uint16_t s16 = f32_to_bf16(scale);
                srow[n] = s16;
                inv[n] = 1.0f / bf16_to_f32(s16);
            }
            for (int64_t k = k0; k < k0 + gs; ++k) {
                int8_t* qrow = q8 + k * N;
                for (int64_t n = 0; n < N; ++n) {
                    float x = src_is_f32 ? sf[k * N + n]
                                         : bf16_to_f32(sb[k * N + n]);
                    float qf = std::nearbyintf(x * inv[n]);
                    int qi = static_cast<int>(qf);
                    qrow[n] = static_cast<int8_t>(
                        std::min(hi, std::max(lo, qi)));
                }
            }
        }
    }
}

extern "C" {

// src: [K, N] row-major, bf16 (uint16) or f32 per src_is_f32.
// q_out: int8 [K, N] for bits=8, packed int8 [K/2, N] for bits=4.
// scales_out: bf16 [K/gs, N].
// Returns 0 on success.
int krasisq_quantize(
    const void* src, int src_is_f32,
    int64_t K, int64_t N,
    int bits, int gs,
    int8_t* q_out, uint16_t* scales_out)
{
    if (K % gs != 0 || (bits == 4 && K % 2 != 0)) return 1;
    if (bits != 4 && bits != 8) return 2;
    const float qmax = (bits == 4) ? 7.0f : 127.0f;
    const int lo = (bits == 4) ? -8 : -128;
    const int hi = (bits == 4) ? 7 : 127;

    if (bits == 8) {
        quantize_to_int8_rows(src, src_is_f32, K, N, qmax, lo, hi, gs,
                              q_out, scales_out);
        return 0;
    }
    // int4: quantize into temp int8, then split-half pack (race-free pass).
    std::vector<int8_t> tmp(static_cast<size_t>(K) * N);
    quantize_to_int8_rows(src, src_is_f32, K, N, qmax, lo, hi, gs,
                          tmp.data(), scales_out);
    const int64_t half = K / 2;
    uint8_t* qo = reinterpret_cast<uint8_t*>(q_out);
#pragma omp parallel for schedule(static)
    for (int64_t k = 0; k < half; ++k) {
        const int8_t* lo_row = tmp.data() + k * N;
        const int8_t* hi_row = tmp.data() + (k + half) * N;
        uint8_t* out_row = qo + k * N;
        for (int64_t n = 0; n < N; ++n) {
            out_row[n] = static_cast<uint8_t>(lo_row[n] & 0xF)
                       | (static_cast<uint8_t>(hi_row[n] & 0xF) << 4);
        }
    }
    return 0;
}

// Batched expert variant: src [E, K, N] → q_out/scales_out batched.
int krasisq_quantize_batch(
    const void* src, int src_is_f32,
    int64_t E, int64_t K, int64_t N,
    int bits, int gs,
    int8_t* q_out, uint16_t* scales_out)
{
    const int64_t src_elem = K * N;
    const int64_t q_stride = (bits == 4 ? K / 2 : K) * N;
    const int64_t s_stride = (K / gs) * N;
    int rc = 0;
    for (int64_t e = 0; e < E; ++e) {
        const char* s = static_cast<const char*>(src)
            + e * src_elem * (src_is_f32 ? 4 : 2);
        int r = krasisq_quantize(
            s, src_is_f32, K, N, bits, gs,
            q_out + e * q_stride, scales_out + e * s_stride);
        if (r) rc = r;
    }
    return rc;
}

int krasisq_num_threads() {
#if defined(_OPENMP)
    return omp_get_max_threads();
#else
    return 1;
#endif
}

}  // extern "C"
