// Native tile-pipeline kernels: multi-level lifting DWT (5/3 reversible on
// int32, 9/7 irreversible on float32), deadzone quantization, band
// dequantization, ROI unshift and the fused final sample conversion.
//
// These are host-side mirrors of grok_tpu/ops/dwt.py and the band loops in
// grok_tpu/tile/tile_processor.py (which remain the bit-exact reference and
// the jax/device path). Written from ITU-T T.800 Annex F, not from the
// reference codec (cf. transform/WaveletFwd.cpp, WaveletReverse.cpp); the
// lifting neighbor rules are the "clamp to nearest valid opposite-phase
// sample" formulation used across this repo.
//
// Build: compiled into libgrok_tpu_native.so by grok_tpu/t1/native.py.

#include <cstdint>
#include <cstring>
#include <cmath>
#include <algorithm>

#ifdef _OPENMP
#include <omp.h>
#include "omp_util.h"
#endif

namespace {

// 9/7 lifting constants (T.800 F.4.8.2), rounded to float32 exactly as the
// numpy path does under NEP-50 weak scalar promotion.
const float A97 = (float)-1.586134342059924;
const float B97 = (float)-0.052980118572961;
const float G97 = (float)0.882911075530934;
const float D97 = (float)0.443506852043971;
const float K97 = (float)1.230174104914001;
const float IK97 = (float)(1.0 / 1.230174104914001);

static inline int sn_of(int n, int P) { return P == 0 ? (n + 1) / 2 : n / 2; }

// Wraparound-defined int32 ops for the 5/3 lifting: corrupt streams can
// carry near-INT32_MAX coefficients, and signed overflow is UB. numpy's
// int32 arithmetic wraps, so wrapping keeps native/host bit-identical.
static inline int32_t wadd(int32_t a, int32_t b) {
    return (int32_t)((uint32_t)a + (uint32_t)b);
}
static inline int32_t wsub(int32_t a, int32_t b) {
    return (int32_t)((uint32_t)a - (uint32_t)b);
}

// ------------------------------------------------------------- 5/3 rows
static void f53_row(int32_t* row, int n, int P, int32_t* tmp) {
    if (n <= 0) return;
    if (n == 1) {
        if (P) row[0] = wadd(row[0], row[0]);
        return;
    }
    int sn = sn_of(n, P), dn = n - sn;
    int32_t* s = tmp;
    int32_t* d = tmp + sn;
    for (int i = 0; i < sn; i++) s[i] = row[2 * i + P];
    for (int j = 0; j < dn; j++) d[j] = row[2 * j + 1 - P];
    if (P == 0) {
        for (int j = 0; j < dn; j++)
            d[j] = wsub(d[j], wadd(s[j], s[j + 1 < sn ? j + 1 : sn - 1]) >> 1);
        for (int i = 0; i < sn; i++)
            s[i] = wadd(s[i], wadd(wadd(d[i > 0 ? i - 1 : 0], d[i < dn - 1 ? i : dn - 1]), 2) >> 2);
    } else {
        for (int j = 0; j < dn; j++)
            d[j] = wsub(d[j], wadd(s[j > 0 ? j - 1 : 0], s[j < sn - 1 ? j : sn - 1]) >> 1);
        for (int i = 0; i < sn; i++)
            s[i] = wadd(s[i], wadd(wadd(d[i], d[i + 1 < dn ? i + 1 : dn - 1]), 2) >> 2);
    }
    std::memcpy(row, tmp, (size_t)n * sizeof(int32_t));
}

static void i53_row(int32_t* row, int n, int P, int32_t* tmp) {
    if (n <= 0) return;
    if (n == 1) {
        if (P) row[0] >>= 1;
        return;
    }
    int sn = sn_of(n, P), dn = n - sn;
    int32_t* s = tmp;
    int32_t* d = tmp + sn;
    std::memcpy(tmp, row, (size_t)n * sizeof(int32_t));
    if (P == 0) {
        for (int i = 0; i < sn; i++)
            s[i] = wsub(s[i], wadd(wadd(d[i > 0 ? i - 1 : 0], d[i < dn - 1 ? i : dn - 1]), 2) >> 2);
        for (int j = 0; j < dn; j++)
            d[j] = wadd(d[j], wadd(s[j], s[j + 1 < sn ? j + 1 : sn - 1]) >> 1);
    } else {
        for (int i = 0; i < sn; i++)
            s[i] = wsub(s[i], wadd(wadd(d[i], d[i + 1 < dn ? i + 1 : dn - 1]), 2) >> 2);
        for (int j = 0; j < dn; j++)
            d[j] = wadd(d[j], wadd(s[j > 0 ? j - 1 : 0], s[j < sn - 1 ? j : sn - 1]) >> 1);
    }
    for (int i = 0; i < sn; i++) row[2 * i + P] = s[i];
    for (int j = 0; j < dn; j++) row[2 * j + 1 - P] = d[j];
}

// ------------------------------------------------------------- 9/7 rows
static void f97_row(float* row, int n, int P, float* tmp) {
    if (n <= 0) return;
    if (n == 1) return;  // single sample: left unscaled (see ops/dwt.py)
    int sn = sn_of(n, P), dn = n - sn;
    float* s = tmp;
    float* d = tmp + sn;
    for (int i = 0; i < sn; i++) s[i] = row[2 * i + P];
    for (int j = 0; j < dn; j++) d[j] = row[2 * j + 1 - P];
    if (P == 0) {
        for (int j = 0; j < dn; j++)
            d[j] += A97 * (s[j] + s[j + 1 < sn ? j + 1 : sn - 1]);
        for (int i = 0; i < sn; i++)
            s[i] += B97 * (d[i > 0 ? i - 1 : 0] + d[i < dn - 1 ? i : dn - 1]);
        for (int j = 0; j < dn; j++)
            d[j] += G97 * (s[j] + s[j + 1 < sn ? j + 1 : sn - 1]);
        for (int i = 0; i < sn; i++)
            s[i] += D97 * (d[i > 0 ? i - 1 : 0] + d[i < dn - 1 ? i : dn - 1]);
    } else {
        for (int j = 0; j < dn; j++)
            d[j] += A97 * (s[j > 0 ? j - 1 : 0] + s[j < sn - 1 ? j : sn - 1]);
        for (int i = 0; i < sn; i++)
            s[i] += B97 * (d[i] + d[i + 1 < dn ? i + 1 : dn - 1]);
        for (int j = 0; j < dn; j++)
            d[j] += G97 * (s[j > 0 ? j - 1 : 0] + s[j < sn - 1 ? j : sn - 1]);
        for (int i = 0; i < sn; i++)
            s[i] += D97 * (d[i] + d[i + 1 < dn ? i + 1 : dn - 1]);
    }
    for (int i = 0; i < sn; i++) row[i] = s[i] * IK97;
    for (int j = 0; j < dn; j++) row[sn + j] = d[j] * K97;
}

static void i97_row(float* row, int n, int P, float* tmp) {
    if (n <= 0) return;
    if (n == 1) return;
    int sn = sn_of(n, P), dn = n - sn;
    float* s = tmp;
    float* d = tmp + sn;
    for (int i = 0; i < sn; i++) s[i] = row[i] * K97;
    for (int j = 0; j < dn; j++) d[j] = row[sn + j] * IK97;
    if (P == 0) {
        for (int i = 0; i < sn; i++)
            s[i] -= D97 * (d[i > 0 ? i - 1 : 0] + d[i < dn - 1 ? i : dn - 1]);
        for (int j = 0; j < dn; j++)
            d[j] -= G97 * (s[j] + s[j + 1 < sn ? j + 1 : sn - 1]);
        for (int i = 0; i < sn; i++)
            s[i] -= B97 * (d[i > 0 ? i - 1 : 0] + d[i < dn - 1 ? i : dn - 1]);
        for (int j = 0; j < dn; j++)
            d[j] -= A97 * (s[j] + s[j + 1 < sn ? j + 1 : sn - 1]);
    } else {
        for (int i = 0; i < sn; i++)
            s[i] -= D97 * (d[i] + d[i + 1 < dn ? i + 1 : dn - 1]);
        for (int j = 0; j < dn; j++)
            d[j] -= G97 * (s[j > 0 ? j - 1 : 0] + s[j < sn - 1 ? j : sn - 1]);
        for (int i = 0; i < sn; i++)
            s[i] -= B97 * (d[i] + d[i + 1 < dn ? i + 1 : dn - 1]);
        for (int j = 0; j < dn; j++)
            d[j] -= A97 * (s[j > 0 ? j - 1 : 0] + s[j < sn - 1 ? j : sn - 1]);
    }
    for (int i = 0; i < sn; i++) row[2 * i + P] = s[i];
    for (int j = 0; j < dn; j++) row[2 * j + 1 - P] = d[j];
}

// -------------------------------------------------- vertical (row-vector)
// Vertical passes run the same lifting with whole rows as vector lanes;
// in-place on the interleaved rows, then (de)interleave through scratch.

template <typename T, typename Step1, typename Step2>
static void vert_lift(T* a, int h, int w, int stride, int P, Step1 st1,
                      Step2 st2) {
    int sn = sn_of(h, P), dn = h - sn;
    auto S = [&](int i) { return a + (size_t)(2 * i + P) * stride; };
    auto D = [&](int j) { return a + (size_t)(2 * j + 1 - P) * stride; };
    // step over d rows (independent per row: parallel)
#ifdef _OPENMP
#pragma omp parallel for schedule(static) if ((int64_t)dn * w > 65536)
#endif
    for (int j = 0; j < dn; j++) {
        const T *l, *r;
        if (P == 0) {
            l = S(j);
            r = S(j + 1 < sn ? j + 1 : sn - 1);
        } else {
            l = S(j > 0 ? j - 1 : 0);
            r = S(j < sn - 1 ? j : sn - 1);
        }
        st1(D(j), l, r, w);
    }
    // step over s rows
#ifdef _OPENMP
#pragma omp parallel for schedule(static) if ((int64_t)sn * w > 65536)
#endif
    for (int i = 0; i < sn; i++) {
        const T *l, *r;
        if (P == 0) {
            l = D(i > 0 ? i - 1 : 0);
            r = D(i < dn - 1 ? i : dn - 1);
        } else {
            l = D(i);
            r = D(i + 1 < dn ? i + 1 : dn - 1);
        }
        st2(S(i), l, r, w);
    }
}

template <typename T, typename Step1, typename Step2>
static void vert_lift_packed(T* a, int h, int w, int stride, int P, Step1 st2,
                             Step2 st1) {
    // inverse direction: rows already packed [s | d]
    int sn = sn_of(h, P), dn = h - sn;
    auto S = [&](int i) { return a + (size_t)i * stride; };
    auto D = [&](int j) { return a + (size_t)(sn + j) * stride; };
#ifdef _OPENMP
#pragma omp parallel for schedule(static) if ((int64_t)sn * w > 65536)
#endif
    for (int i = 0; i < sn; i++) {
        const T *l, *r;
        if (P == 0) {
            l = D(i > 0 ? i - 1 : 0);
            r = D(i < dn - 1 ? i : dn - 1);
        } else {
            l = D(i);
            r = D(i + 1 < dn ? i + 1 : dn - 1);
        }
        st2(S(i), l, r, w);
    }
#ifdef _OPENMP
#pragma omp parallel for schedule(static) if ((int64_t)dn * w > 65536)
#endif
    for (int j = 0; j < dn; j++) {
        const T *l, *r;
        if (P == 0) {
            l = S(j);
            r = S(j + 1 < sn ? j + 1 : sn - 1);
        } else {
            l = S(j > 0 ? j - 1 : 0);
            r = S(j < sn - 1 ? j : sn - 1);
        }
        st1(D(j), l, r, w);
    }
}

template <typename T>
static void deinterleave_rows(T* a, int h, int w, int stride, int P,
                              T* scratch) {
    int sn = sn_of(h, P), dn = h - sn;
#ifdef _OPENMP
#pragma omp parallel for schedule(static) if ((int64_t)sn * w > 65536)
#endif
    for (int i = 0; i < sn; i++)
        std::memcpy(scratch + (size_t)i * w, a + (size_t)(2 * i + P) * stride,
                    (size_t)w * sizeof(T));
#ifdef _OPENMP
#pragma omp parallel for schedule(static) if ((int64_t)dn * w > 65536)
#endif
    for (int j = 0; j < dn; j++)
        std::memcpy(scratch + (size_t)(sn + j) * w,
                    a + (size_t)(2 * j + 1 - P) * stride,
                    (size_t)w * sizeof(T));
#ifdef _OPENMP
#pragma omp parallel for schedule(static) if ((int64_t)h * w > 65536)
#endif
    for (int y = 0; y < h; y++)
        std::memcpy(a + (size_t)y * stride, scratch + (size_t)y * w,
                    (size_t)w * sizeof(T));
}

template <typename T>
static void interleave_rows(T* a, int h, int w, int stride, int P,
                            T* scratch) {
    int sn = sn_of(h, P), dn = h - sn;
#ifdef _OPENMP
#pragma omp parallel for schedule(static) if ((int64_t)sn * w > 65536)
#endif
    for (int i = 0; i < sn; i++)
        std::memcpy(scratch + (size_t)(2 * i + P) * w, a + (size_t)i * stride,
                    (size_t)w * sizeof(T));
#ifdef _OPENMP
#pragma omp parallel for schedule(static) if ((int64_t)dn * w > 65536)
#endif
    for (int j = 0; j < dn; j++)
        std::memcpy(scratch + (size_t)(2 * j + 1 - P) * w,
                    a + (size_t)(sn + j) * stride, (size_t)w * sizeof(T));
#ifdef _OPENMP
#pragma omp parallel for schedule(static) if ((int64_t)h * w > 65536)
#endif
    for (int y = 0; y < h; y++)
        std::memcpy(a + (size_t)y * stride, scratch + (size_t)y * w,
                    (size_t)w * sizeof(T));
}

// ---------------------------------------------------------- 5/3 vertical
static void f53_vert(int32_t* a, int h, int w, int stride, int P,
                     int32_t* scratch) {
    if (h == 1) {
        if (P)
            for (int x = 0; x < w; x++) a[x] = wadd(a[x], a[x]);
        return;
    }
    vert_lift<int32_t>(
        a, h, w, stride, P,
        [](int32_t* d, const int32_t* l, const int32_t* r, int n) {
            for (int x = 0; x < n; x++) d[x] = wsub(d[x], wadd(l[x], r[x]) >> 1);
        },
        [](int32_t* s, const int32_t* l, const int32_t* r, int n) {
            for (int x = 0; x < n; x++)
                s[x] = wadd(s[x], wadd(wadd(l[x], r[x]), 2) >> 2);
        });
    deinterleave_rows(a, h, w, stride, P, scratch);
}

static void i53_vert(int32_t* a, int h, int w, int stride, int P,
                     int32_t* scratch) {
    if (h == 1) {
        if (P)
            for (int x = 0; x < w; x++) a[x] >>= 1;
        return;
    }
    vert_lift_packed<int32_t>(
        a, h, w, stride, P,
        [](int32_t* s, const int32_t* l, const int32_t* r, int n) {
            for (int x = 0; x < n; x++)
                s[x] = wsub(s[x], wadd(wadd(l[x], r[x]), 2) >> 2);
        },
        [](int32_t* d, const int32_t* l, const int32_t* r, int n) {
            for (int x = 0; x < n; x++) d[x] = wadd(d[x], wadd(l[x], r[x]) >> 1);
        });
    interleave_rows(a, h, w, stride, P, scratch);
}

// ---------------------------------------------------------- 9/7 vertical
static void f97_vert(float* a, int h, int w, int stride, int P,
                     float* scratch) {
    if (h == 1) return;
    int sn = sn_of(h, P), dn = h - sn;
    auto step_d = [&](float c) {
        return [c](float* d, const float* l, const float* r, int n) {
            for (int x = 0; x < n; x++) d[x] += c * (l[x] + r[x]);
        };
    };
    vert_lift<float>(a, h, w, stride, P, step_d(A97), step_d(B97));
    vert_lift<float>(a, h, w, stride, P, step_d(G97), step_d(D97));
    auto S = [&](int i) { return a + (size_t)(2 * i + P) * stride; };
    auto D = [&](int j) { return a + (size_t)(2 * j + 1 - P) * stride; };
    for (int i = 0; i < sn; i++) {
        float* s = S(i);
        for (int x = 0; x < w; x++) s[x] *= IK97;
    }
    for (int j = 0; j < dn; j++) {
        float* d = D(j);
        for (int x = 0; x < w; x++) d[x] *= K97;
    }
    deinterleave_rows(a, h, w, stride, P, scratch);
}

static void i97_vert(float* a, int h, int w, int stride, int P,
                     float* scratch) {
    if (h == 1) return;
    int sn = sn_of(h, P), dn = h - sn;
    auto S = [&](int i) { return a + (size_t)i * stride; };
    auto D = [&](int j) { return a + (size_t)(sn + j) * stride; };
    for (int i = 0; i < sn; i++) {
        float* s = S(i);
        for (int x = 0; x < w; x++) s[x] *= K97;
    }
    for (int j = 0; j < dn; j++) {
        float* d = D(j);
        for (int x = 0; x < w; x++) d[x] *= IK97;
    }
    auto step_m = [&](float c) {
        return [c](float* d, const float* l, const float* r, int n) {
            for (int x = 0; x < n; x++) d[x] -= c * (l[x] + r[x]);
        };
    };
    vert_lift_packed<float>(a, h, w, stride, P, step_m(D97), step_m(G97));
    vert_lift_packed<float>(a, h, w, stride, P, step_m(B97), step_m(A97));
    interleave_rows(a, h, w, stride, P, scratch);
}

struct LevelRect {
    int64_t x0, y0, x1, y1;
    int h() const { return (int)(y1 - y0); }
    int w() const { return (int)(x1 - x0); }
    LevelRect half() const {
        return {(x0 + 1) >> 1, (y0 + 1) >> 1, (x1 + 1) >> 1, (y1 + 1) >> 1};
    }
};

}  // namespace

extern "C" {

// Full multi-level forward DWT on arr[H, W] (row-major) whose top-left
// [rect.h x rect.w] holds the tile data; matches ops/dwt.py forward().
int dwt53_forward(int32_t* arr, int32_t W, int64_t x0, int64_t y0, int64_t x1,
                  int64_t y1, int32_t levels, int32_t num_threads) {
#ifdef _OPENMP
    omp_set_num_threads(ompshared::resolve_threads(num_threads));
#endif
    if (x1 <= x0 || y1 <= y0 || levels < 0 || levels > 38 ||
        x1 - x0 > 0x7FFFFFFF || y1 - y0 > 0x7FFFFFFF)
        return -1;  // corrupt geometry/headers: refuse
    LevelRect cur{x0, y0, x1, y1};
    int maxd = std::max(cur.h(), cur.w());
    // one scratch allocation for every level (level 0 is the largest)
    int32_t* scratch = new int32_t[(size_t)cur.h() * cur.w()];
    for (int lvl = 0; lvl < levels; lvl++) {
        int h = cur.h(), w = cur.w();
        if (h == 0 || w == 0) break;
        int py = (int)(cur.y0 & 1), px = (int)(cur.x0 & 1);
        f53_vert(arr, h, w, W, py, scratch);
#ifdef _OPENMP
#pragma omp parallel
#endif
        {
            int32_t* tmp = new int32_t[(size_t)maxd + 2];
#ifdef _OPENMP
#pragma omp for schedule(static)
#endif
            for (int y = 0; y < h; y++) f53_row(arr + (size_t)y * W, w, px, tmp);
            delete[] tmp;
        }
        cur = cur.half();
    }
    delete[] scratch;
    return 0;
}

int dwt53_inverse(int32_t* arr, int32_t W, int64_t x0, int64_t y0, int64_t x1,
                  int64_t y1, int32_t levels, int32_t num_threads) {
#ifdef _OPENMP
    omp_set_num_threads(ompshared::resolve_threads(num_threads));
#endif
    if (x1 <= x0 || y1 <= y0 || levels < 0 || levels > 38 ||
        x1 - x0 > 0x7FFFFFFF || y1 - y0 > 0x7FFFFFFF)
        return -1;  // corrupt geometry/headers: refuse
    LevelRect rects[40];
    rects[0] = {x0, y0, x1, y1};
    for (int i = 0; i < levels; i++) rects[i + 1] = rects[i].half();
    int maxd = std::max(rects[0].h(), rects[0].w());
    int32_t* scratch = new int32_t[(size_t)rects[0].h() * rects[0].w()];
    for (int lvl = levels; lvl >= 1; lvl--) {
        LevelRect cur = rects[lvl - 1];
        int h = cur.h(), w = cur.w();
        if (h == 0 || w == 0) continue;
        int py = (int)(cur.y0 & 1), px = (int)(cur.x0 & 1);
#ifdef _OPENMP
#pragma omp parallel
#endif
        {
            int32_t* tmp = new int32_t[(size_t)maxd + 2];
#ifdef _OPENMP
#pragma omp for schedule(static)
#endif
            for (int y = 0; y < h; y++) i53_row(arr + (size_t)y * W, w, px, tmp);
            delete[] tmp;
        }
        i53_vert(arr, h, w, W, py, scratch);
    }
    delete[] scratch;
    return 0;
}

int dwt97_forward(float* arr, int32_t W, int64_t x0, int64_t y0, int64_t x1,
                  int64_t y1, int32_t levels, int32_t num_threads) {
#ifdef _OPENMP
    omp_set_num_threads(ompshared::resolve_threads(num_threads));
#endif
    if (x1 <= x0 || y1 <= y0 || levels < 0 || levels > 38 ||
        x1 - x0 > 0x7FFFFFFF || y1 - y0 > 0x7FFFFFFF)
        return -1;  // corrupt geometry/headers: refuse
    LevelRect cur{x0, y0, x1, y1};
    int maxd = std::max(cur.h(), cur.w());
    // one scratch allocation for every level (level 0 is the largest)
    float* scratch = new float[(size_t)cur.h() * cur.w()];
    for (int lvl = 0; lvl < levels; lvl++) {
        int h = cur.h(), w = cur.w();
        if (h == 0 || w == 0) break;
        int py = (int)(cur.y0 & 1), px = (int)(cur.x0 & 1);
        f97_vert(arr, h, w, W, py, scratch);
#ifdef _OPENMP
#pragma omp parallel
#endif
        {
            float* tmp = new float[(size_t)maxd + 2];
#ifdef _OPENMP
#pragma omp for schedule(static)
#endif
            for (int y = 0; y < h; y++) f97_row(arr + (size_t)y * W, w, px, tmp);
            delete[] tmp;
        }
        cur = cur.half();
    }
    delete[] scratch;
    return 0;
}

int dwt97_inverse(float* arr, int32_t W, int64_t x0, int64_t y0, int64_t x1,
                  int64_t y1, int32_t levels, int32_t num_threads) {
#ifdef _OPENMP
    omp_set_num_threads(ompshared::resolve_threads(num_threads));
#endif
    if (x1 <= x0 || y1 <= y0 || levels < 0 || levels > 38 ||
        x1 - x0 > 0x7FFFFFFF || y1 - y0 > 0x7FFFFFFF)
        return -1;  // corrupt geometry/headers: refuse
    LevelRect rects[40];
    rects[0] = {x0, y0, x1, y1};
    for (int i = 0; i < levels; i++) rects[i + 1] = rects[i].half();
    int maxd = std::max(rects[0].h(), rects[0].w());
    float* scratch = new float[(size_t)rects[0].h() * rects[0].w()];
    for (int lvl = levels; lvl >= 1; lvl--) {
        LevelRect cur = rects[lvl - 1];
        int h = cur.h(), w = cur.w();
        if (h == 0 || w == 0) continue;
        int py = (int)(cur.y0 & 1), px = (int)(cur.x0 & 1);
#ifdef _OPENMP
#pragma omp parallel
#endif
        {
            float* tmp = new float[(size_t)maxd + 2];
#ifdef _OPENMP
#pragma omp for schedule(static)
#endif
            for (int y = 0; y < h; y++) i97_row(arr + (size_t)y * W, w, px, tmp);
            delete[] tmp;
        }
        i97_vert(arr, h, w, W, py, scratch);
    }
    delete[] scratch;
    return 0;
}

// Deadzone scalar quantization over packed bands: q = sign(v)*floor(|v|/step)
// (float32 divide, matching the numpy band loop in tile_processor.compress).
int quant_bands(const float* src, int32_t* dst, int32_t W, int32_t nbands,
                const int32_t* oys, const int32_t* oxs, const int32_t* hs,
                const int32_t* ws, const float* steps, int32_t roi_shift,
                int32_t num_threads) {
#ifdef _OPENMP
    omp_set_num_threads(ompshared::resolve_threads(num_threads));
#pragma omp parallel for schedule(dynamic)
#endif
    for (int b = 0; b < nbands; b++) {
        float step = steps[b];
        for (int y = 0; y < hs[b]; y++) {
            const float* sp = src + (size_t)(oys[b] + y) * W + oxs[b];
            int32_t* dp = dst + (size_t)(oys[b] + y) * W + oxs[b];
            for (int x = 0; x < ws[b]; x++) {
                float v = sp[x];
                int32_t q = (int32_t)std::floor(std::fabs(v) / step);
                if (v < 0) q = -q;
                dp[x] = roi_shift ? (q << roi_shift) : q;
            }
        }
    }
    return 0;
}

// Mid-point dequantization: rec = sign(q) * (|q| + 0.5) * step for |q| > 0.
int dequant_bands(const int32_t* src, float* dst, int32_t W, int32_t nbands,
                  const int32_t* oys, const int32_t* oxs, const int32_t* hs,
                  const int32_t* ws, const float* steps, int32_t num_threads) {
#ifdef _OPENMP
    omp_set_num_threads(ompshared::resolve_threads(num_threads));
#pragma omp parallel for schedule(dynamic)
#endif
    for (int b = 0; b < nbands; b++) {
        float step = steps[b];
        for (int y = 0; y < hs[b]; y++) {
            const int32_t* sp = src + (size_t)(oys[b] + y) * W + oxs[b];
            float* dp = dst + (size_t)(oys[b] + y) * W + oxs[b];
            for (int x = 0; x < ws[b]; x++) {
                int32_t q = sp[x];
                float mag = (float)(q < 0 ? -q : q);
                float rec = mag > 0.0f ? (mag + 0.5f) * step : 0.0f;
                dp[x] = q < 0 ? -rec : rec;
            }
        }
    }
    return 0;
}

// ROI maxshift unshift (decode): mag >= 2^shift ? mag >> shift : mag.
int roi_unshift(int32_t* a, int64_t n, int32_t shift, int32_t num_threads) {
    int32_t thresh = 1 << shift;
#ifdef _OPENMP
    omp_set_num_threads(ompshared::resolve_threads(num_threads));
#pragma omp parallel for schedule(static)
#endif
    for (int64_t i = 0; i < n; i++) {
        int32_t v = a[i];
        int32_t mag = v < 0 ? -v : v;
        if (mag >= thresh) mag >>= shift;
        a[i] = v < 0 ? -mag : mag;
    }
    return 0;
}

// Fused irreversible finish: out = clip(floor(a + add), lo, hi) in float32.
int finish_irrev(const float* a, int32_t* out, int64_t n, float add,
                 int32_t lo, int32_t hi, int32_t num_threads) {
#ifdef _OPENMP
    omp_set_num_threads(ompshared::resolve_threads(num_threads));
#pragma omp parallel for schedule(static)
#endif
    for (int64_t i = 0; i < n; i++) {
        // clamp in float BEFORE the int cast: corrupt streams can reach here
        // with huge coefficients, and float->int of out-of-range values is UB
        float v = std::floor(a[i] + add);
        if (!(v > (float)lo)) v = (float)lo;  // also catches NaN
        if (v > (float)hi) v = (float)hi;
        out[i] = (int32_t)v;
    }
    return 0;
}

// Fused reversible finish: out = clip(a + add, lo, hi).
int finish_rev(const int32_t* a, int32_t* out, int64_t n, int32_t add,
               int32_t lo, int32_t hi, int32_t num_threads) {
#ifdef _OPENMP
    omp_set_num_threads(ompshared::resolve_threads(num_threads));
#pragma omp parallel for schedule(static)
#endif
    for (int64_t i = 0; i < n; i++) {
        int32_t v = a[i] + add;
        out[i] = v < lo ? lo : (v > hi ? hi : v);
    }
    return 0;
}

// Per-pass effective R-D slopes after convex-hull pruning (mirror of
// t2/rate_control.py hull_effective_slopes; same arithmetic and epsilons).
int hull_slopes(const int64_t* rates, const double* dists,
                const int32_t* npasses, int64_t n, int32_t pmax,
                double* slopes, int32_t num_threads) {
#ifdef _OPENMP
    omp_set_num_threads(ompshared::resolve_threads(num_threads));
#pragma omp parallel
#endif
    {
        double* d_cum = new double[pmax];
        int* hull = new int[pmax];
#ifdef _OPENMP
#pragma omp for schedule(static)
#endif
        for (int64_t i = 0; i < n; i++) {
            double* srow = slopes + i * pmax;
            for (int k = 0; k < pmax; k++) srow[k] = 0.0;
            int np_i = npasses[i];
            if (np_i == 0) continue;
            const int64_t* r = rates + i * pmax;
            const double* dd = dists + i * pmax;
            double acc = 0.0;
            for (int k = 0; k < np_i; k++) {
                acc += dd[k];
                d_cum[k] = acc;
            }
            auto R = [&](int j) { return j >= 0 ? (double)r[j] : 0.0; };
            auto D = [&](int j) { return j >= 0 ? d_cum[j] : 0.0; };
            int hn = 0;
            for (int k = 0; k < np_i; k++) {
                if (d_cum[k] <= D(hn ? hull[hn - 1] : -1)) continue;
                while (hn) {
                    int prev = hn >= 2 ? hull[hn - 2] : -1;
                    double dr_top = R(hull[hn - 1]) - R(prev);
                    double s_top =
                        (D(hull[hn - 1]) - D(prev)) /
                        (dr_top > 1e-9 ? dr_top : 1e-9);
                    double dr_new = (double)r[k] - R(prev);
                    double s_new = (d_cum[k] - D(prev)) /
                                   (dr_new > 1e-9 ? dr_new : 1e-9);
                    if (s_new >= s_top)
                        hn--;
                    else
                        break;
                }
                hull[hn++] = k;
            }
            int prev_idx = -1;
            double r0 = 0.0, d0 = 0.0;
            for (int hi2 = 0; hi2 < hn; hi2++) {
                int h = hull[hi2];
                double dr = (double)r[h] - r0;
                double seg = (d_cum[h] - d0) / (dr > 1e-9 ? dr : 1e-9);
                for (int k = prev_idx + 1; k <= h; k++) srow[k] = seg;
                r0 = (double)r[h];
                d0 = d_cum[h];
                prev_idx = h;
            }
        }
        delete[] d_cum;
        delete[] hull;
    }
    return 0;
}

// Fused reversible color transform + DC shift (forward): inputs are the
// raw component planes; outputs are the shifted/transformed int32 planes.
int rct_dc_forward(const int32_t* r, const int32_t* g, const int32_t* b,
                   int32_t* y, int32_t* cb, int32_t* cr, int64_t n,
                   int32_t dc0, int32_t dc1, int32_t dc2,
                   int32_t num_threads) {
#ifdef _OPENMP
    omp_set_num_threads(ompshared::resolve_threads(num_threads));
#pragma omp parallel for schedule(static)
#endif
    for (int64_t i = 0; i < n; i++) {
        int32_t rr = r[i] - dc0, gg = g[i] - dc1, bb = b[i] - dc2;
        y[i] = (rr + 2 * gg + bb) >> 2;
        cb[i] = bb - gg;
        cr[i] = rr - gg;
    }
    return 0;
}

int rct_inverse_c(const int32_t* y, const int32_t* cb, const int32_t* cr,
                  int32_t* r, int32_t* g, int32_t* b, int64_t n,
                  int32_t num_threads) {
#ifdef _OPENMP
    omp_set_num_threads(ompshared::resolve_threads(num_threads));
#pragma omp parallel for schedule(static)
#endif
    for (int64_t i = 0; i < n; i++) {
        // read all inputs first: callers may alias outputs onto inputs
        int32_t yy = y[i], cbv = cb[i], crv = cr[i];
        int32_t gg = yy - ((cbv + crv) >> 2);
        r[i] = crv + gg;
        g[i] = gg;
        b[i] = cbv + gg;
    }
    return 0;
}

// Fused ICT + DC shift (forward), float32 in the numpy op order.
int ict_dc_forward(const int32_t* r, const int32_t* g, const int32_t* b,
                   float* y, float* cb, float* cr, int64_t n, int32_t dc0,
                   int32_t dc1, int32_t dc2, int32_t num_threads) {
    const float m00 = 0.299f, m01 = 0.587f, m02 = 0.114f;
    const float m10 = -0.168736f, m11 = -0.331264f, m12 = 0.5f;
    const float m20 = 0.5f, m21 = -0.418688f, m22 = -0.081312f;
#ifdef _OPENMP
    omp_set_num_threads(ompshared::resolve_threads(num_threads));
#pragma omp parallel for schedule(static)
#endif
    for (int64_t i = 0; i < n; i++) {
        float rr = (float)(r[i] - dc0), gg = (float)(g[i] - dc1),
              bb = (float)(b[i] - dc2);
        y[i] = m00 * rr + m01 * gg + m02 * bb;
        cb[i] = m10 * rr + m11 * gg + m12 * bb;
        cr[i] = m20 * rr + m21 * gg + m22 * bb;
    }
    return 0;
}

int ict_inverse_c(const float* y, const float* cb, const float* cr, float* r,
                  float* g, float* b, int64_t n, int32_t num_threads) {
    const float m02 = 1.402f, m11 = -0.344136f, m12 = -0.714136f,
                m21 = 1.772f;
#ifdef _OPENMP
    omp_set_num_threads(ompshared::resolve_threads(num_threads));
#pragma omp parallel for schedule(static)
#endif
    for (int64_t i = 0; i < n; i++) {
        // read all inputs first: callers may alias outputs onto inputs
        float yy = y[i], cbv = cb[i], crv = cr[i];
        r[i] = yy + m02 * crv;
        g[i] = yy + m11 * cbv + m12 * crv;
        b[i] = yy + m21 * cbv;
    }
    return 0;
}

// Copy packet-body contributions into padded per-codeblock rows.
int gather_segments(const uint8_t* body, const int32_t* c_row,
                    const int64_t* c_nb, const int64_t* c_off,
                    int64_t ncontrib, uint8_t* dst, int64_t stride,
                    int64_t* row_cursor) {
    for (int64_t i = 0; i < ncontrib; i++) {
        int32_t r = c_row[i];
        if (r < 0) continue;
        std::memcpy(dst + (int64_t)r * stride + row_cursor[r],
                    body + c_off[i], (size_t)c_nb[i]);
        row_cursor[r] += c_nb[i];
    }
    return 0;
}

// Scatter decoded [N, BH, BW] batch rows into a packed int32 plane.
int scatter_rows(const int32_t* batch, int32_t BH, int32_t BW,
                 const int32_t* rows, int64_t nrows, const int32_t* y0s,
                 const int32_t* x0s, const int32_t* hs, const int32_t* ws,
                 int32_t* dst, int32_t dstW, int32_t num_threads) {
#ifdef _OPENMP
    omp_set_num_threads(ompshared::resolve_threads(num_threads));
#pragma omp parallel for schedule(dynamic, 16)
#endif
    for (int64_t i = 0; i < nrows; i++) {
        int32_t r = rows[i];
        const int32_t* src = batch + (int64_t)r * BH * BW;
        for (int y = 0; y < hs[i]; y++)
            std::memcpy(dst + (int64_t)(y0s[i] + y) * dstW + x0s[i],
                        src + (int64_t)y * BW, (size_t)ws[i] * 4);
    }
    return 0;
}

// Gather codeblock rows from a packed int32 plane into the batch.
int gather_rows(const int32_t* src, int32_t srcW, const int32_t* rows,
                int64_t nrows, const int32_t* y0s, const int32_t* x0s,
                const int32_t* hs, const int32_t* ws, int32_t* batch,
                int32_t BH, int32_t BW, int32_t num_threads) {
#ifdef _OPENMP
    omp_set_num_threads(ompshared::resolve_threads(num_threads));
#pragma omp parallel for schedule(dynamic, 16)
#endif
    for (int64_t i = 0; i < nrows; i++) {
        int32_t r = rows[i];
        int32_t* dstrow = batch + (int64_t)r * BH * BW;
        for (int y = 0; y < hs[i]; y++)
            std::memcpy(dstrow + (int64_t)y * BW,
                        src + (int64_t)(y0s[i] + y) * srcW + x0s[i],
                        (size_t)ws[i] * 4);
    }
    return 0;
}

// Fused inverse RCT + DC shift + clip: one pass instead of two.
int rct_finish(const int32_t* y, const int32_t* cb, const int32_t* cr,
               int32_t* r, int32_t* g, int32_t* b, int64_t n, int32_t add,
               int32_t lo, int32_t hi, int32_t num_threads) {
#ifdef _OPENMP
    omp_set_num_threads(ompshared::resolve_threads(num_threads));
#pragma omp parallel for schedule(static)
#endif
    for (int64_t i = 0; i < n; i++) {
        int32_t yy = y[i], cbv = cb[i], crv = cr[i];
        int32_t gg = yy - ((cbv + crv) >> 2);
        int32_t rv = crv + gg + add, gv = gg + add, bv = cbv + gg + add;
        r[i] = rv < lo ? lo : (rv > hi ? hi : rv);
        g[i] = gv < lo ? lo : (gv > hi ? hi : gv);
        b[i] = bv < lo ? lo : (bv > hi ? hi : bv);
    }
    return 0;
}

// Fused inverse ICT + float finish (floor(x + add), clip) -> int32.
int ict_finish(const float* y, const float* cb, const float* cr, int32_t* r,
               int32_t* g, int32_t* b, int64_t n, float add, int32_t lo,
               int32_t hi, int32_t num_threads) {
    const float m02 = 1.402f, m11 = -0.344136f, m12 = -0.714136f,
                m21 = 1.772f;
#ifdef _OPENMP
    omp_set_num_threads(ompshared::resolve_threads(num_threads));
#pragma omp parallel for schedule(static)
#endif
    for (int64_t i = 0; i < n; i++) {
        float yy = y[i], cbv = cb[i], crv = cr[i];
        float rv = std::floor(yy + m02 * crv + add);
        float gv = std::floor(yy + m11 * cbv + m12 * crv + add);
        float bv = std::floor(yy + m21 * cbv + add);
        if (!(rv > (float)lo)) rv = (float)lo;
        if (rv > (float)hi) rv = (float)hi;
        if (!(gv > (float)lo)) gv = (float)lo;
        if (gv > (float)hi) gv = (float)hi;
        if (!(bv > (float)lo)) bv = (float)lo;
        if (bv > (float)hi) bv = (float)hi;
        r[i] = (int32_t)rv;
        g[i] = (int32_t)gv;
        b[i] = (int32_t)bv;
    }
    return 0;
}



// Fused decode scatter + dequantization: write each decoded codeblock row
// directly into the float coefficient plane at its band step (saves a full
// int32 staging plane pass; parity: reference PostDecompressFilters.h
// ScaleFilter applied per block in TileComponent::postProcess).
int scatter_rows_dequant(const int32_t* batch, int32_t BH, int32_t BW,
                         const int32_t* rows, int64_t nrows,
                         const int32_t* y0s, const int32_t* x0s,
                         const int32_t* hs, const int32_t* ws,
                         const float* steps, float* dst, int32_t dstW,
                         int32_t num_threads) {
#ifdef _OPENMP
    omp_set_num_threads(ompshared::resolve_threads(num_threads));
#pragma omp parallel for schedule(dynamic, 16)
#endif
    for (int64_t i = 0; i < nrows; i++) {
        int32_t r = rows[i];
        float step = steps[i];
        const int32_t* src = batch + (int64_t)r * BH * BW;
        for (int y = 0; y < hs[i]; y++) {
            const int32_t* sp = src + (int64_t)y * BW;
            float* dp = dst + (int64_t)(y0s[i] + y) * dstW + x0s[i];
            for (int x = 0; x < ws[i]; x++) {
                int32_t q = sp[x];
                float mag = (float)(q < 0 ? -q : q);
                float rec = mag > 0.0f ? (mag + 0.5f) * step : 0.0f;
                dp[x] = q < 0 ? -rec : rec;
            }
        }
    }
    return 0;
}


// fused one-pass min/max over an int32 batch (buffer-sizing prepass; a
// numpy .max()+.min() costs two single-threaded sweeps of a multi-hundred
// MB array)
int minmax_i32(const int32_t* a, int64_t n, int32_t* out_minmax,
               int32_t num_threads) {
#ifdef _OPENMP
    omp_set_num_threads(ompshared::resolve_threads(num_threads));
#endif
    int32_t mn = 0, mx = 0;  // zero-initialized: matches max(initial=0)
#ifdef _OPENMP
#pragma omp parallel for reduction(min : mn) reduction(max : mx) \
    schedule(static)
#endif
    for (int64_t i = 0; i < n; i++) {
        int32_t v = a[i];
        if (v < mn) mn = v;
        if (v > mx) mx = v;
    }
    out_minmax[0] = mn;
    out_minmax[1] = mx;
    return 0;
}

}  // extern "C"
