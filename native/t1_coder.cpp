// Batched EBCOT Tier-1 coder — native host implementation.
//
// Brand-new implementation from ITU-T T.800 Annex D + T.88 (same algorithm
// as grok_tpu/t1/ebcot_np.py, which is the bit-exact reference; this file is
// the fast host path the reference keeps in t1/t1_part1/, re-written from
// the standard, not copied). Lane order, pass structure, termination and
// byte-stuffing match the batched numpy coder exactly.
//
// Build: g++ -O3 -fPIC -shared -fopenmp -o libgrok_tpu_native.so t1_coder.cpp

#include <cstdint>
#include <cstring>
#include <cmath>
#include <algorithm>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

// ---------------------------------------------------------------- MQ coder
struct MQTables {
    uint16_t qe[47];
    uint8_t nmps[47], nlps[47], sw[47];
};

static const MQTables MQT = {
    {0x5601, 0x3401, 0x1801, 0x0AC1, 0x0521, 0x0221, 0x5601, 0x5401, 0x4801,
     0x3801, 0x3001, 0x2401, 0x1C01, 0x1601, 0x5601, 0x5401, 0x5101, 0x4801,
     0x3801, 0x3401, 0x3001, 0x2801, 0x2401, 0x2201, 0x1C01, 0x1801, 0x1601,
     0x1401, 0x1201, 0x1101, 0x0AC1, 0x09C1, 0x08A1, 0x0521, 0x0441, 0x02A1,
     0x0221, 0x0141, 0x0111, 0x0085, 0x0049, 0x0025, 0x0015, 0x0009, 0x0005,
     0x0001, 0x5601},
    {1,  2,  3,  4,  5,  38, 7,  8,  9,  10, 11, 12, 13, 29, 15, 16,
     17, 18, 19, 20, 21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32,
     33, 34, 35, 36, 37, 38, 39, 40, 41, 42, 43, 44, 45, 45, 46},
    {1,  6,  9,  12, 29, 33, 6,  14, 14, 14, 17, 18, 20, 21, 14, 14,
     15, 16, 17, 18, 19, 19, 20, 21, 22, 23, 24, 25, 26, 27, 28, 29,
     30, 31, 32, 33, 34, 35, 36, 37, 38, 39, 40, 41, 42, 43, 46},
    {1, 0, 0, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0,
     0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0},
};

constexpr int NUM_CTX = 19;
constexpr int CTX_ZC0 = 0, CTX_SC0 = 9, CTX_MR0 = 14, CTX_RL = 17, CTX_UNI = 18;

// codeblock style flags (T.800 Table A-19)
constexpr int STY_BYPASS = 0x01, STY_RESET = 0x02, STY_TERMALL = 0x04,
              STY_VSC = 0x08, STY_PTERM = 0x10, STY_SEGSYM = 0x20;

struct MQEncoder {
    uint32_t a = 0x8000, c = 0;
    int ct = 12;
    uint8_t* buf;  // buf[0] is the virtual carry byte
    int64_t pos = 0;
    int64_t cap = INT64_MAX;  // buffer capacity; writes past it set overflow
    bool overflow = false;
    uint8_t state[NUM_CTX];
    uint8_t mps[NUM_CTX];

    void reset_ctx() {
        std::memset(state, 0, sizeof(state));
        std::memset(mps, 0, sizeof(mps));
        state[CTX_ZC0] = 4;
        state[CTX_RL] = 3;
        state[CTX_UNI] = 46;
    }

    void init(uint8_t* b, int64_t capacity = INT64_MAX) {
        buf = b;
        buf[0] = 0;
        cap = capacity;
        overflow = false;
        reset_ctx();
    }

    // bounds-checked append: the buffer size in native.py is a heuristic with
    // no worst-case proof, so a pathological block must flag an error instead
    // of silently overrunning the heap
    inline void push(uint8_t v) {
        if (pos + 1 >= cap) {
            overflow = true;
            return;
        }
        buf[++pos] = v;
    }

    void byteout() {
        uint8_t b = buf[pos];
        if (b == 0xFF) {
            push((uint8_t)(c >> 20));
            c &= 0xFFFFF;
            ct = 7;
        } else {
            if ((c & 0x8000000u) == 0) {
                push((uint8_t)(c >> 19));
                c &= 0x7FFFF;
                ct = 8;
            } else {
                buf[pos] = (uint8_t)(b + 1);
                if (buf[pos] == 0xFF) {
                    c &= 0x7FFFFFF;
                    push((uint8_t)(c >> 20));
                    c &= 0xFFFFF;
                    ct = 7;
                } else {
                    push((uint8_t)(c >> 19));
                    c &= 0x7FFFF;
                    ct = 8;
                }
            }
        }
    }

    inline void renorm() {
        do {
            a <<= 1;
            c <<= 1;
            if (--ct == 0) byteout();
        } while ((a & 0x8000) == 0);
    }

    inline void encode(int bit, int ctx) {
        uint32_t qe = MQT.qe[state[ctx]];
        uint8_t s = state[ctx];
        if (bit == mps[ctx]) {
            a -= qe;
            if ((a & 0x8000) == 0) {
                if (a < qe)
                    a = qe;
                else
                    c += qe;
                state[ctx] = MQT.nmps[s];
                renorm();
            } else {
                c += qe;
            }
        } else {
            a -= qe;
            if (a < qe)
                c += qe;
            else
                a = qe;
            if (MQT.sw[s]) mps[ctx] = 1 - mps[ctx];
            state[ctx] = MQT.nlps[s];
            renorm();
        }
    }

    void flush() {
        uint32_t tempc = c + a;
        c |= 0xFFFF;
        if (c >= tempc) c -= 0x8000;
        c <<= ct;
        byteout();
        c <<= ct;
        byteout();
    }

    int64_t length() const {
        // bytes 1..pos, excluding a trailing 0xFF
        return pos + (buf[pos] != 0xFF ? 1 : 0) - 1;
    }

    // terminate the current codeword segment and restart for the next one
    // (TERMALL); returns the cumulative stream length so far
    int64_t terminate_restart() {
        flush();
        int64_t len = length();
        pos = len;  // buf[pos] = last counted byte (never 0xFF)
        a = 0x8000;
        c = 0;
        ct = buf[pos] == 0xFF ? 13 : 12;
        return len;
    }

    // ---- raw (bypass) emission into the same buffer --------------------
    // Raw bits go MSB-first with 0xFF stuffing, continuing at the byte
    // after the last MQ byte. Invariant: pos = index of last written byte;
    // stream length so far = pos (buffer index 0 is the virtual byte).
    uint32_t raw_tmp = 0;
    int raw_used = 0;   // bits used in the pending raw byte
    int raw_avail = 8;  // capacity of the pending byte (7 after an 0xFF)

    void raw_start() {
        raw_tmp = 0;
        raw_used = 0;
        raw_avail = buf[pos] == 0xFF ? 7 : 8;
    }

    void raw_bit(int v) {
        raw_tmp = (raw_tmp << 1) | (uint32_t)v;
        if (++raw_used == raw_avail) {
            push((uint8_t)raw_tmp);
            raw_avail = buf[pos] == 0xFF ? 7 : 8;
            raw_tmp = 0;
            raw_used = 0;
        }
    }

    // conservative decodable-prefix length while inside a raw pass
    int64_t raw_safe_len() const { return pos + (raw_used > 0 ? 1 : 0); }

    // byte-align the raw segment and restart MQ; returns stream length
    int64_t raw_terminate_restart_mq() {
        if (raw_used > 0) {
            raw_tmp <<= (raw_avail - raw_used);
            push((uint8_t)raw_tmp);
        }
        if (buf[pos] == 0xFF) push(0);  // raw segments can't end 0xFF
        int64_t len = pos;
        a = 0x8000;
        c = 0;
        ct = buf[pos] == 0xFF ? 13 : 12;
        return len;
    }
};

struct MQDecoder {
    uint32_t a = 0, c = 0;
    int ct = 0;
    const uint8_t* buf;
    int64_t bp = 0, end = 0;
    uint8_t state[NUM_CTX];
    uint8_t mps[NUM_CTX];

    inline uint8_t byte_at(int64_t i) const {
        return i < end ? buf[i] : 0xFF;
    }

    void bytein() {
        uint8_t b = byte_at(bp);
        uint8_t b1 = byte_at(bp + 1);
        if (b == 0xFF) {
            if (b1 > 0x8F) {
                c += 0xFF00;
                ct = 8;
            } else {
                bp++;
                c += (uint32_t)b1 << 9;
                ct = 7;
            }
        } else {
            bp++;
            c += (uint32_t)b1 << 8;
            ct = 8;
        }
    }

    void reset_ctx() {
        std::memset(state, 0, sizeof(state));
        std::memset(mps, 0, sizeof(mps));
        state[CTX_ZC0] = 4;
        state[CTX_RL] = 3;
        state[CTX_UNI] = 46;
    }

    void init_registers(const uint8_t* b, int64_t len) {
        // re-prime on a new codeword segment; context states persist
        buf = b;
        end = len;
        bp = 0;
        c = (uint32_t)byte_at(0) << 16;
        bytein();
        c <<= 7;
        ct -= 7;
        a = 0x8000;
    }

    void init(const uint8_t* b, int64_t len) {
        init_registers(b, len);
        reset_ctx();
    }

    inline void renorm() {
        do {
            if (ct == 0) bytein();
            a <<= 1;
            c <<= 1;
            ct--;
        } while ((a & 0x8000) == 0);
    }

    // ---- raw (bypass) reading ------------------------------------------
    const uint8_t* rbuf = nullptr;
    int64_t rpos = 0, rend = 0;
    uint32_t rtmp = 0;
    int rbits = 0;
    bool rprev_ff = false;

    void raw_init(const uint8_t* b, int64_t len) {
        rbuf = b;
        rpos = 0;
        rend = len;
        rbits = 0;
        rprev_ff = false;
    }

    inline int raw_bit() {
        if (rbits == 0) {
            uint32_t b = rpos < rend ? rbuf[rpos++] : 0xFF;
            rbits = rprev_ff ? 7 : 8;
            rprev_ff = b == 0xFF;
            rtmp = b;
        }
        return (int)((rtmp >> --rbits) & 1);
    }

    inline int decode(int ctx) {
        uint8_t s = state[ctx];
        uint32_t qe = MQT.qe[s];
        int d;
        a -= qe;
        if (((c >> 16) & 0xFFFF) < qe) {
            // LPS subinterval
            if (a < qe) {
                d = mps[ctx];
                state[ctx] = MQT.nmps[s];
            } else {
                d = 1 - mps[ctx];
                if (MQT.sw[s]) mps[ctx] = 1 - mps[ctx];
                state[ctx] = MQT.nlps[s];
            }
            a = qe;
            renorm();
        } else {
            c -= (uint32_t)qe << 16;
            if ((a & 0x8000) == 0) {
                if (a < qe) {
                    d = 1 - mps[ctx];
                    if (MQT.sw[s]) mps[ctx] = 1 - mps[ctx];
                    state[ctx] = MQT.nlps[s];
                } else {
                    d = mps[ctx];
                    state[ctx] = MQT.nmps[s];
                }
                renorm();
            } else {
                d = mps[ctx];
            }
        }
        return d;
    }
};

// --------------------------------------------------------- context tables
struct ZCLuts {
    uint8_t lut[4][45];
    uint8_t sc_ctx[9], sc_xor[9];
    ZCLuts() {
        auto normal = [](int h, int v, int d) -> int {
            if (h == 2) return 8;
            if (h == 1) {
                if (v >= 1) return 7;
                return d >= 1 ? 6 : 5;
            }
            if (v == 2) return 4;
            if (v == 1) return 3;
            return d >= 2 ? 2 : (d == 1 ? 1 : 0);
        };
        auto hh = [](int h, int v, int d) -> int {
            int a = h + v;
            if (d >= 3) return 8;
            if (d == 2) return a >= 1 ? 7 : 6;
            if (d == 1) return a >= 2 ? 5 : (a == 1 ? 4 : 3);
            return a >= 2 ? 2 : (a == 1 ? 1 : 0);
        };
        for (int h = 0; h < 3; h++)
            for (int v = 0; v < 3; v++)
                for (int d = 0; d < 5; d++) {
                    int i = h * 15 + v * 5 + d;
                    lut[0][i] = normal(h, v, d);
                    lut[2][i] = normal(h, v, d);
                    lut[1][i] = normal(v, h, d);
                    lut[3][i] = hh(h, v, d);
                }
        // sign coding, index (hbar+1)*3 + (vbar+1)
        const int tbl[3][3][2] = {
            // hbar=-1        hbar=0 is middle row? (indexing below)
            {{13, 1}, {12, 1}, {11, 1}},  // hbar=-1: vbar=-1,0,1
            {{10, 1}, {9, 0}, {10, 0}},   // hbar=0
            {{11, 0}, {12, 0}, {13, 0}},  // hbar=1
        };
        for (int hb = -1; hb <= 1; hb++)
            for (int vb = -1; vb <= 1; vb++) {
                int i = (hb + 1) * 3 + (vb + 1);
                sc_ctx[i] = tbl[hb + 1][vb + 1][0];
                sc_xor[i] = tbl[hb + 1][vb + 1][1];
            }
    }
};
static const ZCLuts ZC;

// ------------------------------------------------------------ block state
struct BlockCtx {
    int h, w, orient;       // actual extents
    int stride;             // padded row stride = w + 2
    bool vsc = false;       // vertically stripe-causal contexts
    // padded (h+2) x (w+2) state planes
    std::int64_t* mag;
    int8_t* sgn;
    uint8_t* sig;
    uint8_t* visited;
    uint8_t* refined;
    uint8_t* nbr;  // count of significant 8-neighbors (incremental)

    inline int idx(int y, int x) const { return (y + 1) * stride + (x + 1); }

    // call when (y, x) becomes significant
    inline void mark_sig(int i) {
        sig[i] = 1;
        nbr[i - stride - 1]++; nbr[i - stride]++; nbr[i - stride + 1]++;
        nbr[i - 1]++;                             nbr[i + 1]++;
        nbr[i + stride - 1]++; nbr[i + stride]++; nbr[i + stride + 1]++;
    }

    // VSC: at a stripe's bottom row the row below is treated insignificant
    inline bool cut_below(int y) const { return vsc && (y & 3) == 3; }

    inline int ncount(int y, int x) const {
        const uint8_t* s = sig;
        int i = idx(y, x);
        int n = s[i - 1] + s[i + 1] + s[i - stride] + s[i - stride - 1] +
                s[i - stride + 1];
        if (!cut_below(y))
            n += s[i + stride] + s[i + stride - 1] + s[i + stride + 1];
        return n;
    }

    inline int zc_ctx(int y, int x) const {
        const uint8_t* s = sig;
        int i = idx(y, x);
        bool cb = cut_below(y);
        int hc = s[i - 1] + s[i + 1];
        int vc = s[i - stride] + (cb ? 0 : s[i + stride]);
        int dc = s[i - stride - 1] + s[i - stride + 1] +
                 (cb ? 0 : s[i + stride - 1] + s[i + stride + 1]);
        return ZC.lut[orient][hc * 15 + vc * 5 + dc];
    }

    inline void sc_ctx(int y, int x, int* ctx, int* xr) const {
        int i = idx(y, x);
        auto contrib = [&](int j) -> int {
            return sig[j] ? (sgn[j] ? -1 : 1) : 0;
        };
        int hb = contrib(i - 1) + contrib(i + 1);
        int vb = contrib(i - stride) + (cut_below(y) ? 0 : contrib(i + stride));
        hb = hb < -1 ? -1 : (hb > 1 ? 1 : hb);
        vb = vb < -1 ? -1 : (vb > 1 ? 1 : vb);
        int k = (hb + 1) * 3 + (vb + 1);
        *ctx = ZC.sc_ctx[k];
        *xr = ZC.sc_xor[k];
    }
};

// distortion decrease helpers (squared-error change in coefficient units of
// 2^{2p}; caller scales by step^2 * bandnorm^2 outside)
static inline double dd_sig(int64_t v, int p) {
    // squared-error decrease in coefficient units when v becomes significant
    // at plane p: decoder goes from 0 to 1.5 * 2^p
    double dv = (double)v;
    double rec = 1.5 * std::ldexp(1.0, p);
    return dv * dv - (dv - rec) * (dv - rec);
}
static inline double dd_ref(int64_t v, int p) {
    // refinement at plane p: recon goes from (bits>=p+1) + 2^p
    // to (bits>=p) + 2^(p-1)
    double dv = (double)v;
    double rb = (double)((v >> (p + 1)) << (p + 1)) + std::ldexp(1.0, p);
    double ra = (double)((v >> p) << p) + std::ldexp(0.5, p);
    return (dv - rb) * (dv - rb) - (dv - ra) * (dv - ra);
}

// --------------------------------------------------------------- encoder
struct PassRecorder {
    int32_t* rates;     // [max_passes]
    double* dists;      // [max_passes]
    int count = 0;
    double dist_acc = 0.0;
};

static void enc_spp(BlockCtx& B, MQEncoder& mq, int plane, double* dist,
                    bool raw = false) {
    for (int y0 = 0; y0 < B.h; y0 += 4) {
        int rows = std::min(4, B.h - y0);
        for (int x = 0; x < B.w; x++) {
            for (int k = 0; k < rows; k++) {
                int y = y0 + k;
                int i = B.idx(y, x);
                if (B.sig[i]) continue;
                if (B.nbr[i] == 0) continue;
                if (B.ncount(y, x) == 0) continue;  // VSC can mask the count
                int bit = (int)((B.mag[i] >> plane) & 1);
                if (raw)
                    mq.raw_bit(bit);
                else
                    mq.encode(bit, B.zc_ctx(y, x));
                B.visited[i] = 1;
                if (bit) {
                    if (raw) {
                        mq.raw_bit((int)B.sgn[i]);
                    } else {
                        int sc, xr;
                        B.sc_ctx(y, x, &sc, &xr);
                        mq.encode((int)(B.sgn[i] ^ xr), sc);
                    }
                    B.mark_sig(i);
                    *dist += dd_sig(B.mag[i], plane);
                }
            }
        }
    }
}

static void enc_mrp(BlockCtx& B, MQEncoder& mq, int plane, double* dist,
                    bool raw = false) {
    for (int y0 = 0; y0 < B.h; y0 += 4) {
        int rows = std::min(4, B.h - y0);
        for (int x = 0; x < B.w; x++) {
            for (int k = 0; k < rows; k++) {
                int y = y0 + k;
                int i = B.idx(y, x);
                if (!B.sig[i] || B.visited[i]) continue;
                int bit = (int)((B.mag[i] >> plane) & 1);
                if (raw) {
                    mq.raw_bit(bit);
                } else {
                    int ctx = B.refined[i]
                                  ? CTX_MR0 + 2
                                  : (B.ncount(y, x) > 0 ? CTX_MR0 + 1 : CTX_MR0);
                    mq.encode(bit, ctx);
                }
                B.refined[i] = 1;
                *dist += dd_ref(B.mag[i], plane);
            }
        }
    }
}

static void enc_cup(BlockCtx& B, MQEncoder& mq, int plane, double* dist,
                    bool segsym) {
    for (int y0 = 0; y0 < B.h; y0 += 4) {
        int rows = std::min(4, B.h - y0);
        bool full = rows == 4;
        for (int x = 0; x < B.w; x++) {
            int first_k = 4;
            bool rl = full;
            if (rl) {
                for (int k = 0; k < 4; k++) {
                    int y = y0 + k;
                    int i = B.idx(y, x);
                    if (B.sig[i] || B.visited[i] || B.nbr[i] != 0) {
                        rl = false;
                        break;
                    }
                }
                if (!rl && B.vsc) {
                    // VSC masks below-stripe neighbors: redo the exact test
                    rl = full;
                    for (int k = 0; k < 4 && rl; k++) {
                        int y = y0 + k;
                        int i = B.idx(y, x);
                        if (B.sig[i] || B.visited[i] || B.ncount(y, x) != 0)
                            rl = false;
                    }
                }
            }
            if (rl) {
                for (int k = 0; k < 4; k++) {
                    if ((B.mag[B.idx(y0 + k, x)] >> plane) & 1) {
                        first_k = k;
                        break;
                    }
                }
                mq.encode(first_k < 4 ? 1 : 0, CTX_RL);
                if (first_k == 4) continue;  // whole column stays zero
                mq.encode((first_k >> 1) & 1, CTX_UNI);
                mq.encode(first_k & 1, CTX_UNI);
            }
            for (int k = (rl ? first_k : 0); k < rows; k++) {
                int y = y0 + k;
                int i = B.idx(y, x);
                if (B.sig[i] || B.visited[i]) continue;
                int bit;
                if (rl && k == first_k) {
                    bit = 1;  // significance implied by the run interrupt
                } else {
                    bit = (int)((B.mag[i] >> plane) & 1);
                    mq.encode(bit, B.zc_ctx(y, x));
                }
                if (bit) {
                    int sc, xr;
                    B.sc_ctx(y, x, &sc, &xr);
                    mq.encode((int)(B.sgn[i] ^ xr), sc);
                    B.mark_sig(i);
                    *dist += dd_sig(B.mag[i], plane);
                }
            }
        }
    }
    if (segsym) {  // segmentation symbol 1010 in the UNIFORM context
        mq.encode(1, CTX_UNI);
        mq.encode(0, CTX_UNI);
        mq.encode(1, CTX_UNI);
        mq.encode(0, CTX_UNI);
    }
}

// --------------------------------------------------------------- decoder
static void dec_spp(BlockCtx& B, MQDecoder& mq, int plane, bool raw = false) {
    for (int y0 = 0; y0 < B.h; y0 += 4) {
        int rows = std::min(4, B.h - y0);
        for (int x = 0; x < B.w; x++) {
            for (int k = 0; k < rows; k++) {
                int y = y0 + k;
                int i = B.idx(y, x);
                if (B.sig[i]) continue;
                if (B.nbr[i] == 0) continue;
                if (B.ncount(y, x) == 0) continue;  // VSC can mask the count
                int bit = raw ? mq.raw_bit() : mq.decode(B.zc_ctx(y, x));
                B.visited[i] = 1;
                if (bit) {
                    int sbit;
                    if (raw) {
                        sbit = mq.raw_bit();
                        B.sgn[i] = (int8_t)sbit;
                    } else {
                        int sc, xr;
                        B.sc_ctx(y, x, &sc, &xr);
                        sbit = mq.decode(sc);
                        B.sgn[i] = (int8_t)(sbit ^ xr);
                    }
                    B.mag[i] |= (int64_t)1 << plane;
                    B.mark_sig(i);
                }
            }
        }
    }
}

static void dec_mrp(BlockCtx& B, MQDecoder& mq, int plane, bool raw = false) {
    for (int y0 = 0; y0 < B.h; y0 += 4) {
        int rows = std::min(4, B.h - y0);
        for (int x = 0; x < B.w; x++) {
            for (int k = 0; k < rows; k++) {
                int y = y0 + k;
                int i = B.idx(y, x);
                if (!B.sig[i] || B.visited[i]) continue;
                int bit;
                if (raw) {
                    bit = mq.raw_bit();
                } else {
                    int ctx = B.refined[i]
                                  ? CTX_MR0 + 2
                                  : (B.ncount(y, x) > 0 ? CTX_MR0 + 1 : CTX_MR0);
                    bit = mq.decode(ctx);
                }
                if (bit) B.mag[i] |= (int64_t)1 << plane;
                B.refined[i] = 1;
            }
        }
    }
}

static void dec_cup(BlockCtx& B, MQDecoder& mq, int plane, bool segsym) {
    for (int y0 = 0; y0 < B.h; y0 += 4) {
        int rows = std::min(4, B.h - y0);
        bool full = rows == 4;
        for (int x = 0; x < B.w; x++) {
            int first_k = 0;
            bool rl = full;
            if (rl) {
                for (int k = 0; k < 4; k++) {
                    int y = y0 + k;
                    int i = B.idx(y, x);
                    if (B.sig[i] || B.visited[i] || B.nbr[i] != 0) {
                        rl = false;
                        break;
                    }
                }
                if (!rl && B.vsc) {
                    rl = full;
                    for (int k = 0; k < 4 && rl; k++) {
                        int y = y0 + k;
                        int i = B.idx(y, x);
                        if (B.sig[i] || B.visited[i] || B.ncount(y, x) != 0)
                            rl = false;
                    }
                }
            }
            if (rl) {
                if (!mq.decode(CTX_RL)) continue;
                int b1 = mq.decode(CTX_UNI);
                int b0 = mq.decode(CTX_UNI);
                first_k = (b1 << 1) | b0;
            }
            for (int k = (rl ? first_k : 0); k < rows; k++) {
                int y = y0 + k;
                int i = B.idx(y, x);
                if (B.sig[i] || B.visited[i]) continue;
                int bit;
                if (rl && k == first_k) {
                    bit = 1;
                } else {
                    bit = mq.decode(B.zc_ctx(y, x));
                }
                if (bit) {
                    int sc, xr;
                    B.sc_ctx(y, x, &sc, &xr);
                    int sbit = mq.decode(sc);
                    B.sgn[i] = (int8_t)(sbit ^ xr);
                    B.mag[i] |= (int64_t)1 << plane;
                    B.mark_sig(i);
                }
            }
        }
    }
    if (segsym) {  // consume (and ignore) the 1010 segmentation symbol
        mq.decode(CTX_UNI);
        mq.decode(CTX_UNI);
        mq.decode(CTX_UNI);
        mq.decode(CTX_UNI);
    }
}

struct Workspace {
    std::int64_t* mag;
    int8_t* sgn;
    uint8_t* sig;
    uint8_t* visited;
    uint8_t* refined;
};

}  // namespace

extern "C" {

int t1_encode_cblks(const int64_t* coeffs, const int32_t* heights,
                    const int32_t* widths, const int32_t* orients,
                    const int32_t* styles, int64_t n,
                    int32_t H, int32_t W, uint8_t* out_data, int64_t max_bytes,
                    int64_t* out_lengths, int32_t* out_numbps,
                    int32_t* out_npasses, int64_t* out_pass_rates,
                    double* out_pass_dist, int32_t max_passes,
                    int32_t num_threads) {
    const int stride = W + 2;
    const int64_t plane_sz = (int64_t)(H + 2) * stride;

#ifdef _OPENMP
    if (num_threads > 0) omp_set_num_threads(num_threads);
#pragma omp parallel
#endif
    {
        // per-thread workspace
        std::int64_t* mag = new std::int64_t[plane_sz];
        int8_t* sgn = new int8_t[plane_sz];
        uint8_t* sig = new uint8_t[plane_sz];
        uint8_t* visited = new uint8_t[plane_sz];
        uint8_t* refined = new uint8_t[plane_sz];
        uint8_t* nbr = new uint8_t[plane_sz];

#ifdef _OPENMP
#pragma omp for schedule(dynamic)
#endif
        for (int64_t b = 0; b < n; b++) {
            int h = heights[b], w = widths[b];
            std::memset(mag, 0, plane_sz * sizeof(std::int64_t));
            std::memset(sgn, 0, plane_sz);
            std::memset(sig, 0, plane_sz);
            std::memset(visited, 0, plane_sz);
            std::memset(refined, 0, plane_sz);
            std::memset(nbr, 0, plane_sz);

            const int64_t* src = coeffs + b * (int64_t)H * W;
            int64_t maxmag = 0;
            for (int y = 0; y < h; y++)
                for (int x = 0; x < w; x++) {
                    int64_t v = src[y * W + x];
                    int64_t av = v < 0 ? -v : v;
                    mag[(y + 1) * stride + (x + 1)] = av;
                    sgn[(y + 1) * stride + (x + 1)] = v < 0 ? 1 : 0;
                    if (av > maxmag) maxmag = av;
                }
            int numbps = 0;
            while (maxmag >> numbps) numbps++;
            int npasses = numbps > 0 ? 3 * numbps - 2 : 0;
            out_numbps[b] = numbps;
            out_npasses[b] = npasses;
            for (int i = 0; i < max_passes; i++) {
                out_pass_rates[b * max_passes + i] = 0;
                out_pass_dist[b * max_passes + i] = 0.0;
            }
            if (npasses == 0) {
                out_lengths[b] = 0;
                continue;
            }

            int style = styles ? styles[b] : 0;
            BlockCtx B{h, w, orients[b], stride,
                       (style & STY_VSC) != 0, mag, sgn, sig, visited, refined,
                       nbr};
            MQEncoder mq;
            mq.init(out_data + b * max_bytes, max_bytes);
            bool reset = (style & STY_RESET) != 0;
            bool segsym = (style & STY_SEGSYM) != 0;
            bool termall = (style & STY_TERMALL) != 0;
            bool bypass = (style & STY_BYPASS) != 0;

            // pass p type: 0 SPP, 1 MRP, 2 CUP; raw from the 11th pass on
            auto typ = [](int p) { return p == 0 ? 2 : (p - 1) % 3; };
            auto is_raw = [&](int p) { return bypass && p >= 10 && typ(p) != 2; };
            auto term_after = [&](int p) {
                if (termall) return true;
                if (!bypass) return false;
                int t = typ(p);
                return p == 9 || (p > 9 && (t == 1 || t == 2));
            };

            int pass_i = 0;
            bool in_raw = false;
            bool last_term = false;
            for (int plane = numbps - 1; plane >= 0; plane--) {
                double d;
                auto end_pass = [&](double dd) {
                    bool term = term_after(pass_i);
                    int64_t r;
                    if (term)
                        r = in_raw ? mq.raw_terminate_restart_mq()
                                   : mq.terminate_restart();
                    else
                        r = in_raw ? mq.raw_safe_len()
                                   : mq.pos + (27 - mq.ct + 7) / 8;
                    out_pass_rates[b * max_passes + pass_i] = r;
                    out_pass_dist[b * max_passes + pass_i] = dd;
                    pass_i++;
                    last_term = term;
                    if (reset) mq.reset_ctx();
                    if (term) {
                        in_raw = is_raw(pass_i);
                        if (in_raw) mq.raw_start();
                    }
                };
                if (plane < numbps - 1) {
                    d = 0;
                    enc_spp(B, mq, plane, &d, in_raw);
                    end_pass(d);
                    d = 0;
                    enc_mrp(B, mq, plane, &d, in_raw);
                    end_pass(d);
                }
                d = 0;
                enc_cup(B, mq, plane, &d, segsym);
                end_pass(d);
                std::memset(visited, 0, plane_sz);
            }
            int64_t len;
            if (last_term) {
                len = out_pass_rates[b * max_passes + npasses - 1];
            } else if (in_raw) {
                len = mq.raw_terminate_restart_mq();
            } else {
                mq.flush();
                len = mq.length();
            }
            // a negative length flags buffer overflow to the Python caller
            out_lengths[b] = mq.overflow ? -1 : len;
            // clamp conservative per-pass rates to the final length
            for (int i = 0; i < npasses; i++) {
                int64_t r = out_pass_rates[b * max_passes + i];
                if (r > len || i == npasses - 1)
                    out_pass_rates[b * max_passes + i] = len;
            }
        }
        delete[] mag;
        delete[] sgn;
        delete[] sig;
        delete[] visited;
        delete[] refined;
        delete[] nbr;
    }
    return 0;
}

int t1_decode_cblks(const uint8_t* data, const int64_t* lengths,
                    const int32_t* numbps, const int32_t* npasses,
                    const int32_t* heights, const int32_t* widths,
                    const int32_t* orients, const int32_t* styles,
                    const int64_t* seg_lengths, int32_t max_segs,
                    int64_t n, int32_t H, int32_t W,
                    int64_t max_bytes, int64_t* out_coeffs,
                    int32_t num_threads) {
    const int stride = W + 2;
    const int64_t plane_sz = (int64_t)(H + 2) * stride;

#ifdef _OPENMP
    if (num_threads > 0) omp_set_num_threads(num_threads);
#pragma omp parallel
#endif
    {
        std::int64_t* mag = new std::int64_t[plane_sz];
        int8_t* sgn = new int8_t[plane_sz];
        uint8_t* sig = new uint8_t[plane_sz];
        uint8_t* visited = new uint8_t[plane_sz];
        uint8_t* refined = new uint8_t[plane_sz];
        uint8_t* nbr = new uint8_t[plane_sz];

#ifdef _OPENMP
#pragma omp for schedule(dynamic)
#endif
        for (int64_t b = 0; b < n; b++) {
            int h = heights[b], w = widths[b];
            std::memset(mag, 0, plane_sz * sizeof(std::int64_t));
            std::memset(sgn, 0, plane_sz);
            std::memset(sig, 0, plane_sz);
            std::memset(visited, 0, plane_sz);
            std::memset(refined, 0, plane_sz);
            std::memset(nbr, 0, plane_sz);
            int64_t* dst = out_coeffs + b * (int64_t)H * W;
            std::memset(dst, 0, (int64_t)H * W * sizeof(int64_t));

            int nb = numbps[b];
            int np = npasses[b];
            if (nb <= 0 || np <= 0) continue;

            int style = styles ? styles[b] : 0;
            BlockCtx B{h, w, orients[b], stride,
                       (style & STY_VSC) != 0, mag, sgn, sig, visited, refined,
                       nbr};
            bool reset = (style & STY_RESET) != 0;
            bool segsym = (style & STY_SEGSYM) != 0;
            bool termall = (style & STY_TERMALL) != 0;
            bool bypass = (style & STY_BYPASS) != 0;
            bool segmented = (termall || bypass) && seg_lengths;
            const int64_t* segl =
                seg_lengths ? seg_lengths + b * max_segs : nullptr;

            auto typ = [](int p) { return p == 0 ? 2 : (p - 1) % 3; };
            auto is_raw = [&](int p) { return bypass && p >= 10 && typ(p) != 2; };
            auto term_after = [&](int p) {
                if (termall) return true;
                if (!bypass) return false;
                int t = typ(p);
                return p == 9 || (p > 9 && (t == 1 || t == 2));
            };

            MQDecoder mq;
            int64_t seg_off = 0;
            int seg_i = 0;
            bool in_raw = false;
            mq.init(data + b * max_bytes,
                    segmented ? segl[0] : lengths[b]);
            auto next_seg = [&](int finished_pass) {
                if (!segmented) return;
                if (!term_after(finished_pass)) return;
                seg_off += segl[seg_i];
                seg_i++;
                int64_t sl = seg_i < max_segs ? segl[seg_i] : 0;
                in_raw = is_raw(finished_pass + 1);
                if (in_raw)
                    mq.raw_init(data + b * max_bytes + seg_off, sl);
                else
                    mq.init_registers(data + b * max_bytes + seg_off, sl);
            };

            int pass_i = 0;
            bool done = false;
            for (int plane = nb - 1; plane >= 0 && !done; plane--) {
                if (plane < nb - 1) {
                    if (pass_i >= np) { done = true; break; }
                    dec_spp(B, mq, plane, in_raw);
                    pass_i++;
                    if (reset) mq.reset_ctx();
                    if (pass_i < np) next_seg(pass_i - 1);
                    if (pass_i >= np) { done = true; break; }
                    dec_mrp(B, mq, plane, in_raw);
                    pass_i++;
                    if (reset) mq.reset_ctx();
                    if (pass_i < np) next_seg(pass_i - 1);
                }
                if (pass_i >= np) { done = true; break; }
                dec_cup(B, mq, plane, segsym);
                pass_i++;
                if (reset) mq.reset_ctx();
                if (pass_i < np) next_seg(pass_i - 1);
                std::memset(visited, 0, plane_sz);
            }
            for (int y = 0; y < h; y++)
                for (int x = 0; x < w; x++) {
                    int64_t v = mag[(y + 1) * stride + (x + 1)];
                    if (sgn[(y + 1) * stride + (x + 1)]) v = -v;
                    dst[y * W + x] = v;
                }
        }
        delete[] mag;
        delete[] sgn;
        delete[] sig;
        delete[] refined;
        delete[] visited;
        delete[] nbr;
    }
    return 0;
}

}  // extern "C"
