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

// merged state/MPS representation: one byte 2*s + mps per context, with
// transition bytes precomputed (removes the MPS array + switch branch)
struct MqMergedState {
    uint16_t qe;
    uint8_t nmps, nlps;
};
struct MqMerged {
    MqMergedState st[94];
    MqMerged() {
        for (int sidx = 0; sidx < 47; sidx++) {
            for (int mps = 0; mps < 2; mps++) {
                MqMergedState& e = st[2 * sidx + mps];
                e.qe = MQT.qe[sidx];
                e.nmps = (uint8_t)(2 * MQT.nmps[sidx] + mps);
                int nm = MQT.sw[sidx] ? 1 - mps : mps;
                e.nlps = (uint8_t)(2 * MQT.nlps[sidx] + nm);
            }
        }
    }
};
static const MqMerged MQM;
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
    uint8_t state[NUM_CTX];  // merged 2*s + mps

    void reset_ctx() {
        std::memset(state, 0, sizeof(state));
        state[CTX_ZC0] = 2 * 4;
        state[CTX_RL] = 2 * 3;
        state[CTX_UNI] = 2 * 46;
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
        uint8_t s = state[ctx];
        const MqMergedState& e = MQM.st[s];
        uint32_t qe = e.qe;
        if (__builtin_expect(bit == (s & 1), 1)) {
            a -= qe;
            if (__builtin_expect((a & 0x8000) == 0, 0)) {
                if (a < qe)
                    a = qe;
                else
                    c += qe;
                state[ctx] = e.nmps;
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
            state[ctx] = e.nlps;
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
    uint8_t state[NUM_CTX];  // merged 2*s + mps

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
        state[CTX_ZC0] = 2 * 4;
        state[CTX_RL] = 2 * 3;
        state[CTX_UNI] = 2 * 46;
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
        const MqMergedState& e = MQM.st[s];
        uint32_t qe = e.qe;
        int d;
        a -= qe;
        if (__builtin_expect(((c >> 16) & 0xFFFF) < qe, 0)) {
            // LPS subinterval
            if (a < qe) {
                d = s & 1;
                state[ctx] = e.nmps;
            } else {
                d = 1 - (s & 1);
                state[ctx] = e.nlps;
            }
            a = qe;
            renorm();
        } else {
            c -= (uint32_t)qe << 16;
            if (__builtin_expect((a & 0x8000) == 0, 0)) {
                if (a < qe) {
                    d = 1 - (s & 1);
                    state[ctx] = e.nlps;
                } else {
                    d = s & 1;
                    state[ctx] = e.nmps;
                }
                renorm();
            } else {
                d = s & 1;
            }
        }
        return d;
    }
};

// --------------------------------------------------------- context tables

// ------------------------------------------------------------ context LUTs
// Flags-word formulation: one uint32 per sample in a padded (h+2)x(w+2)
// plane carries the entire coding state, so every pass decision is a single
// load + mask instead of gathers over separate sig/visited/refined/nbr
// planes (the reference keeps an equivalent packed-flags scheme in its T1;
// this layout and the LUT indexing are our own).
//
//   bits 0-7  : significance of the 8 neighbors (W E N S NW NE SW SE)
//   bits 8-11 : sign of the significant W/E/N/S neighbors (1 = negative)
//   bit 12    : SIG      — this sample is significant
//   bit 13    : VISITED  — coded in an earlier pass of the current plane
//   bit 14    : REFINED  — has been magnitude-refined before
//   bit 15    : SELF_SGN — this sample's own sign (encoder prefills)
constexpr uint32_t F_W = 1u << 0, F_E = 1u << 1, F_N = 1u << 2, F_S = 1u << 3;
constexpr uint32_t F_NW = 1u << 4, F_NE = 1u << 5, F_SW = 1u << 6,
                   F_SE = 1u << 7;
constexpr uint32_t F_SGN_W = 1u << 8, F_SGN_E = 1u << 9, F_SGN_N = 1u << 10,
                   F_SGN_S = 1u << 11;
constexpr uint32_t F_SIG = 1u << 12, F_VISITED = 1u << 13,
                   F_REFINED = 1u << 14, F_SELF_SGN = 1u << 15;
constexpr uint32_t F_NBR = 0xFFu;
// contributions of the row below, ignored at a VSC stripe bottom
constexpr uint32_t F_VSC_CUT = F_S | F_SW | F_SE | F_SGN_S;

struct FlagLuts {
    uint8_t zc[4][256];               // [orient][neighbor-significance bits]
    uint8_t sc_ctx[256], sc_xor[256]; // [(sig W E N S) | (sgn W E N S) << 4]
    FlagLuts() {
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
        for (int bits = 0; bits < 256; bits++) {
            int hc = !!(bits & F_W) + !!(bits & F_E);
            int vc = !!(bits & F_N) + !!(bits & F_S);
            int dc = !!(bits & F_NW) + !!(bits & F_NE) + !!(bits & F_SW) +
                     !!(bits & F_SE);
            zc[0][bits] = (uint8_t)normal(hc, vc, dc);
            zc[2][bits] = (uint8_t)normal(hc, vc, dc);
            zc[1][bits] = (uint8_t)normal(vc, hc, dc);
            zc[3][bits] = (uint8_t)hh(hc, vc, dc);
        }
        // sign coding (T.800 Table D-3), rows hbar=-1..1, cols vbar=-1..1
        const int tbl[3][3][2] = {
            {{13, 1}, {12, 1}, {11, 1}},
            {{10, 1}, {9, 0}, {10, 0}},
            {{11, 0}, {12, 0}, {13, 0}},
        };
        for (int idx = 0; idx < 256; idx++) {
            auto contrib = [&](int sigbit, int sgnbit) -> int {
                if (!(idx & sigbit)) return 0;
                return (idx & sgnbit) ? -1 : 1;
            };
            int hb = contrib(1, 16) + contrib(2, 32);   // W, E
            int vb = contrib(4, 64) + contrib(8, 128);  // N, S
            hb = hb < -1 ? -1 : (hb > 1 ? 1 : hb);
            vb = vb < -1 ? -1 : (vb > 1 ? 1 : vb);
            sc_ctx[idx] = (uint8_t)tbl[hb + 1][vb + 1][0];
            sc_xor[idx] = (uint8_t)tbl[hb + 1][vb + 1][1];
        }
    }
};
static const FlagLuts FL;

// sign-coding LUT index from a (VSC-masked) flags word
static inline uint32_t sc_index(uint32_t f) {
    return (f & 0x0Fu) | ((f >> 4) & 0xF0u);
}

// distortion decrease helpers (squared-error change in coefficient units of
// 2^{2p}; caller scales by step^2 * bandnorm^2 outside)
static inline double dd_sig(int64_t v, int p) {
    double dv = (double)v;
    double rec = 1.5 * std::ldexp(1.0, p);
    return dv * dv - (dv - rec) * (dv - rec);
}
static inline double dd_ref(int64_t v, int p) {
    double dv = (double)v;
    double rb = (double)((v >> (p + 1)) << (p + 1)) + std::ldexp(1.0, p);
    double ra = (double)((v >> p) << p) + std::ldexp(0.5, p);
    return (dv - rb) * (dv - rb) - (dv - ra) * (dv - ra);
}

// ------------------------------------------------------------ block state
struct BlockCtx {
    int h, w, orient, stride;  // stride = W + 2 (padded row)
    bool vsc;
    uint32_t* flags;  // padded flags plane
    uint32_t* mag;    // padded |coefficient| plane
    uint64_t* colact = nullptr;  // per-stripe column-activity bits (w <= 64)
    bool use_bits = false;
    uint64_t wmask = 0;
    uint32_t vmask[4];

    inline int idx(int y, int x) const { return (y + 1) * stride + (x + 1); }

    void init_vmask() {
        vmask[0] = vmask[1] = vmask[2] = ~0u;
        vmask[3] = vsc ? ~F_VSC_CUT : ~0u;
    }

    void init_colact(uint64_t* buf) {
        colact = buf;
        use_bits = w <= 64;
        wmask = w >= 64 ? ~0ULL : ((1ULL << w) - 1);
        if (use_bits) std::memset(colact, 0, ((h + 3) / 4) * sizeof(uint64_t));
    }

    // call when block position (y, x) / padded index i becomes significant
    inline void mark_sig(int i, uint32_t neg, int y, int x) {
        const int s = stride;
        flags[i] |= F_SIG | (neg ? F_SELF_SGN : 0u);
        flags[i - 1] |= F_E | (neg ? F_SGN_E : 0u);
        flags[i + 1] |= F_W | (neg ? F_SGN_W : 0u);
        flags[i - s] |= F_S | (neg ? F_SGN_S : 0u);
        flags[i + s] |= F_N | (neg ? F_SGN_N : 0u);
        flags[i - s - 1] |= F_SE;
        flags[i - s + 1] |= F_SW;
        flags[i + s - 1] |= F_NE;
        flags[i + s + 1] |= F_NW;
        if (use_bits) {
            uint64_t m = (x > 0 ? 7ULL << (x - 1) : 3ULL) & wmask;
            colact[y >> 2] |= m;
            if (y > 0) colact[(y - 1) >> 2] |= m;
            if (y + 1 < h) colact[(y + 1) >> 2] |= m;
        }
    }
};

// --------------------------------------------------------------- encoder
static void enc_spp(BlockCtx& B, MQEncoder& mq, int plane, double* dist,
                    bool raw = false) {
    const int s = B.stride;
    const uint8_t* zc = FL.zc[B.orient];
    for (int y0 = 0; y0 < B.h; y0 += 4) {
        int rows = std::min(4, B.h - y0);
        auto col = [&](int x) __attribute__((always_inline)) {
            int i0 = B.idx(y0, x);
            for (int k = 0; k < rows; k++) {
                int i = i0 + k * s;
                uint32_t f = B.flags[i] & B.vmask[k];
                if ((f & F_SIG) || !(f & F_NBR)) continue;
                int bit = (int)((B.mag[i] >> plane) & 1);
                if (raw)
                    mq.raw_bit(bit);
                else
                    mq.encode(bit, zc[f & F_NBR]);
                B.flags[i] |= F_VISITED;
                if (bit) {
                    uint32_t neg = f & F_SELF_SGN;
                    if (raw) {
                        mq.raw_bit(neg ? 1 : 0);
                    } else {
                        uint32_t si = sc_index(f);
                        mq.encode((int)((neg ? 1u : 0u) ^ FL.sc_xor[si]),
                                  FL.sc_ctx[si]);
                    }
                    B.mark_sig(i, neg, y0 + k, x);
                    *dist += dd_sig((int64_t)B.mag[i], plane);
                }
            }
        };
        if (B.use_bits) {
            int str = y0 >> 2;
            uint64_t done = 0;
            for (;;) {
                uint64_t avail = B.colact[str] & B.wmask & ~done;
                if (!avail) break;
                int x = __builtin_ctzll(avail);
                // strictly left-to-right: a bit newly set at x-1 by a
                // mark_sig during col(x) must not be revisited this pass
                done |= (2ULL << x) - 1;
                col(x);
            }
        } else {
            for (int x = 0; x < B.w; x++) {
                int i0 = B.idx(y0, x);
                uint32_t any = 0;
                for (int k = 0; k < rows; k++) any |= B.flags[i0 + k * s];
                if (!(any & F_NBR)) continue;
                col(x);
            }
        }
    }
}

static void enc_mrp(BlockCtx& B, MQEncoder& mq, int plane, double* dist,
                    bool raw = false) {
    const int s = B.stride;
    for (int y0 = 0; y0 < B.h; y0 += 4) {
        int rows = std::min(4, B.h - y0);
        auto col = [&](int x) __attribute__((always_inline)) {
            int i0 = B.idx(y0, x);
            for (int k = 0; k < rows; k++) {
                int i = i0 + k * s;
                uint32_t f = B.flags[i];
                if ((f & (F_SIG | F_VISITED)) != F_SIG) continue;
                int bit = (int)((B.mag[i] >> plane) & 1);
                if (raw) {
                    mq.raw_bit(bit);
                } else {
                    uint32_t fm = f & B.vmask[k];
                    int ctx = (f & F_REFINED)
                                  ? CTX_MR0 + 2
                                  : ((fm & F_NBR) ? CTX_MR0 + 1 : CTX_MR0);
                    mq.encode(bit, ctx);
                }
                B.flags[i] |= F_REFINED;
                *dist += dd_ref((int64_t)B.mag[i], plane);
            }
        };
        if (B.use_bits) {
            uint64_t avail = B.colact[y0 >> 2] & B.wmask;
            while (avail) {
                int x = __builtin_ctzll(avail);
                avail &= avail - 1;
                col(x);
            }
        } else {
            for (int x = 0; x < B.w; x++) {
                int i0 = B.idx(y0, x);
                uint32_t any = 0;
                for (int k = 0; k < rows; k++) any |= B.flags[i0 + k * s];
                if (!(any & F_SIG)) continue;
                col(x);
            }
        }
    }
}

static void enc_cup(BlockCtx& B, MQEncoder& mq, int plane, double* dist,
                    bool segsym) {
    const int s = B.stride;
    const uint8_t* zc = FL.zc[B.orient];
    for (int y0 = 0; y0 < B.h; y0 += 4) {
        int rows = std::min(4, B.h - y0);
        bool full = rows == 4;
        int str = y0 >> 2;
        for (int x = 0; x < B.w; x++) {
            int i0 = B.idx(y0, x);
            int first_k = 4;
            bool rl = false;
            if (full) {
                if (B.use_bits && !((B.colact[str] >> x) & 1)) {
                    rl = true;  // untouched column: provably all-clear
                } else {
                    uint32_t any = 0;
                    for (int k = 0; k < 4; k++)
                        any |= B.flags[i0 + k * s] & B.vmask[k];
                    rl = (any & (F_SIG | F_VISITED | F_NBR)) == 0;
                }
            }
            if (rl) {
                for (int k = 0; k < 4; k++)
                    if ((B.mag[i0 + k * s] >> plane) & 1) {
                        first_k = k;
                        break;
                    }
                mq.encode(first_k < 4 ? 1 : 0, CTX_RL);
                if (first_k == 4) continue;  // whole column stays zero
                mq.encode((first_k >> 1) & 1, CTX_UNI);
                mq.encode(first_k & 1, CTX_UNI);
            }
            for (int k = (rl ? first_k : 0); k < rows; k++) {
                int i = i0 + k * s;
                uint32_t f = B.flags[i];
                if (f & (F_SIG | F_VISITED)) continue;
                int bit;
                if (rl && k == first_k) {
                    bit = 1;  // significance implied by the run interrupt
                } else {
                    bit = (int)((B.mag[i] >> plane) & 1);
                    mq.encode(bit,
                              zc[(f & B.vmask[k]) & F_NBR]);
                }
                if (bit) {
                    uint32_t neg = f & F_SELF_SGN;
                    uint32_t si = sc_index(f & B.vmask[k]);
                    mq.encode((int)((neg ? 1u : 0u) ^ FL.sc_xor[si]),
                              FL.sc_ctx[si]);
                    B.mark_sig(i, neg, y0 + k, x);
                    *dist += dd_sig((int64_t)B.mag[i], plane);
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
    const int s = B.stride;
    const uint8_t* zc = FL.zc[B.orient];
    for (int y0 = 0; y0 < B.h; y0 += 4) {
        int rows = std::min(4, B.h - y0);
        auto col = [&](int x) __attribute__((always_inline)) {
            int i0 = B.idx(y0, x);
            for (int k = 0; k < rows; k++) {
                int i = i0 + k * s;
                uint32_t f = B.flags[i] & B.vmask[k];
                if ((f & F_SIG) || !(f & F_NBR)) continue;
                int bit = raw ? mq.raw_bit()
                              : mq.decode(zc[f & F_NBR]);
                B.flags[i] |= F_VISITED;
                if (bit) {
                    uint32_t neg;
                    if (raw) {
                        neg = (uint32_t)mq.raw_bit();
                    } else {
                        uint32_t si = sc_index(f);
                        neg = (uint32_t)mq.decode(FL.sc_ctx[si]) ^
                              FL.sc_xor[si];
                    }
                    // scaled-by-2 magnitudes: reconstruct at 1.5 * 2^plane
                    // (the reference's oneplushalf mid-bin convention)
                    B.mag[i] = 3u << plane;
                    B.mark_sig(i, neg, y0 + k, x);
                }
            }
        };
        if (B.use_bits) {
            int str = y0 >> 2;
            uint64_t done = 0;
            for (;;) {
                uint64_t avail = B.colact[str] & B.wmask & ~done;
                if (!avail) break;
                int x = __builtin_ctzll(avail);
                // strictly left-to-right: a bit newly set at x-1 by a
                // mark_sig during col(x) must not be revisited this pass
                done |= (2ULL << x) - 1;
                col(x);
            }
        } else {
            for (int x = 0; x < B.w; x++) {
                int i0 = B.idx(y0, x);
                uint32_t any = 0;
                for (int k = 0; k < rows; k++) any |= B.flags[i0 + k * s];
                if (!(any & F_NBR)) continue;
                col(x);
            }
        }
    }
}

static void dec_mrp(BlockCtx& B, MQDecoder& mq, int plane, bool raw = false) {
    const int s = B.stride;
    for (int y0 = 0; y0 < B.h; y0 += 4) {
        int rows = std::min(4, B.h - y0);
        auto col = [&](int x) __attribute__((always_inline)) {
            int i0 = B.idx(y0, x);
            for (int k = 0; k < rows; k++) {
                int i = i0 + k * s;
                uint32_t f = B.flags[i];
                if ((f & (F_SIG | F_VISITED)) != F_SIG) continue;
                int bit;
                if (raw) {
                    bit = mq.raw_bit();
                } else {
                    uint32_t fm = f & B.vmask[k];
                    int ctx = (f & F_REFINED)
                                  ? CTX_MR0 + 2
                                  : ((fm & F_NBR) ? CTX_MR0 + 1 : CTX_MR0);
                    bit = mq.decode(ctx);
                }
                // refinement re-centers to the half-bin (+-2^(plane-1),
                // i.e. +-2^plane in scaled units)
                if (bit)
                    B.mag[i] += 1u << plane;
                else
                    B.mag[i] -= 1u << plane;
                B.flags[i] |= F_REFINED;
            }
        };
        if (B.use_bits) {
            uint64_t avail = B.colact[y0 >> 2] & B.wmask;
            while (avail) {
                int x = __builtin_ctzll(avail);
                avail &= avail - 1;
                col(x);
            }
        } else {
            for (int x = 0; x < B.w; x++) {
                int i0 = B.idx(y0, x);
                uint32_t any = 0;
                for (int k = 0; k < rows; k++) any |= B.flags[i0 + k * s];
                if (!(any & F_SIG)) continue;
                col(x);
            }
        }
    }
}

static void dec_cup(BlockCtx& B, MQDecoder& mq, int plane, bool segsym) {
    const int s = B.stride;
    const uint8_t* zc = FL.zc[B.orient];
    for (int y0 = 0; y0 < B.h; y0 += 4) {
        int rows = std::min(4, B.h - y0);
        bool full = rows == 4;
        int str = y0 >> 2;
        for (int x = 0; x < B.w; x++) {
            int i0 = B.idx(y0, x);
            int first_k = 0;
            bool rl = false;
            if (full) {
                if (B.use_bits && !((B.colact[str] >> x) & 1)) {
                    rl = true;
                } else {
                    uint32_t any = 0;
                    for (int k = 0; k < 4; k++)
                        any |= B.flags[i0 + k * s] & B.vmask[k];
                    rl = (any & (F_SIG | F_VISITED | F_NBR)) == 0;
                }
            }
            if (rl) {
                if (!mq.decode(CTX_RL)) continue;
                int b1 = mq.decode(CTX_UNI);
                int b0 = mq.decode(CTX_UNI);
                first_k = (b1 << 1) | b0;
            }
            for (int k = (rl ? first_k : 0); k < rows; k++) {
                int i = i0 + k * s;
                uint32_t f = B.flags[i];
                if (f & (F_SIG | F_VISITED)) continue;
                int bit;
                if (rl && k == first_k) {
                    bit = 1;
                } else {
                    bit = mq.decode(
                        zc[(f & B.vmask[k]) & F_NBR]);
                }
                if (bit) {
                    uint32_t si = sc_index(f & B.vmask[k]);
                    uint32_t neg =
                        (uint32_t)mq.decode(FL.sc_ctx[si]) ^ FL.sc_xor[si];
                    B.mag[i] = 3u << plane;  // mid-bin (scaled-by-2)
                    B.mark_sig(i, neg, y0 + k, x);
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

}  // namespace

extern "C" {


int t1_encode_cblks(const int32_t* coeffs, const int32_t* heights,
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
        // per-thread workspace: packed flags + magnitude planes
        uint32_t* flags = new uint32_t[plane_sz];
        uint32_t* mag = new uint32_t[plane_sz];
        uint64_t* colact = new uint64_t[(H + 3) / 4 + 1];

#ifdef _OPENMP
#pragma omp for schedule(dynamic)
#endif
        for (int64_t b = 0; b < n; b++) {
            int h = heights[b], w = widths[b];
            std::memset(flags, 0, plane_sz * sizeof(uint32_t));
            std::memset(mag, 0, plane_sz * sizeof(uint32_t));

            const int32_t* src = coeffs + b * (int64_t)H * W;
            uint32_t maxmag = 0;
            for (int y = 0; y < h; y++)
                for (int x = 0; x < w; x++) {
                    int32_t v = src[y * W + x];
                    uint32_t av = v < 0 ? (uint32_t)(-(int64_t)v) : (uint32_t)v;
                    int i = (y + 1) * stride + (x + 1);
                    mag[i] = av;
                    if (v < 0) flags[i] = F_SELF_SGN;
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
                       (style & STY_VSC) != 0, flags, mag};
            B.init_vmask();
            B.init_colact(colact);
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
                for (int64_t ii = 0; ii < plane_sz; ii++)
                    flags[ii] &= ~F_VISITED;
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
        delete[] flags;
        delete[] mag;
        delete[] colact;
    }
    return 0;
}

int t1_decode_cblks(const uint8_t* data, const int64_t* lengths,
                    const int32_t* numbps, const int32_t* npasses,
                    const int32_t* heights, const int32_t* widths,
                    const int32_t* orients, const int32_t* styles,
                    const int64_t* seg_lengths, int32_t max_segs,
                    int64_t n, int32_t H, int32_t W,
                    int64_t max_bytes, int32_t* out_coeffs,
                    int32_t num_threads) {
    const int stride = W + 2;
    const int64_t plane_sz = (int64_t)(H + 2) * stride;

#ifdef _OPENMP
    if (num_threads > 0) omp_set_num_threads(num_threads);
#pragma omp parallel
#endif
    {
        uint32_t* flags = new uint32_t[plane_sz];
        uint32_t* mag = new uint32_t[plane_sz];
        uint64_t* colact = new uint64_t[(H + 3) / 4 + 1];

#ifdef _OPENMP
#pragma omp for schedule(dynamic)
#endif
        for (int64_t b = 0; b < n; b++) {
            int h = heights[b], w = widths[b];
            std::memset(flags, 0, plane_sz * sizeof(uint32_t));
            std::memset(mag, 0, plane_sz * sizeof(uint32_t));
            int32_t* dst = out_coeffs + b * (int64_t)H * W;
            std::memset(dst, 0, (int64_t)H * W * sizeof(int32_t));

            int nb = numbps[b];
            int np = npasses[b];
            if (nb <= 0 || np <= 0) continue;

            int style = styles ? styles[b] : 0;
            BlockCtx B{h, w, orients[b], stride,
                       (style & STY_VSC) != 0, flags, mag};
            B.init_vmask();
            B.init_colact(colact);
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
                for (int64_t ii = 0; ii < plane_sz; ii++)
                    flags[ii] &= ~F_VISITED;
            }
            for (int y = 0; y < h; y++)
                for (int x = 0; x < w; x++) {
                    int i = (y + 1) * stride + (x + 1);
                    int32_t v = (int32_t)(mag[i] >> 1);  // drop the 1/2 bit
                    if (flags[i] & F_SELF_SGN) v = -v;
                    dst[y * W + x] = v;
                }
        }
        delete[] flags;
        delete[] mag;
        delete[] colact;
    }
    return 0;
}

}  // extern "C"
