// Shared MQ (T.88) tables and the bit-reservoir MQ decoder.
//
// Header-only so the production coder (t1_coder.cpp) and the lockstep
// oracle (tools/mq_dual_check.cpp) compile the SAME decoder: the oracle's
// independent byte-machine reimplementation is compared against this
// exact code, not a copy.

#ifndef GROK_TPU_MQ_DECODER_H_
#define GROK_TPU_MQ_DECODER_H_

#include <cstdint>
#include <cstring>

namespace mqshared {

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

// one-load state records: qe(0-15) | mps(16) | nmps idx(17-23) | nlps
// idx(24-30). The per-context state holds the WHOLE record, so a decision
// needs a single L1 load (the old u8-index + record pair was two dependent
// loads on the critical path); transitions store REC[next] off the path.
struct MqRecords {
    uint32_t rec[94];
    MqRecords() {
        for (int i = 0; i < 94; i++) {
            const MqMergedState& e = MQM.st[i];
            rec[i] = (uint32_t)e.qe | ((uint32_t)(i & 1) << 16) |
                     ((uint32_t)e.nmps << 17) | ((uint32_t)e.nlps << 24);
        }
    }
};
static const MqRecords MQR;

// Bit-reservoir MQ decoder. T.88's BYTEIN state machine is equivalent to
// shifting an UNSTUFFED bit sequence (8 bits per byte, 7 after an 0xFF,
// all-ones past the terminating marker) into the bottom of the 16-bit
// decision window chigh = (C >> 16) mod 2^16: a byte inserted at C bits
// 8-15 has its MSB one renorm shift away from the window, so each shift
// performs chigh = (chigh << 1) | next_bit, and the init sequence
// (C = B0 << 16; BYTEIN; C <<= 7) loads exactly the first 15 unstuffed
// bits. A stuffed byte in 0x80-0x8F carries an encoder CARRY in bit 7
// that BYTEIN adds at C bit 16 — i.e. +1 to the window applied lazily at
// the first shift after the preceding 0xFF has fully entered the window
// (renorm byteins fire at the START of the next shift, so decisions made
// while CT==0 still see the no-carry window). Decisions (compare /
// subtract qe) touch only chigh, so pre-unstuffing the segment once —
// recording carry-event bit positions — and renormalizing by clz-many
// bits at a time is bit-exact while removing the per-bit shift loop and
// per-byte branches from the hot path. Validated lockstep against the
// byte-machine on 10^8 random decisions (tools + tests/test_mq.py).
struct MQDecoder {
    uint32_t a = 0, c = 0;  // c = the 16-bit chigh decision window
    uint64_t res = 0;       // unstuffed bits, left-aligned (MSB = next bit)
    int rb = 0;             // valid bits in res
    uint8_t* ubuf = nullptr;   // caller-provided unstuff scratch
    int64_t* evbuf = nullptr;  // caller-provided carry-event scratch
    int64_t upos = 0, ulen = 0;
    int64_t pos = 0;  // unstuffed bits delivered to the window so far
    int ecnt = 0, ei = 0;
    uint32_t state[NUM_CTX];  // MqRecords entries (see MQR)

    void refill() {
        while (rb <= 56) {
            uint32_t b = upos < ulen ? ubuf[upos++] : 0xFFu;
            res |= (uint64_t)b << (56 - rb);
            rb += 8;
        }
    }

    inline uint32_t take(int n) {  // 1 <= n <= 16
        if (rb < n) refill();
        uint32_t v = (uint32_t)(res >> (64 - n));
        res <<= n;
        rb -= n;
        return v;
    }

    inline void shift_in(int n) {
        c = (c << n) | take(n);
        int64_t np = pos + n;
        if (__builtin_expect(ei < ecnt && evbuf[ei] < np, 0)) {
            do {
                c += 1u << (np - evbuf[ei]);
                ei++;
            } while (ei < ecnt && evbuf[ei] < np);
        }
        pos = np;
        c &= 0xFFFF;  // the byte-machine window is implicitly mod 2^16
    }

    void reset_ctx() {
        for (int i = 0; i < NUM_CTX; i++) state[i] = MQR.rec[0];
        state[CTX_ZC0] = MQR.rec[2 * 4];
        state[CTX_RL] = MQR.rec[2 * 3];
        state[CTX_UNI] = MQR.rec[2 * 46];
    }

    void init_registers(const uint8_t* b, int64_t len) {
        // re-prime on a new codeword segment; context states persist
        int64_t nb = 0;
        uint32_t acc = 0;
        int ab = 0;
        bool pf = false;
        ecnt = 0;
        for (int64_t i = 0; i < len; i++) {
            uint32_t v = b[i];
            if (pf) {
                if (v > 0x8F) break;  // marker: rest of the stream is 1-bits
                if (v & 0x80) evbuf[ecnt++] = nb * 8 + ab;  // carry event
                acc = (acc << 7) | (v & 0x7F);
                ab += 7;
            } else {
                acc = (acc << 8) | v;
                ab += 8;
            }
            pf = v == 0xFF;
            if (ab >= 8) {
                ab -= 8;
                ubuf[nb++] = (uint8_t)(acc >> ab);
            }
        }
        if (ab) ubuf[nb++] = (uint8_t)((acc << (8 - ab)) | (0xFFu >> ab));
        ulen = nb;
        upos = 0;
        res = 0;
        rb = 0;
        ei = 0;
        pos = 0;
        c = 0;
        shift_in(15);
        a = 0x8000;
    }

    void init(const uint8_t* b, int64_t len) {
        init_registers(b, len);
        reset_ctx();
    }

    inline void renorm() {
        int n = __builtin_clz(a) - 16;  // a in [1, 0x7FFF] here
        shift_in(n);
        a <<= n;
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

    __attribute__((always_inline)) inline int decode(int ctx) {
        uint32_t s = state[ctx];
        uint32_t qe = s & 0xFFFF;
        int mps = (int)((s >> 16) & 1);
        int d;
        a -= qe;
        if (__builtin_expect(c < qe, 0)) {
            // LPS subinterval
            if (a < qe) {
                d = mps;
                state[ctx] = MQR.rec[(s >> 17) & 0x7F];
            } else {
                d = mps ^ 1;
                state[ctx] = MQR.rec[(s >> 24) & 0x7F];
            }
            a = qe;
            renorm();
        } else {
            c -= qe;
            if (__builtin_expect((a & 0x8000) == 0, 0)) {
                if (a < qe) {
                    d = mps ^ 1;
                    state[ctx] = MQR.rec[(s >> 24) & 0x7F];
                } else {
                    d = mps;
                    state[ctx] = MQR.rec[(s >> 17) & 0x7F];
                }
                renorm();
            } else {
                d = mps;
            }
        }
        return d;
    }
};

}  // namespace mqshared

#endif  // GROK_TPU_MQ_DECODER_H_
