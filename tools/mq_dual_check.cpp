// Dual MQ decoder self-test: reference T.88 byte-machine vs the new
// bit-reservoir window decoder, lockstep on the same buffer + ctx script.
#include <cstdint>
#include <cstring>
#include <cstdio>
#include <cstdlib>

#include "../native/mq_decoder.h"

using New = mqshared::MQDecoder;  // the PRODUCTION decoder, not a copy

struct RefTables {
    uint16_t qe[47];
    uint8_t nmps[47], nlps[47], sw[47];
};
static const RefTables MQT = {
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
constexpr int NUM_CTX = mqshared::NUM_CTX;
struct RefMergedState { uint16_t qe; uint8_t nmps, nlps; };
struct RefMerged {
    RefMergedState st[94];
    RefMerged() {
        for (int sidx = 0; sidx < 47; sidx++)
            for (int mps = 0; mps < 2; mps++) {
                RefMergedState& e = st[2 * sidx + mps];
                e.qe = MQT.qe[sidx];
                e.nmps = (uint8_t)(2 * MQT.nmps[sidx] + mps);
                int nm = MQT.sw[sidx] ? 1 - mps : mps;
                e.nlps = (uint8_t)(2 * MQT.nlps[sidx] + nm);
            }
    }
};
static const RefMerged MQM;

struct Ref {  // the original byte-machine decoder
    uint32_t a = 0, c = 0;
    int ct = 0;
    const uint8_t* buf;
    int64_t bp = 0, end = 0;
    uint8_t state[NUM_CTX];
    uint8_t byte_at(int64_t i) const { return i < end ? buf[i] : 0xFF; }
    void bytein() {
        uint8_t b = byte_at(bp), b1 = byte_at(bp + 1);
        if (b == 0xFF) {
            if (b1 > 0x8F) { c += 0xFF00; ct = 8; }
            else { bp++; c += (uint32_t)b1 << 9; ct = 7; }
        } else { bp++; c += (uint32_t)b1 << 8; ct = 8; }
    }
    void init(const uint8_t* b, int64_t len) {
        std::memset(state, 0, sizeof(state));
        state[mqshared::CTX_ZC0] = 2 * 4;   // T.800 initial states,
        state[mqshared::CTX_RL] = 2 * 3;    // matching MQDecoder::reset_ctx
        state[mqshared::CTX_UNI] = 2 * 46;
        buf = b; end = len; bp = 0;
        c = (uint32_t)byte_at(0) << 16;
        bytein();
        c <<= 7; ct -= 7; a = 0x8000;
    }
    void renorm() {
        do { if (ct == 0) bytein(); a <<= 1; c <<= 1; ct--; } while (!(a & 0x8000));
    }
    int decode(int ctx) {
        uint8_t s = state[ctx];
        const RefMergedState& e = MQM.st[s];
        uint32_t qe = e.qe; int d;
        a -= qe;
        if (((c >> 16) & 0xFFFF) < qe) {
            if (a < qe) { d = s & 1; state[ctx] = e.nmps; }
            else { d = 1 - (s & 1); state[ctx] = e.nlps; }
            a = qe; renorm();
        } else {
            c -= qe << 16;
            if (!(a & 0x8000)) {
                if (a < qe) { d = 1 - (s & 1); state[ctx] = e.nlps; }
                else { d = s & 1; state[ctx] = e.nmps; }
                renorm();
            } else d = s & 1;
        }
        return d;
    }
};

int main(int argc, char** argv) {
    // random buffers + random ctx scripts
    unsigned seed = argc > 1 ? (unsigned)atoi(argv[1]) : 1;
    srand(seed);
    static uint8_t buf[4096], scratch[8192];
    for (int trial = 0; trial < 2000; trial++) {
        int len = 1 + rand() % 300;
        for (int i = 0; i < len; i++) {
            int r = rand() % 100;
            buf[i] = r < 20 ? 0xFF : (uint8_t)(rand() & (r < 40 ? 0x8F : 0xFF));
        }
        Ref R; R.init(buf, len);
        static int64_t evscratch[4096];
        New N;
        N.ubuf = scratch;
        N.evbuf = evscratch;
        N.init(buf, len);
        for (int i = 0; i < 5000; i++) {
            int ctx = rand() % NUM_CTX;
            int dr = R.decode(ctx);
            int dn = N.decode(ctx);
            uint32_t rwin = (R.c >> 16) & 0xFFFF;
            if (dr != dn || R.a != N.a || rwin != N.c) {
                printf("trial %d len %d decision %d ctx %d: ref d=%d a=%04x win=%04x | new d=%d a=%04x win=%04x\n",
                       trial, len, i, ctx, dr, R.a, rwin, dn, N.a, N.c);
                printf("bytes:");
                for (int j = 0; j < len && j < 40; j++) printf(" %02x", buf[j]);
                printf("\n");
                return 1;
            }
        }
    }
    printf("all lockstep-identical\n");
    return 0;
}
