// Dual MQ decoder self-test: reference T.88 byte-machine vs the new
// bit-reservoir window decoder, lockstep on the same buffer + ctx script.
#include <cstdint>
#include <cstring>
#include <cstdio>
#include <cstdlib>

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
struct MqMergedState { uint16_t qe; uint8_t nmps, nlps; };
struct MqMerged {
    MqMergedState st[94];
    MqMerged() {
        for (int sidx = 0; sidx < 47; sidx++)
            for (int mps = 0; mps < 2; mps++) {
                MqMergedState& e = st[2 * sidx + mps];
                e.qe = MQT.qe[sidx];
                e.nmps = (uint8_t)(2 * MQT.nmps[sidx] + mps);
                int nm = MQT.sw[sidx] ? 1 - mps : mps;
                e.nlps = (uint8_t)(2 * MQT.nlps[sidx] + nm);
            }
    }
};
static const MqMerged MQM;

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
        const MqMergedState& e = MQM.st[s];
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

struct New {  // bit-reservoir window decoder
    uint32_t a = 0, c = 0;
    uint64_t res = 0;
    int rb = 0;
    uint8_t* ubuf;
    int64_t upos = 0, ulen = 0;
    int64_t pos = 0;          // total bits delivered to the window
    int64_t evbuf[4096];
    const int64_t* ev = nullptr;
    int ecnt = 0, ei = 0;
    uint8_t state[NUM_CTX];
    void refill() {
        while (rb <= 56) {
            uint32_t b = upos < ulen ? ubuf[upos++] : 0xFFu;
            res |= (uint64_t)b << (56 - rb);
            rb += 8;
        }
    }
    uint32_t take(int n) {
        if (rb < n) refill();
        uint32_t v = (uint32_t)(res >> (64 - n));
        res <<= n; rb -= n;
        return v;
    }
    inline void shift_in(int n) {
        c = (c << n) | take(n);
        int64_t np = pos + n;
        while (ei < ecnt && ev[ei] < np) {
            c += 1u << (np - ev[ei]);
            ei++;
        }
        pos = np;
        c &= 0xFFFF;
    }
    void init(const uint8_t* b, int64_t len) {
        std::memset(state, 0, sizeof(state));
        int64_t nb = 0; uint32_t acc = 0; int ab = 0; bool pf = false;
        ecnt = 0;
        for (int64_t i = 0; i < len; i++) {
            uint32_t v = b[i];
            if (pf) {
                if (v > 0x8F) break;
                if (v & 0x80) evbuf[ecnt++] = nb * 8 + ab;  // carry event
                acc = (acc << 7) | (v & 0x7F); ab += 7;
            } else { acc = (acc << 8) | v; ab += 8; }
            pf = v == 0xFF;
            if (ab >= 8) { ab -= 8; ubuf[nb++] = (uint8_t)(acc >> ab); }
        }
        if (ab) ubuf[nb++] = (uint8_t)((acc << (8 - ab)) | (0xFFu >> ab));
        ulen = nb; upos = 0; res = 0; rb = 0;
        ev = evbuf; ei = 0; pos = 0; c = 0;
        shift_in(15);
        a = 0x8000;
    }
    void renorm() {
        int n = __builtin_clz(a) - 16;
        shift_in(n);
        a <<= n;
    }
    int decode(int ctx) {
        uint8_t s = state[ctx];
        const MqMergedState& e = MQM.st[s];
        uint32_t qe = e.qe; int d;
        a -= qe;
        if (c < qe) {
            if (a < qe) { d = s & 1; state[ctx] = e.nmps; }
            else { d = 1 - (s & 1); state[ctx] = e.nlps; }
            a = qe; renorm();
        } else {
            c -= qe;
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
        New N; N.ubuf = scratch; N.init(buf, len);
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
