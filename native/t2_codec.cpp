// Tier-2 packet codec — native host implementation.
//
// Whole-tile packet header emission/parsing in one call: the Python side
// flattens precinct geometry + T1 results into arrays, and this file runs
// the per-packet tag-tree / numpasses / length signalling loops
// (grok_tpu/t2/packets.py and t2/tagtree.py remain the bit-exact reference;
// this is their fast mirror, validated by the full interop suite).
// Re-derived from ITU-T T.800 B.9/B.10 — not a port of the reference's
// t2/T2Compress.cpp / T2Decompress.cpp.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

// --------------------------------------------------- bit IO (0xFF stuffing)
struct BitW {
    std::vector<uint8_t>& out;
    uint32_t buf = 0;
    int ct = 8;
    explicit BitW(std::vector<uint8_t>& o) : out(o) {}
    inline void bit(int b) {
        if (ct == 0) {
            out.push_back((uint8_t)buf);
            ct = buf == 0xFF ? 7 : 8;
            buf = 0;
        }
        ct--;
        if (b) buf |= 1u << ct;
    }
    inline void bits(uint64_t v, int n) {
        for (int i = n - 1; i >= 0; i--) bit((int)((v >> i) & 1));
    }
    void flush() {
        if (ct < 8) {
            out.push_back((uint8_t)buf);
            if (buf == 0xFF) out.push_back(0);
        }
        buf = 0;
        ct = 8;
    }
};

struct BitR {
    const uint8_t* data;
    int64_t len;
    int64_t pos;
    uint32_t buf = 0;
    int ct = 0;
    bool prev_ff = false;
    BitR(const uint8_t* d, int64_t l, int64_t p) : data(d), len(l), pos(p) {}
    inline int bit() {
        if (ct == 0) {
            buf = pos < len ? data[pos++] : 0;  // feed 0s past the end
            if (pos > len) buf = 0;
            ct = prev_ff ? 7 : 8;
            prev_ff = buf == 0xFF;
        }
        ct--;
        return (int)((buf >> ct) & 1);
    }
    inline uint64_t bits(int n) {
        uint64_t v = 0;
        for (int i = 0; i < n; i++) v = (v << 1) | (uint64_t)bit();
        return v;
    }
    void align() {
        ct = 0;
        if (prev_ff) {
            if (pos < len) pos++;
            prev_ff = false;
        }
    }
};

// ------------------------------------------------------------- tag trees
struct TagTree {
    int w = 0, h = 0, nlev = 0;
    int lw[20], lh[20], off[21];
    std::vector<int32_t> values, lows;
    std::vector<uint8_t> known;

    void build(int w_, int h_) {
        w = w_;
        h = h_;
        int cw = w_ > 0 ? w_ : 1, ch = h_ > 0 ? h_ : 1;
        nlev = 0;
        int total = 0;
        while (true) {
            lw[nlev] = cw;
            lh[nlev] = ch;
            off[nlev] = total;
            total += cw * ch;
            nlev++;
            if (cw == 1 && ch == 1) break;
            cw = (cw + 1) / 2;
            ch = (ch + 1) / 2;
        }
        off[nlev] = total;
        values.assign(total, 0);
        lows.assign(total, 0);
        known.assign(total, 0);
    }

    inline int idx(int lvl, int y, int x) const {
        return off[lvl] + y * lw[lvl] + x;
    }

    // set leaf values and propagate min up
    void set_values(const int32_t* leaf /* h*w */) {
        for (int y = 0; y < lh[0]; y++)
            for (int x = 0; x < lw[0]; x++)
                values[idx(0, y, x)] =
                    (y < h && x < w) ? leaf[y * w + x] : 0;
        for (int lvl = 1; lvl < nlev; lvl++) {
            for (int y = 0; y < lh[lvl]; y++)
                for (int x = 0; x < lw[lvl]; x++) {
                    int32_t m = INT32_MAX;
                    for (int dy = 0; dy < 2; dy++)
                        for (int dx = 0; dx < 2; dx++) {
                            int yy = 2 * y + dy, xx = 2 * x + dx;
                            if (yy < lh[lvl - 1] && xx < lw[lvl - 1])
                                m = std::min(m, values[idx(lvl - 1, yy, xx)]);
                        }
                    values[idx(lvl, y, x)] = m;
                }
        }
        std::fill(lows.begin(), lows.end(), 0);
        std::fill(known.begin(), known.end(), 0);
    }

    void encode(BitW& bio, int x, int y, int threshold) {
        int32_t tmin = 0;
        for (int lvl = nlev - 1; lvl >= 0; lvl--) {
            int cx = x >> lvl, cy = y >> lvl;
            int i = idx(lvl, cy, cx);
            int32_t low = lows[i];
            if (low < tmin) low = tmin;
            int32_t val = values[i];
            while (low < threshold && !known[i]) {
                if (val > low) {
                    bio.bit(0);
                    low++;
                } else {
                    bio.bit(1);
                    known[i] = 1;
                }
            }
            lows[i] = low;
            tmin = low;
        }
    }

    // returns true iff leaf value known and < threshold
    bool decode(BitR& bio, int x, int y, int threshold) {
        int32_t tmin = 0;
        for (int lvl = nlev - 1; lvl >= 0; lvl--) {
            int cx = x >> lvl, cy = y >> lvl;
            int i = idx(lvl, cy, cx);
            int32_t low = lows[i];
            if (low < tmin) low = tmin;
            while (low < threshold && !known[i]) {
                if (bio.bit()) {
                    known[i] = 1;
                    values[i] = low;
                } else {
                    low++;
                }
            }
            lows[i] = low;
            tmin = low;
        }
        int i0 = idx(0, y, x);
        return known[i0] && values[i0] < threshold;
    }

    // fully decode the leaf value; returns -1 past the limit (corrupt)
    int decode_value(BitR& bio, int x, int y, int limit = 74) {
        int t = 1;
        while (!decode(bio, x, y, t)) {
            t++;
            if (t > limit) return -1;
        }
        return values[idx(0, y, x)];
    }
};

static inline int floor_log2(int64_t n) {
    if (n <= 0) return 0;  // guard: n<0 would arithmetic-shift forever
    int r = -1;
    while (n) {
        n >>= 1;
        r++;
    }
    return r;
}

static inline int bit_length(int64_t n) { return floor_log2(n) + 1; }

// codeword segment splits (T.800 D.4): pass counts of the segments covering
// [start, start+npasses)
static int segment_splits(int style, int start, int npasses, int* out) {
    if (style & 0x40) {  // HT: cleanup own segment; SigProp+MagRef share one
        int n = 0;
        for (int p = start; p < start + npasses; p++) {
            if (p % 3 == 2 && n > 0 && (p - 1) >= start && (p - 1) % 3 == 1)
                out[n - 1] += 1;
            else
                out[n++] = 1;
        }
        return n;
    }
    if (style & 0x04) {  // TERMALL
        for (int i = 0; i < npasses; i++) out[i] = 1;
        return npasses;
    }
    if (style & 0x01) {  // BYPASS
        auto term_after = [](int p) {
            int t = p == 0 ? 2 : (p - 1) % 3;
            return p == 9 || (p > 9 && (t == 1 || t == 2));
        };
        int n = 0, cur = 0;
        for (int p = start; p < start + npasses; p++) {
            cur++;
            if (term_after(p)) {
                out[n++] = cur;
                cur = 0;
            }
        }
        if (cur) out[n++] = cur;
        return n;
    }
    out[0] = npasses;
    return 1;
}

static void write_numpasses(BitW& bio, int n) {
    if (n == 1)
        bio.bit(0);
    else if (n == 2)
        bio.bits(0b10, 2);
    else if (n <= 5) {
        bio.bits(0b11, 2);
        bio.bits((uint64_t)(n - 3), 2);
    } else if (n <= 36) {
        bio.bits(0b1111, 4);
        bio.bits((uint64_t)(n - 6), 5);
    } else {
        bio.bits(0b111111111, 9);
        bio.bits((uint64_t)(n - 37), 7);
    }
}

static int read_numpasses(BitR& bio) {
    if (!bio.bit()) return 1;
    if (!bio.bit()) return 2;
    int v = (int)bio.bits(2);
    if (v < 3) return 3 + v;
    v = (int)bio.bits(5);
    if (v < 31) return 6 + v;
    return 37 + (int)bio.bits(7);
}

}  // namespace

extern "C" {

// Encode every packet of a tile. Returns 0 on success, 1 if out/hdr buffers
// are too small.
int t2_encode_packets(
    // packet sequence
    int32_t npk, const int32_t* pkt_layer, const int32_t* pkt_prc_off,
    const int32_t* pkt_prc_ids,
    // precinct contexts
    int32_t nprc, const int32_t* prc_numbps, const int32_t* prc_gw,
    const int32_t* prc_gh, const int32_t* prc_cb_off,
    // per precinct-local cblk entry
    const int32_t* cb_global, const int32_t* cb_cx, const int32_t* cb_cy,
    // per global T1 codeblock
    int64_t ncb, const uint8_t* cb_data, int64_t data_stride,
    int32_t data_off, const int64_t* pass_rates, int32_t max_passes,
    const int32_t* cb_numbps,
    const int32_t* cb_npasses, const int32_t* cb_style,
    const int64_t* cum_passes, int32_t num_layers,  // [num_layers, ncb]
    // flags
    int32_t use_sop, int32_t use_eph, int32_t ppt, int32_t sop_start,
    int32_t simulate,  // count bytes only (exact PCRD rate simulation)
    // outputs
    uint8_t* out, int64_t out_cap, int64_t* pkt_lens, uint8_t* hdr_out,
    int64_t hdr_cap, int64_t* hdr_lens, int64_t* total_out,
    int64_t* total_hdr) {
    // derive per-cblk layer split (passes/bytes per layer) and first layer
    std::vector<int32_t> layer_passes((size_t)num_layers * ncb);
    std::vector<int64_t> layer_bytes((size_t)num_layers * ncb);
    std::vector<int32_t> first_layer(ncb);
    for (int64_t i = 0; i < ncb; i++) {
        int64_t prev_k = 0, prev_bytes = 0;
        int32_t fl = num_layers;
        for (int32_t li = 0; li < num_layers; li++) {
            int64_t k = cum_passes[(size_t)li * ncb + i];
            int64_t nb = 0;
            if (k > prev_k) {
                nb = pass_rates[i * max_passes + (k - 1)] - prev_bytes;
                if (fl == num_layers) fl = li;
            }
            layer_passes[(size_t)li * ncb + i] = (int32_t)(k - prev_k);
            layer_bytes[(size_t)li * ncb + i] = nb;
            prev_bytes += nb;
            prev_k = k;
        }
        first_layer[i] = fl;
    }

    // build tag trees per precinct
    std::vector<TagTree> incl(nprc), imsb(nprc);
    for (int p = 0; p < nprc; p++) {
        int gw = prc_gw[p], gh = prc_gh[p];
        incl[p].build(gw, gh);
        imsb[p].build(gw, gh);
        if (gw == 0 || gh == 0) continue;
        std::vector<int32_t> iv((size_t)gw * gh, num_layers),
            mv((size_t)gw * gh, 0);
        for (int e = prc_cb_off[p]; e < prc_cb_off[p + 1]; e++) {
            int g = cb_global[e];
            if (g < 0) continue;
            int cx = cb_cx[e], cy = cb_cy[e];
            iv[(size_t)cy * gw + cx] =
                cb_npasses[g] > 0 ? first_layer[g] : num_layers;
            mv[(size_t)cy * gw + cx] = prc_numbps[p] - cb_numbps[g];
        }
        incl[p].set_values(iv.data());
        imsb[p].set_values(mv.data());
    }

    // per-entry mutable header state
    int total_entries = prc_cb_off[nprc];
    std::vector<int32_t> lblock(total_entries, 3);
    std::vector<uint8_t> included(total_entries, 0);
    std::vector<int64_t> passes_done(total_entries, 0),
        bytes_done(total_entries, 0);

    int64_t opos = 0, hpos = 0;
    std::vector<uint8_t> hdr;
    std::vector<int64_t> body_src;  // (entry, offset, len) triples flattened
    int splits[200];
    int64_t seg_bytes[200];

    for (int32_t pk = 0; pk < npk; pk++) {
        int layer = pkt_layer[pk];
        if (simulate && layer >= num_layers) continue;  // truncated stream
        hdr.clear();
        BitW bio(hdr);
        // any data?
        bool any = false;
        for (int pi = pkt_prc_off[pk]; pi < pkt_prc_off[pk + 1] && !any;
             pi++) {
            int p = pkt_prc_ids[pi];
            for (int e = prc_cb_off[p]; e < prc_cb_off[p + 1]; e++) {
                int g = cb_global[e];
                if (g >= 0 && layer_passes[(size_t)layer * ncb + g] > 0) {
                    any = true;
                    break;
                }
            }
        }
        body_src.clear();
        if (!any) {
            bio.bit(0);
            bio.flush();
        } else {
            bio.bit(1);
            for (int pi = pkt_prc_off[pk]; pi < pkt_prc_off[pk + 1]; pi++) {
                int p = pkt_prc_ids[pi];
                for (int e = prc_cb_off[p]; e < prc_cb_off[p + 1]; e++) {
                    int g = cb_global[e];
                    if (g < 0) continue;
                    int npl = layer_passes[(size_t)layer * ncb + g];
                    if (!included[e])
                        incl[p].encode(bio, cb_cx[e], cb_cy[e], layer + 1);
                    else
                        bio.bit(npl > 0 ? 1 : 0);
                    if (npl == 0) continue;
                    if (!included[e]) {
                        int im = prc_numbps[p] - cb_numbps[g];
                        imsb[p].encode(bio, cb_cx[e], cb_cy[e], im + 1);
                        included[e] = 1;
                    }
                    write_numpasses(bio, npl);
                    int nseg = segment_splits(cb_style[g],
                                              (int)passes_done[e], npl,
                                              splits);
                    if (nseg == 1) {
                        seg_bytes[0] = layer_bytes[(size_t)layer * ncb + g];
                    } else {
                        const int64_t* r = pass_rates + g * max_passes;
                        int64_t p0 = passes_done[e];
                        int64_t prev = p0 > 0 ? r[p0 - 1] : 0;
                        int64_t pcur = p0;
                        for (int si = 0; si < nseg; si++) {
                            pcur += splits[si];
                            int64_t cur = r[pcur - 1];
                            if (cur < prev) return -3;  // non-monotone rates
                            seg_bytes[si] = cur - prev;
                            prev = cur;
                        }
                    }
                    int inc = 0;
                    for (int si = 0; si < nseg; si++) {
                        int needed = std::max(1, bit_length(seg_bytes[si]));
                        inc = std::max(
                            inc, needed - (lblock[e] + floor_log2(splits[si])));
                    }
                    for (int k = 0; k < inc; k++) bio.bit(1);
                    lblock[e] += inc;
                    bio.bit(0);
                    int64_t nbytes = 0;
                    for (int si = 0; si < nseg; si++) {
                        bio.bits((uint64_t)seg_bytes[si],
                                 lblock[e] + floor_log2(splits[si]));
                        nbytes += seg_bytes[si];
                    }
                    body_src.push_back(e);
                    body_src.push_back(g);
                    body_src.push_back(bytes_done[e]);
                    body_src.push_back(nbytes);
                    bytes_done[e] += nbytes;
                    passes_done[e] += npl;
                }
            }
            bio.flush();
        }
        // assemble the packet
        int64_t start = opos, hstart = hpos;
        auto put = [&](const uint8_t* src, int64_t n) -> bool {
            if (simulate) {
                opos += n;
                return true;
            }
            if (opos + n > out_cap) return false;
            std::memcpy(out + opos, src, (size_t)n);
            opos += n;
            return true;
        };
        if (use_sop) {
            uint8_t sop[6] = {0xFF, 0x91, 0, 4,
                              (uint8_t)(((sop_start + pk) >> 8) & 0xFF),
                              (uint8_t)((sop_start + pk) & 0xFF)};
            if (!put(sop, 6)) return 1;
        }
        if (ppt) {
            if (simulate) {
                hpos += (int64_t)hdr.size() + (use_eph ? 2 : 0);
            } else {
                if (hpos + (int64_t)hdr.size() + 2 > hdr_cap) return 1;
                std::memcpy(hdr_out + hpos, hdr.data(), hdr.size());
                hpos += (int64_t)hdr.size();
                if (use_eph) {
                    hdr_out[hpos++] = 0xFF;
                    hdr_out[hpos++] = 0x92;
                }
            }
        } else {
            if (!put(hdr.data(), (int64_t)hdr.size())) return 1;
            if (use_eph) {
                uint8_t eph[2] = {0xFF, 0x92};
                if (!put(eph, 2)) return 1;
            }
        }
        for (size_t bi = 0; bi < body_src.size(); bi += 4) {
            int64_t g = body_src[bi + 1], off = body_src[bi + 2],
                    n = body_src[bi + 3];
            if (!put(cb_data + g * data_stride + data_off + off, n)) return 1;
        }
        pkt_lens[pk] = opos - start;
        if (ppt && hdr_lens) hdr_lens[pk] = hpos - hstart;
    }
    *total_out = opos;
    if (total_hdr) *total_hdr = hpos;
    return 0;
}

// Decode every packet of a tile. Outputs contribution triples in stream
// order. Returns 0 ok, 1 corrupt stream (caller raises), 2 buffers small.
int t2_decode_packets(
    const uint8_t* body, int64_t body_len,
    int32_t npk, const int32_t* pkt_layer, const int32_t* pkt_prc_off,
    const int32_t* pkt_prc_ids, int32_t max_layers,
    int32_t nprc, const int32_t* prc_numbps, const int32_t* prc_gw,
    const int32_t* prc_gh, const int32_t* prc_cb_off, const int32_t* cb_cx,
    const int32_t* cb_cy, const int32_t* cb_style,
    int32_t use_sop, int32_t use_eph,
    const uint8_t* hdrs, int64_t hdr_len, int32_t use_ppt,
    // PLT fast path (cache/PacketLengthMarkers + skipTo parity): when
    // plt_lens covers all npk packets and a packet is marked skip (not
    // wanted: dropped resolution / excluded precinct / truncated layer),
    // advance by its recorded length instead of parsing its headers.
    // Only valid without PPT (packed headers are a separate bit stream
    // with no per-packet byte index).
    int32_t has_plt, const int64_t* plt_lens, const int32_t* pkt_skip,
    int64_t* n_skipped,
    int32_t* out_entry, int32_t* out_npasses, int64_t* out_nbytes,
    int64_t* out_off, int64_t max_contrib, int64_t* n_contrib,
    int32_t* entry_numbps, int64_t* end_pos) {
    std::vector<TagTree> incl(nprc), imsb(nprc);
    for (int p = 0; p < nprc; p++) {
        incl[p].build(prc_gw[p], prc_gh[p]);
        imsb[p].build(prc_gw[p], prc_gh[p]);
    }
    int total_entries = prc_cb_off[nprc];
    std::vector<int32_t> lblock(total_entries, 3);
    std::vector<uint8_t> included(total_entries, 0);
    std::vector<int64_t> npasses_acc(total_entries, 0);
    for (int e = 0; e < total_entries; e++) entry_numbps[e] = -1;

    int64_t pos = 0, nout = 0;
    BitR hdr_reader(hdrs ? hdrs : body, hdr_len, 0);
    int splits[200];
    // per-packet contribution staging (entry, npasses, nbytes)
    std::vector<int64_t> contrib;

    const bool plt_skip_ok = has_plt && !use_ppt;
    int64_t skipped = 0;
    auto is_unwanted = [&](int32_t pk) {
        return (max_layers > 0 && pkt_layer[pk] >= max_layers) ||
               (pkt_skip && pkt_skip[pk]);
    };
    int32_t last_wanted = -1;
    for (int32_t pk = 0; pk < npk; pk++)
        if (!is_unwanted(pk)) last_wanted = pk;
    bool any_skip = false;  // mid-stream unwanted packet => PLT jumps happen
    for (int32_t pk = 0; pk < last_wanted && !any_skip; pk++)
        if (is_unwanted(pk)) any_skip = true;
    // the PLT is only consulted for skip jumps; with nothing to skip the
    // span verification (and its reparse on a lying index) is pointless
    const bool plt_verify = plt_skip_ok && any_skip;
    for (int32_t pk = 0; pk < npk; pk++) {
        int layer = pkt_layer[pk];
        if (pk > last_wanted) break;  // pure unwanted suffix: stop reading
        bool drop = is_unwanted(pk);
        if (drop && plt_skip_ok) {
            if (pos < body_len) {
                // jump the whole packet (SOP/header/EPH/bodies included in
                // the recorded length) so later wanted packets of
                // interleaving progressions stay aligned
                pos += plt_lens[pk];
                skipped++;
                if (pos > body_len) break;  // truncated tail
            }
            continue;
        }
        // without PLT an unwanted mid-stream packet is still parsed (headers
        // keep pos and the PPT bit stream aligned); its contributions are
        // dropped below
        if (pos >= body_len && !use_ppt) break;  // truncated: rest empty
        int64_t pkt_start = pos;
        if (use_sop && pos + 6 <= body_len && body[pos] == 0xFF &&
            body[pos + 1] == 0x91)
            pos += 6;
        BitR local(body, body_len, pos);
        BitR& bio = use_ppt ? hdr_reader : local;
        contrib.clear();
        if (!bio.bit()) {
            bio.align();
            if (!use_ppt) pos = bio.pos;
        } else {
            for (int pi = pkt_prc_off[pk]; pi < pkt_prc_off[pk + 1]; pi++) {
                int p = pkt_prc_ids[pi];
                for (int e = prc_cb_off[p]; e < prc_cb_off[p + 1]; e++) {
                    int inc;
                    if (!included[e])
                        inc = incl[p].decode(bio, cb_cx[e], cb_cy[e],
                                             layer + 1)
                                  ? 1
                                  : 0;
                    else
                        inc = bio.bit();
                    if (!inc) continue;
                    if (!included[e]) {
                        int im = imsb[p].decode_value(bio, cb_cx[e], cb_cy[e]);
                        if (im < 0) { *n_contrib = nout; *end_pos = pos; if (n_skipped) *n_skipped = skipped; return 1; }
                        int nb = prc_numbps[p] - im;
                        if (nb < 0) { *n_contrib = nout; *end_pos = pos; if (n_skipped) *n_skipped = skipped; return 1; }
                        entry_numbps[e] = nb;
                        included[e] = 1;
                    }
                    int npl = read_numpasses(bio);
                    while (bio.bit()) {
                        lblock[e]++;
                        if (lblock[e] > 32) { *n_contrib = nout; *end_pos = pos; if (n_skipped) *n_skipped = skipped; return 1; }
                    }
                    if (npasses_acc[e] + npl > 165) { *n_contrib = nout; *end_pos = pos; if (n_skipped) *n_skipped = skipped; return 1; }
                    int nseg = segment_splits(cb_style[e],
                                              (int)npasses_acc[e], npl,
                                              splits);
                    for (int si = 0; si < nseg; si++) {
                        int64_t nb = (int64_t)bio.bits(
                            lblock[e] + floor_log2(splits[si]));
                        contrib.push_back(e);
                        contrib.push_back(splits[si]);
                        contrib.push_back(nb);
                    }
                    npasses_acc[e] += npl;
                }
            }
            bio.align();
            if (!use_ppt) pos = bio.pos;
        }
        if (use_eph) {
            if (use_ppt) {
                if (hdr_reader.pos + 2 <= hdr_len &&
                    hdrs[hdr_reader.pos] == 0xFF &&
                    hdrs[hdr_reader.pos + 1] == 0x92)
                    hdr_reader.pos += 2;
            } else if (pos + 2 <= body_len && body[pos] == 0xFF &&
                       body[pos + 1] == 0x92) {
                pos += 2;
            }
        }
        for (size_t ci = 0; ci < contrib.size(); ci += 3) {
            int64_t e = contrib[ci], npl = contrib[ci + 1],
                    nb = contrib[ci + 2];
            if (pos + nb > body_len) { *n_contrib = nout; *end_pos = pos; if (n_skipped) *n_skipped = skipped; return 1; }  // body truncated
            if (!drop) {
                if (nout >= max_contrib) { *n_contrib = nout; *end_pos = pos; if (n_skipped) *n_skipped = skipped; return 2; }
                out_entry[nout] = (int32_t)e;
                out_npasses[nout] = (int32_t)npl;
                out_nbytes[nout] = nb;
                out_off[nout] = pos;
                nout++;
            }
            pos += nb;
        }
        // verify the parsed span against the PLT record: the
        // reference emits PLTs that do not match its own packet
        // sequence on POC / multi-tile-part streams, so a skip jump
        // based on them would desync — rc 3 tells the caller to
        // reparse without PLT (caught on the FIRST wanted packet
        // after any bad skip, before contributions are consumed)
        if (plt_verify && !use_ppt && pos - pkt_start != plt_lens[pk]) {
            *n_contrib = 0;
            *end_pos = pkt_start;
            if (n_skipped) *n_skipped = skipped;
            return 3;
        }
    }
    *n_contrib = nout;
    *end_pos = pos;
    if (n_skipped) *n_skipped = skipped;
    return 0;
}

}  // extern "C"

extern "C" {

// Merge packet contributions into codeword-segment byte lengths per
// codeblock row (the decode-side counterpart of segment_splits; parity:
// reference T2Decompress segment assembly). Contributions must be in
// stream order. Rows whose style has no termination bits are skipped
// (seg_out stays zero). seg_out is [nrows x max_segs], zero-initialised.
int merge_contrib_segments(const int32_t* c_row, const int64_t* c_np,
                           const int64_t* c_nb, int64_t ncontrib,
                           const int32_t* styles, const int64_t* nps,
                           int64_t nrows, int64_t* seg_out,
                           int32_t max_segs) {
    if (nrows <= 0) return 0;
    const int TMAX = 160;  // >= max passes (109) + slack
    int* targets = new int[(size_t)nrows * TMAX];
    int* ntarg = new int[nrows];
    int* ti = new int[nrows];
    int* nseg = new int[nrows];
    int64_t* acc_p = new int64_t[nrows];
    int64_t* acc_b = new int64_t[nrows];
    for (int64_t r = 0; r < nrows; r++) {
        ti[r] = nseg[r] = 0;
        acc_p[r] = acc_b[r] = 0;
        if (!(styles[r] & 0x45) || nps[r] <= 0) {
            ntarg[r] = -1;  // not segmented
            continue;
        }
        int np = (int)std::min<int64_t>(nps[r], TMAX - 1);
        ntarg[r] = segment_splits(styles[r], 0, np, targets + r * TMAX);
    }
    for (int64_t i = 0; i < ncontrib; i++) {
        int32_t r = c_row[i];
        if (r < 0 || r >= nrows || ntarg[r] < 0) continue;
        acc_b[r] += c_nb[i];
        acc_p[r] += c_np[i];
        const int* tg = targets + (int64_t)r * TMAX;
        while (ti[r] < ntarg[r] && acc_p[r] >= tg[ti[r]]) {
            acc_p[r] -= tg[ti[r]];
            ti[r]++;
            if (nseg[r] < max_segs) seg_out[(int64_t)r * max_segs + nseg[r]] = acc_b[r];
            nseg[r]++;
            acc_b[r] = 0;
        }
    }
    int mx = 0;
    for (int64_t r = 0; r < nrows; r++) {
        if (ntarg[r] < 0) continue;
        if (acc_b[r] && nseg[r] < max_segs)
            seg_out[(int64_t)r * max_segs + nseg[r]] = acc_b[r];
        if (acc_b[r]) nseg[r]++;
        if (nseg[r] > mx) mx = nseg[r];
    }
    delete[] targets;
    delete[] ntarg;
    delete[] ti;
    delete[] nseg;
    delete[] acc_p;
    delete[] acc_b;
    return mx;  // max segments actually used (<= max_segs or truncated)
}

}  // extern "C"
