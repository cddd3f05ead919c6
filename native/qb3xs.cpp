// qb3xs — native transfer-syntax helpers for the qb3_tpu engine.
//
// The QB3 stream is bit-serial: the position of group k+1 depends on group
// k's code lengths.  This module performs that serial walk at native speed,
// emitting per-group metadata (kind / value-code position / rung / common
// factor) that the TPU then consumes for fully parallel value decoding
// (qb3_tpu/ops/decode.py).  It mirrors qb3_tpu/offsets.py, the portable
// reference implementation, and is an original design: a flat bit-position
// cursor with absolute peeks, not a streaming accumulator.
//
// Also provides the RLE0 byte post-pass (spec: QB3encode.cpp:271-332,
// QB3decode.cpp:267-307) whose byte-serial scan is host work by nature.
//
// Build: make -C native   (produces libqb3xs.so, loaded via ctypes)

#include <cstdint>
#include <cstring>

#include "qb3xs_tables.inc"

namespace {

constexpr int B2 = 16;
constexpr uint32_t TBL = 0xFFF;

struct Bits {
    const uint8_t* data;
    size_t nbytes;
    int64_t pos = 0;  // bit cursor

    inline uint64_t peek() const {
        size_t byte = size_t(pos >> 3);
        // padded callers guarantee 8 readable bytes past the end; be safe
        uint64_t v = 0;
        size_t avail = nbytes > byte ? nbytes - byte : 0;
        if (avail >= 9) {
            uint64_t lo, hi8;
            memcpy(&lo, data + byte, 8);
            hi8 = data[byte + 8];
            int sh = int(pos & 7);
            return sh ? (lo >> sh) | (hi8 << (64 - sh)) : lo;
        }
        uint8_t tmp[9] = {0};
        memcpy(tmp, data + byte, avail > 9 ? 9 : avail);
        uint64_t lo;
        memcpy(&lo, tmp, 8);
        int sh = int(pos & 7);
        v = sh ? (lo >> sh) | (uint64_t(tmp[8]) << (64 - sh)) : lo;
        return v;
    }
};

inline int ubits_for(int tsize) {
    return tsize == 1 ? 3 : tsize == 2 ? 4 : tsize == 4 ? 5 : 6;
}

// computed decode for rung >= 2; returns len<<16 | unused, value via out
inline void qb3dsz(uint64_t w, int rung, int* len, uint64_t* val) {
    uint64_t rbit = 1ull << rung;
    if (!(w & 1)) {
        *len = rung;
        *val = (w & (rbit - 1)) >> 1;
        return;
    }
    uint64_t n = (w >> 1) & 1;
    uint64_t v = (w >> 2) & (rbit - 1);
    *len = rung + 1 + int(n);
    *val = n ? (v | rbit) : (v | (rbit >> 1));
}

inline void dec_single(uint64_t w, int rung, int* len, uint64_t* val) {
    if (rung <= 7) {
        uint16_t e = DSGL_T[rung][w & ((1u << (rung + 2)) - 1)];
        *len = e >> 12;
        *val = e & TBL;
        return;
    }
    qb3dsz(w, rung, len, val);
}

enum Kind : uint8_t { K_NORMAL = 0, K_ZERO, K_BITS, K_CF, K_CF0, K_IDX };

}  // namespace

extern "C" {

// Walk the stream; fills (nblocks*nbands)-sized arrays in stream order.
// Returns the final bit position, or a negative error code.
int64_t qb3xs_parse(const uint8_t* payload, size_t len_bytes, int64_t nblocks,
                    int nbands, int tsize, int is_ftl, const int32_t* entry_runbits,
                    const uint64_t* entry_cf, uint8_t* kind, int64_t* val_pos,
                    int32_t* vrung, uint64_t* cf_out, int32_t* rung_out) {
    const int u = ubits_for(tsize);
    const int nmask = (1 << u) - 1;
    const int lmask = (1 << (u + 1)) - 1;
    const uint16_t* dsw = DSW_T[u];
    const int maxbits = 8 * tsize;
    const uint64_t tmask = maxbits == 64 ? ~0ull : ((1ull << maxbits) - 1);
    const int64_t endbit = int64_t(len_bytes) * 8;

    int32_t runbits[256];
    uint64_t pcf[256];
    for (int c = 0; c < nbands; c++) {
        runbits[c] = entry_runbits ? entry_runbits[c] : 0;
        pcf[c] = entry_cf ? entry_cf[c] : 0;
    }

    Bits s{payload, len_bytes};
    int64_t gi = 0;
    for (int64_t b = 0; b < nblocks; b++) {
        for (int c = 0; c < nbands; c++, gi++) {
            if (s.pos > endbit) return -2;  // overrun
            uint64_t w = s.peek();
            int cs_len = 1, delta = 0;
            if (w & 1) {
                uint16_t e = dsw[(w >> 1) & lmask];
                cs_len = e >> 12;
                delta = e & TBL;
            }
            bool signal = !is_ftl && (w & 1) && delta == 0 && cs_len == u + 2;
            if (!signal) {
                int rung = (runbits[c] + delta) & nmask;
                runbits[c] = rung;
                s.pos += cs_len;
                rung_out[gi] = rung;
                vrung[gi] = rung;
                cf_out[gi] = 0;
                if (rung == 0) {
                    int flag = int(s.peek() & 1);
                    s.pos += 1;
                    val_pos[gi] = s.pos;
                    kind[gi] = flag ? K_BITS : K_ZERO;
                    if (flag) s.pos += B2;
                } else {
                    kind[gi] = K_NORMAL;
                    val_pos[gi] = s.pos;
                    if (rung <= 7) {
                        const uint16_t* t = DGRP_T[rung];
                        const uint32_t m = (1u << (rung + 2)) - 1;
                        for (int i = 0; i < B2; i++)
                            s.pos += t[s.peek() & m] >> 12;
                    } else {
                        for (int i = 0; i < B2; i++) {
                            int ln; uint64_t v;
                            qb3dsz(s.peek(), rung, &ln, &v);
                            s.pos += ln > 64 ? 65 : ln;
                        }
                    }
                }
                continue;
            }
            // extended encodings (QB3decode.h:624-716)
            s.pos += cs_len;
            uint16_t e2 = dsw[s.peek() & lmask];  // flagless codeswitch
            int rung = (runbits[c] + (e2 & TBL)) & nmask;
            s.pos += (e2 >> 12) - 1;
            if (rung != nmask) {  // CF group
                int cfrung = rung;
                int diff = int(s.peek() & 1);
                s.pos += 1;
                if (diff) {
                    int own = int(s.peek() & 1);
                    s.pos += 1;
                    if (own) {
                        uint16_t e3 = dsw[s.peek() & lmask];
                        cfrung = (rung + (e3 & TBL)) & nmask;
                        s.pos += (e3 >> 12) - 1;
                    }
                    int ln; uint64_t v;
                    dec_single(s.peek(), cfrung - own, &ln, &v);
                    if (ln > 64) return -3;
                    s.pos += ln;
                    pcf[c] = v + (own ? (1ull << cfrung) : 0);
                }
                uint64_t cf = pcf[c] + 2;
                cf_out[gi] = cf;
                vrung[gi] = rung;
                if (rung == 0) {
                    kind[gi] = K_CF0;
                    val_pos[gi] = s.pos;
                    s.pos += B2;
                    uint64_t v = 2 * cf - 1;
                    int tb = 63;
                    while (tb && !((v >> tb) & 1)) tb--;
                    runbits[c] = tb;
                } else {
                    kind[gi] = K_CF;
                    val_pos[gi] = s.pos;
                    uint64_t vals[B2];
                    if (rung <= 7) {
                        const uint16_t* t = DGRP_T[rung];
                        const uint32_t m = (1u << (rung + 2)) - 1;
                        for (int i = 0; i < B2; i++) {
                            uint16_t e = t[s.peek() & m];
                            s.pos += e >> 12;
                            vals[i] = e & TBL;
                        }
                    } else {
                        for (int i = 0; i < B2; i++) {
                            int ln; uint64_t v;
                            qb3dsz(s.peek(), rung, &ln, &v);
                            if (ln > 64) {
                                s.pos += 64;
                                v |= (s.peek() & 1) << 62;
                                s.pos += 1;
                            } else {
                                s.pos += ln;
                            }
                            vals[i] = v;
                        }
                    }
                    // step restore then magsmul OR for the runbits chain
                    uint32_t acc = 0;
                    for (int i = 0; i < B2; i++)
                        acc |= uint32_t((vals[i] >> rung) & 1) << i;
                    if ((acc & (acc + 1)) == 0) {
                        int ones = 0;
                        while (acc) { ones++; acc >>= 1; }
                        if (ones < B2) vals[ones] ^= 1ull << rung;
                    }
                    uint64_t used = 0;
                    for (int i = 0; i < B2; i++) {
                        uint64_t v = vals[i];
                        uint64_t mm = (((v >> 1) + (v & 1)) * (cf << 1) - (v & 1)) & tmask;
                        used |= v ? mm : 0;
                    }
                    int tb = 63;
                    used |= 1;
                    while (tb && !((used >> tb) & 1)) tb--;
                    runbits[c] = tb;
                }
                rung_out[gi] = runbits[c];
            } else {  // index group
                uint16_t e3 = dsw[s.peek() & lmask];
                rung = (runbits[c] + (e3 & TBL)) & nmask;
                runbits[c] = rung;
                s.pos += (e3 >> 12) - 1;
                kind[gi] = K_IDX;
                vrung[gi] = rung;
                rung_out[gi] = rung;
                cf_out[gi] = 0;
                val_pos[gi] = s.pos;
                int maxidx = 0;
                for (int i = 0; i < B2; i++) {
                    uint16_t e = IDXD[s.peek() & 0xF];
                    s.pos += e >> 12;
                    int v = e & TBL;
                    if (v > maxidx) maxidx = v;
                }
                for (int i = 0; i <= maxidx; i++) {
                    int ln; uint64_t v;
                    dec_single(s.peek(), rung, &ln, &v);
                    if (ln > 64) return -4;
                    s.pos += ln;
                }
            }
        }
    }
    if (s.pos > endbit) return -2;
    return s.pos;
}

// ---- RLE0 byte post-pass ----

int64_t qb3xs_rle0_encode(const uint8_t* src, int64_t len, uint8_t* dst) {
    const uint8_t* end = src + len;
    uint8_t* d = dst;
    uint8_t last = 0;
    while (src < end - 2) {
        uint8_t c = *src++;
        if (((uint8_t)(c + 1) & 0xFE) != 0 || c != src[0] ||
            (!c && (last == 0xFF || (end - src) < 3 || src[1] || src[2]))) {
            last = *d++ = c;
            continue;
        }
        src++;
        if (c == 0) {
            src += 2;
            c = 0;
            while (c < 0xFE && src < end && *src == 0) { c++; src++; }
        }
        last = 0;
        *d++ = 0xFF;
        *d++ = 0xFF;
        *d++ = c;
    }
    while (src < end) *d++ = *src++;
    return d - dst;
}

int64_t qb3xs_rle0_decode(const uint8_t* src, int64_t slen, uint8_t* dst, int64_t dlen) {
    const uint8_t* end = src + slen;
    uint8_t* d = dst;
    const uint8_t* last = dst + dlen;
    while (d < last && src < end - 2) {
        uint8_t c = *src++;
        if (c != 0xFF || src[0] != 0xFF) {
            *d++ = c;
            continue;
        }
        int64_t count;
        uint8_t fill;
        if (src[1] != 0xFF) { count = 4 + src[1]; fill = 0; }
        else { count = 2; fill = 0xFF; }
        if (last - d < count) return -1;
        src += 2;
        while (count--) *d++ = fill;
    }
    while (src < end && d < last) *d++ = *src++;
    if (src != end || d != last) return -1;
    return d - dst;
}

int64_t qb3xs_rle0_size(const uint8_t* src, int64_t len) {
    const uint8_t* end = src + len;
    int64_t count = 0;
    while (src < end - 2) {
        if (src[0] != 0xFF || src[1] != 0xFF) {
            count++;
            src++;
            continue;
        }
        count += (src[2] == 0xFF) ? 2 : (4 + int64_t(src[2]));
        src += 3;
    }
    return count + (end - src);
}

}  // extern "C"
