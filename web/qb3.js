/* qb3.js — dependency-free QB3 v2 decoder for browsers and JS runtimes.
 *
 * The client surface of the qb3_tpu engine: the counterpart of the
 * reference's emscripten decoder (wasm/qb3decapi.cpp + wasm/post.js), but
 * plain portable JavaScript — no build step, no WASM toolchain.  The
 * decode design is ported from this repo's own NumPy client (qb3_tpu/
 * lite.py) and serial walk (qb3_tpu/offsets.py): an absolute bit cursor
 * with arithmetic (table-free) VLC decoding.
 *
 *   import { getInfo, decode } from "./qb3.js";
 *   const info = getInfo(bytes);          // header probe
 *   const { data } = decode(bytes);       // TypedArray, H*W*C interleaved
 *
 * Supports all modes (FTL/BASE/BEST/RLE/STORED), all 8 dtypes (64-bit via
 * BigInt), quanta, core bands, scan curves, small images.
 */

const B = 4, B2 = 16;
const HILBERT = 0x01548cd9aefb7623n;
const DTYPES = ["u8", "i8", "u16", "i16", "u32", "i32", "u64", "i64"];
const TSIZE = [1, 1, 2, 2, 4, 4, 8, 8];
const MODE_STORED = 255, MODE_FTL = 8;
const RLE_MODES = new Set([2, 3, 6, 7]); // RLE, CF_RLE, RLE_H, CF_RLE_H
const ZCURVE_MODES = new Set([0, 1, 2, 3]); // legacy z-curve modes
const FTL_EQ = new Set([8]);

// ---------------------------------------------------------------- container

export function getInfo(bytes) {
  const d = bytes instanceof Uint8Array ? bytes : new Uint8Array(bytes);
  if (d.length < 15 || d[0] !== 0x51 || d[1] !== 0x42 || d[2] !== 0x33 || d[3] !== 0x80)
    throw new Error("not a QB3 stream");
  const u16 = (o) => d[o] | (d[o + 1] << 8);
  const info = {
    xsize: u16(4) + 1, ysize: u16(6) + 1, nbands: d[8] + 1,
    dtype: DTYPES[d[9]], dtypeCode: d[9], mode: d[10],
    quanta: 1, order: 0n, cband: null, dataOffset: 0,
  };
  if (d[9] > 7) throw new Error("bad dtype");
  if (info.mode >= 10 && info.mode !== MODE_STORED) throw new Error("bad mode");
  if (ZCURVE_MODES.has(info.mode)) info.order = 0x0145236789cdabefn;
  info.cband = Array.from({ length: info.nbands }, (_, i) => i);
  let pos = 11;
  for (;;) {
    if (pos + 2 > d.length) throw new Error("truncated headers");
    const sig = String.fromCharCode(d[pos], d[pos + 1]);
    if (sig === "DT") { info.dataOffset = pos + 2; break; }
    const ln = u16(pos + 2);
    if (sig === "QV") {
      info.quanta = 0;
      for (let i = ln - 1; i >= 0; i--) info.quanta = info.quanta * 256 + d[pos + 4 + i];
      pos += 4 + ln;
    } else if (sig === "CB") {
      info.cband = Array.from(d.subarray(pos + 4, pos + 4 + ln));
      pos += 4 + ln;
    } else if (sig === "SC") {
      let v = 0n;
      for (let i = 7; i >= 0; i--) v = (v << 8n) | BigInt(d[pos + 4 + i]);
      info.order = v;
      pos += 4 + ln;
    } else if (d[pos] & 0x20) {
      pos += ln; // skippable chunk: len counts from the chunk start
    } else {
      throw new Error("unknown chunk " + sig);
    }
  }
  return info;
}

// ------------------------------------------------------------------- RLE0

function rle0Size(d) {
  let n = 0, i = 0;
  while (i + 2 < d.length) {
    if (d[i] !== 0xff || d[i + 1] !== 0xff) { n++; i++; }
    else { n += d[i + 2] === 0xff ? 2 : 4 + d[i + 2]; i += 3; }
  }
  return n + (d.length - i);
}

function rle0Decode(d) {
  const out = new Uint8Array(rle0Size(d));
  let i = 0, o = 0;
  while (i + 2 < d.length) {
    if (d[i] !== 0xff || d[i + 1] !== 0xff) { out[o++] = d[i++]; continue; }
    if (d[i + 2] === 0xff) { out[o++] = 0xff; out[o++] = 0xff; }
    else out.fill(0, o, (o += 4 + d[i + 2]));
    i += 3;
  }
  while (i < d.length) out[o++] = d[i++];
  return out;
}

// ----------------------------------------------------- bit reader (Number)

// Numbers hold 53 exact bits; peek() returns >= 40 valid stream bits, enough
// for any code of the 8/16/32-bit types (max 34 bits).  64-bit types use
// the BigInt reader below.
class Bits {
  constructor(data) { this.d = data; this.pos = 0; }
  peek() {
    const byte = this.pos >>> 3, d = this.d;
    const b = (i) => (byte + i < d.length ? d[byte + i] : 0);
    const v = b(0) + b(1) * 0x100 + b(2) * 0x10000 + b(3) * 0x1000000 +
      b(4) * 0x100000000 + b(5) * 0x10000000000;
    return Math.floor(v / 2 ** (this.pos & 7));
  }
}

class BitsBig {
  constructor(data) { this.d = data; this.pos = 0; }
  peek() { // >= 66 valid bits
    const byte = this.pos >>> 3, d = this.d;
    let v = 0n;
    for (let i = 9; i >= 0; i--)
      v = (v << 8n) | BigInt(byte + i < d.length ? d[byte + i] : 0);
    return v >> BigInt(this.pos & 7);
  }
}

// ------------------------------------------------- arithmetic VLC decoding

const bit = (w, i) => Math.floor(w / 2 ** i) % 2;
const low = (w, n) => w % 2 ** n;

// base 3-range decode -> [len, value]; no swap (rung 0: one literal bit)
function dszPlain(w, rung) {
  if (rung === 0) return [1, w % 2];
  if (w % 2 === 0) return [rung, low(Math.floor(w / 2), rung - 1)];
  const n = bit(w, 1), v = low(Math.floor(w / 4), rung);
  return n ? [rung + 2, v + 2 ** rung] : [rung + 1, v + 2 ** (rung - 1)];
}

// group/single-context swap of the decoded value (tables.py middle swaps)
function swapVal(v, rung, group) {
  let a = -1;
  if (rung >= 3 && rung <= 7) a = 2 ** rung - 1;
  else if (group && rung === 1) a = 1;
  else if (group && rung === 2) a = 3;
  if (v === a) return a + 1;
  if (v === a + 1) return a;
  return v;
}

function dsz(w, rung, group) {
  const [ln, v] = dszPlain(w, rung);
  return [ln, swapVal(v, rung, group)];
}

// BigInt variants for the 64-bit types (codes up to 65 bits)
function dszPlainBig(w, rung) {
  if (rung === 0) return [1, w & 1n];
  const r = BigInt(rung);
  if ((w & 1n) === 0n) return [rung, (w >> 1n) & ((1n << (r - 1n)) - 1n)];
  const n = (w >> 1n) & 1n, v = (w >> 2n) & ((1n << r) - 1n);
  return n ? [rung + 2, v | (1n << r)] : [rung + 1, v | (1n << (r - 1n))];
}

function dszBig(w, rung, group) {
  const [ln, v0] = dszPlainBig(w, rung);
  let a = -1n;
  if (rung >= 3 && rung <= 7) a = (1n << BigInt(rung)) - 1n;
  else if (group && rung === 1) a = 1n;
  else if (group && rung === 2) a = 3n;
  let v = v0;
  if (v === a) v = a + 1n;
  else if (v === a + 1n) v = a;
  return [ln, v];
}

// codeswitch decode: w = stream bits AT the flag -> [bits consumed, delta]
// (delta 0 with full length == SIGNAL form; tables.py _make_dsw)
function csw(w, u, big) {
  const w0 = big ? Number(w & 0xffffn) : low(w, 16);
  if (w0 % 2 === 0) return [1, 0, false];
  const [ln, v] = dszPlain(Math.floor(w0 / 2), u - 1);
  const sv = v % 2 ? -((v - 1) / 2 + 1) : v / 2;
  const delta = sv >= 0 ? (sv + 1) % 2 ** (u - 1) : (sv + 2 ** u) % 2 ** u;
  return [ln + 1, delta, delta === 0 && ln === u + 1];
}

// ------------------------------------------------------------ group decode

function decodeGroupsNum(data, nblocks, nbands, tsize, ftl) {
  // -> per-group Float64-safe values in mag-sign form (Array of Uint32Array)
  const u = tsize === 1 ? 3 : tsize === 2 ? 4 : 5;
  const nmask = 2 ** u - 1;
  const s = new Bits(data);
  const runbits = new Array(nbands).fill(0);
  const pcf = new Array(nbands).fill(0);
  const out = new Float64Array(nblocks * nbands * B2);
  const g = new Float64Array(B2);
  for (let b = 0; b < nblocks; b++) {
    for (let c = 0; c < nbands; c++) {
      let w = s.peek();
      const [csLen, delta, signal0] = csw(w, u, false);
      const signal = !ftl && signal0;
      let rung, kind = 0, cf = 0; // kind 0=group 1=zero 2=bits 3=cf 4=cf0 5=idx
      if (!signal) {
        rung = (runbits[c] + delta) & nmask;
        runbits[c] = rung;
        s.pos += csLen;
        if (rung === 0) {
          kind = bit(s.peek(), 0) ? 2 : 1;
          s.pos += 1;
        }
      } else {
        s.pos += csLen;
        const [l2, d2] = csw(s.peek() * 2 + 1, u, false); // flagless
        rung = (runbits[c] + d2) & nmask;
        s.pos += l2 - 1;
        if (rung !== nmask) { // CF group
          let cfrung = rung;
          const diff = bit(s.peek(), 0); s.pos += 1;
          if (diff) {
            const own = bit(s.peek(), 0); s.pos += 1;
            if (own) {
              const [l3, d3] = csw(s.peek() * 2 + 1, u, false);
              cfrung = (rung + d3) & nmask;
              s.pos += l3 - 1;
            }
            const [ln, v] = dsz(s.peek(), cfrung - own, false);
            s.pos += ln;
            pcf[c] = v + (own ? 2 ** cfrung : 0);
          }
          cf = pcf[c] + 2;
          kind = rung === 0 ? 4 : 3;
        } else { // index group
          const [l3, d3] = csw(s.peek() * 2 + 1, u, false);
          rung = (runbits[c] + d3) & nmask;
          runbits[c] = rung;
          s.pos += l3 - 1;
          kind = 5;
        }
      }
      // ---- 16 values
      if (kind === 1) g.fill(0);
      else if (kind === 2 || kind === 4) {
        for (let i = 0; i < B2; i++) { g[i] = bit(s.peek(), 0); s.pos += 1; }
      } else if (kind === 5) {
        let maxidx = 0;
        for (let i = 0; i < B2; i++) {
          const [ln, v] = dsz(s.peek(), 2, false); // plain rung-2 index code
          s.pos += ln;
          g[i] = v; if (v > maxidx) maxidx = v;
        }
        const uq = new Float64Array(8);
        for (let i = 0; i <= maxidx; i++) {
          const [ln, v] = dsz(s.peek(), rung, false);
          s.pos += ln;
          uq[i] = v;
        }
        for (let i = 0; i < B2; i++) g[i] = uq[g[i]];
      } else {
        for (let i = 0; i < B2; i++) {
          const [ln, v] = dsz(s.peek(), rung, true);
          s.pos += ln;
          g[i] = v;
        }
      }
      // step restore (skipped for FTL normal groups; always for CF)
      if ((kind === 3 || (kind === 0 && !ftl)) && rung >= 1) {
        let acc = 0;
        for (let i = 0; i < B2; i++) acc |= bit(g[i], rung) << i;
        if ((acc & (acc + 1)) === 0) {
          const ones = 32 - Math.clz32(acc);
          if (ones < B2) g[ones] = g[ones] >= 2 ** rung ? g[ones] - 2 ** rung : g[ones] + 2 ** rung;
        }
      }
      if (kind === 3) { // multiply back: magsmul, exact mod 2^tbits
        const mod = 2 ** (8 * tsize);
        let used = 0;
        for (let i = 0; i < B2; i++) {
          const v = g[i];
          if (v) {
            const a = Math.floor(v / 2) + v % 2, b2 = cf * 2;
            // split multiply keeps every partial product under 2^53
            let m = ((a % 65536) * b2) % mod;
            m = (m + ((Math.floor(a / 65536) * b2) % mod) * 65536) % mod;
            m = (m - v % 2 + mod) % mod;
            g[i] = m;
            if (m > used) used = m;
          } else g[i] = 0;
        }
        runbits[c] = used ? Math.floor(Math.log2(used)) : 0;
      } else if (kind === 4) {
        const neg = (cf - 1) * 2 + 1;
        for (let i = 0; i < B2; i++) g[i] = g[i] ? neg : 0;
        runbits[c] = Math.floor(Math.log2(neg));
      }
      out.set(g, (b * nbands + c) * B2);
    }
  }
  return out;
}

function decodeGroupsBig(data, nblocks, nbands, ftl) {
  const u = 6, nmask = 63;
  const s = new BitsBig(data);
  const runbits = new Array(nbands).fill(0);
  const pcf = new Array(nbands).fill(0n);
  const out = new BigUint64Array(nblocks * nbands * B2);
  const g = new BigUint64Array(B2);
  const M = (1n << 64n) - 1n;
  for (let b = 0; b < nblocks; b++) {
    for (let c = 0; c < nbands; c++) {
      const [csLen, delta, signal0] = csw(s.peek(), u, true);
      const signal = !ftl && signal0;
      let rung, kind = 0, cf = 0n;
      if (!signal) {
        rung = (runbits[c] + delta) & nmask;
        runbits[c] = rung;
        s.pos += csLen;
        if (rung === 0) { kind = (s.peek() & 1n) ? 2 : 1; s.pos += 1; }
      } else {
        s.pos += csLen;
        const [l2, d2] = csw((s.peek() << 1n) | 1n, u, true);
        rung = (runbits[c] + d2) & nmask;
        s.pos += l2 - 1;
        if (rung !== nmask) {
          let cfrung = rung;
          const diff = Number(s.peek() & 1n); s.pos += 1;
          if (diff) {
            const own = Number(s.peek() & 1n); s.pos += 1;
            if (own) {
              const [l3, d3] = csw((s.peek() << 1n) | 1n, u, true);
              cfrung = (rung + d3) & nmask;
              s.pos += l3 - 1;
            }
            const [ln, v] = dszBig(s.peek(), Math.max(cfrung - own, 0), false);
            s.pos += ln;
            pcf[c] = v + (own ? 1n << BigInt(cfrung) : 0n);
          }
          cf = pcf[c] + 2n;
          kind = rung === 0 ? 4 : 3;
        } else {
          const [l3, d3] = csw((s.peek() << 1n) | 1n, u, true);
          rung = (runbits[c] + d3) & nmask;
          runbits[c] = rung;
          s.pos += l3 - 1;
          kind = 5;
        }
      }
      if (kind === 1) g.fill(0n);
      else if (kind === 2 || kind === 4) {
        for (let i = 0; i < B2; i++) { g[i] = s.peek() & 1n; s.pos += 1; }
      } else if (kind === 5) {
        let maxidx = 0n;
        for (let i = 0; i < B2; i++) {
          const [ln, v] = dszBig(s.peek(), 2, false);
          s.pos += ln;
          g[i] = v; if (v > maxidx) maxidx = v;
        }
        const uq = new BigUint64Array(8);
        for (let i = 0n; i <= maxidx; i++) {
          const [ln, v] = dszBig(s.peek(), rung, false);
          s.pos += ln;
          uq[Number(i)] = v;
        }
        for (let i = 0; i < B2; i++) g[i] = uq[Number(g[i])];
      } else {
        for (let i = 0; i < B2; i++) {
          let [ln, v] = dszBig(s.peek(), rung, true);
          if (ln === 65) { // rung-63 long form: 65th bit is bit 62 of the value
            s.pos += 64;
            v |= (s.peek() & 1n) << 62n;
            s.pos += 1;
          } else s.pos += ln;
          g[i] = v;
        }
      }
      if ((kind === 3 || (kind === 0 && !ftl)) && rung >= 1) {
        const r = BigInt(rung);
        let acc = 0;
        for (let i = 0; i < B2; i++) acc |= Number((g[i] >> r) & 1n) << i;
        if ((acc & (acc + 1)) === 0) {
          const ones = 32 - Math.clz32(acc);
          if (ones < B2) g[ones] ^= 1n << r;
        }
      }
      if (kind === 3) {
        let used = 0n;
        for (let i = 0; i < B2; i++) {
          const v = g[i];
          g[i] = v ? (((v >> 1n) + (v & 1n)) * (cf << 1n) - (v & 1n)) & M : 0n;
          used |= g[i];
        }
        runbits[c] = (used | 1n).toString(2).length - 1;
      } else if (kind === 4) {
        const neg = ((cf - 1n) << 1n) | 1n;
        for (let i = 0; i < B2; i++) g[i] = g[i] ? neg : 0n;
        runbits[c] = neg.toString(2).length - 1;
      }
      out.set(g, (b * nbands + c) * B2);
    }
  }
  return out;
}

// -------------------------------------------------------------- placement

function curveOffsets(order) {
  const offs = [];
  for (let i = 0; i < 16; i++) {
    const nib = Number((order >> BigInt((15 - i) * 4)) & 0xfn);
    offs.push([nib >> 2, nib & 3]);
  }
  return offs;
}

function blockOrigins(size) {
  const n = Math.ceil(size / B), out = [];
  for (let i = 0; i < n; i++) out.push(i * B);
  out[n - 1] = size - B;
  return out;
}

function reconstructNum(gvals, h, w, nbands, order, cband, tbits, Arr) {
  const img = new Arr(h * w * nbands);
  const offs = curveOffsets(order);
  const ys = blockOrigins(h), xs = blockOrigins(w);
  const mod = 2 ** tbits;
  const prev = new Float64Array(nbands);
  let gi = 0;
  for (const y of ys) for (const x of xs) {
    for (let c = 0; c < nbands; c++, gi++) {
      let p = prev[c];
      for (let i = 0; i < B2; i++) {
        const v = gvals[gi * B2 + i];
        const sv = v % 2 ? -((v - 1) / 2 + 1) : v / 2;
        p = (((p + sv) % mod) + mod) % mod;
        img[((y + offs[i][0]) * w + x + offs[i][1]) * nbands + c] = p;
      }
      prev[c] = p;
    }
  }
  for (let c = 0; c < nbands; c++) if (cband[c] !== c)
    for (let i = c; i < img.length; i += nbands)
      img[i] += img[i - c + cband[c]];
  return img;
}

function reconstructBig(gvals, h, w, nbands, order, cband) {
  const img = new BigUint64Array(h * w * nbands);
  const offs = curveOffsets(order);
  const ys = blockOrigins(h), xs = blockOrigins(w);
  const M = (1n << 64n) - 1n;
  const prev = new BigUint64Array(nbands);
  let gi = 0;
  for (const y of ys) for (const x of xs) {
    for (let c = 0; c < nbands; c++, gi++) {
      let p = prev[c];
      for (let i = 0; i < B2; i++) {
        const v = gvals[gi * B2 + i];
        const sv = (v >> 1n) ^ (0n - (v & 1n));
        p = (p + sv) & M;
        img[((y + offs[i][0]) * w + x + offs[i][1]) * nbands + c] = p;
      }
      prev[c] = p;
    }
  }
  for (let c = 0; c < nbands; c++) if (cband[c] !== c)
    for (let i = c; i < img.length; i += nbands)
      img[i] += img[i - c + cband[c]];
  return img;
}

// ------------------------------------------------------------------ decode

const OUT_ARR = {
  u8: Uint8Array, i8: Int8Array, u16: Uint16Array, i16: Int16Array,
  u32: Uint32Array, i32: Int32Array, u64: BigUint64Array, i64: BigInt64Array,
};
const UNS_ARR = { 1: Uint8Array, 2: Uint16Array, 4: Uint32Array, 8: BigUint64Array };

export function decode(bytes) {
  const raw = bytes instanceof Uint8Array ? bytes : new Uint8Array(bytes);
  const info = getInfo(raw);
  const { xsize: w, ysize: h, nbands: nb } = info;
  const tsize = TSIZE[info.dtypeCode];
  const tbits = 8 * tsize;
  let data = raw.subarray(info.dataOffset);

  if (info.mode === MODE_STORED) {
    const out = new OUT_ARR[info.dtype](
      data.buffer.slice(data.byteOffset, data.byteOffset + h * w * nb * tsize));
    return { info, data: out };
  }
  if (RLE_MODES.has(info.mode)) data = rle0Decode(data);

  let dh = h, dw = w;
  if (w < B || h < B) {
    const ngroups = Math.ceil((h * w) / B2);
    if (w < B) { dw = B; dh = ngroups * B; } else { dh = B; dw = ngroups * B; }
  }
  const nblocks = Math.ceil(dh / B) * Math.ceil(dw / B);
  const order = info.order === 0n ? HILBERT : info.order;
  const ftl = FTL_EQ.has(info.mode);
  let uns;
  if (tsize === 8) {
    const g = decodeGroupsBig(data, nblocks, nb, ftl);
    uns = reconstructBig(g, dh, dw, nb, order, info.cband);
  } else {
    const g = decodeGroupsNum(data, nblocks, nb, tsize, ftl);
    uns = reconstructNum(g, dh, dw, nb, order, info.cband, tbits, UNS_ARR[tsize]);
  }
  if (dh !== h || dw !== w) uns = unpackSmall(uns, h, w, nb, w < B, tsize);
  let out = new OUT_ARR[info.dtype](uns.buffer, uns.byteOffset, h * w * nb);
  if (info.quanta > 1) out = dequantize(out, info.quanta, info.dtype, tsize);
  return { info, data: out };
}

function unpackSmall(uns, h, w, nb, narrow, tsize) {
  // inverse of the encoder's B-aligned repack (api.py repack_small)
  const n = h * w * nb;
  const out = new uns.constructor(n);
  if (narrow) { out.set(uns.subarray(0, n)); return out; }
  // short-and-wide: stored column by column
  let k = 0;
  for (let x = 0; x < w; x++) for (let y = 0; y < h; y++)
    for (let c = 0; c < nb; c++) out[(y * w + x) * nb + c] = uns[k++];
  return out;
}

function dequantize(arr, q, dtype, tsize) {
  const signed = dtype[0] === "i";
  if (tsize === 8) {
    const qb = BigInt(q);
    const max = signed ? (1n << 63n) - 1n : (1n << 64n) - 1n;
    const min = signed ? -(1n << 63n) : 0n;
    const maxi = max / qb, mini = min / qb; // trunc, matching C division
    for (let i = 0; i < arr.length; i++) {
      const v = arr[i];
      arr[i] = v > maxi ? max : (signed && q > 2 && v < mini ? min : v * qb);
    }
    return arr;
  }
  const tbits = 8 * tsize;
  const max = signed ? 2 ** (tbits - 1) - 1 : 2 ** tbits - 1;
  const min = signed ? -(2 ** (tbits - 1)) : 0;
  const maxi = Math.floor(max / q);
  const mini = Math.trunc(min / q); // trunc, matching C division
  for (let i = 0; i < arr.length; i++) {
    const v = arr[i];
    arr[i] = v > maxi ? max : (signed && q > 2 && v < mini ? min : v * q);
  }
  return arr;
}
