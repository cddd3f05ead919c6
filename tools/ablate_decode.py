"""Ablation timing of the fused u8 indexed-decode kernel on the real chip.

Each variant is ONE jit (same dispatch cost), with a pipeline stage replaced
by a cheap stand-in, so differences isolate in-kernel cost:
  full          gather + wavefront + reconstruct
  nogather      regs = broadcast word0 (no gather_slabs)
  norecon       reconstruct replaced by a byte-sum reduce
  gatheronly    gather + reduce
Also sweeps gather_slabs tile params (G, sub).
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def sustained(fn, iters=30):
    from qb3_tpu.benchutil import sustained as _s
    return _s(fn, iters)


def main():
    import jax
    import jax.numpy as jnp

    import qb3_tpu
    from qb3_tpu import container
    from qb3_tpu.api import _indexed_window_R
    from qb3_tpu.constants import HILBERT, B2
    from qb3_tpu.ops import decode as D
    from qb3_tpu.ops.decode import payload_words
    from qb3_tpu.ops.pack_pallas import gather_slabs

    from bench import natural_image

    h, w, nb = 512, 512, 3
    img = natural_image(h, w, nb)
    raw_mb = img.nbytes / 1e6
    stream = qb3_tpu.encode(img, mode=qb3_tpu.Mode.FTL, index=True)
    info = container.parse_headers(stream)
    payload = stream[info.data_offset:]
    wordsv = payload_words(payload)
    nw = 1 << max(4, int(np.ceil(np.log2(len(wordsv)))))
    wpad = np.zeros(nw, np.uint64)
    wpad[: len(wordsv)] = wordsv
    glens = np.frombuffer(info.index, dtype="<u2").astype(np.int32)
    nblocks = (h // 4) * (w // 4)
    ngroups = nblocks * nb
    R = _indexed_window_R(glens, 8)
    dw = jax.device_put(jnp.asarray(wpad))
    dg = jax.device_put(jnp.asarray(glens))

    def wavefront(words64, glens, gather_mode, G=256, sub=16, R=R, i32=False):
        """decode_indexed_narrow body with a pluggable gather stage."""
        W = jnp.uint32
        ubits = 3
        nmask = 7
        ends = jnp.cumsum(glens.astype(jnp.int32 if i32 else jnp.int64))
        goff = ends - glens
        base = (goff >> 5).astype(jnp.int32)
        off0 = (goff & 31).astype(jnp.int32)
        NREG = 8
        words32 = jax.lax.bitcast_convert_type(words64, jnp.uint32).reshape(-1)
        if gather_mode == "pallas":
            pad = (-ngroups) % G
            basep = jnp.concatenate([base, jnp.broadcast_to(base[-1], (pad,))]) if pad else base
            Rg = R if G == 256 else max(256, -(-((G * 160) // 32 + NREG + 130) // 128) * 128)
            regs_arr = gather_slabs(words32, basep, G, NREG, Rg, sub=sub)[:ngroups]
        elif gather_mode in ("onehot", "onehot-take"):
            from qb3_tpu.ops.gather import gather_slabs_onehot
            pad = (-ngroups) % G
            basep = jnp.concatenate([base, jnp.broadcast_to(base[-1], (pad,))]) if pad else base
            Rg = max(128, -(-((G * 160) // 32 + NREG + 130) // 128) * 128)
            regs_arr = gather_slabs_onehot(words32, basep, G, NREG, Rg,
                                           row_matmul=gather_mode == "onehot")[:ngroups]
        elif gather_mode == "xla":
            regs_arr = words32[base[:, None] + jnp.arange(NREG)[None, :]]
        else:  # none
            regs_arr = jnp.broadcast_to(words32[:NREG][None, :], (ngroups, NREG))
        return regs_arr, goff, off0, base

    def decode_body_per7(regs_arr, off0, glens):
        """Window-based wavefront: 7 values per 64-bit window (u8 codes are
        <= 9 bits), 3 windows per group, no accumulator refill logic."""
        from qb3_tpu.ops.decode import _DSW_LEN, _DSW_DELTA, _vlc_decode_arith
        W = jnp.uint32
        ubits, nmask = 3, 7
        NREG = 8
        regs = [regs_arr[:, i] for i in range(NREG)]
        regs += [jnp.zeros_like(regs[0]), jnp.zeros_like(regs[0])]

        def window(off):
            wi = off >> 5
            sh = (off & 31).astype(jnp.uint64)
            lo = regs[NREG - 1]
            hi = regs[NREG]
            w2 = regs[NREG + 1]
            for i in range(NREG - 2, -1, -1):
                lo = jnp.where(wi == i, regs[i], lo)
                hi = jnp.where(wi == i, regs[i + 1], hi)
            for i in range(NREG - 3, -1, -1):
                w2 = jnp.where(wi == i, regs[i + 2], w2)
            w = (lo.astype(jnp.uint64) | (hi.astype(jnp.uint64) << 32)) >> sh
            return w | jnp.where(sh == 0, jnp.uint64(0),
                                 w2.astype(jnp.uint64) << ((jnp.uint64(64) - sh) & 63))

        w0 = window(off0).astype(W)
        has_cs = (w0 & 1) == 1
        idx = ((w0 >> 1) & W(15)).astype(jnp.int32)
        cs_len = jnp.where(has_cs, _DSW_LEN[ubits, idx], 1)
        delta = jnp.where(has_cs, _DSW_DELTA[ubits, idx], 0)
        rung = (jnp.cumsum(delta.reshape(nblocks, nb), axis=0) & nmask).reshape(-1)
        rung0 = rung == 0
        flag = ((w0 >> cs_len.astype(W)) & 1).astype(jnp.int32)
        is_bits = rung0 & (flag == 1)
        is_group = ~rung0
        off = off0 + cs_len + jnp.where(rung0, 1, 0)

        per = 7
        takes = np.minimum(per, B2 - np.arange(0, B2, per))

        def body(off, take):
            w = window(off)
            shift = jnp.zeros_like(off)
            outs = []
            for t in range(per):
                ww = (w >> shift.astype(jnp.uint64)).astype(W)
                gv, gl = _vlc_decode_arith(ww, rung, W)
                v = jnp.where(is_group, gv, jnp.where(is_bits, ww & 1, W(0)))
                ln = jnp.where(is_group, gl, jnp.where(is_bits, 1, 0))
                live = t < take
                outs.append(jnp.where(live, v, 0))
                shift = shift + jnp.where(live, ln, 0)
            return (off + shift).astype(jnp.int32), jnp.stack(outs, axis=-1)

        _, vals = jax.lax.scan(body, off, jnp.asarray(takes))
        return jnp.moveaxis(vals, 0, 1).reshape(ngroups, -1)[:, :B2]

    def decode_body(regs_arr, off0, glens):
        """The register-window wavefront after gathering (from decode_indexed_narrow)."""
        W = jnp.uint32
        from qb3_tpu.ops.decode import _DSW_LEN, _DSW_DELTA, _vlc_decode_arith
        ubits, nmask = 3, 7
        NREG = 8
        regs = [regs_arr[:, i] for i in range(NREG)]
        regs += [jnp.zeros_like(regs[0]), jnp.zeros_like(regs[0])]

        def selreg(k):
            out = regs[NREG]
            for i in range(NREG - 1, -1, -1):
                out = jnp.where(k == i, regs[i], out)
            return out.astype(jnp.uint64)

        def window(off):
            wi = off >> 5
            sh = (off & 31).astype(W)
            lo = regs[NREG - 1]
            hi = regs[NREG]
            for i in range(NREG - 2, -1, -1):
                lo = jnp.where(wi == i, regs[i], lo)
                hi = jnp.where(wi == i, regs[i + 1], hi)
            high = jnp.where(sh == 0, W(0), hi << ((W(32) - sh) & 31))
            return (lo >> sh) | high

        w0 = window(off0)
        has_cs = (w0 & 1) == 1
        idx = ((w0 >> 1) & W(15)).astype(jnp.int32)
        cs_len = jnp.where(has_cs, _DSW_LEN[ubits, idx], 1)
        delta = jnp.where(has_cs, _DSW_DELTA[ubits, idx], 0)
        rung = (jnp.cumsum(delta.reshape(nblocks, nb), axis=0) & nmask).reshape(-1)
        rung0 = rung == 0
        flag = ((w0 >> cs_len.astype(W)) & 1).astype(jnp.int32)
        is_bits = rung0 & (flag == 1)
        is_group = ~rung0
        off = off0 + cs_len + jnp.where(rung0, 1, 0)

        per = 3
        takes = np.minimum(per, B2 - np.arange(0, B2, per))
        k0 = off >> 5
        acc0 = (selreg(k0) | (selreg(k0 + 1) << 32)) >> (off & 31).astype(jnp.uint64)
        navail0 = 64 - (off & 31)
        k0 = k0 + 2

        def body(carry, take):
            acc, navail, k = carry
            shift = jnp.zeros_like(navail)
            outs = []
            for t in range(per):
                ww = (acc >> shift.astype(jnp.uint64)).astype(W)
                gv, gl = _vlc_decode_arith(ww, rung, W)
                v = jnp.where(is_group, gv, jnp.where(is_bits, ww & 1, W(0)))
                ln = jnp.where(is_group, gl, jnp.where(is_bits, 1, 0))
                live = t < take
                outs.append(jnp.where(live, v, 0))
                shift = shift + jnp.where(live, ln, 0)
            acc = acc >> shift.astype(jnp.uint64)
            navail = navail - shift
            need = navail < 27
            fill = jnp.where(need, selreg(k), jnp.uint64(0))
            acc = acc | (fill << navail.astype(jnp.uint64))
            navail = navail + jnp.where(need, 32, 0)
            k = k + jnp.where(need, 1, 0)
            return (acc, navail, k), jnp.stack(outs, axis=-1)

        _, vals = jax.lax.scan(body, (acc0, navail0, k0), jnp.asarray(takes))
        return jnp.moveaxis(vals, 0, 1).reshape(ngroups, -1)[:, :B2]

    variants = {}

    def make(gather_mode, recon, G=256, sub=16, i32=False, per7=False):
        def run(words64, glens):
            regs_arr, goff, off0, base = wavefront(words64, glens, gather_mode,
                                                   G, sub, i32=i32)
            if recon == "prep_only":
                return jnp.sum(base) + jnp.sum(off0)
            if recon == "skip_wave":
                return jnp.sum(regs_arr, dtype=jnp.uint32)
            body_fn = decode_body_per7 if per7 else decode_body
            g = body_fn(regs_arr, off0, glens)
            if recon == "full":
                gg = g.reshape(nblocks, nb, B2)
                im, _ = D.reconstruct(gg, jnp.zeros(nb, jnp.uint64), h, w, nb,
                                      HILBERT, (1, 1, 1), np.uint8)
                return im
            return jnp.sum(g, dtype=jnp.uint32)

        return jax.jit(run)

    cases = [
        ("full onehot acc (current)", make("onehot", "full", G=128, i32=True)),
        ("full onehot per7", make("onehot", "full", G=128, i32=True, per7=True)),
        ("wave only acc", make("none", "sum", i32=True)),
        ("wave only per7", make("none", "sum", i32=True, per7=True)),
    ]
    for name, fn in cases:
        try:
            out = fn(dw, dg)
            ok = ""
            if "full" in name:
                ok = f" ok={bool((np.asarray(out).reshape(img.shape) == img).all())}"
            t = sustained(lambda: fn(dw, dg))
            print(f"{name:28s}: {1e3*t:7.3f} ms  {raw_mb/t:6.0f} MB/s{ok}", flush=True)
        except Exception as e:
            print(f"{name:28s}: FAILED {type(e).__name__}: {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
