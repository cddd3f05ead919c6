"""Conformance sweep on the DEFAULT backend (the real chip).

The pytest suite pins the CPU backend (tests/conftest.py); this sweep
re-runs the core oracle checks where the TPU-only code paths live (Pallas
placement, MXU one-hot gathers, register wavefronts), catching
chip-specific divergences the CPU suite cannot."""

import sys

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tests")


def main():
    import jax

    import qb3_tpu
    import refqb3
    from qb3_tpu.constants import Mode
    from tests import corpus

    print(f"backend: {jax.default_backend()}", flush=True)
    assert refqb3.available(), "oracle not built"
    checks = 0

    def check(img, mode, index=False, **kw):
        nonlocal checks
        ours = qb3_tpu.encode(img, mode=mode, index=index, **kw)
        small = img.shape[0] < 4 or img.shape[1] < 4
        if small:
            # the reference encoder has use-after-scope UB for dims < 4
            # (REFERENCE_BUGS.md); verify by reference-DECODING our stream
            want, _ = refqb3.ref_decode(ours)
        else:
            ref = refqb3.ref_encode(img, mode=int(mode), **kw)
            if index:
                assert qb3_tpu.encode(img, mode=mode, **kw) == ref, (mode, img.dtype)
            else:
                assert ours == ref, (mode, img.dtype, img.shape)
            want, _ = refqb3.ref_decode(ref)
        dec, _ = qb3_tpu.decode(ours)
        np.testing.assert_array_equal(dec.reshape(want.shape), want)
        checks += 1
        print(f"  ok: {Mode(mode).name} {img.dtype} {img.shape} index={index}",
              flush=True)

    img8 = corpus.natural8(64, 48, 3, seed=500)
    for mode in (Mode.FTL, Mode.BASE_H, Mode.BASE_Z, Mode.CF_H):
        check(img8, mode)
    for index in (True, "ic"):
        check(img8, Mode.FTL, index=index)
    check(img8, Mode.CF_H, index="ib")
    check(corpus.natural8(53, 47, 1, seed=501), Mode.FTL)  # unaligned
    check(corpus.natural8(20, 2, 1, seed=502), Mode.FTL)   # narrow
    check(corpus.natural8(2, 20, 1, seed=503), Mode.FTL)   # short
    check(img8, Mode.RLE_H, quanta=4)
    for dt, mult in ((np.uint16, 257), (np.uint32, 65537), (np.uint64, 1 << 40)):
        wide = corpus.to_type(corpus.natural8(32, 32, 1, seed=504), dt, mult)
        check(wide, Mode.FTL)
        check(wide, Mode.FTL, index=True)
        check(wide, Mode.CF_H)
    u64hi = corpus.natural8(16, 16, 1, seed=505).astype(np.uint64)
    u64hi[0, 0, 0] = (1 << 63) | (1 << 62)
    check(u64hi, Mode.FTL, index=True)
    s16 = (corpus.natural8(32, 32, 2, seed=506).astype(np.int16) - 100).astype(np.int16)
    check(s16, Mode.FTL, coreband=[0, 0])
    print(f"TPU conformance: {checks} checks passed", flush=True)


if __name__ == "__main__":
    main()
