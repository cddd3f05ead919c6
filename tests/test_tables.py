"""Algebraic self-tests of the generated entropy-code tables.

Mirrors the self-check strategy of the reference table generator
(attic/tables.py:89-113 trycodec, :154-176 trycs), plus golden fixtures for a
few packed table rows taken from the published stream format so that the
generator is pinned to the real QB3 v2 bit layout (QB3encode.h:28,:79 and
QB3decode.h:98).
"""

import numpy as np
import pytest

from qb3_tpu import tables as T


def test_vlc_lengths_and_prefix_free():
    for rung in range(1, 12):
        codes = {}
        for v in range(1 << (rung + 1)):
            ln, code = T.vlc(v, rung)
            assert rung <= ln <= rung + 2
            assert code < (1 << ln)
            codes[v] = (ln, code)
        # prefix-free: no code is a prefix (in LSB-first sense) of another
        for v1, (l1, c1) in codes.items():
            for v2, (l2, c2) in codes.items():
                if v1 != v2 and l1 <= l2:
                    assert (c2 & ((1 << l1) - 1)) != c1 or l1 == l2


@pytest.mark.parametrize("group", [False, True])
def test_decode_inverts_encode(group):
    enc = T.ENC_GROUP if group else T.ENC_SINGLE
    dec = T.DEC_GROUP if group else T.DEC_SINGLE
    for rung in range(8):
        for v in range(1 << (rung + 1)):
            ln, code = enc[rung, v]
            for hi in range(1 << (rung + 2 - ln)):
                bits = (hi << ln) | code
                dln, dv = dec[rung, bits]
                assert (dln, dv) == (ln, v), (rung, v, bits)


def test_computed_code_matches_tables_at_low_rungs():
    # the computed path (rungs >= 8) must agree with the unswapped formula
    for rung in range(2, 8):
        for v in range(1 << (rung + 1)):
            sv = v
            pair = ((1 << rung) - 1, 1 << rung) if rung >= 3 else None
            if pair and v in pair:
                sv = pair[0] if v == pair[1] else pair[1]
            ln, code = T.computed_code(sv, rung)
            assert (ln, code) == tuple(T.ENC_SINGLE[rung, v])


def test_codeswitch_roundtrip():
    for u in (3, 4, 5, 6):
        for d in range(1, 1 << u):
            ln, code = T.CSW[u, d]
            assert code & 1  # change flag
            bits = code >> 1  # after the flag
            # decoder may see arbitrary higher bits
            for hi in range(4):
                idx = (bits | (hi << (ln - 1))) & ((1 << (u + 1)) - 1)
                dln, delta = T.DSW[u, idx]
                assert dln == ln and delta == d, (u, d)


def test_signal_decodes_to_zero_delta():
    for u in (3, 4, 5, 6):
        ln, code = T.SIGNAL[u]
        assert ln == u + 2
        dln, delta = T.DSW[u, (code >> 1) & ((1 << (u + 1)) - 1)]
        assert dln == ln and delta == 0


def test_golden_rows():
    """Golden fixtures from the QB3 v2 format (packed len<<12|code layout)."""
    def packed(tbl, rung):
        n = 1 << (rung + 1)
        return [(int(tbl[rung, v, 0]) << 12) | int(tbl[rung, v, 1]) for v in range(n)]

    # QB3encode.h:28 (crg2), :35-36 (crg3 head)
    assert packed(T.ENC_SINGLE, 2) == [0x2000, 0x2002, 0x3001, 0x3005, 0x4003, 0x4007, 0x400B, 0x400F]
    assert packed(T.ENC_SINGLE, 3)[:12] == [
        0x3000, 0x3002, 0x3004, 0x3006, 0x4001, 0x4005, 0x4009, 0x5003, 0x400D, 0x5007, 0x500B, 0x500F]
    # QB3encode.h:27 (crg1) and the group-context rung-1 swap (QB3encode.h:185-186)
    assert packed(T.ENC_SINGLE, 1) == [0x1000, 0x2001, 0x3003, 0x3007]
    assert packed(T.ENC_GROUP, 1) == [0x1000, 0x3003, 0x2001, 0x3007]
    # QB3encode.h:79 (csw3), QB3encode.h:286 (SIGNAL)
    csw3 = [(int(T.CSW[3, d, 0]) << 12) | int(T.CSW[3, d, 1]) for d in range(8)]
    assert csw3 == [0x1000, 0x3001, 0x4003, 0x5007, 0x501F, 0x500F, 0x400B, 0x3005]
    assert (int(T.SIGNAL[3, 0]) << 12) | int(T.SIGNAL[3, 1]) == 0x5017
    assert (int(T.SIGNAL[6, 0]) << 12) | int(T.SIGNAL[6, 1]) == 0x80F7
    # QB3decode.h:98 (dsw3 head)
    dsw3 = [(int(T.DSW[3, i, 0]) << 12) | int(T.DSW[3, i, 1]) for i in range(4)]
    assert dsw3 == [0x3001, 0x4002, 0x3007, 0x5003]


def test_rung63_overflow_code():
    # long code at rung 63 is 65 bits; low 64 bits then bit 62 of the value
    v = (1 << 63) | (1 << 62) | 0x5
    ln, code = T.computed_code(v, 63)
    assert ln == 65
    low64 = code & ((1 << 64) - 1)
    assert low64 == (((v ^ (1 << 63)) << 2) | 0b11) & ((1 << 64) - 1)
    assert (code >> 64) == ((v >> 62) & 1)
