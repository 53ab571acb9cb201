"""Adversarial, hand-constructed bitstream vectors for the built-in codecs.

Every other codec test round-trips fixtures produced by this repo's own
encoders, so a systematic misreading of the dcraw/libraw semantics would pass
them all. The vectors here are built bit-by-bit from the PUBLISHED format
semantics (dcraw.c decode loops, cited per test) and the expected pixel values
are derived BY HAND in the comments — never by running the repo's encoder.

Layout: one class per format; each vector documents the per-photosite fields
and the full decoder-state walk that produced the expected numbers.
"""
from __future__ import annotations

import numpy as np
import pytest

from pysp_tpu.io import native


def bits_to_bytes(bitstr: str) -> bytes:
    """MSB-first pack of an ASCII bit string ('0'/'1', spaces ignored)."""
    s = "".join(c for c in bitstr if c in "01")
    s += "0" * ((-len(s)) % 8)
    return bytes(int(s[i : i + 8], 2) for i in range(0, len(s), 8))


class TestOlympusVectors:
    """dcraw olympus_load_raw semantics (dcraw.c ~L1800): per photosite a
    3-bit sign+low field, a unary magnitude class limited to 12 zeros
    (12 zeros = escape to an explicit (16-nbits)-bit field whose value is
    shifted right once), nbits residual bits; two carry chains by column
    parity; W/N/NW gradient predictor over distance-2 neighbors."""

    def test_escape_sign_and_carry_walk(self):
        # Hand-derived walk. State per parity: carry = [c0, c1, c2];
        # i = 2*(c2 < 3); nbits = 2+i, grown while (c0 & 0xFFFF) >> (nbits+i).
        #
        # col 0 (even parity, carry [0,0,0], nbits 4):
        #   field 010 -> sign=0 low=2; unary: 12 zeros = ESCAPE;
        #   explicit 12 bits 000000001010 = 10 -> high = 10 >> 1 = 5;
        #   4 residual bits 0011=3 -> c0 = (5<<4)|3 = 83;
        #   diff = 83; c1 = (83*3)>>5 = 7; c2 = 0 (83 > 16);
        #   pred = 0 -> raw = (83<<2)|2 = 334
        # col 1 (odd [0,0,0], nbits 4):
        #   field 101 -> sign=-1 low=1; unary 001 -> high=2;
        #   residual 0110=6 -> c0 = (2<<4)|6 = 38;
        #   diff = (38 ^ -1) + 0 = -39; c1 = (-117)>>5 = -4 (floor); c2 = 0;
        #   pred = 0 -> raw = ((-39<<2)|1) & 0xFFFF = -155 & 0xFFFF = 65381
        # col 2 (even [83,7,0]): nbits: 83>>6=1 -> 5; 83>>7=0 -> stop (5);
        #   field 011 -> sign=0 low=3; unary 1 -> high=0;
        #   residual 10001=17 -> c0 = 17; diff = 17+7 = 24;
        #   c1 = (72+7)>>5 = 2; c2 = 0; pred = raw[0,0] = 334
        #   raw = 334 + ((24<<2)|3) = 433
        # col 3 (odd [38,-4,0], nbits 4): field 000; unary 01 -> high=1;
        #   residual 1111=15 -> c0 = 31; diff = 31-4 = 27; c1 = (81-4)>>5 = 2;
        #   c2 = 0; pred = raw[0,1] = 65381 -> raw = 65381+108 = 65489
        # col 4 (even [17,2,0], nbits 4): field 000; unary 1; residual 0010=2
        #   c0 = 2; diff = 4; c1 = 14>>5 = 0; c2 = 1 (2 <= 16);
        #   pred = raw[0,2] = 433 -> raw = 449
        # col 5 (odd [31,2,0], nbits 4): field 010 (low 2); unary 1;
        #   residual 0001=1; diff = 3; c1 = 0; c2 = 1;
        #   pred = raw[0,3] = 65489 -> raw = 65489+14 = 65503
        # col 6 (even [2,0,1], nbits 4): field 001 (low 1); unary 1;
        #   residual 0000; diff = 0; c2 = 2; pred = 449 -> raw = 450
        # col 7 (odd [1,0,1], nbits 4): field 000; unary 1; residual 0101=5;
        #   diff = 5; c1 = 0; c2 = 2; pred = 65503 -> raw = 65523
        # col 8 (even [0,0,2], nbits 4): field 000; unary 1; residual 0011=3;
        #   diff = 3; c2 = 3; pred = 450 -> raw = 462
        # col 9 (odd [5,0,2], nbits 4): field 000; unary 1; residual 0001=1;
        #   diff = 1; c2 = 3; pred = 65523 -> raw = 65527
        # col 10 (even [3,0,3]): c2 >= 3 -> i = 0, nbits = 2 (3>>2 = 0);
        #   field 011 (low 3); unary 0001 -> high=3; residual 01=1 ->
        #   c0 = (3<<2)|1 = 13; diff = 13; c1 = 39>>5 = 1; c2 = 4;
        #   pred = raw[0,8] = 462 -> raw = 462 + ((13<<2)|3) = 517
        # col 11 (odd [1,0,3]): i = 0, nbits = 2; field 101 -> sign=-1 low=1;
        #   unary 1 -> high=0; residual 11=3 -> c0 = 3;
        #   diff = (3 ^ -1) = -4; c1 = -12>>5 = -1; c2 = 4;
        #   pred = raw[0,9] = 65527 -> raw = 65527 + ((-16)|1) = 65512
        stream = (
            "010 000000000000 000000001010 0011"
            "101 001 0110"
            "011 1 10001"
            "000 01 1111"
            "000 1 0010"
            "010 1 0001"
            "001 1 0000"
            "000 1 0101"
            "000 1 0011"
            "000 1 0001"
            "011 0001 01"
            "101 1 11"
        )
        blob = b"\x00" * 7 + bits_to_bytes(stream)
        want = np.array(
            [[334, 65381, 433, 65489, 449, 65503, 450, 65523, 462, 65527,
              517, 65512]],
            np.uint16,
        )

        from pysp_tpu.io.orf import olympus_decode

        got = olympus_decode(blob, 1, 12)
        np.testing.assert_array_equal(got, want)
        if native.has_orf():
            np.testing.assert_array_equal(native.orf_decode(blob, 1, 12), want)

    def test_gradient_predictor_rows(self):
        # Rows >= 2 use the same-color gradient predictor:
        #   w=raw[r,c-2], n=raw[r-2,c], nw=raw[r-2,c-2]
        #   if w<nw<n or n<nw<w: pred = w+n-nw if |w-nw|>32 or |n-nw|>32
        #                        else (w+n)>>1
        #   else: pred = w if |w-nw| > |n-nw| else n
        # Build rows 0-1 with direct values, then check row 2 predictions.
        #
        # Stream plan (3 rows x 4 cols). Rows restart carries at 0, nbits=4.
        # Row 0: col0: field 000, unary 1, res 1010=10 -> diff 10, raw=40
        #        col1: field 000, unary 1, res 1111=15 -> diff 15, raw=60
        #        col2 (even carry now [10,0,1] -> nbits 4): field 000, unary 1,
        #             res 0101=5; diff = 5 + c1(0 from (30)>>5) = 5
        #             ... c1 after col0: (10*3)>>5 = 0; pred=raw[0,0]=40
        #             raw = 40+20 = 60
        #        col3: odd carry [15,1,1]  (c1 = 45>>5 = 1); field 000, unary 1,
        #             res 0000=0 -> c0=0, diff = 0+1 = 1; pred=raw[0,1]=60
        #             raw = 60+4 = 64
        # Row 1: col0: field 000 unary 1 res 0001=1 -> raw = pred0 + 4... but
        #        row<2,col<2 -> pred=0, raw = 4
        #        col1: field 000 unary 1 res 0010=2 -> raw = 8
        #        col2: (even [1,0,1]) field 000 unary 1 res 1000=8:
        #             diff = 8 + 0 = 8; pred = raw[1,0] = 4 -> raw = 36
        #        col3: (odd [2,0,1]) field 000 unary 1 res 1001=9:
        #             diff = 9; pred = raw[1,1] = 8 -> raw = 44
        # Row 2: col0 (row>=2, col<2): pred = raw[0,0] = 40
        #        field 000 unary 1 res 0011=3 -> diff 3 -> raw = 40+12 = 52
        #        col1: pred = raw[0,1] = 60; field 000 unary 1 res 0001=1
        #             -> raw = 64
        #        col2: w = raw[2,0] = 52, n = raw[0,2] = 60, nw = raw[0,0] = 40
        #             not (w<nw<n or n<nw<w)  (nw smallest);
        #             |w-nw| = 12 > |n-nw| = 20? no -> pred = n = 60
        #             field 000 unary 1 res 0010=2; even carry [3,0,1]:
        #             diff = 2; raw = 60+8 = 68
        #        col3: w = raw[2,1] = 64, n = raw[0,3] = 64, nw = raw[0,1] = 60
        #             n<nw<w false, w<nw<n false (w=n=64 > nw) ->
        #             |w-nw| = 4 > |n-nw| = 4? no -> pred = n = 64
        #             odd carry [1,0,1]: field 000 unary 1 res 0101=5; diff 5
        #             raw = 64+20 = 84
        stream = (
            "000 1 1010  000 1 1111  000 1 0101  000 1 0000"
            "000 1 0001  000 1 0010  000 1 1000  000 1 1001"
            "000 1 0011  000 1 0001  000 1 0010  000 1 0101"
        )
        blob = b"\x00" * 7 + bits_to_bytes(stream)
        want = np.array(
            [[40, 60, 60, 64], [4, 8, 36, 44], [52, 64, 68, 84]], np.uint16
        )

        from pysp_tpu.io.orf import olympus_decode

        got = olympus_decode(blob, 3, 4)
        np.testing.assert_array_equal(got, want)
        if native.has_orf():
            np.testing.assert_array_equal(native.orf_decode(blob, 3, 4), want)


def pana_place(fields, buf: bytearray) -> None:
    """Place (nbits, value) fields into a 0x4000-byte buffer using ONLY
    dcraw's published pana_bits addressing (17-bit down-counting cursor,
    byte = vbits >> 3 ^ 0x3ff0, 16-bit LE window shifted by vbits & 7).
    Independent of io/rw2's _PanaBitWriter."""
    vbits = 0
    for n, v in fields:
        assert 0 <= v < (1 << n)
        vbits = (vbits - n) & 0x1FFFF
        byte = vbits >> 3 ^ 0x3FF0
        word = v << (vbits & 7)
        buf[byte] |= word & 0xFF
        buf[byte + 1] |= (word >> 8) & 0xFF


class TestPanasonicVectors:
    """dcraw panasonic_load_raw (v4) semantics: 14-pixel packets of two
    interleaved channels; per packet two 12-bit initialisers (8-bit nonz +
    4-bit low), 8-bit scaled deltas, 2-bit shift codes at i % 3 == 2
    (sh = 4 >> (3 - code), persisting across packets); nonz == 0 re-reads the
    initialiser, except i > 11 forces pred = nonz << 4 | get(4).

    The payload is read through pana_bits: 0x4000-byte sections loaded with
    the first 0x4000-0x2008 file bytes at buf+0x2008 and the next 0x2008
    bytes at buf[0] (load_flags rotation), so the FIRST decoded 16-byte
    group sits at FILE offset 0x1ff8."""

    def _build(self):
        # Packet 1 (cols 0-13), hand walk:
        # col0: nz0=0x80 init0=0x5 -> pred0 = 0x805 = 2053
        # col1: nz1=0x40 init1=0xA -> pred1 = 0x40A = 1034
        # col2: sh code 3 -> sh = 4 >> 0 = 4; d0=0x10:
        #   pred0 -= 0x80<<4 = 2048 -> 5; sh==4 -> &= 0xF -> 5;
        #   += 0x10<<4 = 256 -> 261
        # col3: d1=0 -> no-op (1034)
        # col4: d0=0xFF: 261-2048 = -1787 < 0 -> &= 0xF -> 5 (two's
        #   complement: -1787 & 0xF = 5); += 255<<4 = 4080 -> 4085
        # col5: sh code 0 -> sh = 4 >> 3 = 0; d1=0x01: 1034-128=906, += 1
        #   -> 907
        # col6: d0=0 -> 4085
        # col7: d1=0x80: 907-128=779, += 128 -> 907 (symmetric no-op)
        # col8: sh code 2 -> sh = 4 >> 1 = 2; d0=0x01: 4085-512=3573,
        #   += 4 -> 3577
        # col9: d1=0x02: 907-512=395, += 8 -> 403
        # col10: d0=0x03: 3577-512=3065, += 12 -> 3077
        # col11: sh code 1 -> sh = 4 >> 2 = 1; d1=0 -> 403
        # col12: d0=0 -> 3077
        # col13: d1=0x05: 403-256=147, += 10 -> 157
        p1 = [
            (8, 0x80), (4, 0x5),
            (8, 0x40), (4, 0xA),
            (2, 3), (8, 0x10),
            (8, 0x00),
            (8, 0xFF),
            (2, 0), (8, 0x01),
            (8, 0x00),
            (8, 0x80),
            (2, 2), (8, 0x01),
            (8, 0x02),
            (8, 0x03),
            (2, 1), (8, 0x00),
            (8, 0x00),
            (8, 0x05),
        ]
        # Packet 2 (cols 14-27): all nonz reads zero; i <= 11 keeps pred 0,
        # i > 11 (cols 26, 27) forces pred = 0 << 4 | nibble.
        p2 = [
            (8, 0), (8, 0),          # i=0,1
            (2, 0), (8, 0),          # i=2 (sh) + nonz re-read
            (8, 0), (8, 0),          # i=3,4
            (2, 0), (8, 0),          # i=5
            (8, 0), (8, 0),          # i=6,7
            (2, 0), (8, 0),          # i=8
            (8, 0), (8, 0),          # i=9,10
            (2, 0), (8, 0),          # i=11
            (8, 0), (4, 0xC),        # i=12: nonz=0 but i>11 -> pred = 0xC
            (8, 0), (4, 0x7),        # i=13: pred = 0x7
        ]
        buf = bytearray(0x4000)
        pana_place(p1 + p2, buf)
        # un-rotate into FILE byte order: file[i] = buf[(i + 0x2008) % 0x4000]
        file_bytes = bytes(
            buf[(i + 0x2008) % 0x4000] for i in range(0x4000)
        )
        want = np.array(
            [[2053, 1034, 261, 1034, 4085, 907, 4085, 907, 3577, 403, 3077,
              403, 3077, 157]
             + [0] * 12 + [12, 7]],
            np.uint16,
        )
        return file_bytes, want

    def test_rotation_places_first_group_at_0x1ff8(self):
        file_bytes, _ = self._build()
        # first field written: nz0 = 0x80 at buf[15] (vbits = 0x1fff8 ->
        # byte = 0x3fff ^ 0x3ff0 = 0xf, shift 0) = FILE offset 0x2007
        assert file_bytes[0x2007] == 0x80
        # everything outside the two 16-byte groups at 0x1ff8/0x2008 is zero
        outside = bytearray(file_bytes)
        outside[0x1FF8:0x2018] = b"\x00" * 0x20
        assert not any(outside)

    def test_packet_walk_and_late_init(self):
        file_bytes, want = self._build()

        from pysp_tpu.io.rw2 import pana_v4_decode

        got = pana_v4_decode(file_bytes, 1, 28)
        np.testing.assert_array_equal(got, want)
        if native.has_rw2():
            np.testing.assert_array_equal(
                native.rw2_decode(file_bytes, 1, 28), want
            )


def arw2_block(word0: int, deltas) -> bytearray:
    """Build one 16-byte ARW2 block from the published LSB-first layout:
    32-bit header (max | min<<11 | imax<<22 | imin<<26), then 7-bit deltas at
    bit positions 30+7j (dcraw sony_arw2_load_raw: sget2(dp+(bit>>3)) >>
    (bit&7) & 0x7f). Independent of io/arw's encoder."""
    blk = bytearray(16)
    for b in range(4):
        blk[b] = (word0 >> (8 * b)) & 0xFF
    bit = 30
    for d in deltas:
        assert 0 <= d < 128
        byte, sh = bit >> 3, bit & 7
        word = d << sh
        if byte < 16:
            blk[byte] |= word & 0xFF
        if byte + 1 < 16:
            blk[byte + 1] |= (word >> 8) & 0xFF
        bit += 7
    return blk


class TestSonyArw2Vectors:
    """dcraw sony_arw2_load_raw semantics: 16-byte blocks of 16 photosites on
    one column parity of a 32-column span; 11-bit max/min + 4-bit positions;
    sh = count of (0x80 << s <= max - min) for s in 0..3; delta positions are
    ascending i skipping imax and (only when distinct) imin; delta pixels are
    min + (d << sh) clipped to 0x7ff."""

    def test_distinct_positions_clip_and_sh4(self):
        # Block A (even cols): max=2047 @ i=3, min=256 @ i=0; diff=1791 ->
        # sh = 4 (1791 >= 0x80, 0x100, 0x200, 0x400).
        # Deltas (read order i = 1,2,4,5,...,15):
        #   i=1: d=0x7f -> 256 + (127<<4) = 2288 -> CLIPPED to 2047
        #   i=2: d=1    -> 256 + 16 = 272
        #   i=4: d=0    -> 256
        #   i=5..15: d=i -> 256 + (i<<4)
        w0_a = 2047 | 256 << 11 | 3 << 22 | 0 << 26
        da = [0x7F, 1, 0] + list(range(5, 16))
        a_pix = [256, 2047, 272, 2047, 256] + [256 + (i << 4) for i in range(5, 16)]
        # Block B (odd cols): all-zero header -> max=min=0 at i=0 (the
        # imax==imin degenerate), all deltas 0 -> every photosite 0. Its own
        # 15th delta would cross into the NEXT block; as the last block of the
        # row that read is defined-zero (dcraw reads unwritten malloc bytes).
        blk = arw2_block(w0_a, da) + bytearray(16)
        want = np.zeros((1, 32), np.uint16)
        want[0, 0::2] = a_pix

        from pysp_tpu.io.arw import arw2_decode

        got = arw2_decode(bytes(blk), 1, 32)
        np.testing.assert_array_equal(got, want)

    def test_imax_equals_imin_reads_15_deltas_cross_block(self):
        # Block A: max=300, min=10, imax=imin=0 -> pix[0] = max (the if-branch
        # wins); positions 1..15 ALL carry deltas (15 reads), so the 15th
        # (for i=15, bits 128-134) comes from the NEXT block's first byte.
        # sh: diff=290 -> >=0x80, >=0x100, not >=0x200 -> sh=2.
        # Deltas j=0..13 = 1..14 land on i=1..14: pix = 10 + (i<<2).
        # Cross-block delta for i=15 = B[0] & 0x7f = 0x90 & 0x7f = 0x10 = 16
        # -> pix[15] = 10 + (16<<2) = 74.
        w0_a = 300 | 10 << 11 | 0 << 22 | 0 << 26
        a_deltas = list(range(1, 15))  # the 15th comes from block B's bytes
        a_pix = [300] + [10 + (i << 2) for i in range(1, 15)] + [74]
        # Block B (odd cols): max=0x90=144 @ i=2, min=16 @ i=1; diff=128 ->
        # sh=1; all 14 deltas = 3 -> pix = 16 + (3<<1) = 22 elsewhere.
        w0_b = 0x90 | 16 << 11 | 2 << 22 | 1 << 26
        b_pix = [22, 16, 144] + [22] * 13
        blk = arw2_block(w0_a, a_deltas) + arw2_block(w0_b, [3] * 14)
        want = np.zeros((1, 32), np.uint16)
        want[0, 0::2] = a_pix
        want[0, 1::2] = b_pix

        from pysp_tpu.io.arw import arw2_decode

        got = arw2_decode(bytes(blk), 1, 32)
        np.testing.assert_array_equal(got, want)


@pytest.mark.skipif(not native.available(), reason="native codec not built")
class TestNikonVectors:
    """dcraw nikon_load_raw semantics: per-pixel Huffman value bytes whose low
    nibble is the residual length and high nibble an extra shift (shl);
    diff = ((getbits(len-shl) << 1) + 1) << shl >> 1, sign-extended by
    diff -= (1 << len) - !shl when the top residual bit is clear; cols 0-1
    update two-row-phase vertical predictors, later cols run per-parity
    horizontal predictors; lossy type-2 files switch from tree t to t+1 at the
    split row; output = curve[clip(pred, 0, 0x3fff)] (negative preds clamp to
    index 0 through the (short) cast)."""

    # Canonical Huffman codes built by hand from kNefTree[0] (12-bit lossy):
    #   "00"->5 "010"->4 "011"->3 "100"->6 "101"->2 "110"->7 "1110"->1
    #   "11110"->0 ...
    # and kNefTree[1] (12-bit lossy after split):
    #   "00"->0x39 "010"->0x5a "011"->0x38 "100"->0x27 "101"->0x16 "110"->5
    #   "1110"->4 "11110"->3 ... "11111110"->0 "1111111110"->12
    #
    # 4x4 stream, vpred = [[600, 400], [500, 300]], split row 2:
    # r0c0 "011"+101:   b=5, bit2 set -> diff=+5  -> vpred[0][0]=605
    # r0c1 "011"+001:   b=1 -> 1-7 = -6           -> vpred[0][1]=394
    # r0c2 "00"+10000:  len5 b=16 -> +16          -> hpred[0]=621
    # r0c3 "011"+011:   b=3 -> 3-7 = -4           -> hpred[1]=390
    # r1c0 "101"+10:    len2 b=2 -> +2            -> vpred[1][0]=502
    # r1c1 "11110":     len0 -> 0                 -> vpred[1][1]=300
    # r1c2 "100"+000000: len6 b=0 -> 0-63 = -63   -> hpred[0]=439
    # r1c3 "1110"+1:    len1 b=1 -> +1            -> hpred[1]=301
    # --- split: tree 1 ---
    # r2c0 "101"+10010: 0x16 len6 shl1, b=18 -> diff=(37<<1)>>1=37, bit5 set
    #                   -> +37 -> vpred[0][0]=642
    # r2c1 "00"+000011: 0x39 len9 shl3, b=3 -> ((3<<1)+1)<<3>>1 = 28;
    #                   28 & (1<<8) == 0 -> 28 - 512 = -484
    #                   -> vpred[0][1] = -90 -> output clamps to curve[0]
    # r2c2 "110"+00111: len5 b=7 -> 7-31 = -24    -> hpred[0]=618
    # r2c3 "1110"+1111: len4 b=15 -> +15          -> hpred[1]=-75 -> 0
    # r3c0 "100"+00001: 0x27 len7 shl2, b=1 -> (3<<2)>>1 = 6;
    #                   6 & 64 == 0 -> 6-128 = -122 -> vpred[1][0]=380
    # r3c1 "011"+11111: 0x38 len8 shl3, b=31 -> (63<<3)>>1 = 252;
    #                   252 & 128 != 0 -> +252   -> vpred[1][1]=552
    # r3c2 "1111111110"+100000000001: len12 b=2049 -> +2049 -> hpred[0]=2429
    # r3c3 "11111110":  value 0 -> len0 -> 0      -> hpred[1]=552
    STREAM = (
        "011 101  011 001  00 10000  011 011"
        "101 10  11110  100 000000  1110 1"
        "101 10010  00 000011  110 00111  1110 1111"
        "100 00001  011 11111  1111111110 100000000001  11111110"
    )
    PRE = [  # predictor values before the curve (negatives clamp to index 0)
        [605, 394, 621, 390],
        [502, 300, 439, 301],
        [642, -90, 618, -75],
        [380, 552, 2429, 552],
    ]

    def test_split_tree_switch_and_shift_codes(self):
        blob = bits_to_bytes(self.STREAM)
        vpred = np.array([600, 400, 500, 300], np.uint16)
        curve = np.arange(4096, dtype=np.uint16)
        got = native.nef_decode(blob, 4, 4, 0, vpred, 2, curve)
        want = np.clip(np.array(self.PRE), 0, 4095).astype(np.uint16)
        np.testing.assert_array_equal(got, want)

    def test_curve_application(self):
        blob = bits_to_bytes(self.STREAM)
        vpred = np.array([600, 400, 500, 300], np.uint16)
        curve = (np.arange(4096, dtype=np.uint32) * 3 + 7).clip(0, 65535)
        curve = curve.astype(np.uint16)
        got = native.nef_decode(blob, 4, 4, 0, vpred, 2, curve)
        want = curve[np.clip(np.array(self.PRE), 0, 4095)]
        np.testing.assert_array_equal(got, want)


@pytest.mark.skipif(not native.available(), reason="native codec not built")
def ph1_pack(bitstr: str) -> bytes:
    """Samsung/ph1 packing: MSB-first bits grouped into 32-bit words, each
    word emitted LITTLE-endian (dcraw ph1_bits with order 0x4949)."""
    s = "".join(c for c in bitstr if c in "01")
    s += "0" * ((-len(s)) % 32)
    import struct

    return b"".join(
        struct.pack("<L", int(s[i : i + 32], 2)) for i in range(0, len(s), 32)
    )


class TestSamsungVectors:
    """dcraw samsung_load_raw semantics: 16-pixel blocks of [1 dir bit,
    four 2-bit opcodes, 4-bit replacement lengths for opcode 3 in group
    order, then 16 sign-extended residuals — even columns first, then odd].
    Group of in-block pixel c is ((c & 1) << 1) | (c >> 3); lengths start
    at 7 for rows 0-1, else 4; dir=0 predicts the same-parity pixel two
    left (128 across the whole first block), dir=1 two rows up."""

    def test_full_state_walk(self):
        from pysp_tpu.io.srw import srw_decode

        # Row 0 block 0: dir=0 (all preds 128), op0 x4 (lens stay 7).
        #   evens c0..c14: +10 -5 0 +63 | -64 +1 +2 +3
        #     -> 138 123 128 191 | 64 129 130 131 (cols 0,2,..,14)
        #   odds c1..c15: +7 -8 +9 -10 | 0 0 -1 +1
        #     -> 135 120 137 118 | 128 128 127 129 (cols 1,3,..,15)
        # Row 0 block 1: dir=0, op3 x4 with length 0 -> zero residuals;
        #   evens chain from col 14 (131), odds from col 15 (129).
        row0 = (
            "0" + "00000000"
            + "0001010 1111011 0000000 0111111 1000000 0000001 0000010 0000011"
            + "0000111 1111000 0001001 1110110 0000000 0000000 1111111 0000001"
            + "0" + "11111111" + "0000000000000000"
        )
        # Row 1: both blocks op3/len0, dir=0 -> all 128.
        row1 = ("0" + "11111111" + "0" * 16) * 2
        # Row 2 block 0: dir=1 (pred = row 0), ops op1/op0/op2/op3(6):
        #   lens 4->[5,4,3,6]. evens g0(5b): +15 -16 0 +1; g1(4b): -8 +7 0 +5;
        #   odds g2(3b): +3 -4 0 +1; g3(6b): +31 -32 0 +2.
        # Row 2 block 1: dir=1, op3 x4 len 0 -> copies row 0 cols 16-31.
        row2 = (
            "1" + "01 00 10 11" + "0110"
            + "01111 10000 00000 00001" + "1000 0111 0000 0101"
            + "011 100 000 001" + "011111 100000 000000 000010"
            + "1" + "11111111" + "0" * 16
        )
        # Row 3 block 0: dir=1, op3 x4 len 0 -> copies row 1 (all 128).
        # Row 3 block 1: dir=0, op1 x4 (lens 0->1): evens 1 0 0 0 0 0 0 0
        #   (first -1 then zeros -> 127 chain), odds 0 1 0 0 0 0 0 0
        #   (128 then 127s).
        row3 = (
            "1" + "11111111" + "0" * 16
            + "0" + "01 01 01 01" + "10000000" + "01000000"
        )
        chunks = [ph1_pack(r) for r in (row0, row1, row2, row3)]
        offsets = np.cumsum([0] + [len(c) for c in chunks[:-1]]).astype(np.uint32)
        payload = b"".join(chunks)

        expect = np.array(
            [
                [138, 135, 123, 120, 128, 137, 191, 118,
                 64, 128, 129, 128, 130, 127, 131, 129] + [131, 129] * 8,
                [128] * 32,
                [153, 138, 107, 116, 128, 137, 192, 119,
                 56, 159, 136, 96, 130, 127, 136, 131] + [131, 129] * 8,
                [128] * 16 + [127, 128] + [127] * 14,
            ],
            np.uint16,
        )
        got = srw_decode(payload, offsets, 0, 4, 32)
        np.testing.assert_array_equal(got, expect)
        if native.has_srw():
            np.testing.assert_array_equal(
                native.srw_decode(payload, offsets, 0, 4, 32), expect
            )


class TestLosslessJpegVectors:
    """ITU-T T.81 lossless (SOF3) semantics — the codec behind both compressed
    DNG and CR2: canonical DHT Huffman codes select an SSSS category, SSSS
    magnitude bits EXTEND-sign-extend (F.2.2.1), SSSS=16 means diff=32768 with
    NO appended bits (dcraw ljpeg_diff returns -32768; identical mod 2^16);
    predictor 1 uses Ra with first-row Ra / first-col Rb / first-sample
    1 << (P-1) fallbacks; 0xFF entropy bytes carry a stuffed 0x00."""

    def test_two_components_two_tables_and_ssss16(self):
        # Tables (canonical codes derived by hand):
        #  T0: bits [1,1,1,1,0..] values [2,16,0,3]
        #      -> "0"->ssss2  "10"->ssss16  "110"->ssss0  "1110"->ssss3
        #  T1: bits [0,3,1,0..] values [1,4,0,2]
        #      -> "00"->ssss1 "01"->ssss4 "10"->ssss0 "110"->ssss2
        # Scan: 2 components, comp A uses T0, comp B uses T1 (Td nibble).
        # P=12 -> first-sample pred 2048. Hand walk (A, B per pixel):
        # (0,0)A "0"+11:    extend(3,2)=+3          -> 2051
        # (0,0)B "00"+0:    extend(0,1)=-1          -> 2047
        # (0,1)A "10":      ssss16 -> +32768; 2051+32768 = 34819 (mod 2^16)
        # (0,1)B "01"+1111: extend(15,4)=+15        -> 2062
        # (0,2)A "110":     0                       -> 34819
        # (0,2)B "110"+10:  extend(2,2)=+2          -> 2064
        # (1,0)A "1110"+000: extend(0,3)=-7, pred=Rb=2051 -> 2044
        # (1,0)B "10":      0, pred=Rb=2047         -> 2047
        # (1,1)A "0"+01:    extend(1,2)=-2, pred=Ra -> 2042
        # (1,1)B "00"+1:    extend(1,1)=+1          -> 2048
        # (1,2)A "110":     0                       -> 2042
        # (1,2)B "01"+1111: +15                     -> 2063
        # Entropy bits pad with 1s; bytes 62 7F 6B 84 4E 7F (no 0xFF).
        def dht(tid, counts16, values):
            body = bytes([tid]) + bytes(counts16) + bytes(values)
            return b"\xff\xc4" + (len(body) + 2).to_bytes(2, "big") + body

        c0 = [1, 1, 1, 1] + [0] * 12
        c1 = [0, 3, 1] + [0] * 13
        sof = (
            b"\xff\xc3" + (14).to_bytes(2, "big")
            + bytes([12]) + (2).to_bytes(2, "big") + (3).to_bytes(2, "big")
            + bytes([2, 1, 0x11, 0, 2, 0x11, 0])
        )
        sos = (
            b"\xff\xda" + (10).to_bytes(2, "big")
            + bytes([2, 1, 0x00, 2, 0x10, 1, 0, 0x00])
        )
        entropy = bits_to_bytes(
            "011 000 10 011111 110 11010 1110000 10 001 001 110 011111 11"
        )
        assert entropy == bytes([0x62, 0x7F, 0x6B, 0x84, 0x4E, 0x7F])
        blob = (
            b"\xff\xd8"
            + dht(0, c0, [2, 16, 0, 3])
            + dht(1, c1, [1, 4, 0, 2])
            + sof + sos + entropy + b"\xff\xd9"
        )
        got = native.ljpeg_decode(blob)
        want = np.array(
            [
                [[2051, 2047], [34819, 2062], [34819, 2064]],
                [[2044, 2047], [2042, 2048], [2042, 2063]],
            ],
            np.uint16,
        )
        np.testing.assert_array_equal(got, want)

    def test_byte_stuffing_and_precision16_wrap(self):
        # P=16: first-sample pred 32768; ssss16 adds 32768 -> wraps to 0.
        # Table: "0"->16 "10"->0 "110"->8.
        # (0,0) "0":              0 + nothing -> (32768+32768) mod 2^16 = 0
        # (0,1) "110"+11111111:   extend(255,8)=+255, pred=Ra=0 -> 255
        # Bits: 0 110 11111111 + pad 1111 -> bytes 6D FF(+stuffed 00) F?
        #   0110 1111 = 0x6F, 1111 1111 = 0xFF -> written as FF 00.
        def dht(tid, counts16, values):
            body = bytes([tid]) + bytes(counts16) + bytes(values)
            return b"\xff\xc4" + (len(body) + 2).to_bytes(2, "big") + body

        counts = [1, 1, 1] + [0] * 13
        sof = (
            b"\xff\xc3" + (11).to_bytes(2, "big")
            + bytes([16]) + (1).to_bytes(2, "big") + (2).to_bytes(2, "big")
            + bytes([1, 1, 0x11, 0])
        )
        sos = (
            b"\xff\xda" + (8).to_bytes(2, "big")
            + bytes([1, 1, 0x00, 1, 0, 0x00])
        )
        entropy = bytes([0x6F, 0xFF, 0x00])  # stuffed zero after 0xFF
        blob = (
            b"\xff\xd8" + dht(0, counts, [16, 0, 8])
            + sof + sos + entropy + b"\xff\xd9"
        )
        got = native.ljpeg_decode(blob)
        want = np.array([[0, 255]], np.uint16)
        np.testing.assert_array_equal(got, want)
