"""Golden-layer unit tests: tables, header code, RS, CRC, HDLC, scrambler."""
import numpy as np
import pytest

from vdlm2dec_tpu import constants as C
from vdlm2dec_tpu.golden import codec


def test_gray_tables_reference_spot_values():
    # spot values transcribed from the reference tables (d8psk.h:47-249)
    assert C.GRAY_TABLES[0, 0] == pytest.approx(0.5, abs=1e-6)
    assert C.GRAY_TABLES[0, 1] == pytest.approx(0.547114, abs=1e-6)
    assert C.GRAY_TABLES[0, 128] == pytest.approx(0.5, abs=1e-6)
    assert C.GRAY_TABLES[1, 0] == pytest.approx(0.999998, abs=1e-6)
    assert C.GRAY_TABLES[1, 64] == pytest.approx(0.5, abs=1e-6)
    assert C.GRAY_TABLES[2, 0] == pytest.approx(0.004445, abs=1e-6)
    assert C.GRAY_TABLES[2, 64] == pytest.approx(0.995555, abs=1e-6)


def test_gf_tables():
    # alpha^8 must reduce via 0x187: spot values from rs.c:17-50
    assert C.GF_EXP[8] == 0x87
    assert C.GF_EXP[254] == 0xC3
    assert C.GF_LOG[1] == 0
    assert C.GF_LOG[0] == 255
    # log/exp are inverse on nonzero field elements
    for v in range(1, 256):
        assert C.GF_EXP[C.GF_LOG[v]] == v


def test_crc_table_spot():
    # crc.c:1-34 spot values
    assert C.CRC_TABLE[0] == 0x0000
    assert C.CRC_TABLE[1] == 0x1189
    assert C.CRC_TABLE[255] == 0x0F78


def test_scrambler_keystream_prefix():
    # hand-computed first bits of the x^15+x+1 LFSR from seed 0x4D4B
    s = 0x4D4B
    ref = []
    for _ in range(64):
        b = (s ^ (s >> 14)) & 1
        s = (s << 1) | b
        ref.append(b)
    assert list(C.KEYSTREAM[:64]) == ref
    # keystream must not be degenerate
    assert 0 < C.KEYSTREAM[:1000].sum() < 1000


def test_header_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(50):
        length = int(rng.integers(96, 1 << 17))
        bits = codec.header_encode(length)
        soft = bits.astype(np.float64) * 0.98 + 0.01  # confident soft bits
        dec, metric = codec.header_decode_soft(soft)
        assert dec == length
        assert metric > 0


def test_header_corrects_errors():
    rng = np.random.default_rng(1)
    length = 1000
    bits = codec.header_encode(length)
    for flip in range(3, 25):
        soft = bits.astype(np.float64) * 0.98 + 0.01
        soft[flip] = 1.0 - soft[flip]          # one confident bit error
        dec, _ = codec.header_decode_soft(soft)
        # (25,20) with dmin>=... single error in parity-protected positions:
        # ML decode with one flipped bit among 25 must still win for most
        # positions; verify it never produces a *valid-looking* wrong length
        # with better metric than truth at low noise
        soft2 = bits.astype(np.float64) * 0.9 + 0.05
        soft2[flip] = 0.5                      # erased bit: must correct
        dec2, _ = codec.header_decode_soft(soft2)
        assert dec2 == length


def test_rs_roundtrip_clean():
    rng = np.random.default_rng(2)
    data = rng.integers(0, 256, C.RS_K).astype(np.uint8)
    parity = codec.rs_encode_row(data)
    row = np.concatenate([data, parity])
    out, cnt = codec.rs_decode_row(row, [])
    assert cnt == 0
    assert np.array_equal(out, row)


@pytest.mark.parametrize("nerr", [1, 2, 3])
def test_rs_corrects_errors(nerr):
    rng = np.random.default_rng(3 + nerr)
    for _ in range(10):
        data = rng.integers(0, 256, C.RS_K).astype(np.uint8)
        parity = codec.rs_encode_row(data)
        row = np.concatenate([data, parity])
        bad = row.copy()
        pos = rng.choice(C.RS_N, nerr, replace=False)
        for p in pos:
            bad[p] ^= rng.integers(1, 256)
        out, cnt = codec.rs_decode_row(bad, [])
        assert cnt == nerr
        assert np.array_equal(out, row)


def test_rs_erasures_shortened_row():
    """Erased parity positions (shortened last row) + errors."""
    rng = np.random.default_rng(7)
    data = rng.integers(0, 256, C.RS_K).astype(np.uint8)
    data[30:] = 0                      # shortened row: 30 real bytes
    parity = codec.rs_encode_row(data)
    row = np.concatenate([data, parity])
    bad = row.copy()
    bad[253] = bad[254] = 0            # untransmitted parity -> zeros
    bad[5] ^= 0x55                     # one real error
    out, cnt = codec.rs_decode_row(bad, [253, 254])
    assert cnt >= 1
    assert np.array_equal(out[:C.RS_K], row[:C.RS_K])


def test_rs_uncorrectable():
    rng = np.random.default_rng(8)
    data = rng.integers(0, 256, C.RS_K).astype(np.uint8)
    parity = codec.rs_encode_row(data)
    row = np.concatenate([data, parity])
    bad = row.copy()
    for p in rng.choice(C.RS_N, 6, replace=False):   # > t=3 errors
        bad[p] ^= 0xFF
    out, cnt = codec.rs_decode_row(bad, [])
    if cnt == -1:
        assert np.array_equal(out, bad)   # unmodified on failure


def test_frame_crc_roundtrip():
    rng = np.random.default_rng(9)
    content = rng.integers(0, 256, 40).astype(np.uint8)
    fcs = codec.frame_fcs(content)
    frame = np.concatenate(
        [[0x7E], content, [fcs & 0xFF, fcs >> 8], [0x7E]]
    ).astype(np.uint8)
    assert codec.frame_crc_ok(frame)
    frame[5] ^= 1
    assert not codec.frame_crc_ok(frame)


def test_hdlc_stuff_unstuff_roundtrip():
    rng = np.random.default_rng(10)
    for trial in range(20):
        content = rng.integers(0, 256, int(rng.integers(11, 200))).astype(np.uint8)
        bits = codec.build_burst_bitstream([content], pad_to=None)
        # pack LSB-first into bytes, pad with flags
        while len(bits) % 8:
            bits.append(0)  # partial byte; ok for this test
        un = codec.Unstuffer()
        for i in range(0, len(bits), 8):
            b = 0
            for n in range(8):
                b |= bits[i + n] << n
            un.push_byte(b)
        good = [f for f in un.frames if codec.frame_crc_ok(f)]
        assert len(good) == 1
        assert np.array_equal(good[0][1:-3], content)


def test_hdlc_stuffing_max_ones():
    content = np.array([0xFF] * 16, dtype=np.uint8)
    bits = codec.build_burst_bitstream([content], pad_to=512)
    un = codec.Unstuffer()
    for i in range(0, len(bits), 8):
        b = 0
        for n in range(8):
            b |= bits[i + n] << n
        un.push_byte(b)
    good = [f for f in un.frames if codec.frame_crc_ok(f)]
    assert len(good) == 1
    assert np.array_equal(good[0][1:-3], content)


def test_burst_geometry():
    assert codec.burst_geometry(95) is None            # too short
    assert codec.burst_geometry(96) == (1, 12)
    assert codec.burst_geometry(1991) == (1, 249)
    assert codec.burst_geometry(1992) == (2, 0)        # the quirk case
    assert codec.burst_geometry(1993) == (2, 1)
    assert codec.burst_geometry(8 * 1992 + 8) is None  # nbrow > 8
    assert codec.fec_geometry(3, 2) == (2, 0)
    assert codec.fec_geometry(3, 30) == (3, 2)
    assert codec.fec_geometry(3, 67) == (3, 4)
    assert codec.fec_geometry(3, 68) == (3, 0)


def test_transmitted_cells_count():
    # single full row (nlbyte=249): 249 + 6 bytes
    assert len(codec.transmitted_cells(1, 249)) == 255
    # 2 rows, last has 10 bytes: data 249+10, fec 6+2
    cells = codec.transmitted_cells(2, 10)
    assert len(cells) == 249 + 10 + 6 + 2


def test_make_burst_avoids_unprotected_last_row():
    """Transmit-side rule: nlbyte must be >= 3 (nlbyte<=2 last rows get no
    FEC but ARE erasure-scribbled by the receiver — undecodable by design).
    """
    from vdlm2dec_tpu import modulator as mod

    rng = np.random.default_rng(33)
    for n in [1, 50, 238, 239, 240, 241, 242, 245, 487, 489, 491, 700, 736]:
        content = rng.integers(0, 256, n).astype(np.uint8)
        plan = mod.make_burst([content])
        assert plan.nlbyte >= 3, f"payload {n}: nlbyte {plan.nlbyte}"


def test_flag_byte_in_content_roundtrip():
    """0x7E content bytes vs the reference's unstuff-then-flag-scan.

    The reference (vdlm2.c:120-152) compares UNSTUFFED bytes against the
    flag, so a reconstructed in-frame 0x7E is indistinguishable from a
    flag byte:

    * FIRST content byte 0x7E: at k==1 it is treated as a repeated flag
      and eaten — the frame can never pass CRC.  Undecodable by the
      reference's semantics (which we replicate exactly); transmitters
      never hit it (AVLC byte 0 is an address octet).  make_capture
      excludes it from synthesized truth for the same reason.
    * interior / trailing / FCS 0x7E: the flag-scan appends a truncated
      frame (CRC-dropped) and keeps accumulating, so the full frame is
      appended again at the real closing flag and decodes intact.
    """
    from vdlm2dec_tpu import modulator as mod

    def roundtrip(content):
        plan = mod.make_burst([content])
        good, _ = codec.deframe_block(plan.block, plan.nbrow, plan.nlbyte)
        return [bytes(bytearray(f[1:-3])) for f in good]

    rng = np.random.default_rng(3)
    c = rng.integers(0, 256, 57).astype(np.uint8)
    c[0] = 0x7E
    assert roundtrip(c) == []                  # leading: reference-lost
    c[0] = 0x41
    c[20] = 0x7E
    assert roundtrip(c) == [c.tobytes()]       # interior: fine
    c[-1] = 0x7E
    assert roundtrip(c) == [c.tobytes()]       # trailing: fine
    # FCS bytes equal to 0x7E also roundtrip (seed 33 -> fcs 0x7E45)
    cc = np.random.default_rng(33).integers(0, 256, 30).astype(np.uint8)
    fcs = codec.frame_fcs(cc)
    assert (fcs & 0xFF) == 0x7E or (fcs >> 8) == 0x7E
    assert roundtrip(cc) == [cc.tobytes()]
