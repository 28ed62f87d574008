"""Host L5 tests: AVLC parse, ACARS/XID decode, flights, outputs."""
import io
import json

import numpy as np
import pytest

from vdlm2dec_tpu import framegen as fg
from vdlm2dec_tpu.host import acars, avlc, xid
from vdlm2dec_tpu.host.decoder import FrameDecoder
from vdlm2dec_tpu.host.output import OutputConfig, parse_netaddr, sbs_line
from vdlm2dec_tpu.host.flights import FlightTracker
from vdlm2dec_tpu.pipeline import DecodedBurst


def _mk_burst(frames):
    return DecodedBurst(
        channel=0, t0=0, time_s=0.5, freq_hz=136_975_000.0, ppm=1.5,
        length_bits=0, nbrow=1, nlbyte=0, block=np.zeros((1, 255), np.uint8),
        rs_counts=[0], frames=frames,
    )


def _with_flags(content):
    from vdlm2dec_tpu.golden.codec import frame_fcs

    fcs = frame_fcs(content)
    return np.concatenate(
        [[0x7E], content, [fcs & 0xFF, fcs >> 8], [0x7E]]
    ).astype(np.uint8)


# ---------------------------------------------------------------------------
# AVLC
# ---------------------------------------------------------------------------

def test_icaoaddr_roundtrip():
    for addr in [0x13C6544, 0x4FFFFFF, 0x0000001, 0x7ABCDEF]:
        enc = avlc.encode_icaoaddr(addr)
        assert avlc.icaoaddr(np.frombuffer(enc, np.uint8)) == addr


def test_parse_frame_fields():
    content = fg.acars_frame()
    frame = _with_flags(content)
    fr = avlc.parse_frame(frame)
    assert fr.from_air
    assert fr.from_addr == fg.AIRCRAFT | 0x3C6544
    assert fr.to_addr == fg.GROUND_D | 0x10902A
    assert fr.link_ctrl == 0x03


def test_linkctrl_format():
    assert avlc.format_linkctrl(0x03, 0) == "Frame-U: UI\n"
    assert avlc.format_linkctrl(0xBF, 0) == "Frame-U: XID\n"
    assert avlc.format_linkctrl(0x01, 0).startswith("Frame-S: Nr:0 RR")
    assert avlc.format_linkctrl(0x00, 0).startswith("Frame-I: Ns:0 Nr:0")


# ---------------------------------------------------------------------------
# ACARS
# ---------------------------------------------------------------------------

def test_acars_payload_crc_and_parse():
    pl = fg.acars_payload(text="Q1 TEST", label="Q1", reg=".FHBND")
    msg = acars.parse_acars(pl)
    assert msg is not None
    assert msg.label == "Q1"
    assert msg.reg == "F-HBND"
    assert msg.fid == "AF1234"
    assert msg.no == "M01A"
    assert msg.text == "Q1 TEST"
    assert msg.ack == "!"


def test_acars_crc_reject():
    pl = fg.acars_payload().copy()
    pl[3] ^= 1
    assert acars.parse_acars(pl) is None


@pytest.mark.parametrize("raw,want", [
    (".N12345", "N12345"),       # US: N prefix not in tables -> unchanged
    (".FHBND", "F-HBND"),        # 1-char prefix
    ("PHBXA", "PH-BXA"),         # 2-char prefix
    ("A9CDL", "A9C-DL"),         # 3-char prefix
    ("F-HBND", "F-HBND"),        # already hyphenated
    ("..XYZ", ".XYZ"[1:] if False else "XYZ"),   # dots stripped, short
])
def test_fixreg(raw, want):
    assert acars.fixreg(raw) == want


def test_label_q1_oooi():
    msg = acars.AcarsMessage(label="Q1", text="LFPGKJFKA1B2C3D4E5F6G7H8KJFK")
    oooi, ov = acars.decode_label(msg)
    assert ov == 1
    assert oooi.sa == "LFPG"
    assert oooi.gout == "KJFK"
    assert oooi.da == "KJFK"


def test_label_h1_position():
    msg = acars.AcarsMessage(label="H1", text="#M1BPOSN48123W002345XXXXXX")
    oooi, ov = acars.decode_label(msg)
    assert ov == 1
    assert oooi.lat == pytest.approx(48.123)
    assert oooi.lon == pytest.approx(-2.345)
    assert oooi.epu == 1


def test_label_17_unreachable_quirk():
    """Reference tests label[1]=='6' twice: '17' never parses, '16' may
    fall through to the 17 parser (label.c:277-282)."""
    msg = acars.AcarsMessage(label="17", text="ETA 1234,LFPG,KJFK")
    _, ov = acars.decode_label(msg)
    assert ov == 0               # unreachable, as in the reference


def test_label_filter():
    f = acars.LabelFilter("H1:Q0")
    assert f("H1") and f("Q0") and not f("Q1")
    f2 = acars.LabelFilter(None)
    assert f2("ZZ")


# ---------------------------------------------------------------------------
# XID
# ---------------------------------------------------------------------------

def test_xid_decode_position():
    content = fg.xid_frame()
    # group stream starts after the 0x82 format id (hdata[11] with flag,
    # i.e. content[10] without)
    res = xid.decode_xid(content[10:])
    assert res.decoded
    assert res.info.dst_airport == "LFPG"
    assert res.info.lat == pytest.approx(48.5, abs=0.01)
    assert res.info.lon == pytest.approx(2.5, abs=0.01)
    assert res.info.alt == 35000
    assert any("Destination airport LFPG" in l for l in res.info.lines)


# ---------------------------------------------------------------------------
# Flights
# ---------------------------------------------------------------------------

def test_flight_tracker_mru_and_expiry():
    tr = FlightTracker()
    f1 = tr.add(0x111111, 1000.0)
    f2 = tr.add(0x222222, 1001.0)
    assert len(tr) == 2
    f1b = tr.add(0x111111, 1002.0)
    assert f1b is f1
    assert tr.flights()[0].addr == 0x111111     # MRU front
    tr.add(0x333333, 1000.0 + 1805)
    assert len(tr) == 1                          # others expired


# ---------------------------------------------------------------------------
# FrameDecoder end-to-end
# ---------------------------------------------------------------------------

def _decoder(**kw):
    buf = io.StringIO()
    cfg = OutputConfig(logfile=buf, **kw)
    return FrameDecoder(cfg, time_base=1_700_000_000.0), buf


def test_decoder_acars_text_output():
    dec, buf = _decoder(verbose=1)
    content = fg.acars_frame(text="Q1 HELLO", label="Q1", reg=".FHBND")
    dec.process_burst(_mk_burst([_with_flags(content)]))
    out = buf.getvalue()
    assert "ACARS" in out
    assert "Aircraft reg: F-HBND" in out
    assert "Msg. label: Q1" in out
    assert "Aircraft:3C6544" in out
    assert "Frame-U: UI" in out
    assert dec.stats.acars == 1


def test_decoder_json_output():
    dec, buf = _decoder(verbose=0, jsonout=True, station_id="TEST1")
    content = fg.acars_frame(text="HELLO", label="Q0")
    dec.process_burst(_mk_burst([_with_flags(content)]))
    line = buf.getvalue().strip()
    obj = json.loads(line)
    assert obj["station_id"] == "TEST1"
    assert obj["freq"] == 136.975
    assert obj["hex"] == "3C6544"
    assert obj["icao"] == 0x3C6544
    assert obj["label"] == "Q0"
    assert obj["text"] == "HELLO"
    assert obj["tail"] == "N12345"
    assert obj["flight"] == "AF1234"
    assert obj["app"]["name"] == "vdlm2dec"


def test_decoder_ground_filter():
    dec, buf = _decoder(verbose=1)
    content = fg.acars_frame(from_addr=fg.GROUND_D | 0x123456)
    dec.process_burst(_mk_burst([_with_flags(content)]))
    assert buf.getvalue() == ""          # dropped: ground origin without -G
    assert dec.stats.filtered == 1

    dec2, buf2 = _decoder(verbose=1, grndmess=True)
    dec2.process_burst(_mk_burst([_with_flags(content)]))
    assert "ACARS" in buf2.getvalue()


def test_decoder_xid_to_flight_and_json():
    dec, buf = _decoder(verbose=0, jsonout=True)
    content = fg.xid_frame()
    dec.process_burst(_mk_burst([_with_flags(content)]))
    obj = json.loads(buf.getvalue().strip())
    assert obj["dsta"] == "LFPG"
    assert obj["lat"] == 48.5
    assert obj["alt"] == 35000
    assert dec.stats.xid == 1


def test_decoder_undecoded():
    dec, buf = _decoder(verbose=1, undecmess=True)
    hdr = fg.avlc_header(fg.AIRCRAFT | 0x3C6544, fg.GROUND_A | 0x2)
    content = np.concatenate([hdr, np.array([0x55, 0x66, 0x77], np.uint8)])
    dec.process_burst(_mk_burst([_with_flags(content)]))
    assert "unknown data" in buf.getvalue()


def test_route_and_reg_outputs():
    dec, buf = _decoder(verbose=0, routeout=True, jsonout=True)
    content = fg.acars_frame(text="LFPGKJFKA1B2C3D4E5F6G7H8KJFK",
                             label="Q1", reg=".FHBND")
    dec.process_burst(_mk_burst([_with_flags(content)]))
    lines = [json.loads(l) for l in buf.getvalue().strip().splitlines()]
    assert any("flight" in o and o.get("depa") == "LFPG" for o in lines)
    assert any(o.get("tail") == "F-HBND" for o in lines)


def test_sbs_line_format():
    from vdlm2dec_tpu.host.flights import Flight

    fl = Flight(addr=0x3C6544, reg="F-HBND")
    fl.oooi.epu = 1
    fl.oooi.lat = 48.5
    fl.oooi.lon = 2.5
    fl.oooi.alt = 35000
    line = sbs_line(fl, 1_700_000_000.25, now=1_700_000_000.5)
    assert line.startswith("MSG,3,1,1,3C6544,1,")
    assert ",48.500000,2.500000" in line
    assert line.endswith("\r\n")


def test_parse_netaddr():
    assert parse_netaddr("1.2.3.4:5000")[0:2] == ("1.2.3.4", "5000")
    assert parse_netaddr("feeder.example.org")[0:2] == ("feeder.example.org", "5555")
    a, p, fam = parse_netaddr("[::1]:9999")
    assert a == "::1" and p == "9999"
