"""FANS-1/A CPDLC ASN.1 unaligned-PER codec (downlink subset).

The reference decodes CPDLC through libacars's generated ASN.1 modules
(arincpos.c:22-34) and consumes exactly one shape from the decode result:
the DM48 position report — its current position (lat/lon, optional tenths
of minutes) and its altitude in any of 8 encodings (parse_altitude,
arincpos.c:47-90; extract_position, arincpos.c:92-118), found either as
the message's element id or inside the element-id sequence
(arincpos.c:176-213).

This module is a from-scratch unaligned-PER runtime plus the FANS-1/A
(DO-258A) type subset needed for that: no libacars, no generated code.
The encoder exists so tests can hand-build wire vectors for every
altitude encoding and for sequence-carried DM48 elements (the reference
ships no test corpus).  Field ranges follow DO-258A where published;
they only affect bit widths and are exercised by round-trip tests.

Scope note: the FANS downlink element CHOICE has 81 alternatives
(dM0..dM80); unaligned PER carries no per-element length, so an element
of an unmodelled type cannot be skipped.  decode_downlink() decodes the
header and the first element; a non-DM48 first element yields an
UnsupportedElement marker (the reference's full schema decodes all of
them — position extraction still only ever reads DM48).
"""
from __future__ import annotations

from dataclasses import dataclass, field

M2FT = 3.28084     # meters -> feet (arincpos.c:50)


# -- bit-level PER runtime ----------------------------------------------------
class BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0                      # bit cursor

    def read(self, n: int) -> int:
        if self.pos + n > 8 * len(self.data):
            raise ValueError("PER decode ran past end of data")
        v = 0
        for _ in range(n):
            byte = self.data[self.pos >> 3]
            bit = (byte >> (7 - (self.pos & 7))) & 1
            v = (v << 1) | bit
            self.pos += 1
        return v


class BitWriter:
    def __init__(self):
        self.bits: list[int] = []

    def write(self, v: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.bits.append((v >> i) & 1)

    def bytes(self) -> bytes:
        out = bytearray((len(self.bits) + 7) // 8)
        for i, b in enumerate(self.bits):
            if b:
                out[i >> 3] |= 1 << (7 - (i & 7))
        return bytes(out)


def _width(lo: int, hi: int) -> int:
    span = hi - lo
    return max(span.bit_length(), 0)


def read_int(r: BitReader, lo: int, hi: int) -> int:
    w = _width(lo, hi)
    return lo + (r.read(w) if w else 0)


def write_int(w: BitWriter, v: int, lo: int, hi: int) -> None:
    if not lo <= v <= hi:
        raise ValueError(f"{v} outside PER range [{lo}, {hi}]")
    bw = _width(lo, hi)
    if bw:
        w.write(v - lo, bw)


# -- FANS-1/A subset schema ----------------------------------------------------
# FANSAltitude ::= CHOICE of 8 alternatives, in the order of the reference's
# switch (arincpos.c:52-88).  Each entry: (name, lo, hi, to_feet).
ALTITUDE_CHOICES = (
    ("altitudeQNH", -60, 7000, lambda v: v * 10),
    ("altitudeQNHMeters", -30, 25000, lambda v: round(v * M2FT)),
    ("altitudeQFE", -60, 7000, lambda v: v * 10),
    ("altitudeQFEMeters", -30, 25000, lambda v: round(v * M2FT)),
    ("altitudeGNSSFeet", -600, 70000, lambda v: v),
    ("altitudeGNSSMeters", -200, 22000, lambda v: round(v * M2FT)),
    ("altitudeFlightLevel", 30, 600, lambda v: v * 100),
    ("altitudeFlightLevelMetric", 100, 2500, lambda v: round(v * 10.0 * M2FT)),
)
ALT_INDEX = {name: i for i, (name, *_rest) in enumerate(ALTITUDE_CHOICES)}

# FANSPosition ::= CHOICE { fixName, navaid, airport, latitudeLongitude,
#                           placeBearingDistance }
POSITION_LATLON = 3          # index of latitudeLongitude
N_POSITION_CHOICES = 5

DM48_INDEX = 48              # dM48PositionReport within dM0..dM80
N_DM_CHOICES = 81

# FANSPositionReport optional tail (beyond the 3 mandatory components:
# positioncurrent, timeatpositioncurrent, altitude).  Only the preamble
# width matters for the fields we read; unmodelled optional BODIES cannot
# be skipped, so the decoder requires them absent (all-zero tail bits).
N_REPORT_OPTIONALS = 19


@dataclass
class Altitude:
    encoding: str            # one of ALTITUDE_CHOICES names
    value: int               # raw encoded value
    feet: int                # per parse_altitude (arincpos.c:47-90)


@dataclass
class LatLon:
    lat_deg: int
    lat_min10: int | None    # tenths of minutes, optional
    lat_south: bool
    lon_deg: int
    lon_min10: int | None
    lon_west: bool

    @property
    def lat(self) -> float:
        v = float(self.lat_deg)
        if self.lat_min10 is not None:
            v += self.lat_min10 / 10.0 / 60.0     # arincpos.c:38-45
        return -v if self.lat_south else v

    @property
    def lon(self) -> float:
        v = float(self.lon_deg)
        if self.lon_min10 is not None:
            v += self.lon_min10 / 10.0 / 60.0
        return -v if self.lon_west else v


@dataclass
class PositionReport:
    position: LatLon | None  # None when positioncurrent is not lat/lon
    hours: int
    minutes: int
    altitude: Altitude


@dataclass
class UnsupportedElement:
    index: int               # dM number


@dataclass
class DownlinkMessage:
    msg_id: int
    msg_ref: int | None
    timestamp: tuple[int, int, int] | None
    elements: list = field(default_factory=list)


# -- component codecs ----------------------------------------------------------
def _read_latlon(r: BitReader) -> LatLon:
    lat_has_min = r.read(1)
    lat_deg = read_int(r, 0, 90)
    lat_min = read_int(r, 0, 599) if lat_has_min else None
    lat_dir = r.read(1)                         # 0 north, 1 south
    lon_has_min = r.read(1)
    lon_deg = read_int(r, 0, 180)
    lon_min = read_int(r, 0, 599) if lon_has_min else None
    lon_dir = r.read(1)                         # 0 east, 1 west
    return LatLon(lat_deg, lat_min, bool(lat_dir), lon_deg, lon_min,
                  bool(lon_dir))


def _write_latlon(w: BitWriter, p: LatLon) -> None:
    w.write(1 if p.lat_min10 is not None else 0, 1)
    write_int(w, p.lat_deg, 0, 90)
    if p.lat_min10 is not None:
        write_int(w, p.lat_min10, 0, 599)
    w.write(1 if p.lat_south else 0, 1)
    w.write(1 if p.lon_min10 is not None else 0, 1)
    write_int(w, p.lon_deg, 0, 180)
    if p.lon_min10 is not None:
        write_int(w, p.lon_min10, 0, 599)
    w.write(1 if p.lon_west else 0, 1)


def _read_altitude(r: BitReader) -> Altitude:
    idx = read_int(r, 0, len(ALTITUDE_CHOICES) - 1)
    name, lo, hi, conv = ALTITUDE_CHOICES[idx]
    v = read_int(r, lo, hi)
    return Altitude(name, v, conv(v))


def _write_altitude(w: BitWriter, encoding: str, value: int) -> None:
    idx = ALT_INDEX[encoding]
    _, lo, hi, _ = ALTITUDE_CHOICES[idx]
    write_int(w, idx, 0, len(ALTITUDE_CHOICES) - 1)
    write_int(w, value, lo, hi)


def _read_position_report(r: BitReader) -> PositionReport:
    opt = r.read(N_REPORT_OPTIONALS)
    if opt:
        raise ValueError(
            "FANS position report carries optional components outside the "
            "decoded subset"
        )
    pos_idx = read_int(r, 0, N_POSITION_CHOICES - 1)
    if pos_idx == POSITION_LATLON:
        pos = _read_latlon(r)
    else:
        # positioncurrent not in lat/lon form: the reference returns
        # without extracting (arincpos.c:95-97); named forms are
        # IA5Strings we cannot size without the full schema
        raise _NotLatLon()
    hours = read_int(r, 0, 23)
    minutes = read_int(r, 0, 59)
    alt = _read_altitude(r)
    return PositionReport(pos, hours, minutes, alt)


class _NotLatLon(Exception):
    pass


def _write_position_report(w: BitWriter, p: LatLon, hours: int, minutes: int,
                           alt_encoding: str, alt_value: int) -> None:
    w.write(0, N_REPORT_OPTIONALS)
    write_int(w, POSITION_LATLON, 0, N_POSITION_CHOICES - 1)
    _write_latlon(w, p)
    write_int(w, hours, 0, 23)
    write_int(w, minutes, 0, 59)
    _write_altitude(w, alt_encoding, alt_value)


# -- message codec ---------------------------------------------------------
def decode_downlink(data: bytes) -> DownlinkMessage:
    """FANSATCDownlinkMessage: header + first element (+ DM48 seqOf walk).

    Raises ValueError on truncated/overlong input.
    """
    r = BitReader(data)
    has_seq = r.read(1)                   # seqOf OPTIONAL (top preamble)
    has_ref = r.read(1)                   # header msgReferenceNumber OPTIONAL
    has_ts = r.read(1)                    # header timestamp OPTIONAL
    msg_id = read_int(r, 0, 63)
    msg_ref = read_int(r, 0, 63) if has_ref else None
    ts = None
    if has_ts:
        ts = (read_int(r, 0, 23), read_int(r, 0, 59), read_int(r, 0, 59))
    msg = DownlinkMessage(msg_id, msg_ref, ts)

    def element():
        idx = read_int(r, 0, N_DM_CHOICES - 1)
        if idx != DM48_INDEX:
            return UnsupportedElement(idx), False
        try:
            return _read_position_report(r), True
        except _NotLatLon:
            return PositionReport(None, 0, 0,
                                  Altitude("altitudeQNH", 0, 0)), False

    el, decodable = element()
    msg.elements.append(el)
    if has_seq and decodable:
        # FANSATCDownlinkMsgElementIdSequence ::= SEQUENCE SIZE(1..4) OF;
        # walkable only while every prior element is a modelled type
        n = read_int(r, 1, 4)
        for _ in range(n):
            el, decodable = element()
            msg.elements.append(el)
            if not decodable:
                break
    return msg


def encode_downlink(msg_id: int, reports: list[dict],
                    msg_ref: int | None = None,
                    timestamp: tuple[int, int, int] | None = None) -> bytes:
    """Wire-encode a downlink message whose elements are all DM48 position
    reports (test-vector builder).  Each report dict: latlon (LatLon),
    hours, minutes, alt_encoding, alt_value.
    """
    assert 1 <= len(reports) <= 5
    w = BitWriter()
    w.write(1 if len(reports) > 1 else 0, 1)
    w.write(1 if msg_ref is not None else 0, 1)
    w.write(1 if timestamp is not None else 0, 1)
    write_int(w, msg_id, 0, 63)
    if msg_ref is not None:
        write_int(w, msg_ref, 0, 63)
    if timestamp is not None:
        write_int(w, timestamp[0], 0, 23)
        write_int(w, timestamp[1], 0, 59)
        write_int(w, timestamp[2], 0, 59)

    def emit(rep: dict):
        write_int(w, DM48_INDEX, 0, N_DM_CHOICES - 1)
        _write_position_report(w, rep["latlon"], rep["hours"],
                               rep["minutes"], rep["alt_encoding"],
                               rep["alt_value"])

    emit(reports[0])
    if len(reports) > 1:
        write_int(w, len(reports) - 1, 1, 4)
        for rep in reports[1:]:
            emit(rep)
    return w.bytes()


def find_dm48(msg: DownlinkMessage) -> PositionReport | None:
    """First DM48 position report with a lat/lon position, scanning the
    top element then the sequence (arincpos.c:183-211)."""
    for el in msg.elements:
        if isinstance(el, PositionReport) and el.position is not None:
            return el
    return None
