"""chooseFc port: constraint and search-order semantics (rtl.c:123-160),
plus differential tests of the pure front-end logic (Fc choice, R820T2
IF-filter offset, gain snap, device match) against the UNMODIFIED
reference rtl.c/air.c compiled with stub SDR libs (refshim/shim_choosefc.c).
"""
import os
import subprocess

import pytest

from vdlm2dec_tpu.constants import STEPRATE
from vdlm2dec_tpu.io.sdr import (
    airspy_r2_if_filter,
    choose_fc,
    choose_fc_airspy,
    match_device,
    nearest_gain,
    validate_freqs,
)

_D = os.path.join(os.path.dirname(__file__), "refshim")
SHIM_RTL = os.path.join(_D, "ref_shim_choosefc_rtl")
SHIM_AIR = os.path.join(_D, "ref_shim_choosefc_air")


def _ensure_choosefc_shims():
    src = os.path.join(_D, "shim_choosefc.c")
    fresh = all(
        os.path.exists(b) and os.path.getmtime(b) >= os.path.getmtime(src)
        for b in (SHIM_RTL, SHIM_AIR)
    )
    if fresh:
        return True
    if not os.path.exists("/root/reference/rtl.c"):
        return os.path.exists(SHIM_RTL) and os.path.exists(SHIM_AIR)
    try:
        subprocess.run(["sh", os.path.join(_D, "build.sh")], check=True,
                       capture_output=True, timeout=120)
    except subprocess.SubprocessError:
        return False
    return os.path.exists(SHIM_RTL) and os.path.exists(SHIM_AIR)


def _parse(out: str) -> dict:
    res = {"fo": {}, "r820t": []}
    for line in out.splitlines():
        p = line.split()
        if not p:
            continue
        if p[0] == "FC":
            res["fc"] = int(p[1])
        elif p[0] == "GAIN":
            res["gain"] = int(p[1])
        elif p[0] == "RATE":
            res["rate"] = int(p[1])
        elif p[0] == "FO":
            res["fo"][int(p[1])] = int(p[2])
        elif p[0] == "R820T":
            res["r820t"].append((int(p[1]), int(p[2])))
    return res


def _run_shim(binary, args):
    r = subprocess.run([binary] + [str(a) for a in args],
                       capture_output=True, text=True, timeout=30)
    return r.returncode, _parse(r.stdout)


def _check_constraints(fc, freqs, fs=2_000_000):
    fd = sorted(freqs)
    for n, f in enumerate(fd):
        assert abs(fc - f) <= fs // 2 - 2 * STEPRATE, "outside usable span"
        assert abs(fc - f) >= 2 * STEPRATE, "too close to DC spike"
        if n > 0:
            assert fc - fd[n - 1] != f - fc, "mirror image pair"


def test_choose_fc_single():
    f = [136_975_000]
    fc = choose_fc(f)
    _check_constraints(fc, f)
    # reference scans DOWN from max+2*STEP; with the >=2*STEP DC-guard,
    # constraint |fc-f| >= 2*STEP makes exactly max+2*STEP the first hit
    assert fc == 136_975_000 + 2 * STEPRATE


def test_choose_fc_pair_and_mirror_rule():
    f = [136_725_000, 136_975_000]
    fc = choose_fc(f)
    _check_constraints(fc, f)


def test_choose_fc_eight_channels():
    f = [136_600_000 + 50_000 * i for i in range(8)]
    fc = choose_fc(f)
    _check_constraints(fc, f)


def test_choose_fc_too_far_apart():
    with pytest.raises(ValueError):
        choose_fc([118_000_000, 137_900_000])


def test_choose_fc_airspy_raster():
    fc = choose_fc_airspy([136_975_000, 136_725_000], 6_000_000)
    assert fc % STEPRATE == 0
    assert fc == ((136_850_000 + STEPRATE // 2) // STEPRATE) * STEPRATE


def test_validate_freqs_band():
    assert validate_freqs([117_999_999, 118_000_000, 138_000_000, 138_000_001]) == [
        118_000_000, 138_000_000
    ]


# -- differential vs the compiled reference front-end logic --------------------
needs_shims = pytest.mark.skipif(not _ensure_choosefc_shims(),
                                 reason="no choosefc shims")

# the R820T gain table baked into shim_choosefc.c
R820T_GAINS = [0, 9, 14, 27, 37, 77, 87, 125, 144, 157, 166, 197, 207, 229,
               254, 280, 297, 328, 338, 364, 372, 386, 402, 421, 434, 439,
               445, 480, 496]


@needs_shims
@pytest.mark.parametrize("freqs,gain", [
    ([136.975], 425),
    ([136.975, 136.875], 0),
    ([136.6 + 0.05 * i for i in range(8)], 301),
    ([136.975, 136.725, 136.875], 496),
    ([118.000, 119.000], 178),
])
def test_rtl_frontend_differential(freqs, gain):
    freqs_hz = [int(round(f * 1e6)) for f in freqs]
    rc, ref = _run_shim(
        SHIM_RTL, [gain, 0] + [f"{hz / 1e6:.6f}" for hz in freqs_hz])
    assert rc == 0
    assert choose_fc(freqs_hz) == ref["fc"]
    assert nearest_gain(gain, R820T_GAINS) == ref["gain"]
    # mixer offsets follow from Fc (rtl.c:245-247; channel order = argv)
    for n, f in enumerate(freqs_hz):
        assert f - ref["fc"] == ref["fo"][n]


@needs_shims
@pytest.mark.parametrize("rate,freqs", [
    (6_000_000, [136.975, 131.725]),
    (6_000_000, [136.975]),
    (5_000_000, [136.975]),
    (5_000_000, [136.975, 136.725]),
    (5_000_000, [136.975, 136.100]),
    (5_000_000, [136.975, 136.500, 136.250]),
    (5_000_000, [118.000, 118.750]),
])
def test_airspy_frontend_differential(rate, freqs):
    rc, ref = _run_shim(SHIM_AIR, [rate] + [f"{f:.6f}" for f in freqs])
    assert rc == 0
    freqs_hz = [int(f * 1e6) for f in freqs]
    fc = choose_fc_airspy(freqs_hz, rate)
    assert fc == ref["fc"]
    if rate == 5_000_000:
        sel = airspy_r2_if_filter(
            max(freqs_hz) - min(freqs_hz) + 2 * STEPRATE)
        assert sel is not None
        assert ref["r820t"] == [(10, sel[3]), (11, sel[4])]
    # fs/4 arrangement (air.c:182-185)
    for n, f in enumerate(freqs_hz):
        assert f - (ref["fc"] + rate // 4) == ref["fo"][n]


@needs_shims
def test_airspy_r2_span_too_wide_differential():
    rc, _ = _run_shim(SHIM_AIR, [5_000_000, "136.975000", "131.725000"])
    assert rc != 0                       # reference: Frequencies too far apart
    with pytest.raises(ValueError):
        choose_fc_airspy([136_975_000, 131_725_000], 5_000_000)


def test_nearest_gain_tie_first_wins():
    assert nearest_gain(23, [20, 26]) == 20       # |23-20| == |23-26|
    assert nearest_gain(1000, R820T_GAINS) == 496
    assert nearest_gain(-5, R820T_GAINS) == 0
    assert nearest_gain(10, []) == 0


def test_match_device_semantics():
    serials = ["00000001", "ABCD1234", "XYZ00099"]
    assert match_device("1", serials) == 1        # raw index wins
    assert match_device("00000001", serials) == 1  # strtol octal -> index 1
    assert match_device("ABCD1234", serials) == 1  # exact serial
    assert match_device("XYZ", serials) == 2       # prefix
    assert match_device("99", serials) == 2        # suffix
    assert match_device("nope", serials) == -1
