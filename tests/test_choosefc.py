"""chooseFc port: constraint and search-order semantics (rtl.c:123-160)."""
import pytest

from vdlm2dec_tpu.constants import STEPRATE
from vdlm2dec_tpu.io.sdr import choose_fc, choose_fc_airspy, validate_freqs


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
