"""Airspy-style real-input end-to-end (BASELINE config 3).

Real f32 capture at 6 Msps (Mini) / 5 Msps (R2): channels mixed relative to
F0 = Fc + fs/4 (air.c:182-185); synthetic real capture places the channel's
conjugate-symmetric image far outside the decimator passband.
"""
import numpy as np
import pytest

from vdlm2dec_tpu import framegen as fg
from vdlm2dec_tpu import modulator as mod
from vdlm2dec_tpu.pipeline import Pipeline, PipelineConfig

TWO_PI = 2 * np.pi


@pytest.mark.parametrize("fs,sdrclk", [(6_000_000, 1500), (5_000_000, 1250)])
def test_airspy_real_capture_decodes(fs, sdrclk):
    rng = np.random.default_rng(0)
    freq = 136_975_000
    fc = 136_800_000
    f0 = fc + fs / 4
    fo = freq - f0                       # negative: below F0

    content = fg.acars_frame(text=f"AIRSPY{fs}", label="Q0")
    plan = mod.make_burst([content])
    bb = mod.synthesize_baseband(plan, start=600, total=2 * 8400)
    # real capture: Re{a(t) e^{j 2 pi fo t}} * 2 puts the channel at fo
    # relative to F0 with a conjugate image at -fo (|2 fo| ~ fs/2, rejected)
    ratio = fs / 84_000
    n = int(len(bb) * ratio)
    tt = np.arange(n) / ratio
    i0 = np.clip(np.floor(tt).astype(int), 0, len(bb) - 2)
    frac = tt - i0
    up = bb[i0] * (1 - frac) + bb[i0 + 1] * frac
    real_sig = 2.0 * np.real(up * np.exp(1j * TWO_PI * fo / fs * np.arange(n)))
    real_sig = (real_sig * 30 + rng.normal(size=n)).astype(np.float32)

    cfg = PipelineConfig(
        freqs_hz=[float(freq)], fs=fs, fc_hz=float(fc), real_input=True,
        sdrclk=sdrclk, max_symbols=512, max_candidates=8,
    )
    pipe = Pipeline(cfg)
    bursts = pipe.decode_wideband(real_sig)
    frames = [f for b in bursts for f in b.frames]
    assert len(frames) == 1
    np.testing.assert_array_equal(frames[0][1:-3], content)
