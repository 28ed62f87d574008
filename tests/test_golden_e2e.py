"""End-to-end golden tests: modulator -> scalar demod -> FEC -> frames."""
import numpy as np
import pytest

from vdlm2dec_tpu import modulator as mod
from vdlm2dec_tpu.golden import codec
from vdlm2dec_tpu.golden.dsp import GoldenChannel, mix_and_decimate


def make_test_frame(rng, payload_len=30):
    """A plausible AVLC frame content: addresses + ctrl + payload."""
    content = rng.integers(0, 256, 9 + payload_len).astype(np.uint8)
    # ensure dest/src address bytes look like an air-to-ground frame:
    # hdata[5] holds from-addr type bits; set type=1 (aircraft): the type is
    # (reversebits(hdata[0]>>2,6)<<21 ... >>24)... keep arbitrary here —
    # these tests check transport, not L5 semantics.
    return content


def decode_burst_frames(burst):
    return codec.deframe_block(burst.block, burst.nbrow, burst.nlbyte)[0]


@pytest.mark.parametrize("timing_frac", [0.0, 0.3, 0.7])
def test_e2e_clean_baseband(timing_frac):
    rng = np.random.default_rng(42)
    content = make_test_frame(rng)
    plan = mod.make_burst([content])
    sig = mod.synthesize_baseband(plan, start=200, timing_frac=timing_frac)
    ch = GoldenChannel()
    bursts = ch.run(sig)
    assert len(bursts) == 1, f"expected 1 burst, got {len(bursts)}"
    b = bursts[0]
    assert b.length_bits == plan.length_bits
    frames = decode_burst_frames(b)
    assert len(frames) == 1
    assert np.array_equal(frames[0][1:-3], content)


def test_e2e_cfo_and_phase():
    rng = np.random.default_rng(43)
    content = make_test_frame(rng, payload_len=60)
    plan = mod.make_burst([content])
    # ~ +/-400 Hz CFO is ~ 4 ppm at VHF; demod estimates and removes it
    sig = mod.synthesize_baseband(plan, start=300, cfo_hz=200.0, phase0=1.1)
    ch = GoldenChannel()
    bursts = ch.run(sig)
    assert len(bursts) == 1
    frames = decode_burst_frames(bursts[0])
    assert len(frames) == 1
    assert np.array_equal(frames[0][1:-3], content)


def test_e2e_noise_10db():
    rng = np.random.default_rng(44)
    content = make_test_frame(rng, payload_len=40)
    plan = mod.make_burst([content])
    sig = mod.synthesize_baseband(plan, start=250)
    sig = mod.awgn(sig, 10.0, rng)
    ch = GoldenChannel()
    bursts = ch.run(sig)
    assert len(bursts) == 1
    frames = decode_burst_frames(bursts[0])
    assert len(frames) == 1
    assert np.array_equal(frames[0][1:-3], content)


def test_e2e_multirow():
    rng = np.random.default_rng(45)
    content = rng.integers(0, 256, 400).astype(np.uint8)   # forces 2 RS rows
    plan = mod.make_burst([content])
    assert plan.nbrow >= 2
    sig = mod.synthesize_baseband(plan, start=200)
    ch = GoldenChannel()
    bursts = ch.run(sig)
    assert len(bursts) == 1
    frames = decode_burst_frames(bursts[0])
    assert len(frames) == 1
    assert np.array_equal(frames[0][1:-3], content)


def test_e2e_wideband_channelized():
    """Burst placed at +Fo in a 2.048-like 2.0 Msps wideband, then the
    reference mixer/decimator brings it back to 84 kHz."""
    rng = np.random.default_rng(46)
    content = make_test_frame(rng)
    plan = mod.make_burst([content])
    bb = mod.synthesize_baseband(plan, start=220)
    fs, sdrclk = 2_000_000, 500
    f_off = 75_000.0          # 3 channels up: multiple of 25 kHz
    wide = mod.upsample_to_wideband(bb, fs, f_off)
    y = mix_and_decimate(wide, f_off, fs, sdrclk)
    ch = GoldenChannel()
    bursts = ch.run(y)
    assert len(bursts) == 1
    frames = decode_burst_frames(bursts[0])
    assert len(frames) == 1
    assert np.array_equal(frames[0][1:-3], content)
