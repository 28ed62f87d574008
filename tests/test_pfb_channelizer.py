"""Factorized-DFT filterbank channelizer (chan_impl=pfb) vs dft/matmul.

Same boxcar window + wrapped LO products as the residue-space dft impl,
regrouped Cooley-Tukey: outputs agree to float tolerance and frames are
identical end to end, incl. the fused u8 ingest path.
"""
import numpy as np
import pytest

import bench as B
from vdlm2dec_tpu.ops.channelizer import Channelizer, pfb_tables
from vdlm2dec_tpu.pipeline import Pipeline, PipelineConfig


def test_pfb_tables_factorization():
    a, b, dfa, tw, dfb, bins = pfb_tables((25_000.0, -75_000.0),
                                          2_000_000, 500)
    assert a * b == 80 and abs(a - b) <= a
    assert bins.shape == (2, 2)
    k = bins[:, 0] + a * bins[:, 1]
    assert list(k) == [1, 77]                 # -3 mod 80


def test_pfb_matches_dft_samples():
    rng = np.random.default_rng(11)
    x = (rng.normal(size=80_000) + 1j * rng.normal(size=80_000)).astype(
        np.complex64)
    offs = [0.0, 25_000.0, -50_000.0, 350_000.0]
    y = {}
    for impl in ("dft", "pfb"):
        ch = Channelizer(offs, fs=2_000_000, impl=impl)
        y[impl] = np.asarray(ch(x))
    scale = np.abs(y["dft"]).max()
    np.testing.assert_allclose(y["pfb"], y["dft"], atol=2e-5 * scale)


def test_pfb_frame_parity_fused():
    wide, freqs, fc, truth = B.make_capture(2_000_000, 8, 2.0)
    raw = B.to_u8(wide)
    got = {}
    for impl in ("dft", "pfb"):
        cfg = PipelineConfig(
            freqs_hz=[float(f) for f in freqs], fs=2_000_000,
            fc_hz=float(fc), lo_wrap=True, chan_impl=impl,
            max_candidates=64, max_symbols=512, max_out=512,
        )
        pipe = Pipeline(cfg)
        cands = pipe.decode_wideband_u8(raw)
        bursts = pipe._finish(cands, 0)
        got[impl] = sorted(
            (b.channel, bytes(bytearray(f[1:-3])))
            for b in bursts for f in b.frames
        )
    assert got["dft"] == sorted((c, b) for c, b, *_ in truth)
    assert got["pfb"] == got["dft"]


def test_pfb_rejects_off_raster():
    with pytest.raises(AssertionError):
        Channelizer([12_345.0], fs=2_000_000, impl="pfb")
