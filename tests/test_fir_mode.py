"""FIR channelizer mode: decode parity + adjacent-channel rejection."""
import numpy as np

from vdlm2dec_tpu import framegen as fg
from vdlm2dec_tpu import modulator as mod
from vdlm2dec_tpu.ops.channelizer import Channelizer, fir_aggregation_matrix
from vdlm2dec_tpu.pipeline import Pipeline, PipelineConfig


def test_fir_matrix_properties():
    a, pad = fir_aggregation_matrix(500, 2_000_000)
    assert a.shape == (2000 + 2 * pad, 84)
    np.testing.assert_allclose(a.sum(axis=0), 1.0, atol=1e-3)  # unity DC gain


def test_fir_mode_decodes():
    rng = np.random.default_rng(0)
    fs, freq, fc = 2_000_000, 136_975_000, 136_900_000
    content = fg.acars_frame(text="FIR MODE", label="Q0")
    plan = mod.make_burst([content])
    bb = mod.synthesize_baseband(plan, start=900, total=42_000)
    wide = mod.upsample_to_wideband(bb, fs, freq - fc, total=1_000_000) * 40
    wide += rng.normal(size=1_000_000) + 1j * rng.normal(size=1_000_000)

    cfg = PipelineConfig(freqs_hz=[float(freq)], fc_hz=float(fc),
                         max_symbols=1024, max_candidates=8)
    pipe = Pipeline(cfg)
    pipe.channelizer = Channelizer(pipe.f_offsets, fs=fs, filter_mode="fir")
    bursts = [b for b in pipe.decode_wideband(wide.astype(np.complex64))
              if b.frames]
    assert len(bursts) == 1


def test_fir_adjacent_channel_rejection():
    """A strong burst 25 kHz away: boxcar leaks it into the victim channel
    (garbage sync triggers); FIR suppresses it."""
    rng = np.random.default_rng(1)
    fs, fc = 2_000_000, 136_900_000
    victim = 136_975_000
    aggressor = 137_000_000
    content = fg.acars_frame(text="LOUD NEIGHBOUR", label="Q0")
    plan = mod.make_burst([content])
    bb = mod.synthesize_baseband(plan, start=900, total=42_000)
    wide = mod.upsample_to_wideband(bb, fs, aggressor - fc, total=1_000_000) * 60
    wide += 0.5 * (rng.normal(size=1_000_000) + 1j * rng.normal(size=1_000_000))
    wide = wide.astype(np.complex64)

    def candidates(filter_mode):
        cfg = PipelineConfig(freqs_hz=[float(victim)], fc_hz=float(fc),
                             max_symbols=512, max_candidates=8)
        pipe = Pipeline(cfg)
        pipe.channelizer = Channelizer(pipe.f_offsets, fs=fs,
                                       filter_mode=filter_mode)
        import jax.numpy as jnp

        return pipe._decode_block(jnp.asarray(pipe.channelizer(wide)))

    box = candidates("boxcar")
    fir = candidates("fir")
    # the boxcar-fed demod sync-triggers on the neighbour's leakage; the
    # FIR path must see fewer (ideally zero) spurious candidates
    assert len(fir) <= len(box)
    assert len(fir) == 0, f"FIR leaked {len(fir)} spurious candidates"
