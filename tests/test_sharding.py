"""Multi-device sharding tests on the virtual 8-CPU mesh.

Seam test: a burst straddling a time-shard boundary must decode exactly as
in the unsharded pipeline (halo-exchange correctness).
"""
import numpy as np

import jax

from vdlm2dec_tpu import modulator as mod
from vdlm2dec_tpu.parallel.sharding import ShardedDecoder, make_mesh
from vdlm2dec_tpu.pipeline import Pipeline, PipelineConfig


def _sig_with_bursts(rng, starts, total, contents):
    sig = np.zeros(total, dtype=np.complex128)
    for st, c in zip(starts, contents):
        plan = mod.make_burst([c])
        sig += mod.synthesize_baseband(plan, start=st, total=total)
    return mod.awgn(sig, 15.0, rng)


def test_sharded_matches_unsharded_with_seam_burst():
    rng = np.random.default_rng(0)
    n_time = 4
    t_total = 4 * 8400               # 4 shards x 8400 samples
    # bursts: one mid-shard-0, one STRADDLING the shard 1/2 boundary at 16800
    contents = [rng.integers(0, 256, 30).astype(np.uint8),
                rng.integers(0, 256, 40).astype(np.uint8)]
    starts = [2000, 16500]
    sig = _sig_with_bursts(rng, starts, t_total, contents)
    y = np.stack([sig, sig])          # 2 channels, same content

    cfg = PipelineConfig(freqs_hz=[136_975_000.0, 136_925_000.0],
                         fc_hz=136_900_000.0, max_symbols=512,
                         max_candidates=4)
    pipe = Pipeline(cfg)
    ref_bursts = pipe.decode_channels(y.astype(np.complex64))
    ref_frames = sorted(
        (b.channel, b.t0, tuple(f.tolist())) for b in ref_bursts for f in b.frames
    )
    assert len(ref_frames) == 4       # 2 bursts x 2 channels

    mesh = make_mesh(2, n_time)
    cfg2 = PipelineConfig(freqs_hz=[136_975_000.0, 136_925_000.0],
                          fc_hz=136_900_000.0, max_symbols=512,
                          max_candidates=4, mesh=mesh)
    pipe2 = Pipeline(cfg2)
    sh_bursts = pipe2.decode_channels(y.astype(np.complex64))
    sh_frames = sorted(
        (b.channel, b.t0, tuple(f.tolist())) for b in sh_bursts for f in b.frames
    )
    assert sh_frames == ref_frames


def test_sharded_time_only_mesh():
    rng = np.random.default_rng(1)
    t_total = 8 * 4200
    content = rng.integers(0, 256, 25).astype(np.uint8)
    sig = _sig_with_bursts(rng, [9000], t_total, [content])
    mesh = make_mesh(1, 8)
    dec = ShardedDecoder(mesh, max_candidates=2, max_symbols=512)
    cands = dec.decode(sig[None, :].astype(np.complex64))
    assert len(cands) >= 1
    # the owning shard is shard 2 (9000+sync in [8400, 12600))
    assert any(8400 <= c["t0"] < 12600 for c in cands)


def test_sharded_wideband_packed_decodes_burst():
    """Full sharded wideband step (channelize + halo + decode + packing)
    recovers a real burst with correct global channel/t0."""
    from vdlm2dec_tpu.parallel.sharding import ShardedWidebandDecoder

    rng = np.random.default_rng(2)
    fs, sdrclk = 2_000_000, 500
    p_in = 4 * sdrclk
    n_time = 4
    per_shard = 25 * p_in                  # 25 periods -> 2100 samples @84k
    t_raw = n_time * per_shard
    offs = (25_000.0, 50_000.0, -25_000.0, -50_000.0)

    content = rng.integers(0, 256, 20).astype(np.uint8)
    plan = mod.make_burst([content])
    bb = mod.synthesize_baseband(plan, start=2500, total=t_raw * 21 // sdrclk)
    wide = mod.upsample_to_wideband(bb, fs, offs[1], total=t_raw)  # channel 1
    wide = mod.awgn(wide * 20.0, 25.0, rng)

    mesh = make_mesh(2, n_time // 2)
    dec = ShardedWidebandDecoder(
        mesh, f_offsets=offs, fs=fs, sdrclk=sdrclk, lo_wrap=True,
        max_candidates=4, max_symbols=512,
    )
    cands = dec.decode(wide.astype(np.complex64))
    assert any(c["chan"] == 1 for c in cands)
    good = [c for c in cands if c["chan"] == 1][0]
    assert abs(good["t0"] - 2636) < 20     # sync trigger near preamble end
