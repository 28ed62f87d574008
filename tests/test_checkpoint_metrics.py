"""Checkpoint/resume and metrics tests."""
import numpy as np
import pytest

from vdlm2dec_tpu import modulator as mod
from vdlm2dec_tpu.host.checkpoint import load_checkpoint, save_checkpoint
from vdlm2dec_tpu.host.flights import FlightTracker
from vdlm2dec_tpu.metrics import PipelineMetrics
from vdlm2dec_tpu.pipeline import DecodedBurst, Pipeline, PipelineConfig


def test_checkpoint_roundtrip(tmp_path):
    tr = FlightTracker()
    fl = tr.add(0x3C6544, 1000.0)
    fl.reg = "F-HBND"
    fl.fid = "AF1234"
    fl.oooi.da = "LFPG"
    fl.oooi.lat = 48.5
    fl.oooi.epu = 6
    fl.rt = 1
    path = str(tmp_path / "state.ckpt")
    save_checkpoint(path, 123456, tr, extra={"block": 7})

    tr2 = FlightTracker()
    cursor, extra = load_checkpoint(path, tr2)
    assert cursor == 123456
    assert extra == {"block": 7}
    assert len(tr2) == 1
    f2 = tr2.flights()[0]
    assert f2.addr == 0x3C6544
    assert f2.reg == "F-HBND"
    assert f2.oooi.da == "LFPG"
    assert f2.oooi.lat == 48.5
    assert f2.rt == 1


def test_metrics_accumulation():
    m = PipelineMetrics()
    b = DecodedBurst(
        channel=0, t0=0, time_s=0.0, freq_hz=136e6, ppm=0.0,
        length_bits=400, nbrow=2, nlbyte=50,
        block=np.zeros((2, 255), np.uint8), rs_counts=[0, 2],
        frames=[np.zeros(20, np.uint8)],
    )
    b2 = DecodedBurst(
        channel=0, t0=100, time_s=0.0, freq_hz=136e6, ppm=0.0,
        length_bits=400, nbrow=1, nlbyte=50,
        block=np.zeros((1, 255), np.uint8), rs_counts=[-1], frames=[],
    )
    m.observe_bursts([b, b2])
    s = m.snapshot()
    assert s["bursts_attempted"] == 2
    assert s["rs_rows"] == 3
    assert s["rs_corrected_rows"] == 1
    assert s["rs_corrections"] == 2
    assert s["rs_failures"] == 1
    assert s["frames_crc_ok"] == 1


def _burst_sig(rng, starts, total, nbytes=20):
    sig = np.zeros(total, dtype=np.complex128)
    for st in starts:
        c = rng.integers(0, 256, nbytes).astype(np.uint8)
        sig += mod.synthesize_baseband(mod.make_burst([c]), start=st,
                                       total=total)
    return mod.awgn(sig, 15.0, rng)


def test_device_counters_and_overflow(capsys):
    """Dense traffic with tiny max_out: the on-device counters report the
    real trigger count and the overflow counter fires with a warning
    instead of silent frame loss (VERDICT weak #4/#5)."""
    rng = np.random.default_rng(11)
    total = 42000
    starts = [3000 + 6000 * i for i in range(6)]     # 6 bursts, 1 channel
    y = _burst_sig(rng, starts, total)[None, :].astype(np.complex64)

    cfg = PipelineConfig(freqs_hz=[136_975_000.0], fc_hz=136_900_000.0,
                         max_symbols=512, max_candidates=8, max_out=2)
    pipe = Pipeline(cfg)
    pipe.metrics = PipelineMetrics()
    bursts = pipe.decode_channels(y)
    m = pipe.metrics
    assert m.sync_candidates == 6
    assert m.candidates_overflow == 4                # 6 triggers, 2 slots
    assert m.decimated_samples == total
    assert m.device_time_s > 0
    assert len(bursts) == 2                          # the 2 earliest decode
    assert "candidates dropped" in capsys.readouterr().err

    # same traffic with enough slots: everything decodes, no overflow
    cfg2 = PipelineConfig(freqs_hz=[136_975_000.0], fc_hz=136_900_000.0,
                          max_symbols=512, max_candidates=8)
    pipe2 = Pipeline(cfg2)
    pipe2.metrics = PipelineMetrics()
    assert len(pipe2.decode_channels(y)) == 6
    assert pipe2.metrics.candidates_overflow == 0
    assert pipe2.metrics.sync_candidates == 6


def _run_cli(argv, capsys):
    from vdlm2dec_tpu.cli import main

    assert main(argv) == 0
    return capsys.readouterr().out


def test_kill_and_resume_byte_identical(tmp_path, capsys, monkeypatch):
    """Exact resume on the fused u8 fast path (VERDICT weak #6): interrupt
    after 2 of 4 blocks, resume from the checkpoint, and the concatenated
    output is byte-identical to an uninterrupted run."""
    from vdlm2dec_tpu.io.sdr import write_capture

    rng = np.random.default_rng(5)
    fs = 2_000_000
    total_dec = 4 * 42000                            # 4 blocks x 0.5 s
    starts = [5000, 47000, 89000, 131000]            # one burst per block
    bb = _burst_sig(rng, starts, total_dec)
    wide = mod.upsample_to_wideband(bb, fs, 75_000.0, total=4 * fs // 2) * 30
    wide += (rng.normal(size=len(wide)) + 1j * rng.normal(size=len(wide)))
    cap = str(tmp_path / "cap.cu8")
    write_capture(cap, wide, "cu8")

    base = ["136.975", "--iq", cap, "--fc", "136900000", "--max-rows", "2",
            "--block-seconds", "0.5", "--start-time", "1700000000",
            "-U", "-E", "-G"]
    full = _run_cli(base, capsys)
    assert full.count("[#") >= 4                     # one frame per block

    # interrupted run: KeyboardInterrupt before block 2 is processed
    ck = str(tmp_path / "state.ckpt")
    calls = {"n": 0}
    orig = PipelineMetrics.observe_bursts

    def boom(self, bursts):
        if calls["n"] == 2:
            raise KeyboardInterrupt
        calls["n"] += 1
        return orig(self, bursts)

    monkeypatch.setattr(PipelineMetrics, "observe_bursts", boom)
    part1 = _run_cli(base + ["--checkpoint", ck], capsys)
    monkeypatch.setattr(PipelineMetrics, "observe_bursts", orig)

    cursor, extra = load_checkpoint(ck, FlightTracker())
    assert cursor == 2 * 1_000_000                   # block-aligned
    part2 = _run_cli(base + ["--checkpoint", ck], capsys)
    assert part1 + part2 == full
