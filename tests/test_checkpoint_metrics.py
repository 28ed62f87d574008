"""Checkpoint/resume and metrics tests."""
import numpy as np

from vdlm2dec_tpu.host.checkpoint import load_checkpoint, save_checkpoint
from vdlm2dec_tpu.host.flights import FlightTracker
from vdlm2dec_tpu.metrics import PipelineMetrics
from vdlm2dec_tpu.pipeline import DecodedBurst


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
