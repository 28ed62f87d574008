"""Streaming pipeline + CLI end-to-end tests."""
import io
import json
import sys

import numpy as np
import pytest

from vdlm2dec_tpu import framegen as fg
from vdlm2dec_tpu import modulator as mod
from vdlm2dec_tpu.golden.codec import frame_fcs
from vdlm2dec_tpu.io.sdr import read_capture, write_capture
from vdlm2dec_tpu.pipeline import Pipeline, PipelineConfig


def test_stream_matches_single_shot():
    """Block streaming with cross-block bursts == one-shot decode."""
    rng = np.random.default_rng(0)
    total = 6 * 8400
    sig = np.zeros(total, dtype=np.complex128)
    contents = []
    for st in (2000, 8300 * 2, 8400 * 4 + 100):    # one near a block seam
        c = rng.integers(0, 256, 30).astype(np.uint8)
        contents.append(c)
        plan = mod.make_burst([c])
        sig += mod.synthesize_baseband(plan, start=st, total=total)
    sig = mod.awgn(sig, 15.0, rng)

    cfg = PipelineConfig(freqs_hz=[136_975_000.0], fc_hz=136_900_000.0,
                         max_symbols=512, max_candidates=8)
    pipe = Pipeline(cfg)
    one = pipe.decode_channels(sig[None, :].astype(np.complex64))
    one_frames = sorted(tuple(f.tolist()) for b in one for f in b.frames)
    assert len(one_frames) == 3

    pipe2 = Pipeline(cfg)
    stream_frames = []
    for bursts in pipe2.stream_channels(
        sig[None, :].astype(np.complex64), core_len=8400
    ):
        stream_frames.extend(tuple(f.tolist()) for b in bursts for f in b.frames)
    assert sorted(stream_frames) == one_frames


def test_capture_io_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    x = (rng.normal(size=1000) + 1j * rng.normal(size=1000)).astype(np.complex64) * 20
    p = tmp_path / "cap.cu8"
    write_capture(str(p), x, "cu8")
    back = read_capture(str(p), "cu8")
    assert len(back) == 1000
    # cu8 quantisation: ~1 LSB accuracy
    np.testing.assert_allclose(back.real, np.clip(np.round(x.real + 127.37) - 127.37, -127.37, 127.63), atol=0.51)

    p2 = tmp_path / "cap.cf32"
    write_capture(str(p2), x, "cf32")
    np.testing.assert_allclose(read_capture(str(p2), "cf32"), x, atol=1e-6)


def test_cli_end_to_end(tmp_path, capsys):
    """Full CLI run on a synthesized cu8 capture: JSON output."""
    from vdlm2dec_tpu.cli import main

    rng = np.random.default_rng(2)
    fs = 2_000_000
    freq = 136_975_000
    fc = 136_900_000
    content = fg.acars_frame(text="CLI TEST", label="Q0", reg=".FHBND")
    plan = mod.make_burst([content])
    bb = mod.synthesize_baseband(plan, start=800, total=3 * 8400)
    wide = mod.upsample_to_wideband(bb, fs, freq - fc) * 40.0
    wide += (rng.normal(size=len(wide)) + 1j * rng.normal(size=len(wide))) * 1.0
    cap = tmp_path / "test.cu8"
    write_capture(str(cap), wide, "cu8")

    log = tmp_path / "out.log"
    rc = main([
        "136.975", "--iq", str(cap), "--format", "cu8",
        "--fc", str(fc), "--max-rows", "2",
        "-J", "-i", "TESTSTN", "-l", str(log),
        "--start-time", "1700000000",
    ])
    assert rc == 0
    lines = [l for l in log.read_text().splitlines() if l.strip()]
    assert len(lines) == 1
    obj = json.loads(lines[0])
    assert obj["text"] == "CLI TEST"
    assert obj["station_id"] == "TESTSTN"
    assert obj["freq"] == 136.975
    assert obj["hex"] == "3C6544"


def test_live_pipe_stdin(tmp_path):
    """CLI reading from a pipe (subprocess stdin) decodes like file input."""
    import subprocess
    import sys as _sys

    rng = np.random.default_rng(3)
    fs, freq, fc = 2_000_000, 136_975_000, 136_900_000
    content = fg.acars_frame(text="LIVE PIPE", label="Q0")
    plan = mod.make_burst([content])
    bb = mod.synthesize_baseband(plan, start=2500, total=3 * 8400)
    wide = mod.upsample_to_wideband(bb, fs, freq - fc) * 40.0
    wide += (rng.normal(size=len(wide)) + 1j * rng.normal(size=len(wide)))
    cap = tmp_path / "live.cu8"
    write_capture(str(cap), wide, "cu8")
    log = tmp_path / "live.log"

    import os as _os

    env = dict(_os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    repo_root = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo_root + _os.pathsep + env.get("PYTHONPATH", "")
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        "import sys; from vdlm2dec_tpu.cli import main;"
        f"sys.exit(main(['136.975','--iq','-','--format','cu8',"
        f"'--fc','{fc}','--max-rows','2','--block-seconds','0.2',"
        f"'-J','-l',r'{log}']))"
    )
    with open(cap, "rb") as fh:
        r = subprocess.run(
            [_sys.executable, "-c", code], stdin=fh, env=env,
            capture_output=True, timeout=240, cwd=str(tmp_path.parent),
        )
    assert r.returncode == 0, r.stderr.decode()[-500:]
    lines = [l for l in log.read_text().splitlines() if l.strip()]
    assert len(lines) == 1
    assert json.loads(lines[0])["text"] == "LIVE PIPE"


def test_stream_wideband_u8_matches_f32_stream():
    """The fused u8 streaming path (overlap + pipelining) decodes the same
    frames as the f32 streaming path, including a block-seam burst."""
    from vdlm2dec_tpu.io.sdr import RTL_DC_OFFSET

    rng = np.random.default_rng(7)
    fs, fc = 2_000_000, 136_900_000
    freq = 136_975_000
    total = 3 * fs // 2                    # 1.5 s
    wide = np.zeros(total, dtype=np.complex128)
    contents = []
    # block_seconds=0.5 -> core boundaries every 42000 decimated samples;
    # burst 2 straddles the first boundary
    for st in (2000, 41_500, 100_000):
        c = fg.acars_frame(text=f"U8S{st}", label="Q0")
        contents.append(c)
        plan = mod.make_burst([c])
        bb = mod.synthesize_baseband(plan, start=st, total=126_000)
        wide += mod.upsample_to_wideband(bb, fs, freq - fc, total=total)
    wide = wide * 40 + (rng.normal(size=total) + 1j * rng.normal(size=total))
    wide = wide.astype(np.complex64)

    cfg = PipelineConfig(freqs_hz=[float(freq)], fs=fs, fc_hz=float(fc),
                         max_symbols=512, max_candidates=8)
    pipe = Pipeline(cfg)
    ref_frames = sorted(
        (b.t0, tuple(f.tolist()))
        for bursts in pipe.stream_wideband(wide, block_seconds=0.5)
        for b in bursts for f in b.frames
    )
    assert len(ref_frames) == 3

    inter = np.empty(2 * total, dtype=np.float32)
    inter[0::2] = wide.real + RTL_DC_OFFSET
    inter[1::2] = wide.imag + RTL_DC_OFFSET
    raw = np.clip(np.round(inter), 0, 255).astype(np.uint8)

    pipe2 = Pipeline(cfg)
    u8_frames = sorted(
        (b.t0, tuple(f.tolist()))
        for bursts in pipe2.stream_wideband_u8(raw, block_seconds=0.5)
        for b in bursts for f in b.frames
    )
    # cu8 quantisation of the f32 stimulus can flip borderline soft bits,
    # so compare frame CONTENT (both decoders see the same u8 bytes only in
    # the u8 path); require the same 3 payloads at matching trigger times
    assert len(u8_frames) == 3
    for (t_ref, f_ref), (t_u8, f_u8) in zip(ref_frames, u8_frames):
        assert abs(t_ref - t_u8) <= 2
        assert f_ref == f_u8


@pytest.mark.parametrize("fmt", ["cs16", "cf32"])
def test_cli_other_formats(tmp_path, fmt):
    """cs16/cf32 capture formats through the CLI."""
    from vdlm2dec_tpu.cli import main

    rng = np.random.default_rng(4)
    fs, freq, fc = 2_000_000, 136_975_000, 136_900_000
    content = fg.acars_frame(text=f"FMT {fmt}", label="Q0")
    plan = mod.make_burst([content])
    bb = mod.synthesize_baseband(plan, start=900, total=2 * 8400)
    wide = mod.upsample_to_wideband(bb, fs, freq - fc) * (500 if fmt == "cs16" else 0.5)
    wide += (rng.normal(size=len(wide)) + 1j * rng.normal(size=len(wide))) * (
        12 if fmt == "cs16" else 0.012
    )
    cap = tmp_path / f"cap.{fmt}"
    if fmt == "cs16":
        inter = np.empty(2 * len(wide), np.int16)
        inter[0::2] = np.clip(np.round(wide.real), -32768, 32767)
        inter[1::2] = np.clip(np.round(wide.imag), -32768, 32767)
        inter.tofile(str(cap))
    else:
        write_capture(str(cap), wide.astype(np.complex64), "cf32")
    log = tmp_path / "out.log"
    rc = main(["136.975", "--iq", str(cap), "--format", fmt,
               "--fc", str(fc), "--max-rows", "2", "-J", "-l", str(log)])
    assert rc == 0
    lines = [l for l in log.read_text().splitlines() if l.strip()]
    assert len(lines) == 1
    assert json.loads(lines[0])["text"] == f"FMT {fmt}"


def test_cli_mesh_flag(tmp_path):
    """--mesh CxT routes decode through the sharded path."""
    from vdlm2dec_tpu.cli import main

    rng = np.random.default_rng(5)
    fs, freq, fc = 2_000_000, 136_975_000, 136_900_000
    content = fg.acars_frame(text="MESH RUN", label="Q0")
    plan = mod.make_burst([content])
    bb = mod.synthesize_baseband(plan, start=2000, total=4 * 8400)
    wide = mod.upsample_to_wideband(bb, fs, freq - fc) * 40.0
    wide += rng.normal(size=len(wide)) + 1j * rng.normal(size=len(wide))
    cap = tmp_path / "mesh.cu8"
    write_capture(str(cap), wide, "cu8")
    log = tmp_path / "mesh.log"
    rc = main(["136.975", "--iq", str(cap), "--fc", str(fc),
               "--max-rows", "2", "--mesh", "1x4", "-J", "-l", str(log)])
    assert rc == 0
    lines = [l for l in log.read_text().splitlines() if l.strip()]
    assert len(lines) == 1
    assert json.loads(lines[0])["text"] == "MESH RUN"


@pytest.mark.parametrize("fmt", ["cs16", "cf32", "f32real"])
def test_fused_native_ingest_matches_complex_path(fmt):
    """The fused device-ingest program for cs16/cf32/f32real produces the
    same frames as host-side conversion + the complex decode path."""
    rng = np.random.default_rng(9)
    fs, freq = 2_000_000, 136_975_000
    fc = 136_900_000
    total = 400_000                                  # period-aligned (p_in=2000)
    contents = [rng.integers(0, 256, 25).astype(np.uint8) for _ in range(2)]
    bb = np.zeros(total * 84 // 2000, dtype=np.complex128)
    for st, c in zip((1200, 9000), contents):
        bb += mod.synthesize_baseband(mod.make_burst([c]), start=st,
                                      total=len(bb))
    f0 = fc + fs // 4 if fmt == "f32real" else fc
    wide = mod.upsample_to_wideband(bb, fs, freq - f0, total=total) * 300
    wide += (rng.normal(size=total) + 1j * rng.normal(size=total)) * 8
    if fmt == "f32real":
        raw = (2 * wide.real).astype(np.float32)     # real capture
    elif fmt == "cs16":
        raw = np.empty(2 * total, np.int16)
        raw[0::2] = np.clip(np.round(wide.real), -32768, 32767)
        raw[1::2] = np.clip(np.round(wide.imag), -32768, 32767)
    else:
        raw = np.empty(2 * total, np.float32)
        raw[0::2] = wide.real
        raw[1::2] = wide.imag

    cfg = PipelineConfig(freqs_hz=[float(freq)], fs=fs, fc_hz=float(fc),
                         real_input=(fmt == "f32real"),
                         max_symbols=512, max_candidates=8)
    pipe = Pipeline(cfg)
    fused = sorted(
        (b.t0, tuple(f.tolist()))
        for bursts in pipe.stream_wideband_u8(raw, block_seconds=0.1,
                                              fmt=fmt)
        for b in bursts for f in b.frames
    )
    assert len(fused) == 2

    # reference path: host conversion -> complex blockwise stream
    if fmt == "f32real":
        x = (2 * wide.real).astype(np.float32)
    elif fmt == "cs16":
        x = (raw[0::2].astype(np.float32)
             + 1j * raw[1::2].astype(np.float32)).astype(np.complex64)
    else:
        x = wide.astype(np.complex64)
    pipe2 = Pipeline(cfg)
    ref = sorted(
        (b.t0, tuple(f.tolist()))
        for bursts in pipe2.stream_wideband(x, block_seconds=0.1)
        for b in bursts for f in b.frames
    )
    assert fused == ref


def test_stream_live_fused_cs16_matches_file():
    """Live pipe decode (fused ingest) of a cs16 stream == file decode."""
    import io as _io

    rng = np.random.default_rng(12)
    fs, freq, fc = 2_000_000, 136_975_000, 136_900_000
    total = 500_000
    bb = np.zeros(total * 84 // 2000, dtype=np.complex128)
    for st, nb in ((1500, 20), (12000, 35)):
        c = rng.integers(0, 256, nb).astype(np.uint8)
        bb += mod.synthesize_baseband(mod.make_burst([c]), start=st,
                                      total=len(bb))
    wide = mod.upsample_to_wideband(bb, fs, freq - fc, total=total) * 300
    wide += (rng.normal(size=total) + 1j * rng.normal(size=total)) * 8
    raw = np.empty(2 * total, np.int16)
    raw[0::2] = np.clip(np.round(wide.real), -32768, 32767)
    raw[1::2] = np.clip(np.round(wide.imag), -32768, 32767)

    cfg = PipelineConfig(freqs_hz=[float(freq)], fs=fs, fc_hz=float(fc),
                         max_symbols=512, max_candidates=8)
    live = sorted(
        (b.t0, tuple(f.tolist()))
        for bursts in Pipeline(cfg).stream_live(
            _io.BytesIO(raw.tobytes()), fmt="cs16", block_seconds=0.1)
        for b in bursts for f in b.frames
    )
    filed = sorted(
        (b.t0, tuple(f.tolist()))
        for bursts in Pipeline(cfg).stream_wideband_u8(
            raw, block_seconds=0.1, fmt="cs16")
        for b in bursts for f in b.frames
    )
    assert len(live) == 2
    assert live == filed


def test_sigterm_drains_and_exits(tmp_path):
    """SIGTERM mid-stream drains and exits cleanly (sighandler ->
    stopVdlm2 semantics, main.c:106-110,215-220)."""
    import os as _os
    import signal as _signal
    import subprocess
    import sys as _sys
    import time as _time

    rng = np.random.default_rng(6)
    fs, freq, fc = 2_000_000, 136_975_000, 136_900_000
    content = fg.acars_frame(text="TERM TEST", label="Q0")
    bb = mod.synthesize_baseband(mod.make_burst([content]), start=2500,
                                 total=3 * 8400)
    wide = mod.upsample_to_wideband(bb, fs, freq - fc) * 40.0
    wide += (rng.normal(size=len(wide)) + 1j * rng.normal(size=len(wide)))
    cap = tmp_path / "term.cu8"
    write_capture(str(cap), wide, "cu8")
    log = tmp_path / "term.log"

    env = dict(_os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    repo_root = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo_root + _os.pathsep + env.get("PYTHONPATH", "")
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        "import sys; from vdlm2dec_tpu.cli import main;"
        f"sys.exit(main(['136.975','--iq','-','--format','cu8',"
        f"'--fc','{fc}','--max-rows','2','--block-seconds','0.2',"
        f"'-J','-l',r'{log}']))"
    )
    # keep stdin open after the capture so the decoder blocks on read;
    # then SIGTERM must drain what was decoded and exit 0
    proc = subprocess.Popen([_sys.executable, "-c", code],
                            stdin=subprocess.PIPE, env=env,
                            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                            cwd=str(tmp_path.parent))
    # pad a second of idle samples after the burst so block 0 gains its
    # right margin and decodes while stdin stays open
    proc.stdin.write(cap.read_bytes() + b"\x7f" * (2 * fs))
    proc.stdin.flush()
    deadline = _time.time() + 120
    while _time.time() < deadline:        # wait for the frame to be logged
        if log.exists() and log.read_text().strip():
            break
        _time.sleep(0.5)
    proc.send_signal(_signal.SIGTERM)
    try:
        rc = proc.wait(timeout=60)
    finally:
        proc.kill()
    assert rc == 0
    lines = [l for l in log.read_text().splitlines() if l.strip()]
    assert len(lines) == 1
    assert json.loads(lines[0])["text"] == "TERM TEST"


def test_cli_sdr_flags(tmp_path, capsys):
    """-g/-r/-k parse and run the differential-tested selection logic
    (main.c:142-158); without hardware the effect is validation + the
    reference's verbose prints."""
    from vdlm2dec_tpu.cli import build_parser, main
    from vdlm2dec_tpu.io.sdr import R820T_GAINS, nearest_gain

    # usage text parity: flags exist with the reference's meanings
    args = build_parser().parse_args(
        ["136.975", "--iq", "x", "-g", "90", "-r", "00000002",
         "-k", "0xA74068C82F2E3793", "--devices", "a,b"])
    assert args.gain == 90 and args.rtldevice == "00000002"

    # gain snap semantics (rtl.c:162-184): 90 tenths -> nearest supported
    assert nearest_gain(90, list(R820T_GAINS)) == 87

    # -r with no match exits 1 like verbose_device_search (rtl.c:118-120)
    rc = main(["136.975", "--iq", "/nonexistent", "-r", "zzz",
               "--devices", "serial1,serial2"])
    assert rc == 1
    assert "No matching device" in capsys.readouterr().err

    # invalid -k hex exits 1
    rc = main(["136.975", "--iq", "/nonexistent", "-k", "notahex"])
    assert rc == 1
