"""Differential tests vs the ACTUAL reference decoder binary.

The reference sources (/root/reference, unmodified) are compiled with our
file-input shim (tests/refshim/) and fed the same synthesized captures as
our pipeline; the emitted JSON must agree field-for-field (timestamps and
station ids excluded — wall-clock dependent).
"""
import io
import json
import os
import subprocess

import numpy as np
import pytest

from vdlm2dec_tpu import framegen as fg
from vdlm2dec_tpu import modulator as mod
from vdlm2dec_tpu.host.decoder import FrameDecoder
from vdlm2dec_tpu.host.output import OutputConfig
from vdlm2dec_tpu.io.sdr import write_capture
from vdlm2dec_tpu.pipeline import Pipeline, PipelineConfig

SHIM = os.path.join(os.path.dirname(__file__), "refshim", "ref_shim")
BUILD = os.path.join(os.path.dirname(__file__), "refshim", "build.sh")


def _ensure_shim():
    if os.path.exists(SHIM):
        return True
    if not os.path.exists("/root/reference/d8psk.c"):
        return False
    try:
        subprocess.run(["sh", BUILD], check=True, capture_output=True, timeout=120)
    except subprocess.SubprocessError:
        return False
    return os.path.exists(SHIM)


pytestmark = pytest.mark.skipif(not _ensure_shim(), reason="no reference shim")

VOLATILE = {"timestamp", "station_id"}


def run_reference(path, fc, freqs_mhz, flags=("-J",)):
    r = subprocess.run(
        [SHIM, path, str(fc)] + [f"{f:.6f}" for f in freqs_mhz] + list(flags),
        capture_output=True, text=True, timeout=120,
    )
    out = []
    for line in r.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            out.append(json.loads(line))
    return out


def run_ours(wide, fc, freqs_hz, flags=None):
    cfg = PipelineConfig(
        freqs_hz=[float(f) for f in freqs_hz], fs=2_000_000, fc_hz=float(fc),
        max_symbols=1024, max_candidates=8,
    )
    pipe = Pipeline(cfg)
    buf = io.StringIO()
    out_cfg = OutputConfig(verbose=0, jsonout=True, station_id="x",
                           logfile=buf,
                           grndmess="-G" in (flags or ()),
                           emptymess="-E" in (flags or ()),
                           undecmess="-U" in (flags or ()))
    dec = FrameDecoder(out_cfg)
    for bursts in pipe.stream_channels(
        np.asarray(pipe.channelizer(wide.astype(np.complex64)))
    ):
        for b in bursts:
            dec.process_burst(b)
    return [json.loads(l) for l in buf.getvalue().splitlines() if l.strip()]


def _strip(objs):
    return [
        {k: v for k, v in o.items() if k not in VOLATILE} for o in objs
    ]


def _mk_capture(tmp_path, bursts, fs=2_000_000, fc=136_900_000, seconds=1.0,
                seed=0):
    """bursts: list of (freq_hz, start_84k, frame_content)."""
    rng = np.random.default_rng(seed)
    total_bb = int(84_000 * seconds)
    total = int(fs * seconds)
    wide = np.zeros(total, dtype=np.complex128)
    for freq, start, content in bursts:
        plan = mod.make_burst([content])
        bb = mod.synthesize_baseband(plan, start=start, total=total_bb)
        wide += mod.upsample_to_wideband(bb, fs, freq - fc, total=total)
    wide *= 40.0
    wide += (rng.normal(size=total) + 1j * rng.normal(size=total)) * 1.0
    path = str(tmp_path / "cap.cu8")
    write_capture(path, wide, "cu8")
    return path, wide


def test_acars_json_identical(tmp_path):
    fc = 136_900_000
    freq = 136_975_000
    content = fg.acars_frame(text="DIFF TEST 1", label="Q0", reg=".FHBND")
    path, wide = _mk_capture(tmp_path, [(freq, 900, content)])
    ref = run_reference(path, fc, [freq / 1e6])
    ours = run_ours(wide, fc, [freq])
    assert len(ref) == 1, f"reference decoded {len(ref)}"
    assert _strip(ours) == _strip(ref)


def test_multi_channel_multi_burst_identical(tmp_path):
    fc = 136_900_000
    freqs = [136_975_000, 136_725_000, 137_000_000]
    rng = np.random.default_rng(7)
    bursts = []
    texts = ["ALPHA", "BRAVO POS N48123W002345", "CHARLIE"]
    labels = ["Q0", "H1", "16"]
    # stagger bursts by >0.35 s: adjacent-channel leakage through the boxcar
    # decimator can fire a garbage sync whose (chaotic) header length decodes
    # differently in f32 vs the reference's doubles, occupying the channel
    # for a data-dependent span — both decoders behave this way, but the
    # exact span differs on garbage, so keep real bursts clear of it
    for i, (f, txt, lbl) in enumerate(zip(freqs, texts, labels)):
        content = fg.acars_frame(
            text=txt, label=lbl,
            from_addr=fg.AIRCRAFT | (0x3C0000 + i),
        )
        bursts.append((f, 700 + 30_000 * i, content))
    path, wide = _mk_capture(tmp_path, bursts, seconds=1.0)
    ref = run_reference(path, fc, [f / 1e6 for f in freqs])
    ours = run_ours(wide, fc, freqs)
    ref_s = sorted(_strip(ref), key=lambda o: o["freq"])
    ours_s = sorted(_strip(ours), key=lambda o: o["freq"])
    assert len(ref_s) == 3
    assert ours_s == ref_s


def test_xid_json_identical(tmp_path):
    fc = 136_900_000
    freq = 136_975_000
    content = fg.xid_frame()
    path, wide = _mk_capture(tmp_path, [(freq, 900, content)])
    ref = run_reference(path, fc, [freq / 1e6])
    ours = run_ours(wide, fc, [freq])
    assert len(ref) == 1
    assert _strip(ours) == _strip(ref)


def test_oooi_label_fields_identical(tmp_path):
    fc = 136_900_000
    freq = 136_975_000
    content = fg.acars_frame(
        text="LFPGKJFKA1B2C3D4E5F6G7H8KJFK", label="Q1", reg=".FHBND"
    )
    path, wide = _mk_capture(tmp_path, [(freq, 900, content)])
    ref = run_reference(path, fc, [freq / 1e6])
    ours = run_ours(wide, fc, [freq])
    assert len(ref) == 1
    assert _strip(ours) == _strip(ref)


# ---------------------------------------------------------------------------
# text-mode output parity
# ---------------------------------------------------------------------------

def _run_reference_text(path, fc, freqs_mhz, flags=()):
    r = subprocess.run(
        [SHIM, path, str(fc)] + [f"{f:.6f}" for f in freqs_mhz] + list(flags),
        capture_output=True, text=True, timeout=120,
    )
    return r.stdout


def _run_ours_text(wide, fc, freqs_hz, flags=()):
    cfg = PipelineConfig(
        freqs_hz=[float(f) for f in freqs_hz], fs=2_000_000, fc_hz=float(fc),
        max_symbols=1024, max_candidates=8,
    )
    pipe = Pipeline(cfg)
    buf = io.StringIO()
    out_cfg = OutputConfig(verbose=2 if "-v" in flags else 1, logfile=buf,
                           grndmess="-G" in flags, emptymess="-E" in flags,
                           undecmess="-U" in flags)
    dec = FrameDecoder(out_cfg)
    for bursts in pipe.stream_channels(
        np.asarray(pipe.channelizer(wide.astype(np.complex64)))
    ):
        for b in bursts:
            dec.process_burst(b)
    return buf.getvalue()


def _strip_dates(text):
    """Blank the wall-clock date field of burst header lines."""
    import re

    return re.sub(
        r"\d\d/\d\d/\d{4} \d\d:\d\d:\d\d\.\d{3}", "<TS>", text
    )


def test_text_output_identical(tmp_path):
    fc = 136_900_000
    freq = 136_975_000
    content = fg.acars_frame(text="TEXT DIFF", label="Q0", reg=".FHBND")
    path, wide = _mk_capture(tmp_path, [(freq, 900, content)])
    ref = _strip_dates(_run_reference_text(path, fc, [freq / 1e6]))
    ours = _strip_dates(_run_ours_text(wide, fc, [freq]))
    assert ours == ref


def test_text_output_xid_identical(tmp_path):
    fc = 136_900_000
    freq = 136_975_000
    content = fg.xid_frame()
    path, wide = _mk_capture(tmp_path, [(freq, 900, content)])
    ref = _strip_dates(_run_reference_text(path, fc, [freq / 1e6]))
    ours = _strip_dates(_run_ours_text(wide, fc, [freq]))
    assert ours == ref


def test_undecoded_json_identical(tmp_path):
    """-U: unknown payloads -> hex 'data' field (overlapping-sprintf quirk:
    contiguous hex without separators)."""
    fc = 136_900_000
    freq = 136_975_000
    hdr = fg.avlc_header(fg.AIRCRAFT | 0x3C6544, fg.GROUND_A | 0x2)
    payload = np.array([0x55, 0x66, 0x77, 0x88, 0x01], dtype=np.uint8)
    content = np.concatenate([hdr, payload])
    path, wide = _mk_capture(tmp_path, [(freq, 900, content)])
    ref = run_reference(path, fc, [freq / 1e6], flags=("-J", "-U"))
    ours = run_ours(wide, fc, [freq], flags=("-U",))
    assert len(ref) == 1
    assert "data" in ref[0]
    assert _strip(ours) == _strip(ref)
