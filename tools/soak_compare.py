#!/usr/bin/env python
"""Recall soak: dense multi-channel traffic through our decoder AND the
compiled reference binary; compares decoded-frame sets.

Measured on a 10 s / 2-channel / 125-burst capture (2026-08, this repo):
  reference: 122/125   ours: 125/125 (strict superset)
  --dft (residue-space channelizer): identical 125/125 superset
The 3 extra frames are bursts arriving shortly after a previous burst ends:
the serial reference re-enters sync search with a stale frozen phase ring
(d8psk.c Ph is not updated during a burst) and misses them; the vectorised
scan uses true phases.
"""
import sys
sys.path.insert(0, ".")
import io
import json
import subprocess

import numpy as np

from vdlm2dec_tpu import modulator as mod, framegen as fg
from vdlm2dec_tpu.host.decoder import FrameDecoder
from vdlm2dec_tpu.host.output import OutputConfig
from vdlm2dec_tpu.io.sdr import write_capture
from vdlm2dec_tpu.pipeline import Pipeline, PipelineConfig

SECONDS = 10
fs, fc = 2_000_000, 136_900_000
freqs = [136_725_000, 136_975_000]
rng = np.random.default_rng(42)

total = fs * SECONDS
total_bb = 84_000 * SECONDS
wide = np.zeros(total, dtype=np.complex128)
n_tx = 0
for ci, f in enumerate(freqs):
    bb = np.zeros(total_bb, dtype=np.complex128)
    pos = 1000 + 7000 * ci
    while pos + 4000 < total_bb:
        txt = f"SOAK {ci} {pos}"
        content = fg.acars_frame(
            text=txt, label="Q0",
            from_addr=fg.AIRCRAFT | (0x100000 + ci * 4096 + (pos & 0xFFF)),
        )
        plan = mod.make_burst([content])
        burst = mod.synthesize_baseband(plan, start=0)
        seg = min(len(burst), total_bb - pos)
        bb[pos : pos + seg] += burst[:seg]
        n_tx += 1
        pos += len(burst) + int(rng.integers(3000, 20000))
    wide += mod.upsample_to_wideband(bb, fs, f - fc, total=total)
wide *= 40.0
wide += rng.normal(size=total) + 1j * rng.normal(size=total)
path = "/tmp/soak.cu8"
write_capture(path, wide, "cu8")
print(f"capture: {SECONDS}s, {n_tx} bursts", flush=True)

# reference
r = subprocess.run(
    ["/root/repo/tests/refshim/ref_shim", path, str(fc)]
    + [f"{f/1e6:.6f}" for f in freqs] + ["-J"],
    capture_output=True, text=True, timeout=600,
)
ref = [json.loads(l) for l in r.stdout.splitlines() if l.strip().startswith("{")]
print(f"reference decoded: {len(ref)}", flush=True)

# ours (u8 fast path; --dft/--pfb: residue-space channelizers;
# --fused: Pallas sync + inline demod; --bf16: reduced-precision matmuls)
impl = "dft" if "--dft" in sys.argv else (
    "pfb" if "--pfb" in sys.argv else "matmul")
cfg = PipelineConfig(freqs_hz=[float(f) for f in freqs], fs=fs, fc_hz=float(fc),
                     max_symbols=1024, max_candidates=32, chan_impl=impl,
                     sync_impl="fused" if "--fused" in sys.argv else "xla",
                     compute="bf16" if "--bf16" in sys.argv else "f32")
pipe = Pipeline(cfg)
buf = io.StringIO()
dec = FrameDecoder(OutputConfig(verbose=0, jsonout=True, logfile=buf))
raw = np.fromfile(path, dtype=np.uint8)
import time
t0 = time.time()
for bursts in pipe.stream_wideband_u8(raw, block_seconds=4.0):
    for b in bursts:
        dec.process_burst(b)
dt = time.time() - t0
ours = [json.loads(l) for l in buf.getvalue().splitlines() if l.strip()]
print(f"ours decoded: {len(ours)} in {dt:.1f}s", flush=True)

def key(o):
    return (o["freq"], o.get("text"), o.get("hex"))

kr = sorted(map(key, ref))
ko = sorted(map(key, ours))
both = len(set(kr) & set(ko))
print(f"tx={n_tx} ref={len(kr)} ours={len(ko)} common={both}", flush=True)
only_ref = set(kr) - set(ko)
only_ours = set(ko) - set(kr)
print("only-ref:", list(only_ref)[:5], flush=True)
print("only-ours:", list(only_ours)[:5], flush=True)
