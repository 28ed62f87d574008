"""tools/scan.py: all-channels-at-once frequency scan (the reference
scan.sh's 4-at-a-time live retune, superseded by one batched decode)."""
import subprocess
import sys

import numpy as np

from vdlm2dec_tpu import framegen as fg
from vdlm2dec_tpu import modulator as mod
from vdlm2dec_tpu.io.sdr import write_capture


def test_scan_finds_active_channels(tmp_path):
    import os

    rng = np.random.default_rng(5)
    fs, fc = 2_000_000, 136_900_000
    active = {136_975_000: 3, 136_650_000: 1}
    total = fs
    wide = np.zeros(total, dtype=np.complex128)
    for freq, n in active.items():
        bb = np.zeros(84_000, dtype=np.complex128)
        for k in range(n):
            c = fg.acars_frame(text=f"SCAN{k}", label="Q0")
            bb += mod.synthesize_baseband(mod.make_burst([c]),
                                          start=1500 + 9000 * k,
                                          total=84_000)
        wide += mod.upsample_to_wideband(bb, fs, freq - fc, total=total)
    wide = wide * 40 + (rng.normal(size=total) + 1j * rng.normal(size=total))
    cap = tmp_path / "scan.cu8"
    write_capture(str(cap), wide, "cu8")

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, "tools/scan.py", "--iq", str(cap),
         "--fc", str(fc), "--max-rows", "2"],
        capture_output=True, text=True, timeout=600, cwd=repo, env=env,
    )
    assert r.returncode == 0, r.stderr[-800:]
    lines = dict()
    for line in r.stdout.splitlines():
        if "MHz:" in line:
            mhz, frames = line.split(" MHz: ")
            lines[float(mhz)] = int(frames.split()[0])
    assert lines.get(136.975) == 3
    assert lines.get(136.650) == 1
    # no spurious channels reported
    assert set(lines) == {136.975, 136.650}
    # scanned the whole usable span
    assert "scanning 7" in r.stderr or "channels" in r.stderr
