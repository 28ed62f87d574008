"""Measured multi-host scaling over the real DCN path.

Runs the multihost worker (parallel/multihost.py: jax.distributed + Gloo
collectives between real processes) over a FIXED capture at 1..N
processes, each pinned to its own disjoint CPU core set via taskset so
that P processes honestly emulate P single-host machines.  Window 0 of
each run carries the compile and is excluded; throughput is global
capture samples per post-warmup wall second, taken from process 0 (the
shard_map step is a collective, so all processes advance in lockstep).

Every run also cross-checks correctness: the union of FRAME lines must
be identical across all process counts.

Writes a JSON artifact (default SCALING_MEASURED.json) with per-P
throughput and parallel efficiency vs P=1:
    eff(P) = throughput(P) / (P * throughput(1))

This machine has very few cores, so the curve stops at
cores-available; the point of the artifact is a MEASURED efficiency on
the genuine DCN code path, not a big-iron number (SCALING.md carries
the cost model for real pods).

Usage: python tools/scaling_bench.py [--seconds 8] [--out FILE]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synth_capture(path: str, fs: int, channels: int, seconds: float):
    """Fixed stimulus via the bench generator; returns truth list."""
    import bench as bench_mod

    wide, freqs, fc, truth = bench_mod.make_capture(
        fs, channels, seconds)
    bench_mod.to_u8(wide).tofile(path)
    return freqs, fc, truth


def run_p(processes: int, capture: str, freqs_mhz: list[float], fc: int,
          block_seconds: float, cores: int, devices_per_proc: int,
          timeout: float) -> dict:
    from vdlm2dec_tpu.parallel.multihost import launch_local

    per = max(1, cores // processes)
    cpu_sets = [
        ",".join(str(c) for c in range(p * per, (p + 1) * per))
        for p in range(processes)
    ]
    worker_args = [
        "--iq", capture, "--fc", str(fc),
        "--block-seconds", str(block_seconds),
        "--max-symbols", "512", "--timing",
        # capacity sized for the dense stimulus (~76 bursts per 1 s
        # window; the worker defaults overflow and drop bursts, and the
        # loss would differ by P because packed slots are per process)
        "--max-candidates", "32", "--max-out", "256",
    ] + [str(f) for f in freqs_mhz]
    t0 = time.monotonic()
    outs = launch_local(processes, worker_args,
                        local_devices=devices_per_proc, timeout=timeout,
                        cpu_sets=cpu_sets)
    wall = time.monotonic() - t0
    frames = set()
    stats = None
    for out in outs:
        for line in out.splitlines():
            if line.startswith("FRAME "):
                frames.add(line)
            elif line.startswith("STATS ") and stats is None:
                stats = json.loads(line[6:])
    if stats is None:
        raise RuntimeError("no STATS line (need >=2 windows for timing)")
    samples = stats["timed_windows"] * stats["global_samples_per_window"]
    msps = samples / stats["timed_s"] / 1e6
    return {
        "processes": processes,
        "cores_per_process": per,
        "devices_per_process": devices_per_proc,
        "timed_windows": stats["timed_windows"],
        "timed_s": round(stats["timed_s"], 3),
        "msps": round(msps, 3),
        "total_wall_s": round(wall, 1),
        "phase_s": stats.get("phase_s", {}),
        "frames": sorted(frames),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=8.0)
    ap.add_argument("--channels", type=int, default=8)
    ap.add_argument("--fs", type=int, default=2_000_000)
    ap.add_argument("--block-seconds", type=float, default=1.0)
    ap.add_argument("--processes", default=None,
                    help="comma list (default: 1,2,..,cores)")
    ap.add_argument("--devices-per-proc", type=int, default=2)
    ap.add_argument("--timeout", type=float, default=900.0)
    ap.add_argument("--repeats", type=int, default=3,
                    help="runs per process count; best throughput kept "
                         "(2-core box timing noise is +-20%%)")
    ap.add_argument("--out", default="SCALING_MEASURED.json")
    args = ap.parse_args()

    cores = len(os.sched_getaffinity(0))
    if args.processes:
        plist = [int(x) for x in args.processes.split(",")]
    else:
        plist = [p for p in (1, 2, 4, 8) if p <= cores]
    capture = os.path.join("/tmp", f"scaling_{args.fs}_{args.channels}_"
                                   f"{args.seconds}.cu8")
    freqs, fc, truth = synth_capture(capture, args.fs, args.channels,
                                     args.seconds)
    freqs_mhz = [f / 1e6 for f in freqs]
    print(f"# capture: {args.seconds}s x {args.channels}ch, "
          f"{len(truth)} bursts; cores={cores}, P={plist}",
          file=sys.stderr)

    runs = []
    for p in plist:
        best = None
        for rep in range(args.repeats):
            r = run_p(p, capture, freqs_mhz, fc, args.block_seconds, cores,
                      args.devices_per_proc, args.timeout)
            print(f"# P={p} rep{rep}: {r['msps']} Msps over"
                  f" {r['timed_windows']} windows"
                  f" ({r['cores_per_process']} cores/proc,"
                  f" {len(r['frames'])} frames)", file=sys.stderr)
            if best is None or r["msps"] > best["msps"]:
                best = r
        runs.append(best)

    # correctness: identical frame sets at every process count
    frame_sets = [set(r["frames"]) for r in runs]
    identical = all(fs_ == frame_sets[0] for fs_ in frame_sets)
    base = runs[0]["msps"] / (runs[0]["processes"]
                              * runs[0]["cores_per_process"])
    for r in runs:
        # efficiency per core-normalised ideal: P procs x per-proc cores
        ideal = base * r["processes"] * r["cores_per_process"]
        r["efficiency_vs_1proc"] = round(r["msps"] / ideal, 3)
        del r["frames"]

    out = {
        "capture_seconds": args.seconds,
        "channels": args.channels,
        "bursts": len(truth),
        "cores_available": cores,
        "frames_identical_across_P": identical,
        "runs": runs,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    return 0 if identical else 1


if __name__ == "__main__":
    sys.exit(main())
