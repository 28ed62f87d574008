"""bench --latency path: the per-block turnaround harness must keep
working on the production pipelined streaming path (CPU smoke; the real
numbers are TPU-measured, PERF.md)."""
import sys

import bench


def test_run_latency_smoke():
    out = bench.run_latency(0.25, seconds=2.0, channels=2)
    assert "error" not in out
    assert out["blocks"] >= 3
    assert out["p50_ms"] > 0
    assert out["p95_ms"] >= out["p50_ms"]
    assert out["max_ms"] >= out["p95_ms"]
    # percentile helper stays inside bounds on tiny samples
    assert out["max_ms"] < 60_000
    # paced real-time submission + backlog evidence (VERDICT r4: the
    # artifact must show sustained serving, not just turnaround)
    assert out["paced_realtime"] is True
    assert out["max_backlog_blocks"] >= 1
    assert isinstance(out["sustained"], bool)
    assert out["lag_last_quarter_ms"] >= 0.0
    sys.stderr.flush()
