"""bench.py is a graded per-round artifact — a crash there loses the
round's BENCH record. Smoke: it runs end-to-end at the smallest SF and
prints exactly one well-formed JSON line."""

from __future__ import annotations

import json
import os
import subprocess
import sys


def test_bench_emits_one_json_line():
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_BENCH_RUNS="1",
    )
    proc = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [l for l in proc.stdout.splitlines() if l.strip().startswith("{")]
    assert len(lines) == 1, proc.stdout[-2000:]
    payload = json.loads(lines[0])
    assert payload["metric"] == "headline_queries_total_sec"
    assert payload["unit"] == "sec"
    assert payload["value"] > 0
    assert len(payload["queries"]) >= 10
