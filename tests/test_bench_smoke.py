"""bench.py is a graded per-round artifact — a crash there loses the
round's BENCH record. Smoke: it runs end-to-end at the smallest SF and
prints the two-line emission the driver's tail capture needs — the
full detail line first, then a compact summary line LAST that stays
well under the ~2000-char capture window (r10's single detail line
outgrew it → BENCH_r10 parsed:null)."""

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
    assert len(lines) == 2, proc.stdout[-2000:]
    detail, compact = (json.loads(l) for l in lines)
    # the LAST line is what the driver's tail capture parses: compact,
    # hard-bounded, and carrying the graded fields
    assert len(lines[-1]) < 1500
    for payload in (detail, compact):
        assert payload["metric"] == "headline_queries_total_sec"
        assert payload["unit"] == "sec"
        assert payload["value"] > 0
        # a contended run must be machine-readable from either line
        assert isinstance(payload["load1"], (int, float))
        # the funnel build cost must stay measurable now that min-of-N
        # reads the frames-cache steady state (r12 verdict item 5)
        assert set(payload["cold"]) == {
            "pipeline_curation_funnel_v3",
            "pipeline_pack_batches",
        }
        assert all(v > 0 for v in payload["cold"].values())
    # the detail line always carries the full per-query map; the
    # compact line may degrade it (coarser rounding, then dropped) if
    # catalog growth pushes the line past the capture window — the
    # graded scalars must survive that degradation.
    assert len(detail["queries"]) >= 10
    if "queries" in compact:
        assert len(compact["queries"]) >= 10
    assert compact["value"] == detail["value"]
    assert compact["value_legacy12"] == detail["value_legacy12"]
    assert compact["run_id"] == detail["run_id"]
    # the detail line keeps the per-query medians/spread for humans
    assert "medians" in detail and "medians" not in compact
