#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric", "value", "unit", "queries", "sf"}.

Each query is materialized with the noop sink (full execution, no
driver-side collect — measuring the engine, not result transfer).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from jhu_data_parser_spark import plans
from jhu_data_parser_spark.session import get_spark

# Headline set: one per operator family — star join+agg, grouped agg,
# top-k join, window, time windows, dedup (exact + MinHash near-dup),
# vector top-k (exact + IVF), rolling-hash fingerprints, unpivot,
# bucketed range join.
HEADLINE = [
    "join_revenue_by_nation",
    "agg_pricing_summary",
    "join_shipping_priority_top10",
    "window_rank_top_customers",
    "stream_tumbling_daily",
    "dedup_exact_groups",
    "dedup_near_pairs",
    "sim_cosine_topk",
    "sim_cosine_topk_ivf",
    "text_rolling_fingerprints",
    "unpivot_lineitem_metrics",
    "join_range_followup_events",
]


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="jdps-bench")
    spark.sparkContext.setLogLevel("ERROR")

    queries = plans.get_queries()

    # Warm-up: run every headline plan once at the smallest SF. This JITs
    # whole-stage codegen for the exact plan shapes, warms the parquet
    # footer cache and broadcast machinery — so the timed section below
    # measures steady-state engine throughput, not JVM cold start.
    warm_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    for name in HEADLINE:
        materialize(queries[name](spark, warm_dir))
    # One untimed round at the TARGET sf: the sf0.001 warm-up misses
    # sf-keyed caches (adaptive-collapse probe, IVF index registry) and
    # the target files' footer cache, which otherwise land entirely on
    # the first timed round and dominate the per-query spread.
    for name in HEADLINE:
        materialize(queries[name](spark, sf_dir))

    # Per-query minimum over N runs: single-shot local timings carry
    # 2-3× noise from Python-worker reuse and GC; the min is the
    # steady-state engine throughput the warm-up is there to expose.
    # Rounds are INTERLEAVED (run the whole headline list N times, not
    # each query N times back-to-back): a co-tenant CPU burst then
    # poisons at most one round of each query instead of every repeat
    # of whichever query it landed on.
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5"))
    # Pair-producing dedup lines carry the widest run-to-run band
    # (Python-worker round-trips + multi-join plans); give them extra
    # interleaved rounds so min AND median are trustworthy (r5 verdict:
    # the 1.1-1.9 s band was wider than the regressions under test).
    extra_rounds = {"dedup_near_pairs": 2}
    samples: dict[str, list[float]] = {name: [] for name in HEADLINE}
    for r in range(runs + max(extra_rounds.values(), default=0)):
        for name in HEADLINE:
            if r >= runs + extra_rounds.get(name, 0):
                continue
            t0 = time.perf_counter()
            materialize(queries[name](spark, sf_dir))
            samples[name].append(time.perf_counter() - t0)
    timings = {name: round(min(s), 3) for name, s in samples.items()}
    medians = {
        name: round(sorted(s)[len(s) // 2], 3) for name, s in samples.items()
    }

    sample_path = os.environ.get("SPARK_GRAFT_BENCH_SAMPLES")
    if sample_path:
        with open(sample_path, "w") as fh:
            json.dump(
                {n: [round(x, 3) for x in s] for n, s in samples.items()}, fh
            )

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "n": runs,
                "queries": timings,
                "medians": medians,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
