"""Wave 16-21 operator tests: the Holt dyadic fold vs a pure-python
recurrence, and the compaction planner vs a python cumulative-sum
reference — independent of the DuckDB oracles."""

from __future__ import annotations

import datetime


def test_holt_fold_matches_pure_python(spark, tmp_path):
    from jhu_data_parser_spark.plans.pipeline16 import (
        _HOLT_S,
        events_holt_forecast,
    )

    t0 = datetime.datetime(2024, 1, 1)
    counts = [7, 9, 4, 12, 8, 15, 3, 11, 6]  # one event_type, 9 days
    rows = []
    eid = 0
    for day, n in enumerate(counts):
        for k in range(n):
            rows.append(
                (eid, t0 + datetime.timedelta(days=day, minutes=k), 1,
                 "click", 1.0, "{}")
            )
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long,"
        " event_type string, value double, props string"
    )
    sf = str(tmp_path / "sf")
    df.write.parquet(f"{sf}/events.parquet")
    got = {
        r.horizon: r.forecast_milli
        for r in events_holt_forecast(spark, sf).collect()
    }

    def trunc_div2(x: int) -> int:
        return x // 2 if x >= 0 else -((-x) // 2)

    l = counts[0] * _HOLT_S
    tr = (counts[1] - counts[0]) * _HOLT_S
    for n in counts[1:]:
        nl = trunc_div2(n * _HOLT_S + l + tr)
        tr = trunc_div2(tr + (nl - l))
        l = nl
    for h in range(1, 8):
        exp = (l + h * tr) * 1000
        exp = exp // _HOLT_S if exp >= 0 else -((-exp) // _HOLT_S)
        assert got[h] == exp, (h, got[h], exp)


def test_compaction_plan_matches_python_cumsum(spark, tmp_path):
    import math

    from jhu_data_parser_spark.plans.pipeline16 import layout_compaction_plan

    t0 = datetime.date(2024, 1, 1)
    prices = [10.0, 25.5, 7.25, 90.0, 33.0, 5.5, 61.75, 44.0, 12.0, 70.5]
    rows = [
        (i, i % 3, "O", p, t0 + datetime.timedelta(days=i), "1-URGENT")
        for i, p in enumerate(prices)
    ]
    df = spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate date, o_orderpriority string"
    )
    sf = str(tmp_path / "sf")
    df.write.parquet(f"{sf}/orders.parquet")
    got = {r.bin: (r.n_files, r.bytes_total)
           for r in layout_compaction_plan(spark, sf).collect()}

    sizes = [math.floor(100.0 * p) for p in prices]  # one file per day
    total = sum(sizes)
    target = total // 8 + 1
    bins: dict[int, list[int]] = {}
    before = 0
    for sz in sizes:  # day order == orderkey order here
        bins.setdefault(before // target, []).append(sz)
        before += sz
    exp = {b: (len(v), sum(v)) for b, v in bins.items()}
    assert got == exp
