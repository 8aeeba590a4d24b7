"""Skew-mitigation operators (SURVEY.md §2.12 100-TB posture).

AQE's skew-join splitting handles most skew automatically; these
operators cover the cases AQE can't: aggregations over pathologically
hot keys, and joins where one side's hot keys must be salted manually
(e.g. a pre-AQE cluster or a deterministic-layout requirement).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_agg", "salted_broadcast_join"]


def salted_agg(
    df: DataFrame,
    group_cols: Sequence[str],
    aggs: dict[str, Column],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation with key salting.

    Phase 1 groups on (key, salt) — the hot key's rows spread over
    ``salt_buckets`` reducers; phase 2 re-aggregates the per-salt partials
    on the key alone (|keys|·buckets rows — tiny). Only works for
    decomposable aggregates; the caller supplies both phases implicitly
    by using re-aggregatable expressions (sum/count/min/max).

    ``aggs`` maps output name → phase-1 aggregate expression. Phase 2
    sums counts/sums and min/max's mins/maxes by convention: pass
    ``F.sum``-able phase-1 outputs (count becomes a sum in phase 2).
    """
    salt = F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt_buckets))
    phase1 = (
        df.withColumn("__salt", salt)
        .groupBy(*group_cols, "__salt")
        .agg(*[expr.alias(f"__p1_{name}") for name, expr in aggs.items()])
    )
    # Phase 2: partials combine by summation for sum/count; for min/max
    # the partial is already a min/max so summing would be wrong — detect
    # by convention: names ending in '_min'/'_max' re-combine with
    # min/max.
    finals = []
    for name in aggs:
        p1 = F.col(f"__p1_{name}")
        if name.endswith("_min"):
            finals.append(F.min(p1).alias(name))
        elif name.endswith("_max"):
            finals.append(F.max(p1).alias(name))
        else:
            finals.append(F.sum(p1).alias(name))
    return phase1.groupBy(*group_cols).agg(*finals)


def salted_broadcast_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = 8,
) -> DataFrame:
    """Skew-safe join: salt the big side, explode the small side across
    all salt values, join on (key, salt). Shuffle of the big side spreads
    hot keys over ``salt_buckets`` partitions; the small side replicates
    ×buckets (fine — it's small). Equivalent rows to a plain inner join.
    """
    big_salted = big.withColumn(
        "__salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt_buckets))
    )
    small_exploded = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    out = big_salted.join(small_exploded, [key, "__salt"]).drop("__salt")
    return out
