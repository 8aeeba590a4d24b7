"""Join operators beyond plain equi-joins (SURVEY.md §2.3 J1/J3/J6).

All are compositions of built-in DataFrame ops — no UDFs — so Catalyst
keeps full visibility (pushdown, AQE, broadcast selection) at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["first_match_join", "range_join_count", "asof_join"]


def first_match_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    order_by: str,
    how: str = "left",
) -> DataFrame:
    """Left join that takes at most ONE right row per key — the first in
    ``order_by`` order.

    Re-expresses the reference's nested-loop "first match then break"
    lookup (``src/parser.py:64-70``, ``src/parser2.py:126-134``): its
    implicit order was CSV file order; here the order is an explicit
    column, which is the only well-defined notion of "first" in a
    distributed setting.

    Scale: the dedup is a window over the right side only (shuffle of the
    *dimension*, not the fact); the join itself is broadcast-eligible
    because the deduped right side is ≤ one row per key.
    """
    w = Window.partitionBy(right_key).orderBy(F.col(order_by).asc())
    deduped = (
        right.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")
    )
    return left.join(F.broadcast(deduped), left[left_key] == deduped[right_key], how)


def range_join_count(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    window_seconds: int,
    left_id: str,
    count_alias: str = "n_followups",
) -> DataFrame:
    """For each left row, count right rows with the same ``key`` whose
    timestamp falls in ``(left_ts, left_ts + window_seconds]``.

    A naive theta-join ``r.ts BETWEEN l.ts AND l.ts + W`` has no equi key
    for the range part and degenerates to a nested-loop at scale. This
    implementation buckets time into window-sized buckets and replicates
    each right row into the (at most 2) buckets whose left rows could
    match it — turning the range join into an equi-join on
    ``(key, bucket)`` plus a cheap residual filter. Shuffle volume is
    2·|right| + |left| rows, partitioned by key+bucket: linear, skew-safe
    under AQE, no cross product.
    """
    lb = F.floor(F.unix_timestamp(F.col(left_ts)) / window_seconds)

    l = left.withColumn("__bucket", lb)
    # A right row at time s can match left rows in buckets floor(s/W) and
    # floor(s/W)-1 (since s - W <= l.ts < s).
    r = (
        right.select(
            F.col(key).alias("__rkey"),
            F.col(right_ts).alias("__rts"),
        )
        .withColumn("__boff", F.explode(F.array(F.lit(0), F.lit(1))))
        .withColumn(
            "__bucket_r",
            F.floor(F.unix_timestamp(F.col("__rts")) / window_seconds) - F.col("__boff"),
        )
        .drop("__boff")
    )
    joined = l.join(
        r,
        (l[key] == r["__rkey"])
        & (l["__bucket"] == r["__bucket_r"])
        & (r["__rts"] > l[left_ts])
        & (r["__rts"] <= F.col(left_ts) + F.expr(f"INTERVAL {window_seconds} SECONDS")),
        "left",
    )
    return joined.groupBy(left_id).agg(F.count("__rts").alias(count_alias))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """As-of (backward) join: for each left row, attach the columns of the
    most recent right row with ``right_ts <= left_ts`` for the same key.

    Implemented as the union+window trick: tag both sides, union, then a
    per-key window ordered by time carries the latest right-side values
    forward with ``last(..., ignorenulls)``. One shuffle on ``key`` total —
    same cost as a single sort-merge join — instead of a non-equi join
    that would nest-loop. This is the standard distributed as-of strategy
    (used by e.g. Flint/pandas merge_asof semantics).
    """
    lcols = left.columns
    l_tagged = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        F.struct(*[F.col(c) for c in lcols]).alias("__lrow"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in right_cols],
    )
    r_tagged = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        F.lit(None)
        .cast(l_tagged.schema["__lrow"].dataType)
        .alias("__lrow"),
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
    )
    unioned = l_tagged.unionByName(r_tagged)
    # Right rows sort before left rows at the same timestamp (so a right
    # row AT left_ts is visible to it — "<=" semantics). Among right
    # rows sharing (key, ts), the carried payload tuple sorts last —
    # a deterministic winner under any partitioning (without it, `last`
    # picks by shuffle arrival order).
    r_tiebreak = [F.col(f"__r_{c}").asc_nulls_first() for c in right_cols]
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__ts").asc(), F.col("__is_left").asc(), *r_tiebreak)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = [
        F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__c_{c}") for c in right_cols
    ]
    ts_carried = F.last(
        F.when(F.col("__is_left") == 0, F.col("__ts")), ignorenulls=True
    ).over(w).alias("__c_ts")
    result = (
        unioned.select("*", *carried, ts_carried)
        .filter(F.col("__is_left") == 1)
    )
    if tolerance_seconds is not None:
        tol = F.col("__ts").cast("long") - F.col("__c_ts").cast("long") <= tolerance_seconds
        keep = [
            F.when(tol, F.col(f"__c_{c}")).alias(c) for c in right_cols
        ]
    else:
        keep = [F.col(f"__c_{c}").alias(c) for c in right_cols]
    return result.select(
        *[F.col("__lrow")[c].alias(c) for c in lcols],
        *keep,
    )


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_id: str,
    tolerance_us: int,
) -> DataFrame:
    """As-of NEAREST join: for each left row, the right row (same key)
    minimizing ``|left_ts - right_ts|`` within ``tolerance_us``
    microseconds, ties broken toward the EARLIER right timestamp and
    then the smaller ``right_id`` — fully deterministic.

    Same union+window strategy as :func:`asof_join` (one shuffle on the
    key, never a non-equi nested loop), run in BOTH directions over one
    union: a backward pass carries ``max(struct(ts, -id))`` over the
    preceding frame (latest earlier right row, min-id on ties) and a
    forward pass carries ``min(struct(ts, id))`` over the following
    frame; a codegen projection then picks the closer candidate. Both
    window frames sort within the same key partitioning, so Catalyst
    inserts exactly one exchange. Timestamps are compared as integer
    epoch-µs — exact, engine-portable arithmetic.

    Returns the left columns plus ``<right_id>`` (nullable), ``side``
    ('backward' / 'forward' / null) and ``delta_us``."""
    lcols = left.columns
    l_tagged = left.select(
        F.col(key).alias("__k"),
        F.unix_micros(F.col(left_ts).cast("timestamp")).alias("__t"),
        F.lit(1).alias("__tag"),
        F.struct(*[F.col(c) for c in lcols]).alias("__lrow"),
        F.lit(None).cast("long").alias("__rid"),
    )
    r_tagged = right.select(
        F.col(key).alias("__k"),
        F.unix_micros(F.col(right_ts).cast("timestamp")).alias("__t"),
        F.lit(0).alias("__tag"),
        F.lit(None).cast(l_tagged.schema["__lrow"].dataType).alias("__lrow"),
        F.col(right_id).cast("long").alias("__rid"),
    )
    u = l_tagged.unionByName(r_tagged)
    # Right rows sort before left rows at equal ts => "<=" goes backward.
    order = [F.col("__t").asc(), F.col("__tag").asc()]
    wb = (
        Window.partitionBy("__k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("__k")
        .orderBy(*order)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    r_struct = F.when(
        F.col("__tag") == 0, F.struct(F.col("__t"), (-F.col("__rid")).alias("__nid"))
    )
    f_struct = F.when(F.col("__tag") == 0, F.struct(F.col("__t"), F.col("__rid")))
    cand = (
        u.select(
            "__tag",
            "__lrow",
            "__t",
            F.max(r_struct).over(wb).alias("__b"),  # latest earlier; min id on tie
            F.min(f_struct).over(wf).alias("__f"),  # earliest later; min id on tie
        )
        .filter(F.col("__tag") == 1)
    )
    db = F.col("__t") - F.col("__b.__t")
    df_ = F.col("__f.__t") - F.col("__t")
    b_ok = F.col("__b").isNotNull() & (db <= tolerance_us)
    f_ok = F.col("__f").isNotNull() & (df_ <= tolerance_us)
    # backward wins exact-delta ties (earlier timestamp), matching the
    # ORDER BY delta, ts, id ground truth.
    use_b = b_ok & (~f_ok | (db <= df_))
    use_f = f_ok & ~use_b
    return cand.select(
        *[F.col("__lrow")[c].alias(c) for c in lcols],
        F.when(use_b, -F.col("__b.__nid"))
        .when(use_f, F.col("__f.__rid"))
        .alias(right_id),
        F.when(use_b, F.lit("backward")).when(use_f, F.lit("forward")).alias("side"),
        F.when(use_b, db).when(use_f, df_).alias("delta_us"),
    )
