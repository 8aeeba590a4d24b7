"""Interval analytics without pair materialization (extension surface).

``events_session_concurrency`` (plans/pipeline3.py) materializes every
overlapping session pair through a bucketed equi join — exact, but any
pair-producing plan must grow with the pair count: the 10× scaling
series measured ~100× work when 10× sessions share the same time span
(PLANS.md round-2c). For COUNT-only semantics this module computes the
same numbers by sweep-line rank arithmetic instead:

    overlaps(a) = #{b : b.st ≤ a.en} − #{b : b.en < a.st} − 1

(sessions not overlapping ``a`` either end before it starts or start
after it ends; the two global ranks are evaluated at a's endpoints;
−1 removes ``a`` itself. Same-key sessions never overlap under
gap-based sessionization, so "other users only" needs no further
correction.)

The ranks come from a DISTRIBUTED prefix sum — no global
single-partition window, no driver collect:

1. union points (weight 1) and probes (weight 0), tagged so the
   inclusive/strict tie rule is encoded in the sort key;
2. ``repartitionByRange`` on the sort key (correctness never depends on
   where the range boundaries fall — only on the per-row ordering);
3. per-partition running sum (window over ``spark_partition_id``);
4. per-partition totals (≤ n_parts rows) → exclusive cumulative offsets
   (a window over a tiny frame) → broadcast-joined back.

Every step is linear in |sessions|; wall-clock scales with rows, not
with overlap density.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "global_rank",
    "adaptive_global_rank",
    "session_overlap_counts",
    "GLOBAL_RANK_SINGLE_TASK_MAX",
]

# Crossover for the adaptive rank strategy (r10 verdict stretch): the
# 100× A/B measured the distributed two-level prefix sum 2-3× SLOWER
# than one single-task sort at small layouts (0.85→1.85 s systematic,
# 2.11→6.66 s RFM at 10M rows — three extra exchanges don't pay until
# the sort itself is the problem), while a single task stops being
# POSSIBLE at all around ~10⁸ rows (the sort's one task must hold the
# run; 2 GB task limits / executor memory bound it first). Below the
# threshold the single-task running sum is both faster and safe; above
# it only the distributed form works — so the estimate only needs to
# be right to an order of magnitude.
GLOBAL_RANK_SINGLE_TASK_MAX = 100_000_000


def adaptive_global_rank(
    df: DataFrame,
    order_cols: list[str],
    weight_col: str,
    n_rows: int,
    n_parts: int = 32,
) -> DataFrame:
    """:func:`global_rank` with the documented size crossover applied:
    ``n_rows`` at or under :data:`GLOBAL_RANK_SINGLE_TASK_MAX` takes
    ONE single-task running-sum window (cheapest when a single sort
    task can hold the data — the honest 100× A/B trade), larger inputs
    take the distributed two-level prefix sum (the only shape that
    works at all once the run outgrows one task). Both branches
    produce identical ranks; callers supply ``n_rows`` from a count
    they were already paying for (or one column-pruned count job —
    trivial next to the sort either way)."""
    if n_rows <= GLOBAL_RANK_SINGLE_TASK_MAX:
        w = Window.orderBy(*order_cols).rowsBetween(
            Window.unboundedPreceding, 0
        )
        return df.withColumn("rank", F.sum(weight_col).over(w).cast("long"))
    return global_rank(df, order_cols, weight_col, n_parts)


def global_rank(
    df: DataFrame, order_cols: list[str], weight_col: str, n_parts: int = 32
) -> DataFrame:
    """Append ``rank`` = running sum of ``weight_col`` over the global
    ``order_cols`` ordering, computed as a distributed two-level prefix
    sum (see module docstring). Rows with equal keys may order
    arbitrarily among themselves — their ranks are unaffected (weights
    at equal keys either all count or all don't, by the caller's
    tie-encoding).

    Partitioning: the range split rides a LOGICAL bucket id — a CASE
    chain over quantile boundaries of the first sort key, collected
    ONCE (one column-pruned Greenwald-Khanna pass) and inlined as
    literals — so the bucket is a pure function of the row and every
    re-evaluation of the frame agrees on it. The previous design pinned
    the PHYSICAL partition id instead, which forced an eager
    localCheckpoint of the whole point set (RangePartitioning samples
    its boundaries per evaluation, so unpinned pids silently corrupted
    ranks — observed r6: same probe ranked 917 then 941); the logical
    bucket keeps that equivalence guarantee (pinned by
    test_global_rank_is_stable_across_evaluations) with zero
    materialization — the offsets branch re-reads only (bucket, weight)
    through column pruning. Ties on the first key share a bucket, so a
    massively-tied key skews one bucket; correctness is unaffected."""
    c1 = order_cols[0]
    probs = [i / n_parts for i in range(1, n_parts)]
    bounds = sorted(
        set(
            df.select(F.col(c1).cast("double").alias("__k")).approxQuantile(
                "__k", probs, 0.001
            )
        )
    )
    bucket = F.lit(0)
    if bounds:
        v = F.col(c1).cast("double")
        chain = F.when(v > F.lit(bounds[-1]), len(bounds))
        for i in range(len(bounds) - 2, -1, -1):
            chain = chain.when(v > F.lit(bounds[i]), i + 1)
        bucket = chain.otherwise(0)
    part = df.withColumn("__bucket", bucket.cast("int")).repartition(
        n_parts, F.col("__bucket")
    )
    w_local = (
        Window.partitionBy("__bucket")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    part = part.withColumn("__local", F.sum(weight_col).over(w_local))
    totals = part.groupBy("__bucket").agg(F.sum(weight_col).alias("__tot"))
    # ≤ n_parts rows: the single-partition window here is a deliberate
    # tiny-frame exception, same class as a broadcast dim.
    w_off = Window.orderBy("__bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.withColumn(
        "__off", F.coalesce(F.sum("__tot").over(w_off), F.lit(0))
    ).select("__bucket", "__off")
    return (
        part.join(F.broadcast(offsets), "__bucket")
        .withColumn("rank", (F.col("__local") + F.col("__off")).cast("long"))
        .drop("__bucket", "__local", "__off")
    )


def session_overlap_counts(
    sessions: DataFrame,
    key_cols: list[str],
    st: str = "st",
    en: str = "en",
    n_parts: int = 32,
) -> DataFrame:
    """``sessions(key_cols…, st, en)`` → same frame + ``n_concurrent`` =
    number of OTHER sessions overlapping [st, en] (closed intervals),
    assuming same-key sessions are disjoint (gap sessionization).

    Two sweeps:
    - starts≤en: points at ``st`` (tag 0) BEFORE probes at ``en``
      (tag 1) on equal timestamps → inclusive count.
    - ends<st: probes at ``st`` (tag 0) BEFORE points at ``en``
      (tag 1) on equal timestamps → strict count.
    """
    # The session table feeds FIVE plan branches (points + probes in
    # each of the two sweeps, plus the final join) and the upstream
    # sessionization window re-executes per branch — one lazy
    # localCheckpoint materializes it once (the multi-branch rule;
    # measured 5.4 -> 3.9 s warm at sf0.1, and the gap widens with the
    # input).
    base = sessions.select(*key_cols, st, en).localCheckpoint(eager=False)

    def sweep(point_col: str, probe_col: str, point_tag: int) -> DataFrame:
        points = base.select(
            F.col(point_col).alias("t"),
            F.lit(point_tag).alias("tag"),
            F.lit(1).cast("long").alias("w"),
            *[F.lit(None).cast(base.schema[k].dataType).alias(k) for k in key_cols],
        )
        probes = base.select(
            F.col(probe_col).alias("t"),
            F.lit(1 - point_tag).alias("tag"),
            F.lit(0).cast("long").alias("w"),
            *key_cols,
        )
        ranked = global_rank(
            points.unionByName(probes), ["t", "tag"], "w", n_parts=n_parts
        )
        return ranked.filter(F.col("w") == 0).select(*key_cols, "rank")

    n_start_le_en = sweep(st, en, point_tag=0).withColumnRenamed("rank", "n_le")
    n_end_lt_st = sweep(en, st, point_tag=1).withColumnRenamed("rank", "n_lt")
    return (
        base.join(n_start_le_en, key_cols)
        .join(n_end_lt_st, key_cols)
        .withColumn(
            "n_concurrent", (F.col("n_le") - F.col("n_lt") - F.lit(1)).cast("long")
        )
        .drop("n_le", "n_lt")
    )
