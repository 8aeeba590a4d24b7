"""Catalog wave 17 — round 9 continuation: interval-overlap co-activity
pairs (the bucketed interval self-join), cohort LTV, class-balanced
sampling, and the small-files compaction planner.

Reference parity note: the reference (/root/reference) has no analytics
surface — [extension] operators of the analytics/curation families.
House exactness discipline: every hash gate rides on integers
(epoch-microsecond interval arithmetic, floor(1e6·value) fixed points,
md5-hex draws, integer DIV bucketing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from jhu_data_parser_spark.operators import similarity as sim
from jhu_data_parser_spark.plans.catalog import query
from jhu_data_parser_spark.sources.tables import load_table

# --------------------------------------------------------------------------
# Interval-overlap co-activity pairs — the interval SELF-join (who was
# online together): 4-hour-gap sessionization, then every cross-user
# pair of overlapping multi-event sessions with >= 1 hour of overlap,
# aggregated to a per-user-pair co-activity total.
#
# Scale posture: co-activity pair LISTING is inherently quadratic in
# simultaneous users — measured unbounded on the 100× replicated
# layout (15k users sharing one 30-day timeline, month-long sessions:
# the probe did not finish in 10 minutes). The scale-honest contract
# is therefore a bounded suspect set: the TOP-500 most-active users
# (exact integer rank, user_id tiebreak — what an investigation
# pipeline shortlists before pairwise timeline comparison). Within the
# shortlist the enumeration is a DAY-BUCKETED equi-join — each session
# explodes to the <= 31 day buckets it spans, pairs meet on the bucket
# key, and each session pair is counted ONCE at the bucket containing
# the overlap start (the standard interval-join dedup trick). Pair
# candidates are <= 500²/2 per bucket regardless of corpus size; the
# session build stays linear; the shortlist broadcast is <= 500 ids.
#
# Exactness: all interval arithmetic in epoch microseconds
# (unix_micros ≡ epoch_us under the UTC-pinned session); overlap
# totals integer; output seconds via DIV.
# --------------------------------------------------------------------------

_SESS_GAP_US = 4 * 3600 * 1_000_000
_OVERLAP_MIN_US = 3600 * 1_000_000
_DAY_US = 86400 * 1_000_000
_COACT_TOP_USERS = 500

_COACT_ORACLE = f"""
    WITH active AS (
      SELECT user_id FROM (
        SELECT user_id, row_number() OVER (ORDER BY COUNT(*) DESC, user_id)
                 AS urk
        FROM events GROUP BY user_id)
      WHERE urk <= {_COACT_TOP_USERS}),
    e AS (
      SELECT user_id, epoch_us(ts) AS us, event_id,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
                         (PARTITION BY user_id ORDER BY ts, event_id)
                       > {_SESS_GAP_US}
                   OR lag(epoch_us(ts)) OVER
                         (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS brk
      FROM events WHERE user_id IN (SELECT user_id FROM active)),
    s AS (
      SELECT user_id,
             SUM(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
                            ROWS UNBOUNDED PRECEDING) AS sid,
             us
      FROM e),
    sess AS (
      SELECT user_id, sid, MIN(us) AS st, MAX(us) AS en
      FROM s GROUP BY 1, 2 HAVING MAX(us) > MIN(us)),
    p AS (
      SELECT a.user_id AS a_user, b.user_id AS b_user,
             LEAST(a.en, b.en) - GREATEST(a.st, b.st) AS ov
      FROM sess a JOIN sess b
        ON a.user_id < b.user_id AND a.st < b.en AND b.st < a.en)
    SELECT a_user, b_user,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(SUM(ov) // 1000000 AS BIGINT) AS overlap_sec_total
    FROM p WHERE ov >= {_OVERLAP_MIN_US}
    GROUP BY 1, 2
    """


@query("join_interval_overlap_pairs", oracle=_COACT_ORACLE)
def join_interval_overlap_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-user co-activity among the top-500 most-active users:
    overlapping (>= 1 h) session pairs per user pair, enumerated
    through a day-bucketed interval equi-join (each pair counted once
    at its overlap-start bucket — never a cross join; the suspect
    shortlist bounds pair candidates at any corpus size)."""
    all_ev = load_table(spark, sf_dir, "events")
    active = (
        all_ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_ev"))
        .orderBy(F.col("n_ev").desc(), F.col("user_id"))
        .limit(_COACT_TOP_USERS)
        .select("user_id")
    )
    ev = all_ev.join(F.broadcast(active), "user_id").select(
        "user_id", "ts", "event_id", F.expr("unix_micros(ts)").alias("us")
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    brk = F.when(
        F.lag("us").over(w).isNull()
        | ((F.col("us") - F.lag("us").over(w)) > _SESS_GAP_US),
        1,
    ).otherwise(0)
    s = ev.withColumn("brk", brk).withColumn(
        "sid",
        F.sum("brk").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    sess = (
        s.groupBy("user_id", "sid")
        .agg(F.min("us").alias("st"), F.max("us").alias("en"))
        .filter(F.col("en") > F.col("st"))
    )
    # Day-bucket explode: a session appears in every day bucket it
    # spans; the pair is kept only in the bucket where the overlap
    # starts, so each (a_sid, b_sid) pair is emitted exactly once.
    daysp = sess.select(
        "user_id",
        "sid",
        "st",
        "en",
        F.explode(
            F.expr(f"sequence(st DIV {_DAY_US}, en DIV {_DAY_US})")
        ).alias("day"),
    )
    a = daysp.select(
        F.col("user_id").alias("a_user"),
        F.col("sid").alias("a_sid"),
        F.col("st").alias("a_st"),
        F.col("en").alias("a_en"),
        "day",
    )
    b = daysp.select(
        F.col("user_id").alias("b_user"),
        F.col("sid").alias("b_sid"),
        F.col("st").alias("b_st"),
        F.col("en").alias("b_en"),
        "day",
    )
    pairs = (
        a.join(b, "day")
        .filter(
            (F.col("a_user") < F.col("b_user"))
            & (F.col("a_st") < F.col("b_en"))
            & (F.col("b_st") < F.col("a_en"))
            & (
                F.expr(f"greatest(a_st, b_st) DIV {_DAY_US}") == F.col("day")
            )
        )
        .select(
            "a_user",
            "b_user",
            (
                F.least("a_en", "b_en") - F.greatest("a_st", "b_st")
            ).alias("ov"),
        )
        .filter(F.col("ov") >= _OVERLAP_MIN_US)
    )
    return pairs.groupBy("a_user", "b_user").agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.expr("CAST(SUM(ov) DIV 1000000 AS BIGINT)").alias(
            "overlap_sec_total"
        ),
    )


# --------------------------------------------------------------------------
# Cohort LTV matrix — users cohorted by the absolute week of their
# first event; per (cohort_week, week_offset): active users and the
# exact micro-value mass. The classic retention-revenue triangle.
# Scale posture: one min-per-user aggregate (broadcastable frontier is
# NOT assumed — the cohort table shuffle-joins back on user_id), one
# rollup; output <= |weeks|² rows.
# --------------------------------------------------------------------------

_WEEK_US = 7 * _DAY_US

_LTV_ORACLE = f"""
    WITH f AS (
      SELECT user_id, MIN(epoch_us(ts)) // {_WEEK_US} AS cohort_week
      FROM events GROUP BY 1),
    j AS (
      SELECT f.cohort_week,
             epoch_us(e.ts) // {_WEEK_US} - f.cohort_week AS week_offset,
             e.user_id,
             CAST(floor(1000000.0 * e.value) AS BIGINT) AS v
      FROM events e JOIN f USING (user_id))
    SELECT CAST(cohort_week AS BIGINT) AS cohort_week,
           CAST(week_offset AS BIGINT) AS week_offset,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(SUM(v) AS BIGINT) AS value_sum_micro
    FROM j GROUP BY 1, 2
    """


@query("events_cohort_ltv", oracle=_LTV_ORACLE)
def events_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort-week × week-offset LTV triangle: distinct active users
    and exact micro-value sums."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.expr(f"unix_micros(ts) DIV {_WEEK_US}").alias("wk"),
        F.expr("CAST(floor(1000000.0 * value) AS BIGINT)").alias("v"),
    )
    f = ev.groupBy("user_id").agg(F.min("wk").alias("cohort_week"))
    j = ev.join(f, "user_id").select(
        F.col("cohort_week").cast("long").alias("cohort_week"),
        (F.col("wk") - F.col("cohort_week")).cast("long").alias("week_offset"),
        "user_id",
        "v",
    )
    return j.groupBy("cohort_week", "week_offset").agg(
        F.countDistinct("user_id").cast("long").alias("n_users"),
        F.sum("v").cast("long").alias("value_sum_micro"),
    )


# --------------------------------------------------------------------------
# Class-balanced sampling — undersample every language to the minority
# class size with a deterministic md5 draw (the training-data
# balancing pass). The per-class rank is a window over the md5 hex of
# the doc id (uniform, engine-portable); the minority size is a 1-row
# broadcast scalar.
# --------------------------------------------------------------------------

_BALANCE_ORACLE = """
    WITH n AS (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n FROM documents GROUP BY 1),
    m AS (SELECT MIN(n) AS min_n FROM n),
    r AS (
      SELECT doc_id, lang,
             CAST(row_number() OVER (PARTITION BY lang
                    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT)
               AS rk
      FROM documents)
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_kept,
           CAST(SUM(doc_id) AS BIGINT) AS id_checksum
    FROM r, m WHERE r.rk <= m.min_n
    GROUP BY 1
    """


@query("sample_balanced_classes", oracle=_BALANCE_ORACLE)
def sample_balanced_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Undersample every language to the minority class size via a
    deterministic md5 draw; per-language kept counts (all equal) and
    id checksums."""
    d = load_table(spark, sf_dir, "documents")
    n = d.groupBy("lang").agg(F.count(F.lit(1)).cast("long").alias("n"))
    m = n.agg(F.min("n").alias("min_n"))
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    r = d.select("doc_id", "lang").withColumn(
        "rk", F.row_number().over(w).cast("long")
    )
    return (
        r.crossJoin(F.broadcast(m))
        .filter(F.col("rk") <= F.col("min_n"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_kept"),
            F.sum("doc_id").cast("long").alias("id_checksum"),
        )
    )


# --------------------------------------------------------------------------
# Small-files compaction planner — the OPTIMIZE bin-packing decision:
# per-day "files" (synthetic sizes = exact cent sums of the day's
# orders) packed in day order into 8 balanced bins by cumulative-sum
# bucketing (bin = exclusive-prefix-sum DIV target). Deterministic,
# order-preserving, integer-exact; the real-lake twin reads file
# manifests instead of orders.
# --------------------------------------------------------------------------

_COMPACT_ORACLE = """
    WITH files AS (
      SELECT o_orderdate AS day,
             CAST(SUM(CAST(floor(100.0 * o_totalprice) AS BIGINT)) AS BIGINT)
               AS bytes
      FROM orders GROUP BY 1),
    c AS (
      SELECT day, bytes,
             CAST(COALESCE(SUM(bytes) OVER (ORDER BY day
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS before,
             CAST(SUM(bytes) OVER () AS BIGINT) AS total
      FROM files)
    SELECT CAST(before // (total // 8 + 1) AS BIGINT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n_files,
           CAST(SUM(bytes) AS BIGINT) AS bytes_total,
           MIN(day) AS day_min,
           MAX(day) AS day_max
    FROM c GROUP BY 1
    """


@query("layout_compaction_plan", oracle=_COMPACT_ORACLE)
def layout_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack per-day file sizes into 8 balanced compaction bins via
    exclusive-prefix-sum DIV target — the deterministic OPTIMIZE plan.
    One aggregate + one ordered cumulative window (a single-partition
    window over <= |days| rows — the FILE MANIFEST, not data)."""
    o = load_table(spark, sf_dir, "orders")
    files = o.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.expr("CAST(SUM(CAST(floor(100.0 * o_totalprice) AS BIGINT)) AS BIGINT)").alias(
            "bytes"
        )
    )
    wcum = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, -1)
    c = files.select(
        "day",
        "bytes",
        F.coalesce(F.sum("bytes").over(wcum), F.lit(0)).cast("long").alias("before"),
        F.sum("bytes").over(
            Window.partitionBy().rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).cast("long").alias("total"),
    )
    return c.groupBy(
        F.expr("CAST(before DIV (total DIV 8 + 1) AS BIGINT)").alias("bin")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_files"),
        F.sum("bytes").cast("long").alias("bytes_total"),
        F.min("day").alias("day_min"),
        F.max("day").alias("day_max"),
    )


# --------------------------------------------------------------------------
# Holt double-exponential forecast — linear-trend smoothing over the
# per-type daily counts with α = β = 1/2, which makes every state a
# DYADIC RATIONAL: scaled by S = 2^32, the level/trend recurrence is
# pure int64 arithmetic (one truncating halving per step — truncation
# toward zero is identical in Spark DIV and DuckDB //, verified on
# negatives), so 30 recurrence steps replay bit-for-bit. The oracle is
# a genuine recursive CTE over the step index; the Spark side is one
# JVM HOF fold over the per-type day array (bounded by |days| — the
# time dimension, not the data volume).
# --------------------------------------------------------------------------

_HOLT_S = 1 << 32
_HOLT_H = 7

_HOLT_ORACLE = f"""
    WITH daily AS (
      SELECT event_type,
             CAST(floor(epoch_us(ts) / 86400000000.0) AS BIGINT) AS day,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2),
    steps AS (
      SELECT event_type, n,
             CAST(row_number() OVER (PARTITION BY event_type ORDER BY day)
               AS BIGINT) AS t,
             CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS nd
      FROM daily),
    init AS (
      SELECT s1.event_type, s1.nd,
             s1.n * {_HOLT_S} AS l,
             (s2.n - s1.n) * {_HOLT_S} AS tr
      FROM steps s1 JOIN steps s2 USING (event_type)
      WHERE s1.t = 1 AND s2.t = 2 AND s1.nd >= 2),
    rec AS (
      WITH RECURSIVE r(event_type, t, l, tr, nd) AS (
        SELECT event_type, CAST(1 AS BIGINT), l, tr, nd FROM init
        UNION ALL
        SELECT r.event_type, r.t + 1,
               (s.n * {_HOLT_S} + r.l + r.tr) // 2,
               (r.tr + ((s.n * {_HOLT_S} + r.l + r.tr) // 2 - r.l)) // 2,
               r.nd
        FROM r JOIN steps s ON s.event_type = r.event_type AND s.t = r.t + 1
        WHERE r.t < r.nd)
      SELECT * FROM r),
    fin AS (SELECT event_type, l, tr FROM rec WHERE t = nd)
    SELECT f.event_type, CAST(h.h AS INT) AS horizon,
           CAST((f.l + h.h * f.tr) * 1000 // {_HOLT_S} AS BIGINT)
             AS forecast_milli
    FROM fin f CROSS JOIN generate_series(1, {_HOLT_H}) h(h)
    """


def holt_forecast_from_daily(daily: DataFrame) -> DataFrame:
    """The Holt fold + horizon explode over a (event_type, day, n)
    daily-count table — shared by the batch query and the streaming
    twin (daily counts merge by addition, so the stream applies this
    ONCE at read-back over the merged integers)."""
    arr = (
        daily.groupBy("event_type")
        .agg(F.array_sort(F.collect_list(F.struct("day", "n"))).alias("a"))
        .filter(F.size("a") >= 2)
    )
    fin = arr.select(
        "event_type",
        F.expr(
            f"""aggregate(
                 slice(a, 2, size(a) - 1),
                 named_struct(
                   'l', element_at(a, 1).n * {_HOLT_S}L,
                   'tr', (element_at(a, 2).n - element_at(a, 1).n) * {_HOLT_S}L),
                 (acc, x) -> named_struct(
                   'l', (x.n * {_HOLT_S}L + acc.l + acc.tr) DIV 2L,
                   'tr', (acc.tr + ((x.n * {_HOLT_S}L + acc.l + acc.tr) DIV 2L
                                    - acc.l)) DIV 2L))"""
        ).alias("st"),
    )
    return fin.select(
        "event_type",
        F.explode(F.sequence(F.lit(1), F.lit(_HOLT_H))).alias("horizon"),
        F.col("st.l").alias("l"),
        F.col("st.tr").alias("tr"),
    ).select(
        "event_type",
        F.col("horizon").cast("int").alias("horizon"),
        F.expr(f"CAST((l + horizon * tr) * 1000 DIV {_HOLT_S} AS BIGINT)").alias(
            "forecast_milli"
        ),
    )


def _daily_counts_for_holt(ev: DataFrame) -> DataFrame:
    return ev.groupBy(
        "event_type",
        F.expr("unix_micros(ts) DIV 86400000000").alias("day"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))


@query("events_holt_forecast", oracle=_HOLT_ORACLE)
def events_holt_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day Holt (level+trend, α=β=1/2) forecast of daily event counts
    per type, exact in 2^32-scaled dyadic fixed point."""
    return holt_forecast_from_daily(
        _daily_counts_for_holt(load_table(spark, sf_dir, "events"))
    )


# --------------------------------------------------------------------------
# MinHash LSH band-parameter sweep — the tuning table that picks
# (bands, rows): candidate-pair counts for 2×8 / 4×4 / 8×2 bandings of
# the SAME 16-hash portable signature (collision probability
# 1-(1-j^r)^b — more bands = higher recall = more candidates). The
# signature is computed ONCE and lazily checkpointed across the three
# config branches (the multi-branch materialization rule); each config
# is one banded self-join + a 1-row aggregate.
#
# Dense-duplicate guard (house rule, and measured necessary: the raw
# self-join stalled on the 100× replicated layout): identical texts
# exact-collapse to (rep = min doc_id, cnt) BEFORE signatures, so a
# duplicate-dense corpus costs ONE signature per distinct text; the
# would-be raw candidate volume is REPORTED as Σ cnt_a·cnt_b (plus the
# intra-family Σ cnt·(cnt−1)/2) without ever materializing it.
# --------------------------------------------------------------------------

_SWEEP_BANDS = (2, 4, 8)


def _band_sweep_oracle() -> str:
    cfgs = []
    for nb in _SWEEP_BANDS:
        w = 16 // nb
        cfgs.append(f"""
    b{nb} AS (
      SELECT rep, cnt, g.b AS band,
             md5(array_to_string(mh[g.b * {w} + 1 : g.b * {w} + {w}], '|'))
               AS band_sig
      FROM m, (SELECT unnest(range(0, {nb})) AS b) g),
    c{nb} AS (
      SELECT DISTINCT a.rep AS id_a, c.rep AS id_b,
             a.cnt * c.cnt AS pw
      FROM b{nb} a JOIN b{nb} c
        ON a.band = c.band AND a.band_sig = c.band_sig
       AND a.rep < c.rep),
    r{nb} AS (
      SELECT CAST({nb} AS INT) AS n_bands, CAST({w} AS INT) AS rows_per_band,
             CAST(COUNT(*) AS BIGINT) AS n_candidates,
             CAST(COALESCE(SUM(pw), 0)
                  + (SELECT SUM(cnt * (cnt - 1) // 2) FROM g0) AS BIGINT)
               AS n_expanded,
             CAST(COALESCE(SUM(id_a * 1000003 + id_b), 0) AS BIGINT)
               AS pair_checksum
      FROM c{nb})""")
    unions = " UNION ALL ".join(f"SELECT * FROM r{nb}" for nb in _SWEEP_BANDS)
    return f"""
    WITH g0 AS (
      SELECT MIN(doc_id) AS rep, CAST(COUNT(*) AS BIGINT) AS cnt,
             string_split(lower(text), ' ') AS toks
      FROM documents GROUP BY lower(text)),
    s AS (
      SELECT rep, cnt,
             CASE WHEN len(toks) >= 3
                  THEN list_transform(range(1, len(toks) - 1),
                         i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])
                  ELSE [array_to_string(toks, ' ')] END AS sh
      FROM g0),
    hs AS (
      SELECT rep, cnt,
             list_transform(sh, x ->
               md5('0:' || x) || md5('1:' || x)
               || md5('2:' || x) || md5('3:' || x)) AS hs
      FROM s),
    m AS (
      SELECT rep, cnt,
             list_transform(range(0, 16), j ->
               list_min(list_transform(hs, h -> substr(h, j * 8 + 1, 8)))) AS mh
      FROM hs),{','.join(cfgs)}
    {unions}
    """


@query("dedup_minhash_band_sweep", oracle=_band_sweep_oracle())
def dedup_minhash_band_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate-pair counts for 2x8 / 4x4 / 8x2 bandings of one
    portable 16-hash MinHash signature over the exact-collapsed corpus
    — the (bands, rows) tuning table, with expansion volumes reported
    as numbers (never materialized)."""
    from jhu_data_parser_spark.operators import dedup as dd

    d = dd.ensure_parallelism(load_table(spark, sf_dir, "documents"))
    g0 = d.groupBy(F.lower(F.col("text")).alias("lt")).agg(
        F.min("doc_id").alias("rep"),
        F.count(F.lit(1)).cast("long").alias("cnt"),
    )
    intra = g0.agg(
        F.expr("CAST(SUM(cnt * (cnt - 1) DIV 2) AS BIGINT)").alias("ip")
    )
    t = g0.select(
        F.col("rep").alias("doc_id"), "cnt", F.split("lt", " ").alias("toks")
    )
    mh = (
        dd.minhash_signature_portable(t)
        .join(t.select(F.col("doc_id"), "cnt"), "doc_id")
        .localCheckpoint(eager=False)
    )
    reports = []
    for nb in _SWEEP_BANDS:
        w = 16 // nb
        bands = mh.select(
            "doc_id",
            "cnt",
            F.posexplode(
                F.expr(
                    f"transform(sequence(0, {nb - 1}), b -> "
                    f"md5(cast(concat_ws('|', slice(mh, b * {w} + 1, {w}))"
                    " AS binary)))"
                )
            ).alias("band", "band_sig"),
        )
        a = bands.select(
            F.col("doc_id").alias("id_a"),
            F.col("cnt").alias("cnt_a"),
            "band",
            "band_sig",
        )
        b = bands.select(
            F.col("doc_id").alias("id_b"),
            F.col("cnt").alias("cnt_b"),
            "band",
            "band_sig",
        )
        cand = (
            a.join(b, ["band", "band_sig"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select(
                "id_a", "id_b", (F.col("cnt_a") * F.col("cnt_b")).alias("pw")
            )
            .distinct()
        )
        reports.append(
            cand.agg(
                F.lit(nb).cast("int").alias("n_bands"),
                F.lit(w).cast("int").alias("rows_per_band"),
                F.count(F.lit(1)).cast("long").alias("n_candidates"),
                F.coalesce(F.sum("pw"), F.lit(0)).cast("long").alias("pwsum"),
                F.coalesce(
                    F.sum(F.col("id_a") * 1000003 + F.col("id_b")), F.lit(0)
                )
                .cast("long")
                .alias("pair_checksum"),
            )
            .crossJoin(F.broadcast(intra))
            .select(
                "n_bands",
                "rows_per_band",
                "n_candidates",
                (F.col("pwsum") + F.col("ip")).cast("long").alias("n_expanded"),
                "pair_checksum",
            )
        )
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out


# --------------------------------------------------------------------------
# Streaming Holt forecast — daily counts are addition-mergeable, so the
# stream sinks per-batch (event_type, day, n) partials and the exact
# dyadic fold runs once at read-back: stream ≡ batch ≡ SQL under the
# batch twin's oracle.
# --------------------------------------------------------------------------


@query("stream_holt_forecast", oracle=_HOLT_ORACLE)
def stream_holt_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events_holt_forecast as a REAL availableNow stream of additive
    daily-count partials."""
    from jhu_data_parser_spark.streaming.jobs import run_holt_forecast_stream

    return run_holt_forecast_stream(spark, sf_dir)


# --------------------------------------------------------------------------
# Market-basket pair mining (a-priori level 2) — co-purchased part
# pairs with support and lift over order baskets. Pairs enumerate
# WITHIN an order (baskets are bounded — the natural key), so the
# self-join is linear in orders; lift is one IEEE divide of exact
# int64 products (< 2^53), gated at floor(1e9·x).
# --------------------------------------------------------------------------

_BASKET_ORACLE = """
    WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    n AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n FROM b),
    sup AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS s
            FROM b GROUP BY 1),
    pairs AS (
      SELECT a.l_partkey AS part_a, c.l_partkey AS part_b,
             CAST(COUNT(*) AS BIGINT) AS sup_ab
      FROM b a JOIN b c
        ON a.l_orderkey = c.l_orderkey AND a.l_partkey < c.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= 2)
    SELECT part_a, part_b, sup_ab,
           CAST(floor(1000000000.0 *
             (CAST(p.sup_ab * n.n AS DOUBLE)
              / CAST(sa.s * sb.s AS DOUBLE))) AS BIGINT) AS lift_nano
    FROM pairs p
    JOIN sup sa ON sa.l_partkey = p.part_a
    JOIN sup sb ON sb.l_partkey = p.part_b, n
    ORDER BY sup_ab DESC, part_a, part_b LIMIT 50
    """


@query("agg_market_basket_pairs", oracle=_BASKET_ORACLE)
def agg_market_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 co-purchased part pairs by support, with exact
    fixed-point lift. Within-order pair enumeration (bounded baskets),
    one aggregate per level, TakeOrderedAndProject top-k."""
    li = load_table(spark, sf_dir, "lineitem")
    # ONE shuffle builds the basket table (collect_set dedups in the
    # same pass); pairs expand INSIDE the bounded basket array (<= ~7
    # items — safe from the dense-bucket expansion trap) and the
    # lazily-checkpointed baskets feed the n / sup / pairs branches.
    # Measured vs the (order,part) self-join at 100x: 37.6 -> 28.1 s
    # cold, 1.2 s warm.
    g = (
        li.groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("ps"))
        .localCheckpoint(eager=False)
    )
    n = g.agg(F.count(F.lit(1)).cast("long").alias("n"))
    sup = (
        g.select(F.explode("ps").alias("l_partkey"))
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).cast("long").alias("s"))
    )
    pairs = (
        g.select(
            F.explode(
                F.expr(
                    "flatten(transform(ps, (x, i) -> transform("
                    "slice(ps, i + 2, size(ps) - i - 1),"
                    " y -> struct(x AS part_a, y AS part_b))))"
                )
            ).alias("p")
        )
        .select("p.part_a", "p.part_b")
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).cast("long").alias("sup_ab"))
        .filter(F.col("sup_ab") >= 2)
    )
    sa = sup.select(F.col("l_partkey").alias("part_a"), F.col("s").alias("sa"))
    sb = sup.select(F.col("l_partkey").alias("part_b"), F.col("s").alias("sb"))
    out = (
        pairs.join(F.broadcast(sa), "part_a")
        .join(F.broadcast(sb), "part_b")
        .crossJoin(F.broadcast(n))
        .select(
            "part_a",
            "part_b",
            "sup_ab",
            F.expr(
                "CAST(floor(1000000000.0 * (CAST(sup_ab * n AS DOUBLE)"
                " / CAST(sa * sb AS DOUBLE))) AS BIGINT)"
            ).alias("lift_nano"),
        )
    )
    return out.orderBy(
        F.col("sup_ab").desc(), F.col("part_a"), F.col("part_b")
    ).limit(50)


# --------------------------------------------------------------------------
# SCD2 time-travel read — the AS OF query over the dimension history
# built by scd2_event_state_history: each user's state at a fixed
# instant, rolled up per state. The filter is pure integer epoch-
# microsecond interval containment on the history table; at scale this
# is the partition-prunable read every lakehouse time-travel serves.
# --------------------------------------------------------------------------

_ASOF_US = 1_705_320_000_000_000  # 2024-01-15 12:00:00 UTC

_SCD2_ASOF_ORACLE = f"""
    WITH o AS (
      SELECT user_id, event_type, ts, event_id,
             CASE WHEN lag(event_type) OVER
                         (PARTITION BY user_id ORDER BY ts, event_id)
                       IS DISTINCT FROM event_type
                  THEN 1 ELSE 0 END AS chg
      FROM events),
    v AS (
      SELECT user_id, event_type, ts,
             SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS version
      FROM o),
    g AS (
      SELECT user_id, version, MIN(event_type) AS state,
             MIN(ts) AS vf
      FROM v GROUP BY 1, 2),
    h AS (
      SELECT user_id, state,
             epoch_us(vf) AS valid_from_us,
             epoch_us(lead(vf) OVER (PARTITION BY user_id ORDER BY version))
               AS valid_to_us
      FROM g)
    SELECT state,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(user_id) AS BIGINT) AS user_checksum,
           CAST(MIN(valid_from_us) AS BIGINT) AS earliest_since_us
    FROM h
    WHERE valid_from_us <= {_ASOF_US}
      AND (valid_to_us IS NULL OR valid_to_us > {_ASOF_US})
    GROUP BY 1
    """


@query("scd2_as_of_read", oracle=_SCD2_ASOF_ORACLE)
def scd2_as_of_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-travel read: every user's state AS OF 2024-01-15 12:00 UTC
    from the SCD2 history, rolled up per state."""
    from jhu_data_parser_spark.plans.pipeline4 import scd2_event_state_history

    h = scd2_event_state_history(spark, sf_dir)
    asof = h.filter(
        (F.col("valid_from_us") <= _ASOF_US)
        & (F.col("valid_to_us").isNull() | (F.col("valid_to_us") > _ASOF_US))
    )
    return asof.groupBy("state").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("user_id").cast("long").alias("user_checksum"),
        F.min("valid_from_us").cast("long").alias("earliest_since_us"),
    )


# --------------------------------------------------------------------------
# Batch Matryoshka serving — completes the MRL serving matrix
# ({single, batch}): one corpus scan scores the 16-dim prefix for
# every query in the request batch, row_number()<=32 compiles to
# WindowGroupLimit (per-task partial shortlist before the shuffle),
# and the exact full-dim re-rank touches only 32 rows per query.
# --------------------------------------------------------------------------

_MRL_MULTI_ORACLE = """
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
               FROM embeddings WHERE vec_id >= 5),
    q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qemb
          FROM embeddings WHERE vec_id < 5),
    pre AS (
      SELECT q.query_id, e.vec_id, e.emb, q.qemb,
             row_number() OVER (
               PARTITION BY q.query_id
               ORDER BY list_dot_product(e.emb[1:16], q.qemb[1:16])
                 / (sqrt(list_dot_product(e.emb[1:16], e.emb[1:16]))
                    * sqrt(list_dot_product(q.qemb[1:16], q.qemb[1:16]))) DESC,
                 e.vec_id) AS prk
      FROM e, q),
    short AS (SELECT * FROM pre WHERE prk <= 32),
    rr AS (
      SELECT query_id, vec_id,
             row_number() OVER (
               PARTITION BY query_id
               ORDER BY list_dot_product(emb, qemb)
                 / (sqrt(list_dot_product(emb, emb))
                    * sqrt(list_dot_product(qemb, qemb))) DESC,
                 vec_id) AS rank
      FROM short)
    SELECT query_id, vec_id, CAST(rank AS INT) AS rank
    FROM rr WHERE rank <= 5
    """


@query("sim_cosine_topk_matryoshka_multi", oracle=_MRL_MULTI_ORACLE)
def sim_cosine_topk_matryoshka_multi(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Batch MRL serving: per-query 32-row prefix-dim shortlists off
    ONE corpus scan (WindowGroupLimit), exact full-dim re-rank, top-5
    per query."""
    e = load_table(spark, sf_dir, "embeddings")
    corpus = e.filter(F.col("vec_id") >= 5)
    queries = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qemb")
    )
    scored = corpus.join(F.broadcast(queries)).withColumn(
        "psim",
        sim.cosine(
            F.slice(F.col("embedding"), 1, 16), F.slice(F.col("qemb"), 1, 16)
        ),
    )
    wpre = Window.partitionBy("query_id").orderBy(
        F.col("psim").desc(), F.col("vec_id")
    )
    short = scored.withColumn("prk", F.row_number().over(wpre)).filter(
        F.col("prk") <= 32
    )
    rr = short.withColumn(
        "sim", sim.cosine(F.col("embedding"), F.col("qemb"))
    )
    wrr = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("vec_id")
    )
    return (
        rr.withColumn("rank", F.row_number().over(wrr).cast("int"))
        .filter(F.col("rank") <= 5)
        .select("query_id", "vec_id", "rank")
    )


# --------------------------------------------------------------------------
# Curation funnel v4 — this session's operators composed end-to-end,
# the CCNet-flavored variant of funnels v2/v3: raw → drop the
# benchmark/eval docs → Kneser-Ney fluency cut (keep the head+middle
# perplexity terciles per language) → Bloom-bitmap decontamination →
# class-balanced undersampling; one yield table (stage, n_docs,
# id_checksum). Every stage reuses the verified standalone core
# (_kn_doc_ppx, bloom_flagged_docs, the md5 balance draw); the reused
# frames are lazily checkpointed across the stage aggregates, and the
# oracle marks multi-referenced CTEs AS MATERIALIZED (the recorded
# DuckDB-inlining lesson).
# --------------------------------------------------------------------------


def _funnel_v4_oracle() -> str:
    from jhu_data_parser_spark.plans.pipeline15 import (
        _KN_PD_CHAIN,
        _bloom_oracle,
    )

    kn = _KN_PD_CHAIN.strip()
    assert kn.startswith("WITH")
    kn = kn[4:].strip()  # the KN CTE list: d, bg, cb, cp, cw, b, pd
    bloom_sql = _bloom_oracle()
    bloom = bloom_sql[: bloom_sql.rindex("SELECT doc_id,")].strip()
    assert bloom.startswith("WITH")
    bloom = bloom[4:].strip().rstrip(",")  # toks..probed (no name clashes)
    return f"""
    WITH {kn},
    {bloom},
    dirty AS MATERIALIZED (
      SELECT DISTINCT doc_id FROM probed WHERE bloom_hit = 1),
    ranked AS (
      SELECT doc_id, lang,
             CAST(row_number() OVER (PARTITION BY lang
                    ORDER BY ppx_micro, doc_id) AS BIGINT) AS rk,
             CAST(COUNT(*) OVER (PARTITION BY lang) AS BIGINT) AS nl
      FROM pd WHERE doc_id % 97 <> 0),
    fluent AS MATERIALIZED (
      SELECT doc_id, lang FROM ranked WHERE (3 * (rk - 1)) // nl <= 1),
    surv AS MATERIALIZED (
      SELECT f.doc_id, f.lang FROM fluent f
      WHERE f.doc_id NOT IN (SELECT doc_id FROM dirty)),
    nmin AS (SELECT MIN(cnt) AS m FROM
             (SELECT lang, COUNT(*) AS cnt FROM surv GROUP BY 1)),
    bal AS (
      SELECT doc_id FROM
        (SELECT doc_id,
                row_number() OVER (PARTITION BY lang
                  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
         FROM surv), nmin
      WHERE rk <= m)
    SELECT '0_raw' AS stage, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(doc_id) AS BIGINT) AS id_checksum FROM documents
    UNION ALL
    SELECT '1_corpus', CAST(COUNT(*) AS BIGINT), CAST(SUM(doc_id) AS BIGINT)
    FROM documents WHERE doc_id % 97 <> 0
    UNION ALL
    SELECT '2_fluent', CAST(COUNT(*) AS BIGINT), CAST(SUM(doc_id) AS BIGINT)
    FROM fluent
    UNION ALL
    SELECT '3_decontaminated', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(doc_id) AS BIGINT)
    FROM surv
    UNION ALL
    SELECT '4_balanced', CAST(COUNT(*) AS BIGINT), CAST(SUM(doc_id) AS BIGINT)
    FROM bal
    """


@query("pipeline_curation_funnel_v4", oracle=_funnel_v4_oracle())
def pipeline_curation_funnel_v4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-flavored curation funnel: benchmark split-off → KN
    fluency terciles (keep head+middle per language) → Bloom
    decontamination → class balancing; per-stage yield rows."""
    from jhu_data_parser_spark.plans.pipeline15 import (
        _kn_doc_ppx,
        bloom_flagged_docs,
    )

    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    pdf = _kn_doc_ppx(spark, sf_dir).filter(F.col("doc_id") % 97 != 0)
    wl = Window.partitionBy("lang").orderBy("ppx_micro", "doc_id")
    ranked = pdf.withColumn(
        "rk", F.row_number().over(wl).cast("long")
    ).withColumn(
        "nl", F.count(F.lit(1)).over(Window.partitionBy("lang")).cast("long")
    )
    fluent = (
        ranked.filter(F.expr("(3 * (rk - 1)) DIV nl <= 1"))
        .select("doc_id", "lang")
        .localCheckpoint(eager=False)
    )
    dirty = bloom_flagged_docs(spark, sf_dir)
    surv = fluent.join(dirty, "doc_id", "left_anti").localCheckpoint(
        eager=False
    )
    nmin = surv.groupBy("lang").agg(F.count(F.lit(1)).alias("cnt")).agg(
        F.min("cnt").alias("m")
    )
    wb = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    bal = (
        surv.withColumn("rk", F.row_number().over(wb).cast("long"))
        .crossJoin(F.broadcast(nmin))
        .filter(F.col("rk") <= F.col("m"))
        .select("doc_id")
    )

    def _stage(df: DataFrame, name: str) -> DataFrame:
        return df.agg(
            F.lit(name).alias("stage"),
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("doc_id").cast("long").alias("id_checksum"),
        )

    out = _stage(d, "0_raw")
    for frame, name in (
        (d.filter(F.col("doc_id") % 97 != 0), "1_corpus"),
        (fluent, "2_fluent"),
        (surv, "3_decontaminated"),
        (bal, "4_balanced"),
    ):
        out = out.unionByName(_stage(frame, name))
    return out


# --------------------------------------------------------------------------
# Energy-gated VAD segmentation — the silence-trimming pass an audio
# curation pipeline runs before modeling: 16 balanced frames per clip
# through the REAL RIFF/WAVE parse, a frame is "voiced" iff its mean
# |sample| exceeds the half-range (Σ|v| > 16384·n — integer-exact), and
# voiced runs collapse to segments via gaps-and-islands. The oracle
# replays frame energies from the PCM recurrence (doc_id·7919 +
# i·104729) % 65536 − 32768 without seeing a byte.
# --------------------------------------------------------------------------

_VAD_FRAMES = 16

_VAD_ORACLE = f"""
    WITH base AS (
      SELECT doc_id, doc_id % 192 + 64 AS n FROM documents),
    s AS (
      SELECT b.doc_id, b.n, g.i,
             (b.doc_id * 7919 + g.i * 104729) % 65536 - 32768 AS v
      FROM base b CROSS JOIN generate_series(0, 255) g(i)
      WHERE g.i < b.n),
    fe AS (
      SELECT doc_id, ({_VAD_FRAMES} * i) // n AS frame,
             CAST(SUM(abs(v)) AS BIGINT) AS e,
             CAST(COUNT(*) AS BIGINT) AS ns
      FROM s GROUP BY 1, 2),
    voiced AS (
      SELECT doc_id, frame FROM fe WHERE e > 16384 * ns),
    isl AS (
      SELECT doc_id, frame,
             frame - row_number() OVER (PARTITION BY doc_id ORDER BY frame)
               AS grp
      FROM voiced),
    seg AS (
      SELECT doc_id, grp, CAST(COUNT(*) AS BIGINT) AS len
      FROM isl GROUP BY 1, 2)
    SELECT doc_id,
           CAST(SUM(len) AS BIGINT) AS n_voiced,
           CAST(COUNT(*) AS BIGINT) AS n_segments,
           CAST(MAX(len) AS BIGINT) AS longest_run
    FROM seg GROUP BY 1
    """


@query("multimodal_audio_vad_segments", oracle=_VAD_ORACLE)
def multimodal_audio_vad_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Voice-activity segments per clip: 16-frame energy gate over the
    real WAV decode, voiced runs collapsed gaps-and-islands; per doc the
    voiced-frame count, segment count, and longest run."""
    from jhu_data_parser_spark.operators.multimodal import (
        attach_audio,
        extract_audio_frames,
    )

    d = attach_audio(load_table(spark, sf_dir, "documents"))
    fe = extract_audio_frames(d, n_frames=_VAD_FRAMES)
    voiced = fe.filter(
        F.col("abs_energy") > 16384 * F.col("n_samples")
    ).select("doc_id", "frame")
    isl = voiced.withColumn(
        "grp",
        F.col("frame")
        - F.row_number().over(
            Window.partitionBy("doc_id").orderBy("frame")
        ),
    )
    seg = isl.groupBy("doc_id", "grp").agg(
        F.count(F.lit(1)).cast("long").alias("len")
    )
    return seg.groupBy("doc_id").agg(
        F.sum("len").cast("long").alias("n_voiced"),
        F.count(F.lit(1)).cast("long").alias("n_segments"),
        F.max("len").cast("long").alias("longest_run"),
    )


# --------------------------------------------------------------------------
# Conversion-latency histogram — per user, the first 'click' to the
# first STRICTLY-LATER 'purchase'; latencies bucketed by hour. Exact
# epoch-microsecond arithmetic end to end.
# --------------------------------------------------------------------------

_CONV_ORACLE = """
    WITH fc AS (
      SELECT user_id, MIN(epoch_us(ts)) AS c_us
      FROM events WHERE event_type = 'click' GROUP BY 1),
    fp AS (
      SELECT e.user_id, MIN(epoch_us(e.ts)) AS p_us
      FROM events e JOIN fc ON e.user_id = fc.user_id
      WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > fc.c_us
      GROUP BY 1),
    lat AS (
      SELECT fc.user_id, (fp.p_us - fc.c_us) // 3600000000 AS hour_bucket
      FROM fc JOIN fp ON fc.user_id = fp.user_id)
    SELECT CAST(hour_bucket AS BIGINT) AS hour_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(user_id) AS BIGINT) AS user_checksum
    FROM lat GROUP BY 1
    """


@query("events_conversion_latency", oracle=_CONV_ORACLE)
def events_conversion_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-click → first-later-purchase latency histogram (hour
    buckets) with user checksums."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.expr("unix_micros(ts)").alias("us")
    )
    fc = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.min("us").alias("c_us"))
    )
    fp = (
        ev.filter(F.col("event_type") == "purchase")
        .join(fc, "user_id")
        .filter(F.col("us") > F.col("c_us"))
        .groupBy("user_id")
        .agg(F.min("us").alias("p_us"))
    )
    lat = fc.join(fp, "user_id").select(
        "user_id",
        F.expr("(p_us - c_us) DIV 3600000000").alias("hour_bucket"),
    )
    return lat.groupBy(F.col("hour_bucket").cast("long").alias("hour_bucket")).agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("user_id").cast("long").alias("user_checksum"),
    )


# --------------------------------------------------------------------------
# RFM segmentation — recency / frequency / monetary quintiles per user
# (the classic CRM cut): recency = whole days between the user's last
# event and the corpus frontier, frequency = event count, monetary =
# exact micro-value mass; each dimension ntile(5)'d with a user_id
# tiebreak (deterministic total order), segment code = r·100+f·10+m.
# One per-user aggregate + three bounded ntile windows over the
# per-user table (users ≪ events); output ≤ 125 segment rows.
# --------------------------------------------------------------------------

_RFM_ORACLE = """
    WITH u AS (
      SELECT user_id,
             MAX(epoch_us(ts)) AS last_us,
             CAST(COUNT(*) AS BIGINT) AS freq,
             CAST(SUM(CAST(floor(1000000.0 * value) AS BIGINT)) AS BIGINT)
               AS money
      FROM events GROUP BY 1),
    fr AS (SELECT MAX(last_us) AS f_us FROM u),
    d AS (
      SELECT user_id, freq, money,
             CAST((fr.f_us - last_us) // 86400000000 AS BIGINT) AS rec_days
      FROM u, fr),
    q AS (
      SELECT user_id,
             ntile(5) OVER (ORDER BY rec_days, user_id) AS r,
             ntile(5) OVER (ORDER BY freq DESC, user_id) AS f,
             ntile(5) OVER (ORDER BY money DESC, user_id) AS m
      FROM d)
    SELECT CAST(r * 100 + f * 10 + m AS INT) AS segment,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(user_id) AS BIGINT) AS user_checksum
    FROM q GROUP BY 1
    """


def _ntile_from_rank(rk, n, tiles: int):
    """SQL-exact ntile(tiles) from a 1-based dense unique rank ``rk``
    over ``n`` rows, as pure integer arithmetic (no window): the first
    ``n % tiles`` buckets hold ``n DIV tiles + 1`` rows, the rest hold
    ``n DIV tiles``. ``greatest(q, 1)`` guards the n < tiles case where
    the otherwise-branch denominator would be 0 under ANSI mode (that
    branch is never taken then — every row satisfies rk <= rem)."""
    q = F.floor(n / F.lit(tiles))
    rem = n % F.lit(tiles)
    big = rem * (q + 1)
    return (
        F.when(rk <= big, F.floor((rk + q) / (q + 1)))
        .otherwise(
            rem + F.floor((rk - big + q - 1) / F.greatest(q, F.lit(1)))
        )
        .cast("int")
    )


@query("events_rfm_segments", oracle=_RFM_ORACLE)
def events_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM quintile segmentation with deterministic ntile tiebreaks;
    per segment-code user counts and checksums. NO global ntile window:
    each dimension's 1-based unique rank comes from the ADAPTIVE global
    rank (operators/intervals.adaptive_global_rank — one single-task
    running sum under the ~10⁸-row crossover where it measures 2-3×
    faster, the distributed two-level prefix sum above it where a
    single sort task can no longer hold the run),
    and ntile(5) is recovered from (rank, n) by integer arithmetic
    (_ntile_from_rank; n rides the same 1-row broadcast as the corpus
    frontier). Descending dimensions rank on the negated key. The
    per-user table is localCheckpoint(eager=False)'d once — it feeds
    three rank branches plus their quantile probes, and re-deriving the
    events aggregation 6× is the worse trade (storage cost: one
    |users|-row cached table, evicted with the session)."""
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.max(F.expr("unix_micros(ts)")).alias("last_us"),
        F.count(F.lit(1)).cast("long").alias("freq"),
        F.sum(F.expr("CAST(floor(1000000.0 * value) AS BIGINT)"))
        .cast("long")
        .alias("money"),
    )
    fr = u.agg(
        F.max("last_us").alias("f_us"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    d = (
        u.crossJoin(F.broadcast(fr))
        .select(
            "user_id",
            "freq",
            "money",
            "n",
            F.expr("CAST((f_us - last_us) DIV 86400000000 AS BIGINT)").alias(
                "rec_days"
            ),
        )
        .localCheckpoint(eager=False)
    )
    from jhu_data_parser_spark.operators.intervals import adaptive_global_rank

    # One count over the checkpointed per-user table picks the rank
    # strategy for all three dimensions (adaptive crossover — see
    # sample_systematic_every_k's docstring) and warms the checkpoint
    # the three branches reuse.
    n_users = d.count()

    def dim_rank(sort_col, alias: str) -> DataFrame:
        ranked = adaptive_global_rank(
            d.select(
                "user_id", sort_col.alias("__k"), F.lit(1).alias("__w")
            ),
            ["__k", "user_id"],
            "__w",
            n_rows=n_users,
        )
        return ranked.select("user_id", F.col("rank").alias(alias))
    q = (
        d.join(dim_rank(F.col("rec_days"), "rk_r"), "user_id")
        .join(dim_rank(-F.col("freq"), "rk_f"), "user_id")
        .join(dim_rank(-F.col("money"), "rk_m"), "user_id")
        .select(
            "user_id",
            _ntile_from_rank(F.col("rk_r"), F.col("n"), 5).alias("r"),
            _ntile_from_rank(F.col("rk_f"), F.col("n"), 5).alias("f"),
            _ntile_from_rank(F.col("rk_m"), F.col("n"), 5).alias("m"),
        )
    )
    return q.groupBy(
        F.expr("CAST(r * 100 + f * 10 + m AS INT)").alias("segment")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("user_id").cast("long").alias("user_checksum"),
    )
