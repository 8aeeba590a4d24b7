"""Catalog wave 23 — round 10: post-training data assembly.

The missing second half of an LLM data engine (r9 verdict item 3):
every public stack pairs pretraining curation with SFT / preference
assembly. Four batch operators over the synthetic tables:

- ``pairs_preference_assembly`` — chosen/rejected preference pairs per
  prompt group with deterministic tie-breaks (the DPO/RLHF input table);
- ``dedup_prompt_groups`` — prompt-group dedup on a normalized
  representative-text fingerprint (prompt sets must dedup BEFORE
  pairing or the same comparison is trained twice);
- ``dialog_thread_turns`` — conversation-turn threading over the
  events stream: gap sessionization → role runs → one row per turn
  (the U1/U2 reshape applied to dialogue);
- ``sample_eval_holdout_pairs`` — leakage-safe eval holdout: the split
  is a deterministic md5 draw on the PROMPT key, so no prompt ever
  contributes pairs to both splits.

Reference parity note: the reference (/root/reference) has no
post-training surface — [extension] operators (SURVEY.md §2.12).

Determinism discipline: ranking scores are exact int64 (token counts ×
1e5 + capped milli mean-token-length), tie-breaks are total orders on
doc_id, and split draws are md5 uniforms against integer thresholds —
every decision replays bit-for-bit in DuckDB.

Scale posture: prompt-group operators are one hash shuffle on
prompt_id (map-side-combinable struct min/max aggregates — no window
sort); threading is the sessionize shape (one user_id exchange, all
windows partitioned); the holdout is a scan-level filter on a hash of
the group key. No global sorts, no driver-side state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from jhu_data_parser_spark.operators.text import SHINGLE8_TOKS_SQL
from jhu_data_parser_spark.plans.catalog import query
from jhu_data_parser_spark.sources.tables import load_table

_TS_FMT = "yyyy-MM-dd HH:mm:ss"
_TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S"

# --------------------------------------------------------------------------
# Shared prompt-group model: consecutive documents form a candidate
# pool for one synthetic prompt (doc_id DIV _GROUP span), mirroring how
# K sampled completions per prompt land adjacently in a generation
# log. The ranking score is exact-integer: token count dominates
# (×1e5), capped milli mean-token-length refines ties, doc_id totals
# the order.
# --------------------------------------------------------------------------

_GROUP = 8

# DuckDB: exact-integer candidate score. len(string_split) counts
# whitespace tokens exactly like Spark's size(split) on the same text.
_SCORE_DUCK = (
    "(CAST(len(string_split(text, ' ')) AS BIGINT) * 100000"
    " + LEAST((CAST(length(replace(text, ' ', '')) AS BIGINT) * 1000)"
    " // len(string_split(text, ' ')), 99999))"
)

_CAND_DUCK = f"""
      SELECT doc_id, doc_id // {_GROUP} AS prompt_id, lang,
             {_SCORE_DUCK} AS score
      FROM documents WHERE length(text) > 0
"""


# Spark twin of _SCORE_DUCK — integer DIV (never double division: the
# truncating double quotient is only probabilistically equal to exact
# floor division).
_SCORE_SPARK = (
    "CAST(size(split(text, ' ')) AS BIGINT) * 100000"
    " + LEAST((CAST(length(replace(text, ' ', '')) AS BIGINT) * 1000)"
    " DIV CAST(size(split(text, ' ')) AS BIGINT), CAST(99999 AS BIGINT))"
)


def _candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    return d.select(
        "doc_id",
        F.expr(f"doc_id DIV {_GROUP}").alias("prompt_id"),
        "lang",
        F.expr(_SCORE_SPARK).alias("score"),
    )


# --------------------------------------------------------------------------
# ★ pairs_preference_assembly — the DPO input table: per prompt, the
# deterministically-chosen best candidate paired against EVERY other
# candidate (the standard best-vs-rest pairing), with the exact score
# margin. Chosen = max score, ties to the LOWER doc_id.
#
# Plan: ONE hash exchange on prompt_id; the chosen candidate is a
# max(struct(score, -doc_id)) window aggregate over the unbounded
# partition frame (no ORDER BY → no per-group sort), then a filter
# keeps the rejected rows. No join, no global sort.
# --------------------------------------------------------------------------

_PAIRS_DUCK = f"""
    WITH c AS ({_CAND_DUCK}),
    ch AS (
      SELECT prompt_id, doc_id AS chosen_doc_id, score AS chosen_score
      FROM (SELECT *, row_number() OVER (PARTITION BY prompt_id
                    ORDER BY score DESC, doc_id ASC) AS rk FROM c)
      WHERE rk = 1)
    SELECT c.prompt_id AS prompt_id,
           ch.chosen_doc_id AS chosen_doc_id,
           c.doc_id AS rejected_doc_id,
           CAST(ch.chosen_score - c.score AS BIGINT) AS margin
    FROM c JOIN ch ON c.prompt_id = ch.prompt_id
    WHERE c.doc_id <> ch.chosen_doc_id
"""


def _pref_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _candidates(spark, sf_dir)
    w = Window.partitionBy("prompt_id")
    ch = F.max(F.struct(F.col("score"), (-F.col("doc_id")).alias("nd"))).over(w)
    return (
        c.withColumn("chosen_doc_id", -ch.getField("nd"))
        .withColumn("margin", ch.getField("score") - F.col("score"))
        .filter(F.col("doc_id") != F.col("chosen_doc_id"))
        .select(
            "prompt_id",
            "chosen_doc_id",
            F.col("doc_id").alias("rejected_doc_id"),
            F.col("margin").cast("long").alias("margin"),
        )
    )


@query("pairs_preference_assembly", oracle=_PAIRS_DUCK)
def pairs_preference_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best-vs-rest preference pairs per prompt group: (chosen,
    rejected, exact margin) rows, chosen by max(score, tie→low doc_id).
    One prompt_id exchange, sort-free window aggregate, no join."""
    return _pref_pairs(spark, sf_dir)


# --------------------------------------------------------------------------
# ★ dedup_prompt_groups — prompt-group dedup: two prompts whose
# REPRESENTATIVE candidate (lowest doc_id — the original completion
# every pool is seeded from) normalizes to the same text are the same
# prompt; keep the lowest prompt_id as canonical. Normalization folds
# case and collapses non-alphanumeric runs — the same class of
# canonicalization dedup_url_canonical applies to URLs.
# Per-lang accounting: total prompts, canonical survivors, duplicates
# removed, and the canonical prompt-id checksum.
# --------------------------------------------------------------------------

_PROMPT_DEDUP_ORACLE = f"""
    WITH fps AS (
      SELECT doc_id, doc_id // {_GROUP} AS prompt_id, lang,
             md5(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS fp
      FROM documents WHERE length(text) > 0),
    rep AS (
      SELECT prompt_id,
             arg_min(lang, doc_id) AS lang,
             arg_min(fp, doc_id) AS fp
      FROM fps GROUP BY 1),
    g AS (
      SELECT lang, fp,
             CAST(COUNT(*) AS BIGINT) AS n_prompts,
             CAST(MIN(prompt_id) AS BIGINT) AS canon_prompt
      FROM rep GROUP BY 1, 2)
    SELECT lang,
           CAST(SUM(n_prompts) AS BIGINT) AS n_prompts,
           CAST(COUNT(*) AS BIGINT) AS n_canonical,
           CAST(SUM(n_prompts) - COUNT(*) AS BIGINT) AS n_dups,
           CAST(SUM(canon_prompt) AS BIGINT) AS canon_checksum
    FROM g GROUP BY 1
    """


@query("dedup_prompt_groups", oracle=_PROMPT_DEDUP_ORACLE)
def dedup_prompt_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prompt-group dedup on the md5 fingerprint of the representative
    candidate's normalized text; per-lang survivor accounting. The
    fingerprint is computed MAP-SIDE per document (32 hex chars cross
    the shuffle, never the text), then two map-side-combinable
    aggregates (prompt rep via min_by → fingerprint group) — no window
    sort anywhere."""
    d = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    fps = d.select(
        F.expr(f"doc_id DIV {_GROUP}").alias("prompt_id"),
        "doc_id",
        "lang",
        F.md5(
            F.regexp_replace(F.lower("text"), "[^a-z0-9]+", " ").cast(
                "binary"
            )
        ).alias("fp"),
    )
    rep = fps.groupBy("prompt_id").agg(
        F.min_by("lang", "doc_id").alias("lang"),
        F.min_by("fp", "doc_id").alias("fp"),
    )
    g = rep.groupBy("lang", "fp").agg(
        F.count(F.lit(1)).cast("long").alias("n_prompts"),
        F.min("prompt_id").cast("long").alias("canon_prompt"),
    )
    return g.groupBy("lang").agg(
        F.sum("n_prompts").cast("long").alias("n_prompts"),
        F.count(F.lit(1)).cast("long").alias("n_canonical"),
        (F.sum("n_prompts") - F.count(F.lit(1)))
        .cast("long")
        .alias("n_dups"),
        F.sum("canon_prompt").cast("long").alias("canon_checksum"),
    )


# --------------------------------------------------------------------------
# ★ dialog_thread_turns — conversation threading: sessionize each
# user's event stream at >30-min gaps (the events_sessionize rule),
# map event types to dialogue roles (user-initiated click/purchase/
# signup = 'user'; system-emitted view/error = 'assistant'), then
# merge CONSECUTIVE same-role events into turns. One row per turn with
# its within-session index, event count, id checksum and span — the
# row-form threading a dialogue SFT pipeline needs (array forms
# explode back to exactly these rows).
# --------------------------------------------------------------------------

_GAP_SEC = 1800.0
# single source of truth for the role mapping — the batch plan, the
# DuckDB oracle and the incremental stream (streaming/jobs.py) must
# never disagree on it, or the shared-oracle equivalence breaks.
_USER_ROLE_TYPES = ("click", "purchase", "signup")
_ROLE_DUCK = (
    f"CASE WHEN event_type IN {_USER_ROLE_TYPES!r}"
    " THEN 'user' ELSE 'assistant' END"
)


def dialog_role_expr():
    """Spark twin of _ROLE_DUCK."""
    return F.when(
        F.col("event_type").isin(*_USER_ROLE_TYPES), "user"
    ).otherwise("assistant")

# CTE body shared by the threading oracle and the SFT-packing oracle
# (same sessionization + role-run merge; the packer adds one more
# windowed running sum over the turn table).
_THREAD_CTES = f"""e AS (
      SELECT user_id, event_id, ts, {_ROLE_DUCK} AS role
      FROM events),
    g AS (
      SELECT *,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch(ts) - lag(epoch(ts)) OVER w > {_GAP_SEC}
                  THEN 1 ELSE 0 END AS new_sess,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch(ts) - lag(epoch(ts)) OVER w > {_GAP_SEC}
                       OR role <> lag(role) OVER w
                  THEN 1 ELSE 0 END AS new_turn
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    s AS (
      SELECT *,
             SUM(new_sess) OVER wp AS session_no,
             SUM(new_turn) OVER wp AS turn_no
      FROM g
      WINDOW wp AS (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS UNBOUNDED PRECEDING)),
    t AS (
      SELECT user_id, session_no, turn_no, role,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(SUM(event_id) AS BIGINT) AS evt_checksum,
             strftime(MIN(ts), '{_TS_FMT_DUCK}') AS turn_start,
             strftime(MAX(ts), '{_TS_FMT_DUCK}') AS turn_end,
             CAST(MIN(epoch_us(ts)) AS BIGINT) AS start_us,
             CAST(MAX(epoch_us(ts)) AS BIGINT) AS end_us
      FROM s GROUP BY 1, 2, 3, 4)"""

_THREAD_ORACLE = f"""
    WITH {_THREAD_CTES}
    SELECT user_id,
           CAST(session_no AS BIGINT) AS session_no,
           CAST(turn_no - MIN(turn_no) OVER (PARTITION BY user_id, session_no)
                + 1 AS BIGINT) AS turn_idx,
           role, n_events, evt_checksum, turn_start, turn_end
    FROM t
    """


def _dialog_turns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-turn table (threading core, shared by the turn gate, the
    SFT packer and the latency report): one row per role-run turn with
    session/turn numbers, counts, checksum and both string- and
    micros-typed span bounds."""
    ev = load_table(spark, sf_dir, "events")
    role = dialog_role_expr()
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sec = F.col("ts").cast("timestamp").cast("double")
    prev = F.lag(sec).over(w)
    gap = prev.isNull() | (sec - prev > _GAP_SEC)
    e = ev.select("user_id", "event_id", "ts", role.alias("role"))
    g = e.withColumn("new_sess", F.when(gap, 1).otherwise(0)).withColumn(
        "new_turn",
        F.when(gap | (F.col("role") != F.lag("role").over(w)), 1).otherwise(0),
    )
    wp = w.rowsBetween(Window.unboundedPreceding, 0)
    s = g.withColumn("session_no", F.sum("new_sess").over(wp)).withColumn(
        "turn_no", F.sum("new_turn").over(wp)
    )
    t = s.groupBy("user_id", "session_no", "turn_no", "role").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum("event_id").cast("long").alias("evt_checksum"),
        F.date_format(F.min("ts"), _TS_FMT).alias("turn_start"),
        F.date_format(F.max("ts"), _TS_FMT).alias("turn_end"),
        F.min(F.expr("unix_micros(ts)")).cast("long").alias("start_us"),
        F.max(F.expr("unix_micros(ts)")).cast("long").alias("end_us"),
    )
    w_sess = Window.partitionBy("user_id", "session_no")
    return t.withColumn(
        "turn_idx",
        (F.col("turn_no") - F.min("turn_no").over(w_sess) + 1).cast("long"),
    ).withColumn("session_no", F.col("session_no").cast("long"))


@query("dialog_thread_turns", oracle=_THREAD_ORACLE)
def dialog_thread_turns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-sessionized, role-run-merged dialogue turns, one row per
    turn. Every window partitions by user_id (the turn-index window by
    (user_id, session_no)) — Catalyst reuses ONE user_id exchange for
    the lag flags, both prefix sums and the turn aggregate; no global
    sort anywhere."""
    return _dialog_turns(spark, sf_dir).select(
        "user_id",
        "session_no",
        "turn_idx",
        "role",
        "n_events",
        "evt_checksum",
        "turn_start",
        "turn_end",
    )


# --------------------------------------------------------------------------
# ★ sample_eval_holdout_pairs — leakage-safe preference-pair holdout:
# the train/eval decision is a deterministic md5 draw on the PROMPT id
# (never the pair), so all of a prompt's pairs land in ONE split — the
# property that keeps eval prompts out of training (same discipline as
# sample_split_leakage_safe, applied to the post-training table).
# Eval rate = 1/8 exactly: first 12 md5-hex chars as a 48-bit integer
# against the integer threshold 2^48/8.
# --------------------------------------------------------------------------

_EVAL_THRESH = (1 << 48) // 8  # exact integer literal, shared by both engines


def _draw48_duck(prefix: str, key_expr: str) -> str:
    """DuckDB: 48-bit md5 uniform of 'prefix' || key — the single
    source for every deterministic draw in this module (holdout split,
    frozen reward). Built on pipeline6's hex polynomial so the Spark
    twin (:func:`_draw48_spark`) can never drift from it per-site."""
    from jhu_data_parser_spark.plans.pipeline6 import _hexpoly_sql

    return _hexpoly_sql(
        f"md5('{prefix}' || CAST({key_expr} AS VARCHAR))", 12
    )


def _draw48_spark(prefix: str, key_col) -> object:
    """Spark twin of :func:`_draw48_duck`."""
    from jhu_data_parser_spark.plans.pipeline6 import _hex_long

    return _hex_long(
        F.md5(
            F.concat(F.lit(prefix), key_col.cast("string")).cast("binary")
        ),
        12,
    )

_HOLDOUT_ORACLE = f"""
    WITH p AS ({_PAIRS_DUCK}),
    s AS (
      SELECT *,
             CASE WHEN {_draw48_duck("sft:", "prompt_id")} < {_EVAL_THRESH}
                  THEN 'eval' ELSE 'train' END AS split
      FROM p)
    SELECT split,
           CAST(COUNT(DISTINCT prompt_id) AS BIGINT) AS n_prompts,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(chosen_doc_id + rejected_doc_id) AS BIGINT)
             AS pair_checksum
    FROM s GROUP BY 1
    """


@query("sample_eval_holdout_pairs", oracle=_HOLDOUT_ORACLE)
def sample_eval_holdout_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split the preference pairs into train/eval BY PROMPT via a
    deterministic 48-bit md5 draw (eval = 1/8); per-split prompt and
    pair counts plus a composition checksum. The draw is a scan-level
    expression — no extra shuffle beyond the pair assembly's one."""
    pairs = _pref_pairs(spark, sf_dir)
    draw = _draw48_spark("sft:", F.col("prompt_id"))
    s = pairs.withColumn(
        "split",
        F.when(draw < F.lit(_EVAL_THRESH), "eval").otherwise("train"),
    )
    return s.groupBy("split").agg(
        F.countDistinct("prompt_id").cast("long").alias("n_prompts"),
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum(F.col("chosen_doc_id") + F.col("rejected_doc_id"))
        .cast("long")
        .alias("pair_checksum"),
    )


# --------------------------------------------------------------------------
# ★ stream_pack_batches_incremental — r9 verdict item 7 (stretch): the
# INCREMENTAL packed-batch funnel. New crawl chunks arrive as real
# micro-batches; each passes the frozen per-doc gates (funnel-v3
# Gopher thresholds + lang + 8-token-shingle decontamination against
# the frozen benchmark set) and extends the per-source packed-sequence
# table under a carried token offset — idempotent _SUCCESS-gated
# segments + a ≤|sources|-row offset state per batch_id (the
# stream_ivfpq_index_append discipline applied to packing). The oracle
# replays the SAME gates + packing as ONE batch pass over the union,
# so the driver hash proves N micro-batches ≡ the batch funnel.
# Corpus-global stages (URL/near dedup, boilerplate, trained LR, mix)
# are deliberately absent from this gate — each has its own
# incremental operator (see streaming/jobs._pack_gate_survivors).
# --------------------------------------------------------------------------

_INC_PACK_ORACLE = """
    WITH gm AS (
      SELECT doc_id, lang, source,
             len(string_split(text, ' ')) AS n_tok,
             length(text) - (len(string_split(text, ' ')) - 1) AS letters,
             length(text) - length(replace(text, '#', '')) AS n_hash,
             len(list_filter(string_split(text, ' '),
                             w -> NOT regexp_matches(w, '[a-z]'))) AS n_nonalpha,
             len(list_intersect(string_split(text, ' '),
                                ['the', 'and', 'of', 'to', 'in', 'a', 'is']))
               AS n_stop
      FROM documents),
    gf AS (
      SELECT doc_id, source, n_tok FROM gm
      WHERE lang = 'en' AND n_tok >= 30
        AND 3 * n_tok <= letters AND letters <= 10 * n_tok
        AND 10 * n_hash <= n_tok AND 10 * n_nonalpha <= n_tok
        AND n_stop >= 2),
    lt AS (SELECT doc_id, string_split(lower(text), ' ') AS toks
           FROM documents),
    bench AS (
      SELECT DISTINCT array_to_string(toks[1:8], ' ') AS g
      FROM lt WHERE doc_id % 17 = 0),
    shg AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(toks) - 6),
                                   i -> array_to_string(toks[i:i+7], ' ')))
               AS g
      FROM lt),
    contam AS (SELECT DISTINCT shg.doc_id FROM shg JOIN bench USING (g)),
    surv AS (
      SELECT gf.* FROM gf LEFT JOIN contam c ON c.doc_id = gf.doc_id
      WHERE c.doc_id IS NULL),
    packed AS (
      SELECT source, doc_id, n_tok,
             (SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                               ROWS UNBOUNDED PRECEDING) - n_tok)
               // 512 AS pack_id
      FROM surv)
    SELECT source, CAST(pack_id AS BIGINT) AS pack_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
           CAST(SUM(doc_id) AS BIGINT) AS id_checksum
    FROM packed GROUP BY 1, 2
    """


@query("stream_pack_batches_incremental", oracle=_INC_PACK_ORACLE)
def stream_pack_batches_incremental(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Incremental packed batches from a real documents stream; see
    streaming/jobs.run_pack_batches_incremental_stream."""
    from jhu_data_parser_spark.streaming.jobs import (
        run_pack_batches_incremental_stream,
    )

    return run_pack_batches_incremental_stream(spark, sf_dir)


# --------------------------------------------------------------------------
# ★ dialog_pack_sft — SFT sequence packing: each user's dialogue turns
# (in session/turn order) are packed greedily into training sequences
# of ≤ 64 events — the post-training twin of pipeline_pack_batches'
# running-sum rule (seq boundary where the cumulative event count
# crosses the budget; no global sort, one partitioned window).
# Output per (user_id, seq_id): turn and event counts + checksum.
# --------------------------------------------------------------------------

_SFT_BUDGET = 64  # events per packed SFT sequence

_SFT_PACK_ORACLE = f"""
    WITH {_THREAD_CTES},
    packed AS (
      SELECT user_id, n_events, evt_checksum,
             (SUM(n_events) OVER (PARTITION BY user_id
                                  ORDER BY session_no, turn_no
                                  ROWS UNBOUNDED PRECEDING) - n_events)
               // {_SFT_BUDGET} AS seq_id
      FROM t)
    SELECT user_id,
           CAST(seq_id AS BIGINT) AS seq_id,
           CAST(COUNT(*) AS BIGINT) AS n_turns,
           CAST(SUM(n_events) AS BIGINT) AS n_events,
           CAST(SUM(evt_checksum) AS BIGINT) AS evt_checksum
    FROM packed GROUP BY 1, 2
    """


@query("dialog_pack_sft", oracle=_SFT_PACK_ORACLE)
def dialog_pack_sft(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy per-user packing of dialogue turns into ≤64-event SFT
    sequences; per (user, seq) turn/event counts and checksum. The
    packing window partitions by user_id and orders by (session_no,
    turn_no) — same exchange as the threading itself."""
    t = _dialog_turns(spark, sf_dir)
    wp = (
        Window.partitionBy("user_id")
        .orderBy("session_no", "turn_no")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    packed = t.withColumn("sum_ev", F.sum("n_events").over(wp)).withColumn(
        "seq_id",
        F.expr(f"CAST((sum_ev - n_events) DIV {_SFT_BUDGET} AS BIGINT)"),
    )
    return packed.groupBy("user_id", "seq_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_turns"),
        F.sum("n_events").cast("long").alias("n_events"),
        F.sum("evt_checksum").cast("long").alias("evt_checksum"),
    )


# --------------------------------------------------------------------------
# ★ dialog_response_latency — assistant response-latency histogram:
# for every assistant turn directly following a user turn in the same
# session, latency = assistant turn start − user turn end (exact
# micros via lag over the turn table); bucketed into 10-minute bins
# (capped at bucket 6) so the output is a bounded histogram.
# --------------------------------------------------------------------------

_LAT_BUCKET_US = 600 * 1_000_000  # 10 minutes

_LATENCY_ORACLE = f"""
    WITH {_THREAD_CTES},
    lagged AS (
      SELECT user_id, session_no, role, start_us,
             lag(role) OVER w AS prev_role,
             lag(end_us) OVER w AS prev_end,
             lag(session_no) OVER w AS prev_sess
      FROM t
      WINDOW w AS (PARTITION BY user_id ORDER BY session_no, turn_no)),
    lat AS (
      SELECT CAST(LEAST((start_us - prev_end) // {_LAT_BUCKET_US}, 6)
                  AS BIGINT) AS bucket,
             start_us - prev_end AS lat_us
      FROM lagged
      WHERE role = 'assistant' AND prev_role = 'user'
        AND prev_sess = session_no)
    SELECT bucket,
           CAST(COUNT(*) AS BIGINT) AS n_responses,
           CAST(SUM(lat_us) AS BIGINT) AS lat_us_sum
    FROM lat GROUP BY 1
    """


@query("dialog_response_latency", oracle=_LATENCY_ORACLE)
def dialog_response_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assistant response latency (user turn end → assistant turn
    start) as a bounded 10-minute-bucket histogram. One lag window over
    the turn table, same user_id partitioning as the threading."""
    t = _dialog_turns(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("session_no", "turn_no")
    lagged = t.select(
        "user_id",
        "session_no",
        "role",
        "start_us",
        F.lag("role").over(w).alias("prev_role"),
        F.lag("end_us").over(w).alias("prev_end"),
        F.lag("session_no").over(w).alias("prev_sess"),
    )
    lat = lagged.filter(
        (F.col("role") == "assistant")
        & (F.col("prev_role") == "user")
        & (F.col("prev_sess") == F.col("session_no"))
    ).select(
        F.expr(
            f"CAST(LEAST((start_us - prev_end) DIV {_LAT_BUCKET_US}, 6)"
            " AS BIGINT)"
        ).alias("bucket"),
        (F.col("start_us") - F.col("prev_end")).alias("lat_us"),
    )
    return lat.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_responses"),
        F.sum("lat_us").cast("long").alias("lat_us_sum"),
    )


# --------------------------------------------------------------------------
# ★ pairs_best_of_k_reward — rejection sampling (best-of-K) under a
# FROZEN reward model, and its agreement with the heuristic-quality
# choice: the reward is a deterministic 48-bit md5 score per candidate
# (the replayable stand-in for frozen RM logits — same md5-uniform
# discipline as every sampling operator here). Per lang: prompts,
# reward-vs-quality agreement count, and the reward pick checksum.
# ONE aggregate computes both argmaxes (two max(struct) accumulators,
# map-side combinable, no window, no join).
# --------------------------------------------------------------------------

_RM_DUCK = _draw48_duck("rm:", "doc_id")

_BEST_OF_K_ORACLE = f"""
    WITH c AS ({_CAND_DUCK}),
    r AS (SELECT *, {_RM_DUCK} AS reward FROM c),
    rm AS (
      SELECT prompt_id, doc_id AS rm_doc
      FROM (SELECT *, row_number() OVER (PARTITION BY prompt_id
                    ORDER BY reward DESC, doc_id ASC) AS rk FROM r)
      WHERE rk = 1),
    qp AS (
      SELECT prompt_id, doc_id AS q_doc
      FROM (SELECT *, row_number() OVER (PARTITION BY prompt_id
                    ORDER BY score DESC, doc_id ASC) AS rk FROM r)
      WHERE rk = 1),
    lg AS (SELECT prompt_id, arg_min(lang, doc_id) AS lang
           FROM r GROUP BY 1)
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_prompts,
           CAST(SUM(CASE WHEN rm_doc = q_doc THEN 1 ELSE 0 END) AS BIGINT)
             AS n_agree,
           CAST(SUM(rm_doc) AS BIGINT) AS rm_pick_checksum
    FROM lg JOIN rm USING (prompt_id) JOIN qp USING (prompt_id)
    GROUP BY 1
    """


@query("pairs_best_of_k_reward", oracle=_BEST_OF_K_ORACLE)
def pairs_best_of_k_reward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best-of-K selection under a frozen (md5-replayable) reward and
    its agreement rate with the heuristic-quality choice, per lang.
    One map-side-combinable aggregate carrying two struct argmaxes."""
    c = _candidates(spark, sf_dir)
    reward = _draw48_spark("rm:", F.col("doc_id"))
    r = c.withColumn("reward", reward)
    picks = r.groupBy("prompt_id").agg(
        F.min_by("lang", "doc_id").alias("lang"),
        F.max(F.struct(F.col("reward"), (-F.col("doc_id")).alias("nd"))).alias(
            "rm_pick"
        ),
        F.max(F.struct(F.col("score"), (-F.col("doc_id")).alias("nd"))).alias(
            "q_pick"
        ),
    )
    return picks.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_prompts"),
        F.sum(
            F.when(
                F.col("rm_pick.nd") == F.col("q_pick.nd"), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_agree"),
        F.sum(-F.col("rm_pick.nd")).cast("long").alias("rm_pick_checksum"),
    )


# --------------------------------------------------------------------------
# ★ text_instruction_decontaminate — cross-split leakage scan: the
# pre-release hygiene check that no EVAL prompt's content survives in
# the TRAIN split. Eval prompts = the md5-held-out prompt groups (the
# sample_eval_holdout_pairs draw); their representative texts' 8-token
# shingles form the reference set (grows with the eval split here —
# a curated production eval suite is bounded); every TRAIN-split
# candidate document is flagged if it shares any shingle. Per lang:
# train docs, leaked docs, leaked checksum.
# --------------------------------------------------------------------------

# MUST be the same draw as _HOLDOUT_ORACLE's — both derive from
# _draw48_duck so the two queries can never disagree on the split.
_SPLIT_DUCK = (
    f"CASE WHEN {_draw48_duck('sft:', 'prompt_id')} < {_EVAL_THRESH}"
    " THEN 'eval' ELSE 'train' END"
)

_INSTR_DECON_ORACLE = f"""
    WITH c AS (
      SELECT doc_id, doc_id // {_GROUP} AS prompt_id, lang, text
      FROM documents WHERE length(text) > 0),
    s AS (SELECT *, {_SPLIT_DUCK} AS split FROM c),
    reps AS (
      SELECT prompt_id, arg_min(text, doc_id) AS rep_text
      FROM s WHERE split = 'eval' GROUP BY 1),
    ref AS (
      SELECT DISTINCT
             unnest(list_transform(
               range(1, len(string_split(lower(rep_text), ' ')) - 6),
               i -> array_to_string(
                      string_split(lower(rep_text), ' ')[i:i+7], ' '))) AS g
      FROM reps),
    tr AS (SELECT doc_id, lang,
                  string_split(lower(text), ' ') AS toks
           FROM s WHERE split = 'train'),
    shg AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(toks) - 6),
                                   i -> array_to_string(toks[i:i+7], ' ')))
               AS g
      FROM tr),
    hits AS (SELECT DISTINCT shg.doc_id FROM shg JOIN ref USING (g))
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_train_docs,
           CAST(SUM(CASE WHEN h.doc_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_leaked,
           CAST(COALESCE(SUM(CASE WHEN h.doc_id IS NOT NULL
                                  THEN tr.doc_id END), 0) AS BIGINT)
             AS leaked_checksum
    FROM tr LEFT JOIN hits h ON h.doc_id = tr.doc_id
    GROUP BY 1
    """


@query("text_instruction_decontaminate", oracle=_INSTR_DECON_ORACLE)
def text_instruction_decontaminate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Eval→train leakage scan: 8-token shingles of the eval-split
    prompt representatives probed against every train-split
    candidate's shingles; per-lang train-doc and leaked-doc
    accounting. Plan: the probe is ONE equi-join on the shingle string
    — never a text-pair comparison. Here the eval split is 1/8 of the
    SAME corpus, so the reference set grows with it: no broadcast hint
    (AQE broadcasts while it fits and falls back to a shuffle join at
    scale; a production eval suite is a curated bounded set and would
    always broadcast)."""
    d = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    draw = _draw48_spark("sft:", F.col("prompt_id"))
    c = d.select(
        "doc_id",
        F.expr(f"doc_id DIV {_GROUP}").alias("prompt_id"),
        "lang",
        "text",
    ).withColumn(
        "split",
        F.when(draw < F.lit(_EVAL_THRESH), "eval").otherwise("train"),
    )
    reps = (
        c.filter(F.col("split") == "eval")
        .groupBy("prompt_id")
        .agg(F.min_by("text", "doc_id").alias("rep_text"))
    )
    shingle_expr = (
        SHINGLE8_TOKS_SQL
    )
    ref = (
        reps.select(F.split(F.lower("rep_text"), " ").alias("toks"))
        .select(F.explode(F.expr(shingle_expr)).alias("g"))
        .distinct()
    )
    tr = c.filter(F.col("split") == "train").select(
        "doc_id", "lang", F.split(F.lower("text"), " ").alias("toks")
    )
    shg = tr.select(
        "doc_id", F.explode(F.expr(shingle_expr)).alias("g")
    )
    hits = (
        shg.join(ref, "g")
        .select("doc_id")
        .distinct()
        .withColumn("leak", F.lit(True))
    )
    return (
        tr.join(hits, "doc_id", "left")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_train_docs"),
            F.sum(F.when(F.col("leak"), 1).otherwise(0))
            .cast("long")
            .alias("n_leaked"),
            F.coalesce(
                F.sum(F.when(F.col("leak"), F.col("doc_id"))), F.lit(0)
            )
            .cast("long")
            .alias("leaked_checksum"),
        )
    )


# --------------------------------------------------------------------------
# ★ stream_dialog_threads_incremental — dialogue threading as a REAL
# stream: time-contiguous event chunks arrive as micro-batches; a
# carried per-user state table (last event's clock + role, running
# session/turn counters) keeps (session_no, turn_no) globally
# consistent, so a turn spanning a batch boundary is emitted as
# PARTIAL rows under the same key and the read-back merge reassembles
# it exactly. Shares dialog_thread_turns' oracle: the driver hash
# proves stream-threaded ≡ batch-threaded — the incremental-index
# discipline applied to stateful segmentation.
# --------------------------------------------------------------------------


@query("stream_dialog_threads_incremental", oracle=_THREAD_ORACLE)
def stream_dialog_threads_incremental(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """See streaming/jobs.run_dialog_threads_incremental_stream."""
    from jhu_data_parser_spark.streaming.jobs import (
        run_dialog_threads_incremental_stream,
    )

    return run_dialog_threads_incremental_stream(spark, sf_dir)
