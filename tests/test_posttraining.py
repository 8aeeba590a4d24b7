"""Post-training assembly properties (wave 23): deterministic
chosen/rejected pairing, leakage-safe holdout disjointness, turn
alternation, and the arithmetic-ntile helper vs exact expected sizes."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from jhu_data_parser_spark import plans
from tests.conftest import SF_SMOKE


def test_preference_pairs_deterministic_and_consistent(spark):
    rows = plans.QUERIES["pairs_preference_assembly"](spark, SF_SMOKE).collect()
    assert rows
    by_prompt = defaultdict(list)
    for r in rows:
        assert r.chosen_doc_id != r.rejected_doc_id
        assert r.margin >= 0
        by_prompt[r.prompt_id].append(r)
    for pid, prs in by_prompt.items():
        # exactly one chosen per prompt, shared by every pair row
        assert len({p.chosen_doc_id for p in prs}) == 1
        # best-vs-rest: every non-chosen candidate appears exactly once
        rejected = [p.rejected_doc_id for p in prs]
        assert len(rejected) == len(set(rejected))
        # chosen belongs to the same prompt group
        assert prs[0].chosen_doc_id // 8 == pid


def test_preference_chosen_is_argmax_with_low_id_tiebreak(spark):
    from jhu_data_parser_spark.plans.pipeline18 import _candidates

    cand = _candidates(spark, SF_SMOKE).collect()
    best = {}
    for r in cand:
        key = (-r.score, r.doc_id)  # max score, tie -> lower doc_id
        if r.prompt_id not in best or key < best[r.prompt_id][0]:
            best[r.prompt_id] = (key, r.doc_id)
    pairs = plans.QUERIES["pairs_preference_assembly"](spark, SF_SMOKE).collect()
    for p in pairs:
        assert p.chosen_doc_id == best[p.prompt_id][1]


def test_holdout_split_is_leakage_safe(spark):
    """The md5 draw rides the prompt key, so replaying the split
    expression over the pair table must put each prompt's pairs in
    exactly one split — and the aggregate counts must reconcile."""
    from jhu_data_parser_spark.plans.pipeline18 import _EVAL_THRESH, _pref_pairs

    pairs = _pref_pairs(spark, SF_SMOKE)
    draw = F.conv(
        F.substring(
            F.md5(
                F.concat(F.lit("sft:"), F.col("prompt_id").cast("string")).cast(
                    "binary"
                )
            ),
            1,
            12,
        ),
        16,
        10,
    ).cast("long")
    tagged = pairs.withColumn(
        "split", F.when(draw < F.lit(_EVAL_THRESH), "eval").otherwise("train")
    ).collect()
    seen = defaultdict(set)
    for r in tagged:
        seen[r.prompt_id].add(r.split)
    assert all(len(s) == 1 for s in seen.values())
    agg = {
        r.split: r
        for r in plans.QUERIES["sample_eval_holdout_pairs"](
            spark, SF_SMOKE
        ).collect()
    }
    for split in agg:
        assert agg[split].n_pairs == sum(
            1 for r in tagged if r.split == split
        )


def test_dialog_turns_alternate_roles(spark):
    rows = plans.QUERIES["dialog_thread_turns"](spark, SF_SMOKE).collect()
    assert rows
    threads = defaultdict(dict)
    for r in rows:
        threads[(r.user_id, r.session_no)][r.turn_idx] = r.role
    for key, turns in threads.items():
        idxs = sorted(turns)
        assert idxs == list(range(1, len(idxs) + 1)), key
        for a, b in zip(idxs, idxs[1:]):
            # consecutive turns never share a role (runs were merged)
            assert turns[a] != turns[b], key


def test_ntile_from_rank_matches_exact_bucket_sizes(spark):
    """ntile(t) contract: first n%t buckets hold n//t+1 rows, the rest
    n//t — checked for every n in 1..17 against the arithmetic form."""
    from jhu_data_parser_spark.plans.pipeline16 import _ntile_from_rank

    for n in range(1, 18):
        df = spark.range(1, n + 1).select(
            F.col("id").alias("rk"), F.lit(n).cast("long").alias("n")
        )
        got = [
            r.b
            for r in df.select(
                _ntile_from_rank(F.col("rk"), F.col("n"), 5).alias("b")
            )
            .orderBy("rk")
            .collect()
        ]
        expected = []
        q, rem = divmod(n, 5)
        for bucket in range(1, 6):
            expected.extend([bucket] * (q + 1 if bucket <= rem else q))
        assert got == expected, (n, got)


def test_incremental_pack_stream_is_multibatch_and_idempotent(spark, tmp_path):
    """The incremental packer must actually run one micro-batch per
    staged chunk (3 committed segment dirs + 3 state dirs), and a
    re-run over the same work_dir (fresh checkpoint, so batch ids
    recompute from 0) must skip every committed sink and read back
    identical rows — the _SUCCESS-gated exactly-once discipline."""
    import os

    from jhu_data_parser_spark.streaming.jobs import (
        run_pack_batches_incremental_stream,
    )

    wd = str(tmp_path / "packwork")
    r1 = sorted(
        tuple(r)
        for r in run_pack_batches_incremental_stream(
            spark, SF_SMOKE, work_dir=wd
        ).collect()
    )
    assert r1
    for b in range(3):
        # one tag-partitioned commit per batch (segments + state)
        marker = os.path.join(wd, "sinks", f"batch_id={b}", "_SUCCESS")
        assert os.path.exists(marker), marker
        for tag in ("seg", "state"):
            assert os.path.isdir(
                os.path.join(wd, "sinks", f"batch_id={b}", f"tag={tag}")
            )
    # tamper-check: record mtimes, re-run, nothing rewritten
    seg0 = os.path.join(wd, "sinks", "batch_id=0", "_SUCCESS")
    mtime_before = os.path.getmtime(seg0)
    r2 = sorted(
        tuple(r)
        for r in run_pack_batches_incremental_stream(
            spark, SF_SMOKE, work_dir=wd
        ).collect()
    )
    assert r2 == r1
    assert os.path.getmtime(seg0) == mtime_before


def test_incremental_pack_state_carries_offsets(spark, tmp_path):
    """Per-source offsets must be monotone non-decreasing across the
    batch_id state snapshots and equal the cumulative packed tokens."""
    import os
    from collections import defaultdict

    from jhu_data_parser_spark.streaming.jobs import (
        run_pack_batches_incremental_stream,
    )

    wd = str(tmp_path / "packwork2")
    run_pack_batches_incremental_stream(spark, SF_SMOKE, work_dir=wd).collect()
    state = defaultdict(dict)
    snap = spark.read.parquet(os.path.join(wd, "sinks")).filter(
        "tag = 'state'"
    )
    for r in snap.select("batch_id", "source", "off_tok").collect():
        state[r.batch_id][r.source] = r.off_tok
    for b in range(0, 3):
        for src, off in state[b].items():
            assert off >= state[b - 1].get(src, 0)
    segs = (
        spark.read.parquet(os.path.join(wd, "sinks"))
        .filter("tag = 'seg'")
        .select("source", "n_tok")
        .collect()
    )
    per_src = defaultdict(int)
    for r in segs:
        per_src[r.source] += r.n_tok
    assert dict(per_src) == {s: o for s, o in state[2].items() if o > 0 or s in per_src}


def test_sft_pack_budget_rule_and_mass_conservation(spark):
    """Every turn's seq assignment must follow the running-sum rule
    ((cum - n_events) DIV 64), and packing must conserve events."""
    from jhu_data_parser_spark.plans.pipeline18 import _dialog_turns

    turns = _dialog_turns(spark, SF_SMOKE).collect()
    packed = plans.QUERIES["dialog_pack_sft"](spark, SF_SMOKE).collect()
    by_user = defaultdict(list)
    for t in turns:
        by_user[t.user_id].append(t)
    expect = defaultdict(lambda: [0, 0, 0])  # (user, seq) -> turns, events, cs
    for uid, ts in by_user.items():
        cum = 0
        for t in sorted(ts, key=lambda r: (r.session_no, r.turn_no)):
            seq = cum // 64
            cum += t.n_events
            e = expect[(uid, seq)]
            e[0] += 1
            e[1] += t.n_events
            e[2] += t.evt_checksum
    got = {(r.user_id, r.seq_id): [r.n_turns, r.n_events, r.evt_checksum]
           for r in packed}
    assert got == dict(expect)


def test_best_of_k_agreement_bounded(spark):
    rows = plans.QUERIES["pairs_best_of_k_reward"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_agree <= r.n_prompts


def test_instruction_decontaminate_counts_consistent(spark):
    rows = plans.QUERIES["text_instruction_decontaminate"](
        spark, SF_SMOKE
    ).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_leaked <= r.n_train_docs


def test_incremental_dialog_threads_merge_across_batches(spark, tmp_path):
    """A long single-role run engineered to span every micro-batch cut
    must be emitted as partials under ONE (user, session, turn) key in
    multiple segments, and the merged read-back must equal the batch
    threading exactly. A re-run over the same work_dir must skip every
    committed sink (idempotency)."""
    import datetime
    import os

    from jhu_data_parser_spark.plans.pipeline18 import _dialog_turns
    from jhu_data_parser_spark.streaming.jobs import (
        run_dialog_threads_incremental_stream,
    )

    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    # user 1: one unbroken 'click' run, 60 events 60 s apart -> ONE turn
    # spanning every time cut
    for i in range(60):
        rows.append((i, t0 + datetime.timedelta(seconds=60 * i), 1, "click", 1.0, "{}"))
    # user 2: alternating roles every 5 min -> many short turns
    for i in range(12):
        et = "click" if i % 2 == 0 else "view"
        rows.append((100 + i, t0 + datetime.timedelta(seconds=300 * i), 2, et, 1.0, "{}"))
    sf = str(tmp_path / "corpus")
    os.makedirs(sf)
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).coalesce(1).write.parquet(os.path.join(sf, "events.parquet"))

    wd = str(tmp_path / "dlg")
    got = sorted(
        tuple(r)
        for r in run_dialog_threads_incremental_stream(
            spark, sf, work_dir=wd
        ).collect()
    )
    want = sorted(
        tuple(r)
        for r in _dialog_turns(spark, sf)
        .select(
            "user_id", "session_no", "turn_idx", "role",
            "n_events", "evt_checksum", "turn_start", "turn_end",
        )
        .collect()
    )
    assert got == want
    # the long run must appear as partials in >1 batch segment (sinks
    # land in ONE tag-partitioned dir per batch — one commit per batch)
    from pyspark.sql import functions as F2

    segs = spark.read.parquet(os.path.join(wd, "sinks")).filter(
        "tag = 'seg'"
    )
    spans = (
        segs.groupBy("user_id", "session_no", "turn_no")
        .agg(F2.countDistinct("batch_id").alias("nb"))
        .filter("nb > 1")
        .count()
    )
    assert spans > 0
    # idempotent re-run
    seg0 = os.path.join(wd, "sinks", "batch_id=0", "_SUCCESS")
    mtime = os.path.getmtime(seg0)
    got2 = sorted(
        tuple(r)
        for r in run_dialog_threads_incremental_stream(
            spark, sf, work_dir=wd
        ).collect()
    )
    assert got2 == got
    assert os.path.getmtime(seg0) == mtime
