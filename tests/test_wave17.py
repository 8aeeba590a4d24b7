"""Round-11 operator tests: substring-span dedup (planted-position
fixtures, interval-merge excision) and the mergeable quantile sketch
(merge-of-leaf ≡ direct-global, rank-exactness vs a python replay) —
independent of the DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _docs_df(spark, docs):
    rows = [
        (i, " ".join(toks), "en", "unit", len(" ".join(toks)))
        for i, toks in docs
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
        " n_chars long"
    )


def _toks(prefix, lo, hi):
    return [f"{prefix}{i}" for i in range(lo, hi + 1)]


def test_substring_spans_planted_positions(spark):
    """A 16-token run copied from doc 0 into doc 1 at a known offset
    must come back as exactly one span with exact 1-based positions."""
    from jhu_data_parser_spark.operators.dedup import substring_spans

    d = _docs_df(
        spark,
        [
            (0, _toks("a", 1, 30)),
            # b1..b10 then a5..a20 (16 shared tokens) then c1..c5
            (1, _toks("b", 1, 10) + _toks("a", 5, 20) + _toks("c", 1, 5)),
            (2, _toks("z", 1, 12)),
        ],
    )
    got = [
        tuple(r)
        for r in substring_spans(d, k=8, min_span=12, df_cap=16).collect()
    ]
    assert got == [(0, 1, 5, 11, 16)]


def test_substring_spans_min_span_filters_short_runs(spark):
    """A 10-token shared run seeds pairs (>= k = 8) but sits under
    min_span = 12 and must NOT be reported."""
    from jhu_data_parser_spark.operators.dedup import substring_spans

    d = _docs_df(
        spark,
        [
            (0, _toks("a", 1, 10) + _toks("u", 1, 6)),
            (1, _toks("v", 1, 6) + _toks("a", 1, 10)),
        ],
    )
    assert substring_spans(d, k=8, min_span=12, df_cap=16).count() == 0


def test_substring_spans_exact_collapse_dedups_copies(spark):
    """Verbatim copies collapse to one representative: replicating the
    planted pair 3x must yield the SAME single span (between the min-id
    representatives), not 9 pair-spans."""
    from jhu_data_parser_spark.operators.dedup import substring_spans

    base = [
        (0, _toks("a", 1, 30)),
        (1, _toks("b", 1, 10) + _toks("a", 5, 20) + _toks("c", 1, 5)),
    ]
    docs = []
    for copy in range(3):
        for i, toks in base:
            docs.append((i + 10 * copy, toks))
    got = [
        tuple(r)
        for r in substring_spans(
            _docs_df(spark, docs), k=8, min_span=12, df_cap=16
        ).collect()
    ]
    assert got == [(0, 1, 5, 11, 16)]


def test_substring_excision_merges_overlapping_intervals(spark, tmp_path):
    """Two partners copy OVERLAPPING runs into the same later doc: the
    excision accounting must merge the intervals (union, not sum).

    doc 9 = x1..x5 + a1..a30 + y1..y5 (40 tokens)
    doc 1 contributes a1..a20  -> doc-9 interval [6, 25]
    doc 2 contributes a11..a30 -> doc-9 interval [16, 35]
    union = [6, 35] = 30 tokens removed, 10 kept. The doc1/doc2 shared
    run (a11..a20, 10 tokens) is under min_span and contributes
    nothing."""
    import duckdb
    import os

    from jhu_data_parser_spark.plans.pipeline19 import (
        dedup_substring_excision,
    )

    d = _docs_df(
        spark,
        [
            (1, _toks("a", 1, 20) + _toks("u", 1, 4)),
            (2, _toks("v", 1, 4) + _toks("a", 11, 30)),
            (9, _toks("x", 1, 5) + _toks("a", 1, 30) + _toks("y", 1, 5)),
        ],
    )
    p = os.path.join(str(tmp_path), "documents.parquet")
    d.toPandas().to_parquet(p)
    # the query reads documents.parquet from an sf_dir — stage one
    got = [tuple(r) for r in dedup_substring_excision(spark, str(tmp_path)).collect()]
    assert got == [("en", 1, 30, 10)]
    # and the DuckDB oracle replays the identical accounting
    from jhu_data_parser_spark.plans import ORACLES

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{p}')"
    )
    assert con.execute(
        ORACLES["dedup_substring_excision"]
    ).fetchall() == [("en", 1, 30, 10)]


def test_quantile_sketch_merge_equals_direct(spark, sf_dir):
    """The defining sketch property: merging per-nation leaf sketches
    yields bit-identically the sketch built directly per region."""
    from jhu_data_parser_spark.plans.pipeline19 import _order_buckets

    v = _order_buckets(spark, sf_dir)
    direct = {
        (r["region_name"], r["bucket"]): r["cnt"]
        for r in v.groupBy("region_name", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .collect()
    }
    leaf = v.groupBy("region_name", "nation_name", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    merged = {
        (r["region_name"], r["bucket"]): r["cnt"]
        for r in leaf.groupBy("region_name", "bucket")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
        .collect()
    }
    assert merged == direct


def test_quantile_sketch_rank_exact(spark, sf_dir):
    """The reported estimate is exactly (bucket(v)+1)*width where v is
    the true rank-ceil(q*n/100) order statistic — rank selection is
    exact; only the VALUE is rounded up to a bucket boundary."""
    import math

    from jhu_data_parser_spark.plans.pipeline19 import (
        _QS_WIDTH,
        _QS_QUANTS,
        _order_buckets,
        agg_quantile_sketch_merge,
    )

    vals: dict[str, list[int]] = {}
    for r in _order_buckets(spark, sf_dir).collect():
        vals.setdefault(r["region_name"], []).append(r["bucket"])
    got = {
        r["region_name"]: r.asDict()
        for r in agg_quantile_sketch_merge(spark, sf_dir).collect()
    }
    assert set(got) == set(vals)
    for region, buckets in vals.items():
        buckets.sort()
        n = len(buckets)
        assert got[region]["n_orders"] == n
        for q, alias in _QS_QUANTS:
            rank = math.ceil(n * q / 100)
            expect = (buckets[rank - 1] + 1) * _QS_WIDTH
            assert got[region][alias] == expect, (region, alias)


def test_quantile_sketch_stream_multibatch_equals_batch(spark, tmp_path):
    """The stream twin with REAL multi-batch merging (3 part files,
    maxFilesPerTrigger=1) must equal the batch sketch query on the
    same corpus — the addition-merge claim exercised across actual
    micro-batch boundaries."""
    import os

    from jhu_data_parser_spark.plans.pipeline19 import (
        agg_quantile_sketch_tokens,
    )
    from jhu_data_parser_spark.sources.tables import load_table
    from jhu_data_parser_spark.streaming.jobs import run_quantile_sketch_stream

    src = load_table(spark, "/root/testdata/sf0.001", "documents")
    sf = str(tmp_path / "sf")
    src.repartition(3).write.parquet(os.path.join(sf, "documents.parquet"))

    got = {
        tuple(r)
        for r in run_quantile_sketch_stream(
            spark, sf, max_files_per_trigger=1
        ).collect()
    }
    want = {tuple(r) for r in agg_quantile_sketch_tokens(spark, sf).collect()}
    assert got == want and len(got) > 0


def test_embedding_moments_merge_invariant_and_match_numpy(spark, sf_dir):
    """The moment partials must be partition-invariant (1 partition ≡ 8
    partitions — addition-mergeability where it can fail) and equal a
    numpy int64 reference on the collected corpus."""
    import numpy as np

    from jhu_data_parser_spark.operators.similarity import (
        embedding_moment_partials,
    )
    from jhu_data_parser_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    one = {
        (r["i"], r["j"]): r["s"]
        for r in embedding_moment_partials(emb.repartition(1)).collect()
    }
    many = {
        (r["i"], r["j"]): r["s"]
        for r in embedding_moment_partials(emb.repartition(8)).collect()
    }
    assert one == many

    X = np.stack([r["embedding"] for r in emb.collect()]).astype(np.float64)
    Xi = np.floor(X * 100_000).astype(np.int64)
    g = Xi.T @ Xi
    d = Xi.shape[1]
    want = {(-1, -1): len(Xi)}
    for i in range(d):
        want[(i + 1, -1)] = int(Xi[:, i].sum())
        for j in range(i, d):
            want[(i + 1, j + 1)] = int(g[i, j])
    assert one == want


def test_substring_spans_stream_cross_batch_discovery(spark, tmp_path):
    """The incremental span stream must discover a pair whose two docs
    arrive in DIFFERENT micro-batches (new x old index probe), match
    the batch operator exactly, and re-run idempotently over the same
    work dir."""
    import os

    from jhu_data_parser_spark.operators.dedup import substring_spans
    from jhu_data_parser_spark.streaming.jobs import (
        run_substring_spans_incremental_stream,
    )

    docs = [
        # chunk 0 (ids 0..9): the source doc
        (0, _toks("a", 1, 30)),
        (1, _toks("q", 1, 12)),
        # chunk 1 (ids 10..19): unrelated + an exact copy of doc 0
        (10, _toks("r", 1, 12)),
        (11, _toks("a", 1, 30)),
        # chunk 2 (ids 20..29): copies a5..a20 from doc 0 at offset 11
        (20, _toks("b", 1, 10) + _toks("a", 5, 20) + _toks("c", 1, 5)),
    ]
    d = _docs_df(spark, docs)
    sf = str(tmp_path / "corpus")
    os.makedirs(sf)
    d.coalesce(1).write.parquet(os.path.join(sf, "documents.parquet"))

    wd = str(tmp_path / "subs")
    got = [
        tuple(r)
        for r in run_substring_spans_incremental_stream(
            spark, sf, n_chunks=3, work_dir=wd
        ).collect()
    ]
    want = [
        tuple(r)
        for r in substring_spans(d, k=8, min_span=12, df_cap=16)
        .orderBy("span_len", "doc_a", "doc_b", "start_a", "start_b")
        .collect()
    ]
    # one span, found across batches; the exact copy (doc 11) collapsed
    assert got == [(0, 20, 5, 11, 16)]
    assert sorted(got) == sorted(want)
    # the seed rows for the pair live in the LAST batch's seed segment
    # (new x old probe), proving cross-batch discovery (sinks land in
    # ONE tag-partitioned dir per batch — one commit per micro-batch)
    seeds = spark.read.parquet(os.path.join(wd, "sinks")).filter(
        "tag = 'seeds'"
    )
    assert (
        seeds.filter("doc_a = 0 AND doc_b = 20 AND batch_id = 2").count() > 0
    )
    # idempotent re-run: committed sinks untouched, identical result
    s0 = os.path.join(wd, "sinks", "batch_id=0", "_SUCCESS")
    mtime = os.path.getmtime(s0)
    got2 = [
        tuple(r)
        for r in run_substring_spans_incremental_stream(
            spark, sf, n_chunks=3, work_dir=wd
        ).collect()
    ]
    assert got2 == got
    assert os.path.getmtime(s0) == mtime

def test_substring_spans_stream_df_gate_sums_partials(spark, tmp_path):
    """The read-back df gate is the SUM of the per-batch df partials.
    Two properties that distinguish it from a broken partial merge:
    a gram whose running df stays under the cap at every batch
    boundary but whose summed df blows the cap must be gated out, and
    a doc holding a gram at MANY positions must count once (else a
    16-occurrence doc would push a df-2 pair past the cap). The
    stream must stay bit-identical to the batch operator throughout."""
    import os

    from jhu_data_parser_spark.operators.dedup import substring_spans
    from jhu_data_parser_spark.streaming.jobs import (
        run_substring_spans_incremental_stream,
    )

    R = _toks("h", 1, 12)  # hot run: 17 docs -> final df 17 > cap 16
    W = _toks("w", 1, 12)  # df-2 run: 16 positions in doc 6, 1 in doc 24
    G = _toks("g", 1, 16)  # plain cross-batch pair
    docs = []
    # 17 hot docs: 6 in chunk 0 (ids 0-5), 6 in chunk 1 (9-14),
    # 5 in chunk 2 (19-23); unique prefixes vary R's position
    for i in list(range(0, 6)) + list(range(9, 15)) + list(range(19, 24)):
        docs.append((i, _toks(f"p{i}x", 1, 1 + i % 3) + R))
    wa = []
    for j in range(16):  # W sixteen times, unique separators between
        wa += W + [f"sep6x{j}"]
    docs.append((6, wa))
    docs.append((24, _toks("q24x", 1, 3) + W))
    docs.append((15, _toks("q15x", 1, 2) + G))
    docs.append((25, G + _toks("q25x", 1, 2)))
    d = _docs_df(spark, docs)
    sf = str(tmp_path / "corpus")
    os.makedirs(sf)
    d.coalesce(1).write.parquet(os.path.join(sf, "documents.parquet"))

    got = [
        tuple(r)
        for r in run_substring_spans_incremental_stream(
            spark, sf, n_chunks=3, work_dir=str(tmp_path / "subs")
        ).collect()
    ]
    want = [
        tuple(r)
        for r in substring_spans(d, k=8, min_span=12, df_cap=16).collect()
    ]
    assert sorted(got) == sorted(want)
    hot = set(range(0, 6)) | set(range(9, 15)) | set(range(19, 24))
    # every hot-run pair gated out at read-back (summed df 17 > 16)
    assert not [r for r in got if r[0] in hot and r[1] in hot]
    # the df-2 pair survives with one span per occurrence position
    assert len([r for r in got if (r[0], r[1]) == (6, 24)]) == 16
    assert [r for r in got if (r[0], r[1]) == (15, 25)]
