"""Graph-ANN operator properties: unit-quantization monotonicity,
build determinism and fanout contract, LSH-seeded beam behavior, and
the index cache's variant separation (differently-filtered corpora
over the same files must not collide)."""

from __future__ import annotations

from pyspark.sql import functions as F

from jhu_data_parser_spark.operators import similarity as sim
from jhu_data_parser_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _corpus(spark):
    return load_table(spark, SF, "embeddings").filter(F.col("vec_id") != 0)


def test_unit_quantization_l2_monotone_in_cosine(spark):
    """For quantized UNIT vectors, integer squared-L2 to a query must
    rank identically to exact cosine (up to quantization ties) — the
    metric contract the beam search relies on. Checked on the exact
    top-10: the 10 cosine-nearest ids are the 10 smallest-d2 ids."""
    from jhu_data_parser_spark.plans.llm import _query_vec

    corpus = _corpus(spark)
    qv = _query_vec(spark, SF, 0)
    bf = [r.vec_id for r in sim.topk_cosine(corpus, qv, k=10).collect()]
    qz = sim.quantize_unit_vectors(corpus)
    qq = sim.quantize_unit_vectors(
        load_table(spark, SF, "embeddings").filter(F.col("vec_id") == 0)
    ).select(F.col("q").alias("qv"))
    d2 = qz.crossJoin(F.broadcast(qq)).select(
        "id",
        F.expr(
            "aggregate(zip_with(q, qv, (a, b) -> (a - b) * (a - b)), "
            "CAST(0 AS BIGINT), (s, x) -> s + x)"
        ).alias("d2"),
    )
    by_d2 = [r.id for r in d2.orderBy("d2", "id").limit(10).collect()]
    assert set(bf) == set(by_d2)


def test_knn_graph_fanout_and_determinism(spark):
    corpus = _corpus(spark)
    e1 = sim.knn_graph_banded(corpus, dim=64, m=4, n_planes=4, bands=2)
    e2 = sim.knn_graph_banded(corpus, dim=64, m=4, n_planes=4, bands=2)
    rows1 = sorted((r.src, r.dst) for r in e1.collect())
    rows2 = sorted((r.src, r.dst) for r in e2.collect())
    assert rows1 == rows2  # order-independent, rebuild-identical
    fan = e1.groupBy("src").count().agg(F.max("count")).first()[0]
    assert fan <= 4  # the fixed-fanout contract
    # no self loops
    assert e1.filter(F.col("src") == F.col("dst")).count() == 0


def test_matmul_and_expr_builds_agree_here(spark):
    """The Arrow-matmul bucket path is the bulk-build variant of the
    expression path; on this fixture (no near-zero projections at
    these seeds) the resulting graphs must be identical."""
    corpus = _corpus(spark)
    a = sim.knn_graph_banded(
        corpus, dim=64, m=4, n_planes=4, bands=2, exact_buckets=True
    )
    b = sim.knn_graph_banded(
        corpus, dim=64, m=4, n_planes=4, bands=2, exact_buckets=False
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_beam_search_monotone_and_bounded(spark):
    """The final beam is ≤ beam rows, contains the best seed (the beam
    is monotone — candidates always include the previous beam), and
    d2 is nonincreasing as hops grow."""
    corpus = _corpus(spark)
    qz = sim.quantize_unit_vectors(corpus)
    qq = sim.quantize_unit_vectors(
        load_table(spark, SF, "embeddings").filter(F.col("vec_id") == 0)
    ).select("q")
    edges = sim.knn_graph_banded(corpus, dim=64, m=4, n_planes=4, bands=2)
    edges = edges.localCheckpoint(eager=False)
    b1 = sim.graph_beam_search(qz, edges, qq, beam=8, hops=1, depth=1)
    b3 = sim.graph_beam_search(qz, edges, qq, beam=8, hops=3, depth=1)
    r1 = {r.id: r.d2 for r in b1.collect()}
    r3 = {r.id: r.d2 for r in b3.collect()}
    assert len(r1) <= 8 and len(r3) <= 8
    # monotone: element-wise over the shared prefix (the beams may
    # hold different counts, so a raw sum comparison is meaningless)
    s1, s3 = sorted(r1.values()), sorted(r3.values())
    for a, b in zip(s3, s1):
        assert a <= b


def test_graph_index_variant_keys_do_not_collide(spark):
    """Two differently-filtered corpora over the SAME parquet files
    with the same params must yield different cached indexes when
    distinguished by variant — the documented cache-key invariant."""
    e = load_table(spark, SF, "embeddings")
    p1 = sim.knn_graph_index(
        e.filter(F.col("vec_id") != 0),
        dim=64,
        m=4,
        n_planes=4,
        bands=2,
        variant="t_ne0",
    )
    p2 = sim.knn_graph_index(
        e.filter(F.col("vec_id") >= 5),
        dim=64,
        m=4,
        n_planes=4,
        bands=2,
        variant="t_ge5",
    )
    assert p1 != p2
    n1 = spark.read.parquet(p1).count()
    n2 = spark.read.parquet(p2).count()
    assert n1 != n2 or set(
        r.src for r in spark.read.parquet(p1).collect()
    ) != set(r.src for r in spark.read.parquet(p2).collect())
    # cache hit: same variant returns the same path without a rebuild
    assert (
        sim.knn_graph_index(
            e.filter(F.col("vec_id") != 0),
            dim=64,
            m=4,
            n_planes=4,
            bands=2,
            variant="t_ne0",
        )
        == p1
    )


def test_graph_index_append_stream_equals_batch_and_idempotent(spark):
    """The incremental NSW append must reproduce the batch arrival
    graph exactly (the NSW insertion rule makes node edges a function
    of earlier ids), and re-running over the same work dir must not
    duplicate appends (_SUCCESS-gated idempotence)."""
    import tempfile

    from jhu_data_parser_spark.operators.similarity import _rmtree_at_exit
    from jhu_data_parser_spark.plans.pipeline20 import (
        sim_graph_arrival_edges,
    )
    from jhu_data_parser_spark.streaming.jobs import (
        run_graph_index_append_stream,
    )

    batch = sorted(map(tuple, sim_graph_arrival_edges(spark, SF).collect()))
    wd = tempfile.mkdtemp(prefix="jdps_test_gidx_")
    _rmtree_at_exit(wd)
    s1 = sorted(
        map(
            tuple,
            run_graph_index_append_stream(spark, SF, work_dir=wd).collect(),
        )
    )
    assert s1 == batch
    s2 = sorted(
        map(
            tuple,
            run_graph_index_append_stream(spark, SF, work_dir=wd).collect(),
        )
    )
    assert s2 == batch
