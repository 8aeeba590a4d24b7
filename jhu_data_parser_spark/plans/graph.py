"""Graph-analytics catalog wave: integer-exact PageRank and triangle
counting over a nation-level trade graph derived from the fact tables.

Reference parity note: the reference (/root/reference) has no graph
surface — these are extension operators (the iterative-join and
multi-way self-join shapes corpus curation needs: authority scoring,
community density, dedup-cluster diagnostics).

Oracle discipline: PageRank is fixed-point integer arithmetic (rank
1.0 == 10^12, integer division everywhere), so the DuckDB twin — the
same five update steps unrolled as chained CTEs — reproduces every rank
bit-for-bit. Floating-point PageRank could never hash-match across
engines (reducer-order-dependent sums).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jhu_data_parser_spark.plans.catalog import query
from jhu_data_parser_spark.sources.tables import load_table

_EDGES_SQL = """
    SELECT DISTINCT s.s_nationkey AS src, c.c_nationkey AS dst
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    WHERE s.s_nationkey <> c.c_nationkey
"""

_PR_ITERATIONS = 5
_PR_SCALE = 1_000_000_000_000


def _pagerank_oracle() -> str:
    """Unroll the five integer update steps as chained CTEs (DuckDB
    disallows aggregates in recursive-CTE terms, and a fixed iteration
    count needs no recursion anyway)."""
    steps = []
    for i in range(1, _PR_ITERATIONS + 1):
        steps.append(f"""
    r{i} AS (
      SELECT n.node,
             CAST({_PR_SCALE} // nn.n_nodes * 15 // 100
                  + COALESCE(c.s, 0) * 85 // 100 AS BIGINT) AS r
      FROM nodes n CROSS JOIN nn
      LEFT JOIN (
        SELECT e.dst AS node, CAST(SUM(p.r // od.outdeg) AS BIGINT) AS s
        FROM r{i - 1} p
        JOIN outdeg od ON p.node = od.node
        JOIN edges e ON e.src = p.node
        GROUP BY e.dst) c ON c.node = n.node)""")
    return f"""
    WITH edges AS ({_EDGES_SQL}),
    nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes FROM nodes),
    outdeg AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS outdeg
               FROM edges GROUP BY src),
    r0 AS (SELECT node, CAST({_PR_SCALE} // n_nodes AS BIGINT) AS r
           FROM nodes CROSS JOIN nn),{",".join(steps)}
    SELECT node, r AS rank_scaled FROM r{_PR_ITERATIONS}
    """


@query("graph_pagerank_trade", oracle=_pagerank_oracle())
def graph_pagerank_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Authority scoring of the supplier→customer nation trade graph:
    5 fixed-point PageRank iterations (operators/graph.py). Each
    iteration: one |V|-row join + groupBy, lineage checkpointed — the
    shape that runs unchanged on a billion-edge graph."""
    from jhu_data_parser_spark.operators.graph import pagerank, trade_edges

    edges = trade_edges(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "supplier"),
    )
    return pagerank(edges, iterations=_PR_ITERATIONS, scale=_PR_SCALE)


@query(
    "graph_triangle_count",
    oracle=f"""
    WITH edges AS ({_EDGES_SQL}),
    und AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
            FROM edges),
    tri AS (SELECT e1.a AS ta, e1.b AS tb, e2.b AS tc
            FROM und e1
            JOIN und e2 ON e2.a = e1.b
            JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b),
    nodes AS (SELECT a AS node FROM und UNION SELECT b FROM und),
    member AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS n
               FROM (SELECT ta AS node FROM tri
                     UNION ALL SELECT tb FROM tri
                     UNION ALL SELECT tc FROM tri)
               GROUP BY node)
    SELECT n.node, CAST(COALESCE(m.n, 0) AS BIGINT) AS n_triangles
    FROM nodes n LEFT JOIN member m ON m.node = n.node
    """,
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle participation in the undirected trade graph —
    the community-density primitive. Canonically oriented (a<b<c) so
    each triangle is one 3-way join path; degree-orientation is the
    at-scale skew upgrade (operators/graph.py docstring)."""
    from jhu_data_parser_spark.operators.graph import trade_edges, triangle_counts

    edges = trade_edges(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "supplier"),
    )
    return triangle_counts(edges)


# --------------------------------------------------------------------------
# Link prediction by common neighbors over the STRONG-trade graph. The
# raw trade graph saturates (every nation pair trades at sf>=0.01), so
# prediction runs on the top-60 edges by lineitem volume — the classic
# thresholded-projection step — and scores every absent pair by common
# neighbors and integer Jaccard.
# --------------------------------------------------------------------------

_LP_EDGES = 60
_LP_TOPK = 20


@query(
    "graph_link_prediction",
    oracle=f"""
    WITH raw AS (
      SELECT LEAST(s.s_nationkey, c.c_nationkey) AS a,
             GREATEST(s.s_nationkey, c.c_nationkey) AS b,
             COUNT(*) AS w
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      WHERE s.s_nationkey <> c.c_nationkey
      GROUP BY 1, 2),
    strong AS (
      SELECT a, b FROM raw ORDER BY w DESC, a, b LIMIT {_LP_EDGES}),
    sym AS (
      SELECT a AS x, b AS y FROM strong
      UNION ALL SELECT b, a FROM strong),
    deg AS (SELECT x, CAST(COUNT(*) AS BIGINT) AS d FROM sym GROUP BY x),
    cn AS (
      SELECT e1.y AS a, e2.y AS b, CAST(COUNT(*) AS BIGINT) AS common
      FROM sym e1 JOIN sym e2 ON e1.x = e2.x AND e1.y < e2.y
      GROUP BY 1, 2),
    cand AS (
      SELECT cn.a, cn.b, cn.common,
             CAST(cn.common * 1000000 // (da.d + db.d - cn.common) AS BIGINT)
               AS jaccard_e6
      FROM cn
      JOIN deg da ON da.x = cn.a
      JOIN deg db ON db.x = cn.b
      LEFT JOIN strong s ON s.a = cn.a AND s.b = cn.b
      WHERE s.a IS NULL)
    SELECT a, b, common, jaccard_e6
    FROM cand ORDER BY common DESC, jaccard_e6 DESC, a, b LIMIT {_LP_TOPK}
    """,
)
def graph_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common-neighbor link prediction (Liben-Nowell & Kleinberg 2003)
    over the strong-trade nation graph: project the fact tables to the
    top-60 undirected edges by lineitem volume (the raw graph
    saturates — every pair trades — so thresholding IS the graph-build
    step), then score every ABSENT pair by shared-neighbor count and
    integer Jaccard, returning the top-20 predicted links. Pure
    integer arithmetic end to end; ties broken by (a, b).

    Plan shape: ONE wide shuffle (the fact-side pair aggregate, dims
    broadcast); everything after runs on ≤60 edge rows — the wedge
    join (sym e1 ⋈ sym e2 on the shared endpoint) is the same oriented
    self-join as graph_triangle_count, whose at-scale skew bound
    (degree orientation) applies unchanged. The anti-join against the
    edge set and both degree joins are broadcasts.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    raw = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(s, li["l_suppkey"] == s["s_suppkey"])
        .filter(F.col("s_nationkey") != F.col("c_nationkey"))
        .select(
            F.least("s_nationkey", "c_nationkey").alias("a"),
            F.greatest("s_nationkey", "c_nationkey").alias("b"),
        )
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("w"))
    )
    strong = raw.orderBy(F.desc("w"), "a", "b").limit(_LP_EDGES).select("a", "b")
    sym = strong.select(F.col("a").alias("x"), F.col("b").alias("y")).unionByName(
        strong.select(F.col("b").alias("x"), F.col("a").alias("y"))
    )
    deg = sym.groupBy("x").agg(F.count(F.lit(1)).cast("long").alias("d"))
    e1 = sym.select(F.col("x"), F.col("y").alias("ya"))
    e2 = sym.select(F.col("x"), F.col("y").alias("yb"))
    cn = (
        e1.join(e2, "x")
        .filter(F.col("ya") < F.col("yb"))
        .groupBy(F.col("ya").alias("a"), F.col("yb").alias("b"))
        .agg(F.count(F.lit(1)).cast("long").alias("common"))
    )
    cand = (
        cn.join(strong, ["a", "b"], "left_anti")
        .join(F.broadcast(deg.select(F.col("x").alias("a"), F.col("d").alias("da"))), "a")
        .join(F.broadcast(deg.select(F.col("x").alias("b"), F.col("d").alias("db"))), "b")
        .select(
            "a",
            "b",
            "common",
            F.expr("common * 1000000L div (da + db - common)")
            .cast("long")
            .alias("jaccard_e6"),
        )
    )
    return cand.orderBy(
        F.desc("common"), F.desc("jaccard_e6"), "a", "b"
    ).limit(_LP_TOPK)


# --------------------------------------------------------------------------
# Label propagation (min-label variant) — community detection by
# synchronous label updates: label_i(v) = min(label_{i-1}(v),
# min over undirected neighbors' label_{i-1}) for a FIXED 3 rounds.
# The min rule is fully deterministic (no tie randomness — unlike
# frequency-LPA) and each round is one |E| join + one |V| groupBy, the
# same iterative shape as pagerank; after enough rounds the labels are
# connected components, so the fixed-round output is the distance-≤3
# community approximation. Integer labels replay exactly in DuckDB
# (unrolled CTEs).
# --------------------------------------------------------------------------

_LPA_ITERS = 3


def _lpa_oracle() -> str:
    steps = []
    for i in range(1, _LPA_ITERS + 1):
        steps.append(f"""
    l{i} AS (
      SELECT n.node,
             LEAST(p.label, COALESCE(m.nl, p.label)) AS label
      FROM nodes n
      JOIN l{i - 1} p ON p.node = n.node
      LEFT JOIN (
        SELECT u.src AS node, MIN(p2.label) AS nl
        FROM undirected u JOIN l{i - 1} p2 ON p2.node = u.dst
        GROUP BY 1) m ON m.node = n.node)""")
    return f"""
    WITH edges AS ({_EDGES_SQL}),
    undirected AS (
      SELECT src, dst FROM edges UNION SELECT dst, src FROM edges),
    nodes AS (SELECT DISTINCT src AS node FROM undirected),
    l0 AS (SELECT node, node AS label FROM nodes),{",".join(steps)}
    SELECT label AS community,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           CAST(SUM(node) AS BIGINT) AS member_checksum
    FROM l{_LPA_ITERS} GROUP BY 1
    """


@query("graph_label_propagation", oracle=_lpa_oracle())
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min-label propagation communities after 3 synchronous rounds on
    the undirected trade graph: per community its size and member
    checksum. Each round joins the checkpointed edge list to the
    current |V|-row label table and min-aggregates — no driver-side
    state, the billion-edge-safe iterative-join shape."""
    from jhu_data_parser_spark.operators.graph import trade_edges

    edges = trade_edges(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "supplier"),
    ).select("src", "dst")
    und = (
        edges.union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = und.select(F.col("src").alias("node")).distinct().withColumn(
        "label", F.col("node")
    )
    for _ in range(_LPA_ITERS):
        nbr = (
            und.join(labels.withColumnRenamed("node", "dst"), "dst")
            .groupBy("src")
            .agg(F.min("label").alias("nl"))
            .withColumnRenamed("src", "node")
        )
        labels = (
            labels.join(nbr, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce("nl", F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint(eager=False)
        )
    return labels.groupBy(F.col("label").alias("community")).agg(
        F.count(F.lit(1)).cast("long").alias("n_members"),
        F.sum("node").cast("long").alias("member_checksum"),
    )
