"""Iterative + multi-way-join graph operators (extension surface).

The reference (/root/reference/src/parser.py, parser2.py) has no graph
surface at all — this module belongs to the LLM-pipeline extension:
dedup clustering already needs connected components
(``operators/dedup.py``); PageRank-style scoring and triangle counting
are the next two graph shapes a corpus-curation pipeline reaches for
(authority scoring of link/citation graphs, community density).

All arithmetic is **integer-exact** (fixed-point ranks, integer
division) so results are engine-independent and oracle-checkable —
floating-point PageRank is order-dependent across reducers and can
never hash-match a second engine.

100 TB posture:
- Edges and ranks shuffle on node keys only — payloads never travel.
- Each PageRank iteration is one join + one groupBy; the rank table is
  |V| rows, not |E|. ``localCheckpoint`` per round truncates lineage so
  the plan does not grow with iteration count (same discipline as
  ``dedup.connected_components``).
- Triangle counting orients edges (low id → high id here; by-degree at
  scale, the standard skew bound: fan-out per node becomes O(sqrt(m))
  instead of O(max_degree)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["trade_edges", "pagerank", "triangle_counts"]

PR_SCALE = 1_000_000_000_000  # fixed-point: rank 1.0 == 10^12


def trade_edges(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
) -> DataFrame:
    """Derive a directed nation-level trade graph: one edge
    ``supplier-nation → customer-nation`` per distinct trading pair
    (self-loops dropped). The fact table shuffles only its two key
    columns; nation arity bounds the distinct output at |N|²."""
    return (
        lineitem.select("l_orderkey", "l_suppkey")
        .join(orders.select("o_orderkey", "o_custkey"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer.select("c_custkey", "c_nationkey")), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supplier.select("s_suppkey", "s_nationkey")), F.col("l_suppkey") == F.col("s_suppkey"))
        .filter(F.col("s_nationkey") != F.col("c_nationkey"))
        .select(F.col("s_nationkey").alias("src"), F.col("c_nationkey").alias("dst"))
        .distinct()
    )


def pagerank(
    edges: DataFrame,
    iterations: int = 5,
    damping_pct: int = 85,
    scale: int = PR_SCALE,
    dangling: str = "drop",
) -> DataFrame:
    """Fixed-iteration integer PageRank → ``(node, rank_scaled)``.

    Update rule (all integer, reproducible bit-for-bit in any engine)::

        r0(v)  = scale // n_nodes
        r_i(v) = scale // n_nodes * (100-d) // 100
                 + coalesce(sum over in-edges u→v of r_{i-1}(u) // outdeg(u), 0)
                 * d // 100
                 [+ dangling_sum * d // 100 // n_nodes    if redistribute]

    ``dangling='drop'`` discards sink-node mass (the common simplified
    variant; the oracle twin applies the same rule); ``'redistribute'``
    is the textbook-complete version — the summed rank of zero-outdeg
    nodes is spread uniformly, conserving total mass up to integer
    truncation (pinned in tests). The dangling sum is one extra 1-row
    aggregate per iteration — still no driver action. ``n_nodes`` enters
    as a cross-joined 1-row aggregate, so the whole thing stays one lazy
    plan per iteration.
    """
    if dangling not in ("drop", "redistribute"):
        raise ValueError(f"unknown dangling mode {dangling!r}")
    edges = edges.select("src", "dst").localCheckpoint(eager=True)
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_nodes = nodes.agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
    outdeg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("outdeg")
    )
    teleport = F.expr(f"{scale} div n_nodes * {100 - damping_pct} div 100")

    ranks = nodes.crossJoin(n_nodes).select(
        "node", F.expr(f"{scale} div n_nodes").alias("r")
    )
    for _ in range(iterations):
        contrib = (
            ranks.join(outdeg, "node")
            .join(edges, ranks["node"] == edges["src"])
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.expr("r div outdeg")).alias("s"))
        )
        base = nodes.crossJoin(n_nodes).join(contrib, "node", "left")
        if dangling == "redistribute":
            dang = ranks.join(outdeg, "node", "left_anti").agg(
                F.coalesce(F.sum("r"), F.lit(0)).cast("long").alias("dang_sum")
            )
            base = base.crossJoin(dang)
            share = F.expr(f"dang_sum * {damping_pct} div 100 div n_nodes")
        else:
            share = F.lit(0).cast("long")
        ranks = base.select(
            "node",
            (
                teleport
                + F.expr(f"coalesce(s, 0L) * {damping_pct} div 100")
                + share
            ).alias("r"),
        ).localCheckpoint(eager=True)
    return ranks.select("node", F.col("r").alias("rank_scaled"))


def triangle_counts(edges: DataFrame, orient: str = "id") -> DataFrame:
    """Per-node triangle participation over the undirected version of
    ``edges`` → ``(node, n_triangles)``, every node present (0 if none).

    Orienting every undirected edge along a total order turns each
    triangle into exactly one 2-path + closing edge: e1=(a,b) ⋈ e2=(b,c)
    ⋈ e3=(a,c). ``orient='id'`` uses the node id (keeps the oracle twin
    byte-identical); ``orient='degree'`` uses (degree, id) — the
    standard skew bound: every node's out-fan is O(sqrt(m)) regardless
    of max degree, so a celebrity node cannot blow up the e1⋈e2 join.
    Both orientations count the same triangles (pinned in tests)."""
    und0 = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    if orient == "degree":
        deg = (
            und0.select(F.col("a").alias("node"))
            .unionAll(und0.select("b"))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        und0 = (
            und0.join(deg.withColumnsRenamed({"node": "a", "deg": "da"}), "a")
            .join(deg.withColumnsRenamed({"node": "b", "deg": "db"}), "b")
            .select(
                F.when(
                    (F.col("da") < F.col("db"))
                    | ((F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))),
                    F.struct(F.col("a").alias("a"), F.col("b").alias("b")),
                )
                .otherwise(F.struct(F.col("b").alias("a"), F.col("a").alias("b")))
                .alias("e")
            )
            .select("e.a", "e.b")
        )
    elif orient != "id":
        raise ValueError(f"unknown orientation {orient!r}")
    # Materialize the oriented edge set ONCE — it feeds four plan arms
    # (e1/e2/e3/nodes); without the checkpoint each arm re-runs the full
    # upstream edge-derivation pipeline (audited: 8 redundant fact scans
    # on the trade graph).
    und = und0.localCheckpoint(eager=True)
    e1 = und.select(F.col("a").alias("t_a"), F.col("b").alias("t_b"))
    e2 = und.select(F.col("a").alias("t_b"), F.col("b").alias("t_c"))
    e3 = und.select(F.col("a").alias("t_a"), F.col("b").alias("t_c"))
    tri = e1.join(e2, "t_b").join(e3, ["t_a", "t_c"])
    nodes = und.select(F.col("a").alias("node")).union(und.select("b")).distinct()
    # One pass over the (potentially huge) triangle set: explode the 3
    # corners per row instead of scanning tri three times via unionAll.
    member = (
        tri.select(F.explode(F.array("t_a", "t_b", "t_c")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    return nodes.join(member, "node", "left").select(
        "node", F.coalesce("n", F.lit(0).cast("long")).alias("n_triangles")
    )
