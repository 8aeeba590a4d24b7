"""Clustering catalog wave: distributed k-means over the embeddings
table (fixed-point Lloyd's — `operators/clustering.py`).

Reference parity note: the reference (/root/reference) has no
clustering surface — extension operator for the LLM-data-pipeline
family (topic bucketing / cluster-stratified sampling over ~10^9
embedding rows).

Oracle discipline: identical to ``plans/graph.py`` PageRank — every
update step is integer-exact (quantized vectors, int64 distances,
floor-mean centroids), so the DuckDB twin unrolls the same rounds as
chained CTEs and reproduces every assignment and distance bit-for-bit.
The oracle hardcodes dim=64 (the testdata layout); the Spark operator
is dimension-agnostic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jhu_data_parser_spark.plans.catalog import query
from jhu_data_parser_spark.sources.tables import load_table

_K = 10
_ITERS = 3
_SCALE = 1_000_000
_DIM = 64  # oracle-side only; testdata embeddings are 64-dim


def _kmeans_ctes(
    k: int = _K,
    iters: int = _ITERS,
    where: str = "",
    prefix: str = "",
    dim: int = _DIM,
    lo: int | None = None,
    src: str = "embeddings",
    pts_body: str | None = None,
) -> str:
    """The unrolled assign/update CTE chain (shared by the kmeans
    queries here, the IVF recall report in pipeline5, and the PQ
    subspace fits in pipeline6). ``where`` optionally restricts the
    point set (e.g. corpus-only for an IVF index); ``prefix`` namespaces
    the CTEs so several chains coexist in one statement; ``lo``/``dim``
    fit on the 1-based slice [lo, lo+dim) of the embedding (a PQ
    subspace) instead of the full vector; ``src`` is the FROM source —
    a table name or an aliased ``(subquery) t`` exposing
    (vec_id, embedding); ``pts_body`` overrides the whole point-set
    CTE body (must yield ``(id, q)`` with q already an int list —
    e.g. residual vectors for residual-PQ chains), in which case
    where/lo/src are ignored for the point set."""
    sl = f"[{lo}:{lo + dim - 1}]" if lo is not None else ""
    P = prefix
    default_pts = f"""SELECT vec_id AS id,
                   list_transform(CAST(embedding AS DOUBLE[]){sl},
                                  x -> CAST(ROUND(x * {_SCALE}) AS BIGINT)) AS q
            FROM {src} {where}"""
    parts = [
        f"""
    {P}pts AS ({pts_body if pts_body is not None else default_pts}),
    {P}c0 AS (SELECT CAST(row_number() OVER (ORDER BY id) - 1 AS BIGINT) AS cid, q AS c
           FROM (SELECT id, q FROM {P}pts ORDER BY id LIMIT {k}))"""
    ]
    for i in range(1, iters + 1):
        parts.append(f"""
    {P}a{i} AS (SELECT p.id, p.q, c.cid,
                    CAST(list_sum(list_transform(list_zip(p.q, c.c),
                         z -> (z[1] - z[2]) * (z[1] - z[2]))) AS BIGINT) AS d
             FROM {P}pts p CROSS JOIN {P}c{i - 1} c
             QUALIFY row_number() OVER (PARTITION BY p.id ORDER BY d, c.cid) = 1)""")
        if i < iters:
            parts.append(f"""
    {P}s{i} AS (SELECT cid, t.i AS pos,
                    CAST(SUM(q[t.i + 1]) AS BIGINT) AS s, COUNT(*) AS n
             FROM {P}a{i}, range({dim}) t(i) GROUP BY cid, t.i),
    {P}c{i} AS (SELECT p.cid, COALESCE(u.c, p.c) AS c
             FROM {P}c{i - 1} p LEFT JOIN
                  (SELECT cid, list(CAST(CASE WHEN s >= 0 THEN s // n
                                         ELSE -((-s + n - 1) // n) END AS BIGINT)
                                    ORDER BY pos) AS c
                   FROM {P}s{i} GROUP BY cid) u ON u.cid = p.cid)""")
    return ",".join(parts)


def _kmeans_oracle(k: int = _K, iters: int = _ITERS) -> str:
    """Unroll assign/update rounds as chained CTEs (same fixed-point
    rules as the operator; QUALIFY row_number gives the lowest-cid
    tie-break that struct-ordering gives the Spark side)."""
    return (
        "WITH "
        + _kmeans_ctes(k, iters)
        + f"\n    SELECT id AS vec_id, cid AS cluster, d AS dist_sq FROM a{iters}"
    )


@query("cluster_kmeans_embeddings", oracle=_kmeans_oracle())
def cluster_kmeans_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k=10 / 3-round fixed-point k-means over the embeddings table →
    per-vector (cluster, dist_sq). Assignment is a shuffle-free codegen
    argmin against a broadcast centroid array; each update round is one
    k·dim-group shuffle (operators/clustering.py docstring for the
    100 TB posture)."""
    from jhu_data_parser_spark.operators.clustering import (
        kmeans_assign,
        quantize_vectors,
    )

    pts = quantize_vectors(load_table(spark, sf_dir, "embeddings"))
    # collapse_duplicates: replicated corpora fit over distinct vectors
    # (bit-identical; only probed when the plain local bound overflows)
    out = kmeans_assign(pts, k=_K, iterations=_ITERS, collapse_duplicates=True)
    return out.select(F.col("id").alias("vec_id"), "cluster", "dist_sq")


@query(
    "cluster_kmeans_sizes",
    oracle=_kmeans_oracle()
    .replace(
        "SELECT id AS vec_id, cid AS cluster, d AS dist_sq",
        "SELECT cid AS cluster, CAST(COUNT(*) AS BIGINT) AS n_points, "
        "CAST(SUM(d) AS BIGINT) AS inertia_scaled",
    )
    + " GROUP BY cid",
)
def cluster_kmeans_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster cardinality + integer inertia (Σ dist_sq) — the
    convergence/skew diagnostic you watch when clustering a corpus:
    one extra k-group agg over the assignment."""
    from jhu_data_parser_spark.operators.clustering import (
        kmeans_assign,
        quantize_vectors,
    )

    pts = quantize_vectors(load_table(spark, sf_dir, "embeddings"))
    # collapse_duplicates: replicated corpora fit over distinct vectors
    # (bit-identical; only probed when the plain local bound overflows)
    out = kmeans_assign(pts, k=_K, iterations=_ITERS, collapse_duplicates=True)
    return out.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("n_points"),
        F.sum("dist_sq").alias("inertia_scaled"),
    )
