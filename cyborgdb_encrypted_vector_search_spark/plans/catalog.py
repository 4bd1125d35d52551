"""The query catalog: every implemented operator as a named query with
its DuckDB oracle twin.

This is the single source for ``__spark_entry__.queries()`` /
``oracle_sql()``. Each entry is registered with @query(name, sql=...);
the Spark callable takes (spark, sf_dir) and returns a DataFrame whose
column names/types match the oracle SQL exactly (the driver hashes
values after sorting columns by name — SURVEY.md §5).

Determinism rules used throughout:
- every float that crosses the comparison boundary is rounded (typically
  7 dp) *after* all math is done in double precision;
- sums over doubles go through DECIMAL(18,4) so partial-aggregation
  order cannot change the result;
- top-k always tie-breaks on a unique id;
- timestamps are cast to DATE or string before output.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cyborgdb_encrypted_vector_search_spark.functions import hashing as H
from cyborgdb_encrypted_vector_search_spark.functions import text as X
from cyborgdb_encrypted_vector_search_spark.functions import vector as V
from cyborgdb_encrypted_vector_search_spark.operators import dedup, knn
from cyborgdb_encrypted_vector_search_spark.sources.registry import load


@dataclass
class CatalogEntry:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    sql: str | None  # None → not SQL-expressible; driver does rows-only check


CATALOG: dict[str, CatalogEntry] = {}


def query(name: str, sql: str | None):
    def deco(fn):
        CATALOG[name] = CatalogEntry(name, fn, sql)
        return fn

    return deco


# ----------------------------------------------------------------------
# Vector-collection queries (reference parity: SURVEY.md §2.1-2.6)
# ----------------------------------------------------------------------

_COS = V.sql_cosine("e.embedding", "t.t")

@query(
    "knn_topk_cosine",
    f"""
    WITH target AS (
      SELECT embedding AS t FROM embeddings WHERE vec_id = 42
    ),
    scored AS (
      SELECT e.vec_id AS vec_id, round({_COS}, 7) AS score
      FROM embeddings e CROSS JOIN target t
    ),
    top AS (
      SELECT vec_id, score FROM scored ORDER BY score DESC, vec_id ASC LIMIT 3
    )
    SELECT top.vec_id AS vec_id, d.text AS text, top.score AS score
    FROM top JOIN documents d ON top.vec_id = d.doc_id
    """,
)
def knn_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship (SURVEY.md §7 minimum slice): point-get the stored vector
    for id 42 (reference src/cod.py:107-120), score the whole collection
    against it (src/app.py:134), keep the top-3 (src/cod.py:127,
    n_results=3), join back to document text.

    Plan shape: 1-row broadcast target → corpus scan+project →
    TakeOrderedAndProject(3) → broadcast join to documents. No wide
    shuffle at any corpus size.
    """
    emb = load(spark, "embeddings", sf_dir)
    docs = load(spark, "documents", sf_dir)
    target = emb.filter(F.col("vec_id") == 42).select(F.col("embedding").alias("__t"))
    top = (
        emb.crossJoin(F.broadcast(target))
        .select(
            "vec_id",
            F.round(V.cosine("embedding", "__t"), 7).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("vec_id"))
        .limit(3)
    )
    return top.join(F.broadcast(docs), top["vec_id"] == docs["doc_id"]).select(
        "vec_id", "text", "score"
    )


@query(
    "vector_point_get",
    f"""
    SELECT vec_id, label,
           CAST(len(embedding) AS BIGINT) AS dim,
           round({V.sql_norm('embedding')}, 7) AS norm
    FROM embeddings WHERE vec_id IN (1, 42, 123)
    """,
)
def vector_point_get(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point lookup by key incl. derived vector stats (reference
    src/cod.py:107-120). The IN-filter is pushed to the Parquet scan."""
    emb = load(spark, "embeddings", sf_dir)
    return emb.filter(F.col("vec_id").isin([1, 42, 123])).select(
        "vec_id",
        "label",
        F.size("embedding").cast("bigint").alias("dim"),
        F.round(V.norm("embedding"), 7).alias("norm"),
    )


@query(
    "vector_scan_stats",
    f"""
    SELECT label,
           CAST(count(*) AS BIGINT) AS n_vectors,
           round(avg({V.sql_norm('embedding')}), 7) AS avg_norm,
           CAST(sum(CASE WHEN len(embedding) = 64 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dim_ok
    FROM embeddings GROUP BY label
    """,
)
def vector_scan_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 'leak' full scan (reference src/chromadb_store.py:10-12)
    generalized to a per-label profile with the dim-check constraint
    (SURVEY.md §1.3). avg over per-row norms: norms are bit-identical
    per row in both engines, and the mean of <=N values at 7dp-rounded
    display tolerance is stable."""
    emb = load(spark, "embeddings", sf_dir)
    return emb.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.round(F.avg(V.norm("embedding")), 7).alias("avg_norm"),
        F.sum(
            F.when(V.dim_check("embedding", 64), 1).otherwise(0)
        ).cast("bigint").alias("n_dim_ok"),
    )


_BCOS = V.sql_cosine("c.embedding", "q.embedding")

@query(
    "knn_batch_topk",
    f"""
    WITH scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             round({_BCOS}, 7) AS score,
             row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY {_BCOS} DESC, c.vec_id ASC
             ) AS rnk
      FROM embeddings q CROSS JOIN embeddings c
      WHERE q.vec_id < 10
    )
    SELECT query_id, neighbor_id, score
    FROM scored WHERE rnk <= 3
    """,
)
def knn_batch_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """General kNN join: 10 query vectors x corpus, top-3 each
    (reference src/cod.py:124-129 generalized to a query batch).
    Broadcast the query side; WindowGroupLimit keeps the rank partial."""
    emb = load(spark, "embeddings", sf_dir)
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    res = knn.knn_join(
        queries,
        emb.select(F.col("vec_id").alias("neighbor_id"), "embedding"),
        k=3,
        query_id_col="query_id",
        query_vec_col="query_vec",
        corpus_id_col="neighbor_id",
        corpus_vec_col="embedding",
    )
    return res.select(
        "query_id", "neighbor_id", F.round("score", 7).alias("score")
    )


# ----------------------------------------------------------------------
# Relational pack (generalized operators: joins/aggs/windows/set ops)
# ----------------------------------------------------------------------

@query(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
           CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
             AS sum_disc_price,
           CAST(count(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-filter-aggregate with map-side partials.
    Sums run through DECIMAL(18,4) so partial-agg order can't change the
    result vs the oracle; output cast back to DOUBLE for schema parity."""
    li = load(spark, "lineitem", sf_dir)
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,4)"))
            .cast("double")
            .alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,4)"))
            .cast("double")
            .alias("sum_base_price"),
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,4)"
                )
            )
            .cast("double")
            .alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "q3_top_unshipped_orders",
    """
    SELECT o.o_orderkey AS o_orderkey,
           strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
           CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4)))
                AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY o.o_orderkey, o.o_orderdate
    ORDER BY revenue DESC, o_orderkey ASC
    LIMIT 10
    """,
)
def q3_top_unshipped_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter -> fact join -> agg -> top-k.
    customer is small relative to lineitem: broadcast it; the
    lineitem-orders join shuffles on orderkey (the natural key)."""
    c = load(spark, "customer", sf_dir).filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, "orders", sf_dir).filter(
        F.col("o_orderdate") < F.lit("1995-03-15").cast("timestamp")
    )
    l = load(spark, "lineitem", sf_dir).filter(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp")
    )
    return (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,4)"
                )
            )
            .cast("double")
            .alias("revenue")
        )
        .select(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "revenue",
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


@query(
    "q5_nation_revenue",
    """
    SELECT n.n_name AS n_name,
           CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4)))
                AS DOUBLE) AS revenue
    FROM region r
    JOIN nation n ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    """,
)
def q5_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: star join, dims broadcast, one shuffle on the
    fact keys + one on the group key."""
    r = load(spark, "region", sf_dir).filter(F.col("r_name") == "ASIA")
    n = load(spark, "nation", sf_dir)
    c = load(spark, "customer", sf_dir)
    o = load(spark, "orders", sf_dir)
    l = load(spark, "lineitem", sf_dir)
    return (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy("n_name")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,4)"
                )
            )
            .cast("double")
            .alias("revenue")
        )
    )


@query(
    "q_window_top_orders_per_cust",
    """
    WITH ranked AS (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (
               PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey ASC
             ) AS rnk
      FROM orders
    )
    SELECT o_custkey, o_orderkey,
           round(o_totalprice, 4) AS o_totalprice, CAST(rnk AS INT) AS rnk
    FROM ranked WHERE rnk <= 2 AND o_custkey < 100
    """,
)
def q_window_top_orders_per_cust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k via window rank (SURVEY.md W1/W2 generalization).
    Spark >=3.5 plans the rank<=2 filter as WindowGroupLimit: per-
    partition partial limit before the shuffle."""
    o = load(spark, "orders", sf_dir)
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rnk", F.row_number().over(w))
        .filter((F.col("rnk") <= 2) & (F.col("o_custkey") < 100))
        .select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 4).alias("o_totalprice"),
            F.col("rnk").cast("int").alias("rnk"),
        )
    )


@query(
    "q_events_json_agg",
    """
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value,
           CAST(sum(CASE WHEN CAST(json_extract_string(props, '$.k') AS INT) > 50
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_high_k
    FROM events GROUP BY event_type
    """,
)
def q_events_json_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured ops: JSON prop extraction (from_json) + multi-agg
    incl. distinct count (SURVEY.md §2.4 generalization)."""
    ev = load(spark, "events", sf_dir)
    k = F.from_json(F.col("props"), "k INT")["k"]
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count_distinct(F.col("user_id")).alias("n_users"),
        F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("total_value"),
        F.sum(F.when(k > 50, 1).otherwise(0)).cast("bigint").alias("n_high_k"),
    )


def entries() -> dict[str, CatalogEntry]:
    return dict(CATALOG)
