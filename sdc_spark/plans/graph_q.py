"""Round-4 graph analytics: co-engagement graph construction with a
hot-item cap, and degree-oriented triangle counting.

The classic scale trap in both steps is quadratic blowup: bipartite
projection explodes on hot items (an item with a million users is 5·10¹¹
pairs) and naive triangle enumeration explodes on hub nodes. Both are
bounded here the way production graph pipelines do it: items are capped
to their md5-first ``_CAP`` users (deterministic, engine-independent),
and triangle enumeration orients every edge from the lower-(degree, id)
endpoint to the higher one, so each wedge is generated at most once and
hub fan-out is bounded by the orientation. Fully DuckDB-oracled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from sdc_spark.materialize import materialize as _materialize

from sdc_spark.plans.registry import oracle, query
from sdc_spark.sources.readers import read_table

_CAP = 30  # max users kept per (event_type, day) item


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct undirected co-engagement edges (u < v): two users touched
    the same (event_type, day) item; each item capped to its md5-first
    _CAP users so pair fan-out per item is <= C(_CAP, 2)."""
    ev = read_table(spark, sf_dir, "events")
    items = ev.select(
        "user_id",
        "event_type",
        F.date_trunc("day", F.col("ts").cast("timestamp")).alias("day"),
    ).distinct()
    rk = F.row_number().over(
        W.partitionBy("event_type", "day").orderBy(
            F.md5(F.col("user_id").cast("string").cast("binary")), "user_id"
        )
    )
    capped = items.withColumn("rk", rk).filter(F.col("rk") <= _CAP)
    a = capped.select("event_type", "day", F.col("user_id").alias("u"))
    b = capped.select("event_type", "day", F.col("user_id").alias("v"))
    return (
        a.join(b, ["event_type", "day"])
        .filter(F.col("u") < F.col("v"))
        .select("u", "v")
        .distinct()
    )


@query("graph_triangle_count")
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user triangle participation in the co-engagement graph.

    Orientation: edge {u,v} is directed from the endpoint with lower
    (degree, id) to the higher one; wedges are enumerated only from each
    node's SMALLER-degree side, so enumeration cost is O(Σ d_oriented²) —
    the arboricity-bounded form — instead of O(Σ d²) on hubs. Three hash
    joins total; the edge list is materialized once and reused for all
    three sides."""
    und = _edges(spark, sf_dir).transform(_materialize)
    deg = (
        und.select(F.col("u").alias("n"))
        .union(und.select("v"))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    e = (
        und.join(deg.withColumnRenamed("n", "u").withColumnRenamed("d", "du"), "u")
        .join(deg.withColumnRenamed("n", "v").withColumnRenamed("d", "dv"), "v")
        .select(
            F.when(
                (F.col("du") < F.col("dv"))
                | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))),
                F.struct(F.col("u").alias("s"), F.col("v").alias("t")),
            )
            .otherwise(F.struct(F.col("v").alias("s"), F.col("u").alias("t")))
            .alias("e")
        )
        .select("e.s", "e.t")
    )
    e1 = e.select(F.col("s").alias("a"), F.col("t").alias("b"))
    e2 = e.select(F.col("s").alias("b"), F.col("t").alias("c"))
    e3 = e.select(F.col("s").alias("a2"), F.col("t").alias("c2"))
    tri = (
        e1.join(e2, "b")
        .join(
            e3,
            (F.col("a") == F.col("a2")) & (F.col("c") == F.col("c2")),
        )
        .select("a", "b", "c")
    )
    per_node = (
        tri.select(F.explode(F.array("a", "b", "c")).alias("user_id"))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    return per_node


oracle(
    "graph_triangle_count",
    """
    WITH items AS (
        SELECT DISTINCT user_id, event_type,
               date_trunc('day', CAST(ts AS TIMESTAMP)) AS day
        FROM events
    ), capped AS (
        SELECT * FROM (
            SELECT user_id, event_type, day,
                   row_number() OVER (
                       PARTITION BY event_type, day
                       ORDER BY md5(CAST(user_id AS VARCHAR)), user_id
                   ) AS rk
            FROM items
        ) WHERE rk <= 30
    ), und AS (
        SELECT DISTINCT a.user_id AS u, b.user_id AS v
        FROM capped a JOIN capped b
          ON a.event_type = b.event_type AND a.day = b.day
        WHERE a.user_id < b.user_id
    ), deg AS (
        SELECT n, count(*) AS d FROM (
            SELECT u AS n FROM und UNION ALL SELECT v FROM und
        ) GROUP BY n
    ), e AS (
        SELECT CASE WHEN du < dv OR (du = dv AND u < v) THEN u ELSE v END AS s,
               CASE WHEN du < dv OR (du = dv AND u < v) THEN v ELSE u END AS t
        FROM und
        JOIN deg d1 ON d1.n = und.u
        JOIN deg d2 ON d2.n = und.v,
        LATERAL (SELECT d1.d AS du, d2.d AS dv) x
    ), tri AS (
        SELECT e1.s AS a, e1.t AS b, e2.t AS c
        FROM e e1 JOIN e e2 ON e1.t = e2.s
        JOIN e e3 ON e3.s = e1.s AND e3.t = e2.t
    )
    SELECT user_id, count(*) AS n_triangles FROM (
        SELECT a AS user_id FROM tri
        UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri
    ) GROUP BY user_id
    """,
)
