"""Round-5 frame-expression surface queries: the quote-safe query()/eval()
string translator, pandas-exact positional take (request order, duplicate
positions, negative indices), and order-aware scans over a sorted frame
(cumsum computed in the CURRENT row order, as pandas does after
sort_values).

All three run through the production frame API (frame/core.py), not
hand-written DataFrame code, so the driver's oracle gate exercises the
same paths users hit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sdc_spark.frame.core import IDX, SparkFrame
from sdc_spark.plans.registry import oracle, query
from sdc_spark.sources.readers import read_table


@query("frame_query_eval")
def frame_query_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """df.query + df.eval from expression strings (ref: the reference has
    no query/eval — this is the pandas-parity extension): a pandas-syntax
    predicate with an in-list, `&`, `~` and a quoted literal compiles to a
    Catalyst filter (pushdown-eligible), then an eval() assignment adds a
    computed bucket column. The translator rewrites operators only OUTSIDE
    quoted regions, so the 'src0' literal survives."""
    doc = read_table(spark, sf_dir, "documents")
    sf = SparkFrame(
        doc.select(
            F.col("doc_id").alias(IDX), "lang", "source", "n_chars"
        )
    )
    out = (
        sf.query("lang in ['en', 'de'] & (n_chars > 500) & ~(source == 'src0')")
        .eval("bucket = n_chars - n_chars % 100")
    )
    return (
        out._df.groupBy("lang", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("lang", "bucket")
    )


oracle(
    "frame_query_eval",
    """
    SELECT lang, n_chars - n_chars % 100 AS bucket, count(*) AS n
    FROM documents
    WHERE lang IN ('en', 'de') AND n_chars > 500 AND NOT (source = 'src0')
    GROUP BY lang, bucket
    ORDER BY lang, bucket
    """,
)


@query("frame_take_positions")
def frame_take_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pandas df.take over a sorted frame: positions resolve in the
    CURRENT (sorted) row order, the result preserves the REQUESTED order
    including a duplicated position, and a negative index resolves against
    len(df). The request list is broadcast against distributed positions —
    the data is never collected."""
    cust = read_table(spark, sf_dir, "customer")
    sf = SparkFrame(
        cust.select(
            F.col("c_custkey").alias(IDX),
            F.col("c_custkey").alias("custkey"),
            "c_name",
            "c_acctbal",
        )
    )
    got = sf.sort_values(["c_acctbal", "custkey"], ascending=[False, True]).take(
        [0, 5, 5, -1]
    )
    return got._df.select(
        F.col("__ord__").alias("rk"),
        "c_name",
        F.round(F.col("c_acctbal") * 100).cast("long").alias("acctbal_e2"),
    ).orderBy("rk")


oracle(
    "frame_take_positions",
    """
    WITH ranked AS (
        SELECT c_name, c_acctbal,
               row_number() OVER (ORDER BY c_acctbal DESC, c_custkey) - 1 AS pos
        FROM customer
    ), req AS (
        SELECT 0 AS rk, 0 AS pos
        UNION ALL SELECT 1, 5
        UNION ALL SELECT 2, 5
        UNION ALL SELECT 3, (SELECT count(*) FROM customer) - 1
    )
    SELECT req.rk, ranked.c_name,
           CAST(round(ranked.c_acctbal * 100) AS BIGINT) AS acctbal_e2
    FROM ranked JOIN req USING (pos)
    ORDER BY req.rk
    """,
)


@query("frame_sorted_cumsum")
def frame_sorted_cumsum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sort_values(...).cumsum(): the scan runs in the SORTED row order
    (pandas semantics — the carried __ord__ rank is the scan key), not the
    original index order. Integer quantities keep the running sum exact.
    One range partition + one P-row offsets broadcast for the whole frame
    (operators/order.scan_multi)."""
    li = read_table(spark, sf_dir, "lineitem")
    uid = (F.col("l_orderkey") * 10 + F.col("l_linenumber")).cast("long")
    sf = SparkFrame(
        li.select(
            uid.alias(IDX),
            uid.alias("uid"),
            "l_extendedprice",
            F.col("l_quantity").cast("long").alias("qty"),
        )
    )
    out = sf.sort_values(["l_extendedprice", "uid"]).cumsum()
    return out._df.select(
        F.col(IDX).alias("uid"), F.col("qty").alias("run_qty")
    ).orderBy("uid")


oracle(
    "frame_sorted_cumsum",
    """
    SELECT l_orderkey * 10 + l_linenumber AS uid,
           CASE WHEN l_quantity IS NULL THEN NULL ELSE
               CAST(sum(CAST(l_quantity AS BIGINT)) OVER (
                   ORDER BY l_extendedprice NULLS LAST,
                            l_orderkey * 10 + l_linenumber
                   ROWS UNBOUNDED PRECEDING) AS BIGINT)
           END AS run_qty
    FROM lineitem
    ORDER BY uid
    """,
)
