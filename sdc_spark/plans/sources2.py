"""Round-4 source-format coverage: ORC and line-delimited text.

Both queries are full round-trips — the engine WRITES the format once per
sf-dir (cached by a _SUCCESS marker, same pattern as src_read_csv), reads
it back through the normal Spark reader, and aggregates; the oracle runs
the same aggregate on the original parquet, so a value mismatch anywhere
in the write→read path flips the hash.

Scale note: both writers shard by the input's partitioning (no coalesce),
so a 100-TB export is embarrassingly parallel; the readers are ordinary
splittable Spark sources (ORC is natively splittable; text splits on line
boundaries), so re-ingest parallelism matches file count × block count.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sdc_spark.operators.dedup import normalized_text
from sdc_spark.plans.registry import oracle, query
from sdc_spark.sources.readers import read_table


@query("src_read_orc")
def src_read_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC round-trip (reference's format surface is CSV/parquet/np-binary
    — sdc/io/csv_ext.py, parquet_pio.py, np_io.py; ORC is the same
    columnar contract through Spark's second native columnar format).
    Write events to ORC with zlib, read back, aggregate per event_type."""
    tag = os.path.basename(sf_dir.rstrip("/"))
    path = f"/tmp/sdc_spark_orc_{tag}/events"
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        read_table(spark, sf_dir, "events").write.mode("overwrite").option(
            "compression", "zlib"
        ).orc(path)
    ev = spark.read.orc(path)
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 4).alias("sum_value"),
        F.countDistinct("user_id").alias("n_users"),
        F.unix_micros(F.max("ts").cast("timestamp")).alias("max_ts_us"),
    )


oracle(
    "src_read_orc",
    """
    SELECT event_type, count(*) AS n, round(sum(value), 4) AS sum_value,
           count(DISTINCT user_id) AS n_users,
           epoch_us(CAST(max(ts) AS TIMESTAMP)) AS max_ts_us
    FROM events GROUP BY 1
    """,
)


@query("src_read_text")
def src_read_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line-delimited text source (`spark.read.text`): export documents as
    `doc_id<TAB>normalized_text` lines (normalization collapses internal
    newlines so one doc == one line), read the lines back, re-split, and
    profile token counts per leading-token bucket. Exercises the text
    writer/reader plus string surgery on re-ingest."""
    tag = os.path.basename(sf_dir.rstrip("/"))
    path = f"/tmp/sdc_spark_text_{tag}/documents"
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        read_table(spark, sf_dir, "documents").select(
            F.concat_ws(
                "\t", F.col("doc_id").cast("string"), normalized_text(F.col("text"))
            ).alias("value")
        ).write.mode("overwrite").text(path)
    lines = spark.read.text(path)
    tab = F.instr(F.col("value"), "\t")
    parsed = lines.select(
        F.substring(F.col("value"), F.lit(1), tab - 1).cast("long").alias("doc_id"),
        F.expr("substring(value, instr(value, '\t') + 1)").alias("norm"),
    )
    toks = parsed.select(
        "doc_id",
        F.size(F.split(F.col("norm"), " ")).alias("n_tok"),
        F.element_at(F.split(F.col("norm"), " "), 1).alias("first_tok"),
    )
    return (
        toks.groupBy(F.substring("first_tok", 1, 1).alias("initial"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("total_tok"),
            F.min("doc_id").alias("min_doc"),
        )
    )


oracle(
    "src_read_text",
    r"""
    WITH norm AS (
        SELECT doc_id,
               string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ') AS t
        FROM documents
    )
    SELECT substring(t[1], 1, 1) AS initial,
           count(*) AS n_docs,
           CAST(sum(len(t)) AS BIGINT) AS total_tok,
           min(doc_id) AS min_doc
    FROM norm GROUP BY 1
    """,
)


@query("src_np_datasource")
def src_np_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """np.fromfile as a first-class SPLITTABLE Spark source (sources/
    np_source.py, Spark 4 Python DataSource API): order totals are
    exported once as raw float64 parts in global o_orderkey order
    (repartitionByRange + sortWithinPartitions — files concatenate to the
    sorted array), read back as (pos, value) through the npbin format,
    and profiled per 1000-element block. Positions must line up with the
    oracle's row_number over the sorted column, so this round-trips BOTH
    the bytes and the global ordering."""
    from sdc_spark.sources import np_source
    from sdc_spark.sources.writers import to_numpy_binary

    tag = os.path.basename(sf_dir.rstrip("/"))
    path = f"/tmp/sdc_spark_npsrc_{tag}/totalprice"
    if not glob.glob(os.path.join(path, "part-*.bin")):
        ord_sorted = (
            read_table(spark, sf_dir, "orders")
            .repartitionByRange(8, "o_orderkey")
            .sortWithinPartitions("o_orderkey")
        )
        to_numpy_binary(ord_sorted, "o_totalprice", path, dtype="float64")
    np_source.register(spark)
    df = spark.read.format("npbin").option("path", path).load()
    # block sums in integer cents: a float-double sum of ~1000 values can
    # differ in the last ulps between engines, which round() can't always
    # absorb — integer accumulation is exact on both sides
    return df.groupBy((F.col("pos") / 1000).cast("long").alias("block")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("block_cents"),
        F.round(F.min("value"), 2).alias("lo"),
        F.round(F.max("value"), 2).alias("hi"),
    )


oracle(
    "src_np_datasource",
    """
    WITH p AS (
        SELECT row_number() OVER (ORDER BY o_orderkey) - 1 AS pos, o_totalprice
        FROM orders
    )
    SELECT CAST(pos // 1000 AS BIGINT) AS block, count(*) AS n,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS block_cents,
           round(min(o_totalprice), 2) AS lo,
           round(max(o_totalprice), 2) AS hi
    FROM p GROUP BY 1
    """,
)
