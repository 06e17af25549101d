"""Readers (SURVEY.md §2.1).

Reference surface being re-expressed (see /root/reference):
- ``pd.read_csv`` overload: sdc/datatypes/hpat_pandas_functions.py:101-446 and
  the pyarrow driver sdc/io/csv_ext.py:93-330 — parameters
  ``sep/delimiter, names, usecols, dtype, skiprows, parse_dates, converters``.
- Parquet read: sdc/io/parquet_pio.py:63-410.
- NumPy binary file: sdc/io/np_io.py:58-180.

Spark-first design: ``spark.read`` native sources, schema resolved at
analysis time (the reference resolves schema at Numba compile time — same
two-phase model). Column pruning / predicate pushdown come from Catalyst;
``usecols`` becomes a ``select`` so pruning reaches the scan.
"""

from __future__ import annotations

import os
from collections.abc import Callable, Mapping, Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

_DTYPE_MAP: dict[str, T.DataType] = {
    "int8": T.ByteType(),
    "int16": T.ShortType(),
    "int32": T.IntegerType(),
    "int64": T.LongType(),
    "int": T.LongType(),
    "float32": T.FloatType(),
    "float64": T.DoubleType(),
    "float": T.DoubleType(),
    "bool": T.BooleanType(),
    "str": T.StringType(),
    "object": T.StringType(),
    "datetime64[ns]": T.TimestampType(),
    # Spark DDL spellings, accepted alongside the pandas ones
    "tinyint": T.ByteType(),
    "smallint": T.ShortType(),
    "bigint": T.LongType(),
    "long": T.LongType(),
    "double": T.DoubleType(),
    "boolean": T.BooleanType(),
    "string": T.StringType(),
    "timestamp": T.TimestampType(),
    "date": T.DateType(),
}


def _spark_type(dtype: str | T.DataType) -> T.DataType:
    if isinstance(dtype, T.DataType):
        return dtype
    try:
        return _DTYPE_MAP[str(dtype)]
    except KeyError:
        raise ValueError(f"unsupported dtype {dtype!r}") from None


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def local_rows(spark: SparkSession, rows, schema: str) -> DataFrame:
    """Tiny driver-local literal frame (query workloads, audit rows) in
    ONE partition. ``spark.createDataFrame(list)`` parallelizes the list
    over defaultParallelism Python slices — 32 Python-worker round trips
    to evaluate a 7-row table, and a downstream ``coalesce(1)`` runs
    those round trips SEQUENTIALLY inside one task (profiled: 4-5s to
    write seven rows in the streaming gate; the noop-sink form still
    paid a 32-task storm). One slice = one worker round trip."""
    if not rows:
        return spark.createDataFrame([], schema)
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), schema
    )


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one of the standard test tables with schema normalization.

    ``events.ts`` is written as parquet TIMESTAMP(NANOS) which Spark's
    vectorized reader rejects; we read it via the legacy nanos-as-long path
    and convert to TimestampType at microsecond precision (the reference
    carries ns in its Timestamp struct — sdc/hiframes/pd_timestamp_ext.py:102-133
    — but Spark timestamps are µs; SURVEY §1.2 documents the accepted
    truncation).

    The session timezone is pinned to UTC here because the engine's
    timestamp semantics (epoch-microsecond outputs, oracle comparisons
    against naive-UTC engines) require it, and the caller's session may
    have been built elsewhere with a different default."""
    if spark.conf.get("spark.sql.session.timeZone", None) != "UTC":
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(table_path(sf_dir, name))
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        return df
    return spark.read.parquet(table_path(sf_dir, name))


def read_parquet(spark: SparkSession, path: str, columns: Sequence[str] | None = None) -> DataFrame:
    """Parquet scan (ref: sdc/io/parquet_pio.py:63-410).

    ``columns`` mirrors ``pd.read_parquet(columns=...)`` and becomes a
    ``select`` so Catalyst prunes the scan's ReadSchema.
    """
    df = spark.read.parquet(path)
    if columns is not None:
        df = df.select(*columns)
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: Sequence[str] = TABLES
) -> dict[str, DataFrame]:
    """Load the standard test tables from a scale-factor directory."""
    out = {}
    for name in names:
        p = table_path(sf_dir, name)
        if os.path.exists(p):
            out[name] = read_table(spark, sf_dir, name)
    return out


def _pandas_ddl(dt) -> str:
    """pandas inferred dtype -> Spark DDL type for the from_csv parse."""
    s = str(dt)
    if s.startswith("int") or s.startswith("uint"):
        return "bigint"
    if s.startswith("float"):
        return "double"
    if s == "bool":
        return "boolean"
    if s.startswith("datetime64"):
        return "timestamp"
    return "string"


def _head_sample(
    spark: SparkSession,
    path: str,
    sep: str,
    skiprows: int,
    header: bool,
    names: Sequence[str] | None,
    n_sample: int = 1000,
):
    """Bounded head-read of a CSV file: returns (preamble lines to drop,
    pandas-inferred sample frame). Local files are read directly; non-local
    paths fall back to a Spark ``head`` (single-file head order)."""
    import io as _io
    import itertools as _it

    import pandas as _pd

    n_pre = skiprows + (1 if header else 0)
    try:
        with open(path, newline="") as f:
            head = list(_it.islice(f, n_pre + n_sample))
    except OSError:
        head = [r[0] + "\n" for r in spark.read.text(path).head(n_pre + n_sample)]
    pre = [ln.rstrip("\r\n") for ln in head[:n_pre]]
    if names is not None:
        sample = _pd.read_csv(
            _io.StringIO("".join(head[n_pre:])), sep=sep, header=None, names=list(names)
        )
    else:
        sample = _pd.read_csv(
            _io.StringIO("".join(head[skiprows:])), sep=sep, header=0 if header else None
        )
    return pre, sample


def _drop_preamble(spark: SparkSession, text: DataFrame, pre_lines: Sequence[str]) -> DataFrame:
    """Remove exactly the preamble multiset from a text-lines DataFrame.

    Non-colliding rows stream through a plain filter; rows whose text equals
    some preamble line get occurrence numbers (window over the tiny
    colliding subset only) and the first k occurrences per value are
    dropped, k = that value's preamble multiplicity. Multiset-exact: a data
    row byte-identical to the header survives (indistinguishable rows, so
    which occurrence is dropped is immaterial)."""
    from collections import Counter

    from pyspark.sql import Window

    cnt = Counter(pre_lines)
    if not cnt:
        return text
    pre_vals = list(cnt)
    clean = text.filter(~F.col("value").isin(pre_vals))
    k_df = local_rows(
        spark, [(v, k) for v, k in cnt.items()], "value string, __k__ int"
    )
    w = Window.partitionBy("value").orderBy(F.monotonically_increasing_id())
    kept = (
        text.filter(F.col("value").isin(pre_vals))
        .withColumn("__occ__", F.row_number().over(w))
        .join(F.broadcast(k_df), "value")
        .filter(F.col("__occ__") > F.col("__k__"))
        .select("value")
    )
    return clean.unionByName(kept)


def read_csv(
    spark: SparkSession,
    path: str,
    sep: str = ",",
    delimiter: str | None = None,
    header: bool = True,
    names: Sequence[str] | None = None,
    usecols: Sequence[str] | None = None,
    dtype: Mapping[str, str | T.DataType] | None = None,
    skiprows: int = 0,
    parse_dates: Sequence[str] | None = None,
    converters: Mapping[str, Callable[[Column], Column]] | None = None,
    infer_schema: bool = True,
) -> DataFrame:
    """CSV reader mirroring the reference's ``pd.read_csv`` parameter subset
    (ref: sdc/datatypes/hpat_pandas_functions.py:101-446).

    - ``names`` renames the columns positionally (pandas: replaces header).
    - ``usecols`` → ``select`` (column pruning reaches the scan).
    - ``dtype`` → post-read casts (or pre-empts inference when complete).
    - ``skiprows`` → distributed row-index filter (the CSV source has no
      native skip-N; emulated with a per-file text filter).
    - ``parse_dates`` → TimestampType casts.
    - ``converters`` → Column-expression transforms applied per column
      (the reference applies arbitrary Python converters row-wise; here a
      converter is a ``Column -> Column`` builder so it stays JVM-side —
      wrap a pandas_udf if genuinely needed).
    """
    if delimiter:
        sep = delimiter

    reader = spark.read.option("sep", sep).option("header", str(bool(header)).lower())
    if infer_schema:
        reader = reader.option("inferSchema", "true")
    if skiprows:
        # Spark CSV cannot skip N leading rows. pandas' file model here is a
        # single logical file with a small leading preamble, so:
        #   1) bounded driver-side head-read — the preamble lines (to drop)
        #      and a sample the schema is inferred from with pandas' own
        #      inference (sample-based, like Spark's samplingRatio model);
        #   2) distributed body — drop exactly the preamble MULTISET from
        #      the text lines (value-equality alone would also drop any data
        #      row whose raw text coincides with a preamble/header line;
        #      occurrence-counted dropping keeps those), then ``from_csv``
        #      with the typed schema. Stays JVM-side — no RDD detour; the
        #      occurrence window runs only over the (tiny) colliding subset.
        pre_lines, sample = _head_sample(spark, path, sep, skiprows, header, names)
        body = _drop_preamble(spark, spark.read.text(path), pre_lines)
        ddl_cols = [str(c) for c in (names if names is not None else sample.columns)]
        if infer_schema:
            ddl = ", ".join(
                f"`{c}` {_pandas_ddl(sample[o].dtype)}"
                for c, o in zip(ddl_cols, sample.columns)
            )
        else:
            ddl = ", ".join(f"`{c}` string" for c in ddl_cols)
        df = body.select(
            F.from_csv(F.col("value"), ddl, {"sep": sep}).alias("r")
        ).select("r.*")
    else:
        df = reader.csv(path)
        if names is not None:
            df = df.toDF(*names)

    if usecols is not None:
        df = df.select(*usecols)
    if dtype:
        for c, dt in dtype.items():
            if c in df.columns:
                df = df.withColumn(c, F.col(c).cast(_spark_type(dt)))
    for c in parse_dates or []:
        if c in df.columns:
            df = df.withColumn(c, F.col(c).cast(T.TimestampType()))
    for c, fn in (converters or {}).items():
        if c in df.columns:
            df = df.withColumn(c, fn(F.col(c)))
    return df


def read_binary_files(spark: SparkSession, path: str) -> DataFrame:
    """Opaque binary ingest (ref np.fromfile, sdc/io/np_io.py:58-180) —
    returns (path, modificationTime, length, content) rows; the multimodal
    operators (sdc_spark.operators.multimodal) decode ``content``."""
    return spark.read.format("binaryFile").load(path)


def read_json(
    spark: SparkSession,
    path: str,
    schema: str | T.StructType | None = None,
    usecols: Sequence[str] | None = None,
    dtype: Mapping[str, str | T.DataType] | None = None,
    parse_dates: Sequence[str] | None = None,
    lines: bool = True,
    mode: str | None = None,
) -> DataFrame:
    """JSON-lines reader with the same parameter conventions as
    ``read_csv`` (the reference has no JSON source — this rounds out the
    §2.1 source family with Spark's native scanner).

    - explicit ``schema`` (DDL string or StructType) skips the inference
      pass — ALWAYS pass one in production: schema inference reads the
      data twice and samples nondeterministically on dirty corpora;
    - ``usecols`` prunes columns (reaches the scan);
    - ``dtype``/``parse_dates`` are post-read casts, as in read_csv;
    - ``lines=False`` reads multiLine JSON arrays (one JSON doc per file —
      NOT splittable; at scale keep ndjson).
    """
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if not lines:
        reader = reader.option("multiLine", "true")
    if mode is not None:
        # PERMISSIVE (default): corrupt lines land in
        # ``_corrupt_record`` (add it to the schema to observe them);
        # DROPMALFORMED: silently dropped; FAILFAST: abort the job. At
        # ingest scale PERMISSIVE + a corrupt-record quarantine column is
        # the operable choice — bad rows are countable and auditable.
        reader = reader.option("mode", mode)
    df = reader.json(path)
    if usecols is not None:
        df = df.select(*usecols)
    if dtype:
        for c, dt in dtype.items():
            if c in df.columns:
                df = df.withColumn(c, F.col(c).cast(_spark_type(dt)))
    for c in parse_dates or []:
        if c in df.columns:
            df = df.withColumn(c, F.col(c).cast(T.TimestampType()))
    return df
