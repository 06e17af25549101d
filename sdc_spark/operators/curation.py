"""Training-data curation operators: sequence packing and exact
stratified sampling.

Both are deterministic pure-DataFrame compositions (no Python, no
randomness source that differs across engines) so they are fully
SQL-oracle-able despite being 'sampling'/'packing' ops.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from sdc_spark.operators import order as sorder


def pack_sequences(
    df: DataFrame,
    id_col: str,
    tokens_col: str | Column,
    budget: int,
) -> DataFrame:
    """Concat-and-chunk sequence packing (the GPT-style pretraining layout:
    documents are concatenated in a canonical order and the stream is cut
    into fixed ``budget``-token windows).

    pack_id = floor(prefix_tokens / budget), offset = prefix_tokens mod
    budget, where prefix_tokens counts all tokens BEFORE this doc in
    ``id_col`` order. A doc whose span crosses a cut belongs to the pack
    it starts in (its ``spans_boundary`` flag marks the split for the
    loader). Prefix sums run on the distributed scan machinery
    (operators/order.py) — range partition + P-row offset broadcast, no
    single-partition pass.
    """
    t = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    base = df.select(F.col(id_col).alias("doc"), t.cast("long").alias("__tok__"))
    scanned = sorder.scan_sum(base, ["doc"], F.col("__tok__"), "__cum__")
    start = F.col("__cum__") - F.col("__tok__")
    return scanned.select(
        "doc",
        F.col("__tok__").alias("n_tokens"),
        (start / budget).cast("long").alias("pack_id"),
        (start % budget).alias("offset"),
        ((start / budget).cast("long") != ((F.col("__cum__") - 1) / budget).cast("long")).alias(
            "spans_boundary"
        ),
    )


def sample_stratified(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    n_per_stratum: int,
) -> DataFrame:
    """Exact deterministic stratified sample: n rows per stratum, chosen by
    rank over md5(id) — a uniform-but-reproducible order any engine can
    replicate (unlike Bernoulli sampleBy, which is approximate and
    RNG-dependent). One hash shuffle on the stratum key; per-stratum
    top-n via window rank (AQE handles skewed strata)."""
    w = W.partitionBy(strata_col).orderBy(
        F.md5(F.col(id_col).cast("string").cast("binary")), F.col(id_col)
    )
    return (
        df.withColumn("__rk__", F.row_number().over(w))
        .filter(F.col("__rk__") <= n_per_stratum)
        .drop("__rk__")
    )
