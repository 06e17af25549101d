"""Categorical support (SURVEY.md §1.2): the reference packs categoricals
as minimal-width integer codes + a category list
(/root/reference/sdc/datatypes/categorical/types.py:43-110). Spark has no
first-class categorical type; the engine-level convention is an explicit
(codes: int, categories: broadcastable dim table) pair — dictionary
encoding in Parquet handles the storage side automatically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def categories_of(df: DataFrame, col: str) -> DataFrame:
    """Sorted distinct categories with dense codes 0..k-1 (the reference
    sorts categories, types.py ordered-categories model)."""
    w = Window.orderBy(col)
    return (
        df.select(col)
        .filter(F.col(col).isNotNull())  # null is not a category (code -1)
        .distinct()
        .select(F.col(col).alias("category"), (F.row_number().over(w) - 1).alias("code"))
    )


def encode(df: DataFrame, col: str, out: str | None = None) -> DataFrame:
    """Attach integer codes for a string column via a broadcast join against
    the category dim — the distributed equivalent of pandas .cat.codes.
    Null category → code -1 (pandas convention)."""
    out = out or f"{col}_code"
    cats = categories_of(df, col).withColumnsRenamed({"category": col, "code": out})
    joined = df.join(F.broadcast(cats), col, "left")
    return joined.withColumn(out, F.coalesce(F.col(out), F.lit(-1)))


def decode(df: DataFrame, code_col: str, categories: DataFrame, out: str) -> DataFrame:
    """codes → category strings (broadcast dim join)."""
    dim = categories.withColumnsRenamed({"code": code_col, "category": out})
    return df.join(F.broadcast(dim), code_col, "left")
