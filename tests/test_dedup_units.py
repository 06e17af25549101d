"""Unit pins for dedup primitives (shapes that broke during optimization)."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from sdc_spark.operators.dedup import (
    exact_dedup,
    jaccard,
    ngrams_of_tokens,
    normalized_text,
    word_ngrams,
)


def test_ngrams_shapes(spark):
    df = spark.createDataFrame(
        [("the quick brown fox jumps",), ("a b",), ("one",), ("x x x x",)], "text string"
    )
    got = [
        r.g
        for r in df.select(
            ngrams_of_tokens(F.split(F.col("text"), " ")).alias("g")
        ).collect()
    ]
    assert got[0] == ["the quick brown", "quick brown fox", "brown fox jumps"]
    assert got[1] == ["a b"]
    assert got[2] == ["one"]
    assert got[3] == ["x x x"]  # distinct collapses repeats


def test_word_ngrams_normalizes(spark):
    df = spark.createDataFrame([("  The   QUICK\tbrown fox ",)], "text string")
    got = df.select(word_ngrams("text").alias("g")).collect()[0].g
    assert got == ["the quick brown", "quick brown fox"]


def test_jaccard_exact(spark):
    df = spark.createDataFrame([(["a", "b", "c"], ["b", "c", "d"])], "x array<string>, y array<string>")
    got = df.select(jaccard(F.col("x"), F.col("y")).alias("j")).collect()[0].j
    assert got == 2 / 4


def test_exact_dedup_keeps_min_id(spark):
    df = spark.createDataFrame(
        [(5, "Hello  World"), (2, "hello world"), (9, "other")], "doc_id long, text string"
    )
    rows = {r.keep_id: r.n_copies for r in exact_dedup(df, "text", "doc_id").collect()}
    assert rows == {2: 2, 9: 1}


def test_normalized_text(spark):
    df = spark.createDataFrame([("  A\t\tB  c ",)], "t string")
    assert df.select(normalized_text("t").alias("n")).collect()[0].n == "a b c"
