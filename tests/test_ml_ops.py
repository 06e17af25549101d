"""Property/differential tests for the ML-parity operators — the pieces
the SQL oracles can't pin (k-means' xxhash64 seeding) plus numpy
differentials for the closed-form fits."""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

from sdc_spark.operators.ml import kmeans_fit, linreg_fit, logreg_fit_gd
from sdc_spark.sources.readers import read_table


def _features(spark, sf_dir, cols):
    li = read_table(spark, sf_dir, "lineitem")
    pdf = li.select(*cols).toPandas()
    return pdf[list(cols)].to_numpy(dtype=float)


def test_linreg_fit_matches_numpy_lstsq(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem")
    w = linreg_fit(li, ["l_quantity", "l_discount"], "l_extendedprice")
    pdf = li.select("l_quantity", "l_discount", "l_extendedprice").toPandas()
    X = np.column_stack(
        [np.ones(len(pdf)), pdf.l_quantity.to_numpy(), pdf.l_discount.to_numpy()]
    )
    y = pdf.l_extendedprice.to_numpy()
    ref, *_ = np.linalg.lstsq(X, y, rcond=None)
    np.testing.assert_allclose(w, ref, rtol=1e-6)


def test_logreg_gd_matches_numpy_loop(spark, sf_dir):
    from pyspark.sql import functions as F

    li = read_table(spark, sf_dir, "lineitem").select(
        (F.col("l_quantity") / 50.0).alias("x1"),
        F.col("l_discount").alias("x2"),
        F.when(F.col("l_returnflag") == "R", 1.0).otherwise(-1.0).alias("y"),
    )
    w = logreg_fit_gd(li, ["x1", "x2"], "y", iterations=3, lr=0.001, init=0.5)
    pdf = li.toPandas()
    X = pdf[["x1", "x2"]].to_numpy()
    y = pdf.y.to_numpy()
    ref = np.full(2, 0.5)
    for _ in range(3):
        s = 1.0 / (1.0 + np.exp(-(y * (X @ ref))))
        ref = ref - 0.001 * ((s - 1.0) * y) @ X
    np.testing.assert_allclose(w, ref, rtol=1e-9)


def test_kmeans_deterministic_and_improving(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem")
    cols = ["l_quantity", "l_discount", "l_tax"]
    a = kmeans_fit(li, cols, k=4, iterations=4).collect()
    b = kmeans_fit(li, cols, k=4, iterations=4).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert len(a) == 4

    X = _features(spark, sf_dir, cols)

    def sse(centers):
        C = np.array(centers)
        d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        return d.min(axis=1).sum()

    c0 = [
        [r[f"c_{c}"] for c in cols]
        for r in kmeans_fit(li, cols, k=4, iterations=0).collect()
    ]
    c4 = [[r[f"c_{c}"] for c in cols] for r in a]
    assert sse(c4) <= sse(c0) * 1.0000001, "Lloyd iterations must not worsen SSE"
