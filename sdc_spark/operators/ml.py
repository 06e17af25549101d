"""Distributed ML kernels re-expressed as Spark aggregations — the
engine-level parity layer for the reference's ML surface
(`/root/reference/sdc/tests/test_ml.py:46-160`: linear regression,
logistic regression, KDE, k-means; daal4py glue in `test_d4p.py`).

The Spark-first shapes:

- **Sufficient-statistics regression**: OLS and per-group simple
  regression reduce to SUM aggregates (X'X, X'y are d² + d sums) — one
  map-side-combined pass over the data, a d×d solve on the driver.
  Never a row-at-a-time UDF, never an iterative scan for the exact
  closed form.
- **Gradient-descent logistic regression**: each iteration is ONE
  aggregate of a row-local expression of (x, y, w); w (d scalars) is
  rebroadcast by literal folding each round. iterations × one-pass —
  the same schedule a parameter server would run, with Catalyst codegen
  doing the inner loop.
- **KDE**: a log-sum-exp aggregate against a broadcast point list.
- **k-means**: deterministic xxhash64-seeded centers + Lloyd steps as
  hash aggregations (shared with similarity.ivf_centroids' design).

All math is double-precision JVM expressions; driver-side work is
O(d²)/O(k·d) scalars per iteration, independent of row count.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _xtx_xty(df: DataFrame, feature_cols: list[str], label_col: str):
    """One aggregate pass producing X'X (with intercept) and X'y."""
    feats = [F.lit(1.0)] + [F.col(c).cast("double") for c in feature_cols]
    d = len(feats)
    aggs = []
    for i in range(d):
        for j in range(i, d):
            aggs.append(F.sum(feats[i] * feats[j]).alias(f"xx_{i}_{j}"))
    for i in range(d):
        aggs.append(
            F.sum(feats[i] * F.col(label_col).cast("double")).alias(f"xy_{i}")
        )
    row = df.agg(*aggs).collect()[0]
    xtx = [[row[f"xx_{min(i, j)}_{max(i, j)}"] for j in range(d)] for i in range(d)]
    xty = [row[f"xy_{i}"] for i in range(d)]
    return xtx, xty


def _solve(a: list[list[float]], b: list[float]) -> list[float]:
    """Gaussian elimination with partial pivoting — d is tiny (features +
    intercept), this is driver-side O(d³) on scalars."""
    n = len(b)
    m = [row[:] + [b[i]] for i, row in enumerate(a)]
    for col in range(n):
        piv = max(range(col, n), key=lambda r: abs(m[r][col]))
        m[col], m[piv] = m[piv], m[col]
        p = m[col][col]
        if p == 0.0:
            raise ValueError("singular normal equations")
        m[col] = [v / p for v in m[col]]
        for r in range(n):
            if r != col and m[r][col] != 0.0:
                f = m[r][col]
                m[r] = [v - f * w for v, w in zip(m[r], m[col])]
    return [m[i][n] for i in range(n)]


def linreg_fit(
    df: DataFrame, feature_cols: list[str], label_col: str
) -> list[float]:
    """Exact OLS fit (intercept first) via normal equations — one
    distributed pass + an O(d³) driver solve. The closed-form twin of the
    reference's iterative `test_linear_regression`."""
    xtx, xty = _xtx_xty(df, feature_cols, label_col)
    return _solve(xtx, xty)


def logreg_fit_gd(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    iterations: int = 3,
    lr: float = 1.0,
    init: float = 0.5,
) -> list[float]:
    """Logistic regression by full-batch gradient descent, mirroring the
    reference loop (`test_ml.py:49-66`): w -= lr * Σ ((σ(y·x·w) − 1)·y)·x
    with labels y ∈ {−1, +1}. Each iteration is ONE aggregate; w enters
    the plan as literals, so every pass is a fresh codegen'd scan with
    the current weights constant-folded."""
    from sdc_spark.materialize import materialize_lazy, unmaterialize

    # materialized ONCE (narrow: d+1 doubles per row): every GD step is
    # its own aggregate action, and un-materialized each step replays
    # the caller's upstream plan — iterations full corpus scans at scale.
    # LAZY: the first gradient aggregate below is the materializing
    # action, fusing the projection job into it (one job saved per fit)
    v = materialize_lazy(
        df.select(
            F.col(label_col).cast("double").alias("__y__"),
            *[F.col(c).cast("double").alias(f"__x{i}__") for i, c in enumerate(feature_cols)],
        )
    )
    feats = [F.col(f"__x{i}__") for i in range(len(feature_cols))]
    d = len(feats)
    w = [init] * d
    y = F.col("__y__")
    for _ in range(iterations):
        margin: Column = F.lit(0.0)
        for wi, xi in zip(w, feats):
            margin = margin + F.lit(wi) * xi
        s = F.lit(1.0) / (F.lit(1.0) + F.exp(-(y * margin)))
        coef = (s - F.lit(1.0)) * y
        grad_row = v.agg(
            *[F.sum(coef * xi).alias(f"g_{i}") for i, xi in enumerate(feats)]
        ).collect()[0]
        w = [wi - lr * grad_row[f"g_{i}"] for i, wi in enumerate(w)]
    unmaterialize(v)
    return w


def kde_log_density(
    df: DataFrame, value_col: str, points: list[float], bandwidth: float = 0.5
) -> DataFrame:
    """Gaussian-kernel log-density sum at fixed evaluation points (the
    reference's `test_kde` shape, `test_ml.py:110-129`): for each row x,
    logsumexp over points of −(x−p)²/(2b²), summed corpus-wide. The
    point list is a broadcast array literal; the whole computation is one
    row-local expression feeding one aggregate."""
    b = float(bandwidth)
    n = len(points)
    pts = F.array(*[F.lit(float(p)) for p in points])
    x = F.col(value_col).cast("double")
    d = F.transform(pts, lambda p: -((x - p) ** 2) / F.lit(2.0 * b * b))
    m = F.array_max(d)
    lse = (
        m
        - F.lit(math.log(b * n))
        + F.log(F.aggregate(d, F.lit(0.0), lambda acc, v: acc + F.exp(v - m)))
    )
    return df.agg(F.round(F.sum(lse), 4).alias("kde_log_density"))


def kmeans_fit(
    df: DataFrame,
    feature_cols: list[str],
    k: int,
    iterations: int = 5,
    id_col: str | None = None,
) -> DataFrame:
    """Deterministic Lloyd's k-means over feature columns: seeds are the
    k rows with smallest xxhash64(features) (reproducible, model-free —
    same device as similarity.ivf_centroids), then ``iterations`` rounds
    of assign (broadcast centers, argmin distance) + recompute (hash
    aggregation per center). Returns (center_id, n, c_<feature>...).

    Each round is one broadcast join + one map-side-combined aggregate —
    no shuffle of the feature matrix, no Python in the loop. The center
    table (k·d doubles) is collected per round: driver state independent
    of row count."""
    from sdc_spark.materialize import materialize_lazy, unmaterialize

    feats = [F.col(c).cast("double").alias(c) for c in feature_cols]
    # materialized ONCE: the seed pass plus every Lloyd round is a
    # separate action over this frame — un-materialized, each action
    # replays the source scan+cast, i.e. iterations+1 full corpus scans
    # at 100 TB for a frame that is d doubles per row. LAZY: the seed
    # collect below is the materializing action (one job saved per fit)
    v = materialize_lazy(df.select(*feats))
    seed_key = F.xxhash64(*[F.col(c) for c in feature_cols])
    centers = [
        [r[c] for c in feature_cols]
        for r in v.withColumn("__h__", seed_key)
        .orderBy("__h__", *feature_cols)
        .limit(k)
        .collect()
    ]
    for _ in range(iterations):
        dists = F.array(
            *[
                F.struct(
                    sum(
                        ((F.col(c) - F.lit(float(ctr[i]))) ** 2)
                        for i, c in enumerate(feature_cols)
                    ).alias("d"),
                    F.lit(ci).alias("cid"),
                )
                for ci, ctr in enumerate(centers)
            ]
        )
        assigned = v.withColumn("__cid__", F.array_min(dists)["cid"])
        rows = (
            assigned.groupBy("__cid__")
            .agg(
                F.count(F.lit(1)).alias("n"),
                *[F.avg(c).alias(c) for c in feature_cols],
            )
            .collect()
        )
        new_centers = list(centers)
        for r in rows:
            new_centers[r["__cid__"]] = [r[c] for c in feature_cols]
        centers = new_centers
    # the centers are driver state now; release the feature blocks
    unmaterialize(v)
    spark = df.sparkSession
    from sdc_spark.sources.readers import local_rows

    # k-row driver-local result: ONE slice, not defaultParallelism
    # Python round trips (see local_rows)
    schema = ", ".join(
        ["center_id bigint"] + [f"`c_{c}` double" for c in feature_cols]
    )
    return local_rows(
        spark,
        [(ci, *[float(x) for x in ctr]) for ci, ctr in enumerate(centers)],
        schema,
    )


def gram_partials(df: DataFrame, vec_col: str, dim: int) -> DataFrame:
    """Per-Arrow-batch sufficient statistics for mean/covariance of an
    array<double> column: (count, Σx, upper-triangle of XᵀX) — ONE row per
    batch, each ~(d² / 2) doubles. The canonical one-pass distributed PCA
    front half: at 100 TB the executors stream the vectors once and ship
    back only P tiny Gram partials. numpy does the per-batch XᵀX (BLAS),
    so there is no per-row Python."""
    import numpy as np
    import pandas as pd

    iu0, iu1 = (x.tolist() for x in np.triu_indices(dim))

    def fn(it):
        for pdf in it:
            if not len(pdf):
                continue
            m = np.asarray([np.asarray(v, dtype=float) for v in pdf[vec_col]])
            g = m.T @ m
            yield pd.DataFrame(
                {
                    "n": [len(m)],
                    "s": [m.sum(axis=0).tolist()],
                    "g": [g[iu0, iu1].tolist()],
                }
            )

    return df.select(vec_col).mapInPandas(fn, "n long, s array<double>, g array<double>")


def covariance_matrix(df: DataFrame, vec_col: str, dim: int):
    """Exact sample covariance of an embedding column: combine the Gram
    partials driver-side (P rows × ~d²/2 doubles — a boxing boundary,
    not a data collect). Returns (mean: ndarray d, cov: ndarray d×d, n)."""
    import numpy as np

    parts = gram_partials(df, vec_col, dim).toPandas()
    n = int(parts["n"].sum())
    s = np.sum(np.stack(parts["s"].values), axis=0)
    tri = np.sum(np.stack(parts["g"].values), axis=0)
    full = np.zeros((dim, dim))
    full[np.triu_indices(dim)] = tri
    full = full + np.triu(full, 1).T
    mean = s / n
    cov = (full - n * np.outer(mean, mean)) / (n - 1)
    return mean, cov, n


def pca_project(
    df: DataFrame, id_col: str, vec_col: str, dim: int, k: int = 2
) -> tuple[DataFrame, list[float]]:
    """Distributed PCA: covariance from one Gram pass, eigh on the tiny
    d×d matrix driver-side, then a JVM-expression projection (zip_with
    dot product against literal component vectors — no second Python
    pass). Component signs are fixed (largest-|coefficient| positive) so
    results are orientation-deterministic. Returns (projections df with
    pc1..pck, explained-variance ratios)."""
    import numpy as np

    mean, cov, _ = covariance_matrix(df, vec_col, dim)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1]
    evr = (w[order][:k] / w.sum()).tolist()
    cols = [F.col(id_col)]
    for j in range(k):
        comp = v[:, order[j]]
        if comp[int(np.argmax(np.abs(comp)))] < 0:
            comp = -comp
        lit = F.array(*[F.lit(float(x)) for x in comp])
        dot = F.aggregate(
            F.zip_with(F.col(vec_col), lit, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        cols.append((dot - F.lit(float(mean @ comp))).alias(f"pc{j + 1}"))
    return df.select(*cols), evr
