"""Distributed PCA (Gram-partial covariance + driver eigh + JVM
projection) pinned against a straight numpy PCA on the collected data."""

from __future__ import annotations

import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo")

from sdc_spark.operators.ml import covariance_matrix, pca_project
from sdc_spark.sources.readers import read_table


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return read_table(spark, sf_dir, "embeddings")


@pytest.fixture(scope="module")
def x_np(emb):
    pdf = emb.select("vec_id", "embedding").toPandas().sort_values("vec_id")
    # embeddings are float32 on disk; promote so the numpy reference sums
    # in float64 like the Gram partials do
    return pdf["vec_id"].to_numpy(), np.stack(pdf["embedding"].to_numpy()).astype(
        np.float64
    )


def test_covariance_matches_numpy(emb, x_np):
    _, x = x_np
    mean, cov, n = covariance_matrix(emb, "embedding", 64)
    assert n == len(x)
    np.testing.assert_allclose(mean, x.mean(axis=0), rtol=0, atol=1e-10)
    np.testing.assert_allclose(cov, np.cov(x, rowvar=False), rtol=1e-9, atol=1e-12)


def test_pca_projection_matches_numpy(emb, x_np):
    ids, x = x_np
    proj, evr = pca_project(emb, "vec_id", "embedding", 64, k=3)
    got = proj.toPandas().sort_values("vec_id")
    assert (got["vec_id"].to_numpy() == ids).all()

    cov = np.cov(x, rowvar=False)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1]
    exp_evr = w[order][:3] / w.sum()
    np.testing.assert_allclose(evr, exp_evr, rtol=1e-8)

    xc = x - x.mean(axis=0)
    for j in range(3):
        comp = v[:, order[j]]
        if comp[int(np.argmax(np.abs(comp)))] < 0:
            comp = -comp
        np.testing.assert_allclose(
            got[f"pc{j + 1}"].to_numpy(), xc @ comp, rtol=1e-7, atol=1e-9
        )
    # top components carry decreasing, positive variance shares
    assert evr[0] >= evr[1] >= evr[2] > 0
