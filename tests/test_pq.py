"""Product-quantization tier (operators/pq.py): codebook determinism,
full-probe parity with the brute tier, ADC fidelity, and the
production probe/shortlist recall trade-off."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from dedup_spark.operators.embeddings import (
    cosine_scores_gemm,
    kmeans_centroids,
)
from dedup_spark.operators.pq import ivfpq_topk, pq_train

DIM, M, KSUB = 16, 4, 16


@pytest.fixture(scope="module")
def vecs(spark):
    rng = np.random.default_rng(23)
    centers = rng.standard_normal((5, DIM))
    rows = []
    for i in range(80):
        c = centers[i % 5]
        v = c + 0.05 * rng.standard_normal(DIM)
        rows.append((i, [float(x) for x in v]))
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["vec_id", "embedding"])
    ).cache()


def test_codebooks_deterministic_across_runs(spark, vecs):
    a = pq_train(vecs, m=M, ksub=KSUB, iters=3)
    b = pq_train(vecs, m=M, ksub=KSUB, iters=3)
    assert a.shape == (M, KSUB, DIM // M)
    assert np.array_equal(a, b)  # bit-identical, not just close


def test_full_probe_parity_with_brute(spark, vecs):
    """At full probe + wide shortlist the exact re-rank must reproduce
    the brute GEMM top-k row for row — the driver-gate contract."""
    cents = kmeans_centroids(vecs, k=4, iters=3)
    cb = pq_train(vecs, m=M, ksub=KSUB, iters=3)
    pq = {
        (r["query_id"], r["rnk"]): (r["neighbor_id"], r["cosine"])
        for r in ivfpq_topk(
            vecs, cents, cb, k=3, n_probe=4, shortlist=40
        ).collect()
    }
    brute = {
        (r["query_id"], r["rnk"]): (r["neighbor_id"], r["cosine"])
        for r in cosine_scores_gemm(vecs, topk=3).collect()
    }
    assert pq == brute


def test_adc_tracks_exact_cosine(spark, vecs):
    """ADC from codes must approximate exact cosine: on a clustered
    corpus the mean absolute error stays well under the inter-cluster
    cosine gap (quantization error bound, Jégou et al. §III)."""
    cb = pq_train(vecs, m=M, ksub=KSUB, iters=3)
    pdf = vecs.toPandas().sort_values("vec_id")
    mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    d = DIM // M
    recon = np.zeros_like(mat)
    for j in range(M):
        sub = mat[:, j * d : (j + 1) * d]
        d2 = -2.0 * (sub @ cb[j].T) + (cb[j] ** 2).sum(axis=1)[None, :]
        recon[:, j * d : (j + 1) * d] = cb[j][np.argmin(d2, axis=1)]
    exact = mat @ mat.T
    adc = mat @ recon.T
    err = np.abs(exact - adc)
    np.fill_diagonal(err, 0.0)
    assert float(err.mean()) < 0.02
    assert float(err.max()) < 0.2


def test_production_probe_recall_curve(spark, vecs):
    """Recall@3 vs the brute top-3 rises with probe depth; on this
    5-cluster corpus a single probe already localizes most neighbors
    and full probe is exact (the parity gate)."""
    cents = kmeans_centroids(vecs, k=4, iters=3)
    cb = pq_train(vecs, m=M, ksub=KSUB, iters=3)
    brute = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_scores_gemm(vecs, topk=3).collect()
    }

    def recall(n_probe, shortlist):
        got = {
            (r["query_id"], r["neighbor_id"])
            for r in ivfpq_topk(
                vecs, cents, cb, k=3, n_probe=n_probe, shortlist=shortlist
            ).collect()
        }
        return len(got & brute) / len(brute)

    r1, r4 = recall(1, 40), recall(4, 40)
    assert r4 == 1.0
    assert r1 >= 0.85  # cluster-localized corpus: 1 probe nearly enough
    assert r1 <= r4
