"""Distributed PCA (textops/pca.py): fit vs NumPy, projection round-trip,
audit verdicts, determinism under repartitioning."""

from __future__ import annotations

import numpy as np
import pytest

from databricks_demo_feature_store_spark.textops.pca import (
    fit_pca,
    pca_audit,
    project_pca,
)


def _corpus(spark, n=200, d=8, seed=7):
    rng = np.random.default_rng(seed)
    # anisotropic: two dominant directions so top-2 is meaningful
    base = rng.normal(size=(n, d)) * np.array([5, 3] + [0.5] * (d - 2))
    rows = [(i, [float(x) for x in base[i]]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>"), base


def test_fit_matches_numpy(spark):
    df, x = _corpus(spark)
    x = np.stack(
        [np.asarray(r.embedding, dtype=np.float32) for r in df.orderBy("vec_id").collect()]
    ).astype(np.float64)  # float32-quantized, like the Spark path reads
    model = fit_pca(df, k=3)
    cov = np.cov(x, rowvar=False, bias=True)
    w = np.sort(np.linalg.eigvalsh(cov))[::-1]
    assert np.allclose(np.array(model.eigenvalues), w, atol=1e-8)
    assert np.allclose(np.array(model.mean), x.mean(axis=0), atol=1e-10)
    # components diagonalize the covariance
    vt = np.array(model.components)
    proj_cov = vt @ cov @ vt.T
    assert np.allclose(proj_cov, np.diag(w[:3]), atol=1e-8)


def test_fit_deterministic_across_partitionings(spark):
    df, _ = _corpus(spark)
    m1 = fit_pca(df.repartition(1), k=2)
    m2 = fit_pca(df.repartition(7), k=2)
    assert np.allclose(m1.components, m2.components, atol=1e-9)
    assert np.allclose(m1.eigenvalues, m2.eigenvalues, atol=1e-9)


def test_projection_roundtrip_variance(spark):
    df, _ = _corpus(spark)
    model = fit_pca(df, k=2)
    out = project_pca(df, model, out_col="pca")
    p = np.stack([np.asarray(r.pca) for r in out.collect()])
    assert p.shape[1] == 2
    # per-component variance of the projection == eigenvalue
    var = p.var(axis=0)
    assert np.allclose(var, np.array(model.eigenvalues[:2]), rtol=1e-6)
    # projection preserves the other columns
    assert set(out.columns) == {"vec_id", "embedding", "pca"}


def test_audit_all_verdicts_true(spark):
    df, _ = _corpus(spark)
    rows = pca_audit(df, k=3, report_dims=2).collect()
    assert [r.dim for r in rows] == [0, 1]
    for r in rows:
        assert r.trace_ok and r.orthonormal_ok
        assert r.explained_monotone_ok and r.recon_ok
        assert r.n == 200


def test_dim_mismatch_raises(spark):
    bad = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, [1.0, 2.0, 3.0])],
        "vec_id long, embedding array<float>",
    )
    with pytest.raises(Exception, match="dim"):
        fit_pca(bad, k=1)


def test_too_few_rows_raises(spark):
    one = spark.createDataFrame([(0, [1.0, 2.0])], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="at least 2"):
        fit_pca(one, k=1)


def test_two_stage_recall_on_anisotropic(spark):
    from databricks_demo_feature_store_spark.textops.pca import (
        pca_two_stage_recall,
    )

    df, _ = _corpus(spark)  # dims 0/1 dominate by construction
    out = pca_two_stage_recall(
        df, df.filter("vec_id % 20 = 0"), k=5, m=30, pca_k=2, min_recall=0.6
    ).collect()
    assert len(out) == 10
    assert all(r.recall_ok for r in out)
    assert all(r.n_exact == 5 for r in out)
    # the exact top-1 is the query itself (cosine 1.0 with itself)
    assert all(r.top1_id == r.query_id for r in out)


def test_two_stage_exact_when_candidates_cover_corpus(spark):
    """m >= corpus: stage 1 returns everything, so the rerank IS the
    exact ranking — two-stage must equal brute force row-for-row."""
    from databricks_demo_feature_store_spark.textops.pca import (
        fit_pca,
        pca_two_stage_topk,
    )
    from databricks_demo_feature_store_spark.textops.similarity import (
        brute_force_topk,
    )

    df, _ = _corpus(spark, n=60)
    q = df.filter("vec_id < 3")
    model = fit_pca(df, k=2)
    approx = pca_two_stage_topk(df, q, model, k=5, m=60)
    exact = brute_force_topk(df, q, k=5)
    assert sorted(map(tuple, approx.collect())) == sorted(
        map(tuple, exact.collect())
    )
