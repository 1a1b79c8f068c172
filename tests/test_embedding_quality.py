"""Embedding-quality family (operators/embeddings.py): verdict
semantics on constructed frames, fixed-point norm exactness vs numpy,
plan shape (no shuffle in the per-vector pass), and fence detection.
The two driver queries' oracle gates run in test_anomaly.py via the
ANOMALY_ORACLES parametrization."""

import math

import numpy as np
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, FloatType, LongType, StructField,
                               StructType)

from schema_inference_spark.operators import embeddings as E

SCHEMA = StructType([
    StructField("vec_id", LongType()),
    StructField("embedding", ArrayType(FloatType())),
])


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_verdict_priority_and_measurements(spark):
    rows = [
        (0, [0.5, -0.25, 0.125]),          # ok
        (1, None),                          # null_vec
        (2, [0.5, -0.25]),                  # bad_dim (expected 3)
        (3, [float("nan"), 0.5, 0.25]),     # nonfinite
        (4, [float("inf"), 0.5, 0.25]),     # nonfinite (inf, not nan)
        (5, [0.0, 0.0, 0.0]),               # zero_norm
        # bad_dim wins over nonfinite wins over zero_norm
        (6, [float("nan")]),                # bad_dim (len 1)
        (7, [float("nan"), 0.0, 0.0]),      # nonfinite (not zero_norm)
    ]
    out = {r.vec_id: r for r in
           E.embedding_quality(_df(spark, rows), expected_dim=3).collect()}
    assert out[0].verdict == "ok"
    assert out[1].verdict == "null_vec" and out[1].dim is None
    assert out[2].verdict == "bad_dim" and out[2].dim == 2
    assert out[3].verdict == "nonfinite" and out[3].n_nonfinite == 1
    assert out[4].verdict == "nonfinite" and out[4].n_nonfinite == 1
    assert out[5].verdict == "zero_norm" and out[5].norm_sq_fp == 0
    assert out[6].verdict == "bad_dim"
    assert out[7].verdict == "nonfinite"
    # powers of two are exact: 0.5 -> 500000, -0.25 -> -250000, 0.125 -> 125000
    assert out[0].norm_sq_fp == 500000**2 + 250000**2 + 125000**2
    # nonfinite elements are excluded from the norm, not poisoning it
    assert out[3].norm_sq_fp == 500000**2 + 250000**2


def test_norm_matches_numpy_fixed_point(spark):
    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(50, 16)).astype(np.float32)
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(50)]
    out = E.embedding_quality(_df(spark, rows), expected_dim=16).collect()
    got = {r.vec_id: r.norm_sq_fp for r in out}
    for i in range(50):
        fp = np.floor(vecs[i].astype(np.float64) * 1_000_000).astype(np.int64)
        assert got[i] == int((fp * fp).sum()), i
    assert all(r.verdict == "ok" for r in out)


def test_quality_plan_has_no_shuffle(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    plan = E.embedding_quality(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_norm_fences_detect_planted_rescale(spark):
    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(40, 8)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    vecs[5] *= 2.0   # high_norm
    vecs[9] *= 0.5   # low_norm
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(40)]
    q = E.embedding_quality(_df(spark, rows), expected_dim=8)
    out = {r.vec_id: r.fence for r in
           E.embedding_norm_fences(q, low_bp=9000, high_bp=11000).collect()}
    assert out == {5: "high_norm", 9: "low_norm"}


def test_norm_fences_skip_non_ok_vectors(spark):
    rows = [(0, [1.0, 0.0]), (1, [0.0, 1.0]), (2, [0.6, 0.8]),
            (3, None), (4, [float("nan"), 50.0])]
    q = E.embedding_quality(_df(spark, rows), expected_dim=2)
    fenced = E.embedding_norm_fences(q, low_bp=9000, high_bp=11000).collect()
    # the NaN vector's huge finite tail must not enter the fence pass
    assert [r.vec_id for r in fenced] == []


def test_norm_fence_plan_broadcasts_median(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = E.embedding_quality(df)
    plan = (E.embedding_norm_fences(q)
            ._jdf.queryExecution().executedPlan().toString())
    # the 1-row median frame must ride a broadcast, never a shuffle join
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_centroid_drift_semantics(spark):
    old = _df(spark, [(0, [0.0, 0.5]), (1, [0.0, 0.5])])
    # dim 0 shifted by +0.25 (exact), dim 1 unchanged
    new = _df(spark, [(0, [0.25, 0.5]), (1, [0.25, 0.5])])
    out = {r.dim: r for r in
           E.embedding_centroid_drift(old, new,
                                      threshold_fp=100_000).collect()}
    assert out[0].mean_fp_old == 0 and out[0].mean_fp_new == 250_000
    assert out[0].delta_fp == 250_000 and out[0].drifted
    assert out[1].delta_fp == 0 and not out[1].drifted


def test_centroid_drift_partial_agg_before_exchange(spark, sf_dir):
    """The posexplode fan-out must collapse to <= dim rows per task
    BEFORE the shuffle: a partial HashAggregate precedes the first
    Exchange in each centroid subtree."""
    df = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    half = df.limit(100)
    plan = (E.embedding_centroid_drift(half, df)
            ._jdf.queryExecution().executedPlan().toString())
    first_exchange = plan.find("Exchange hashpartitioning")
    first_partial = plan.find("HashAggregate")
    assert 0 <= first_partial < first_exchange, plan
