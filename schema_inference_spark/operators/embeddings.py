"""Embedding-column quality validation: the vector analog of the
column-stat checks (D7) for the `array<float>` payloads a training-data
pipeline ships next to text.

A 100-TB embedding corpus fails in ways scalar profiling never sees:
a model server emits NaN/Inf under overflow, a batching bug truncates
or pads vectors to the wrong dimension, a zero vector sneaks in from a
failed encode and then poisons cosine similarity (norm 0 -> divide by
zero or silent 0-similarity), and a drifting norm distribution breaks
dot-product calibration. ``embedding_quality`` verdicts each vector:

- ``null_vec``  — the embedding column itself is NULL
- ``bad_dim``   — length differs from ``expected_dim``
- ``nonfinite`` — any NaN or +/-Inf element
- ``zero_norm`` — all finite elements are (fixed-point) zero
- ``ok``        — none of the above

plus the measurements behind the verdict (``dim``, ``n_nonfinite``,
``norm_sq_fp``), so downstream fences can run over the same scan.

Cross-engine exactness: norms are computed in FIXED POINT — each
element is floored to an integer at ``scale`` (default 1e-6 units)
after an exact float->double widening, and the sum of squared integers
is a bigint. IEEE-754 float->double, double multiply, and floor are
bit-identical across the JVM and DuckDB, so ``norm_sq_fp`` hashes
byte-for-byte in the driver's oracle compare — no float-summation-order
ambiguity (the same trick as ``snapshot_row_diff``'s payload hashing,
anomaly.py). 64 elements in [-1, 1] at 1e6 scale square-sum well under
2^63, no overflow.

Scale shape: a pure per-row map — ``transform``/``filter``/``aggregate``
higher-order functions over the array, all JVM column expressions inside
WholeStageCodegen. No shuffle, no Python, no collect; the scan prunes to
(id, vector). Violations-only consumers filter ``verdict != 'ok'`` so
output is |bad|-sized.

Reference tie-in: the per-value type checks of infer-schema
(util.clj's ground schemas) say "this cell is a vector of floats";
this operator is the value-domain refinement the reference leaves to
the engine — the same role the range/fence checks play for scalars.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

INF = float("inf")


def _finite(x: Column) -> Column:
    return ~F.isnan(x) & (F.abs(x) != F.lit(INF))


def _fp(x: Column, scale: int) -> Column:
    """Deterministic fixed-point: floor(double(x) * scale) as bigint."""
    return F.floor(x.cast("double") * F.lit(scale)).cast("long")


def embedding_quality(df: DataFrame, vec_col: str = "embedding",
                      id_col: str = "vec_id", expected_dim: int = 64,
                      scale: int = 1_000_000) -> DataFrame:
    """Per-vector quality frame: (id, dim, n_nonfinite, norm_sq_fp,
    verdict). Verdict priority: null_vec > bad_dim > nonfinite >
    zero_norm > ok (one verdict per row keeps the violation store
    keyed; the measurement columns preserve the full picture)."""
    v = F.col(vec_col)
    finite = F.filter(v, _finite)
    dim = F.size(v).cast("int")
    n_nonfinite = (F.size(v) - F.size(finite)).cast("bigint")
    norm_sq_fp = F.aggregate(
        finite, F.lit(0).cast("long"),
        lambda acc, x: acc + _fp(x, scale) * _fp(x, scale))
    verdict = (F.when(v.isNull(), "null_vec")
               .when(dim != F.lit(expected_dim), "bad_dim")
               .when(n_nonfinite > 0, "nonfinite")
               .when(norm_sq_fp == 0, "zero_norm")
               .otherwise("ok"))
    return df.select(
        F.col(id_col),
        F.when(v.isNull(), None).otherwise(dim).alias("dim"),
        n_nonfinite.alias("n_nonfinite"),
        norm_sq_fp.alias("norm_sq_fp"),
        verdict.alias("verdict"))


def embedding_norm_fences(quality: DataFrame, low_bp: int = 2500,
                          high_bp: int = 40000) -> DataFrame:
    """Norm-distribution fence over the 'ok' vectors of an
    ``embedding_quality`` frame: flags vectors whose squared norm falls
    below ``low_bp`` or above ``high_bp`` basis points of the corpus
    MEDIAN squared norm — the "encoder silently rescaled its output"
    drift catch that per-vector verdicts cannot see.

    Integer-exact: the median is ``percentile_approx``-free — an exact
    ``median`` over bigints — and the ratio is floored basis points, so
    both engines agree bit-for-bit. ONE aggregation to a 1-row frame,
    broadcast-joined back (never collected); the quality frame should be
    persisted by the caller if it also feeds other consumers."""
    med = quality.filter(F.col("verdict") == "ok").agg(
        F.expr("median(norm_sq_fp)").cast("double").alias("_med"))
    ratio = F.floor(F.col("norm_sq_fp") * 10000.0 / F.col("_med")) \
             .cast("bigint")
    return (quality.filter(F.col("verdict") == "ok")
            .crossJoin(F.broadcast(med))
            .withColumn("ratio_bp", ratio)
            .filter((F.col("ratio_bp") < low_bp)
                    | (F.col("ratio_bp") > high_bp))
            .withColumn("fence", F.when(F.col("ratio_bp") < low_bp,
                                        "low_norm").otherwise("high_norm"))
            .drop("_med"))


def embedding_centroid_drift(old: DataFrame, new: DataFrame,
                             vec_col: str = "embedding",
                             scale: int = 1_000_000,
                             threshold_fp: int = 100_000) -> DataFrame:
    """Per-dimension centroid shift between two embedding snapshots —
    the distribution-drift check (D13) lifted to vector space. A new
    encoder deploy that rescales, re-centers, or rotates its output
    moves per-dimension means long before any per-vector verdict
    fires; this is the "did the embedding space silently move" gate a
    retrieval index cares about.

    Output: one row per dimension with both fixed-point means, the
    delta, and a ``drifted`` flag (|delta| > ``threshold_fp``, i.e.
    threshold_fp/scale in embedding units).

    Exactness: per-dimension SUMS are exact bigints (same fixed-point
    floor as ``embedding_quality``); the mean is floor(sum·1.0/n),
    bit-identical across engines while |sum| < 2^53 (~10^9 unit-norm
    vectors at 1e-6 scale — beyond that, switch the mean to exact
    decimal division or compare via the cross-multiplied integer form
    |s_new·n_old - s_old·n_new| > threshold·n_old·n_new, which never
    leaves bigint/int128).

    Scale shape: ``posexplode`` multiplies rows ×dim, but the
    partial HashAggregate collapses each task to ≤dim rows BEFORE the
    exchange, so the shuffle moves dim rows per partition regardless
    of corpus size; the final aggregate is |dim|-sized. Two scans
    (one per snapshot), no join on the big side — the two |dim|-row
    aggregates meet in a trivially small equi-join.
    """
    def centroid(df: DataFrame, mean_alias: str) -> DataFrame:
        e = F.posexplode(F.col(vec_col)).alias("dim", "x")
        flat = df.select(e)
        return (flat.groupBy("dim")
                .agg(F.sum(_fp(F.col("x"), scale)).alias("s"),
                     F.count(F.lit(1)).alias("n"))
                .select(F.col("dim").cast("int").alias("dim"),
                        F.floor(F.col("s") * F.lit(1.0) / F.col("n"))
                        .cast("long").alias(mean_alias)))

    o = centroid(old, "mean_fp_old")
    n = centroid(new, "mean_fp_new")
    delta = F.col("mean_fp_new") - F.col("mean_fp_old")
    return (o.join(n, "dim")
            .select("dim", "mean_fp_old", "mean_fp_new",
                    delta.cast("long").alias("delta_fp"),
                    (F.abs(delta) > F.lit(threshold_fp)).alias("drifted"))
            .orderBy("dim"))
