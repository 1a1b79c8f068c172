"""Column statistics + sketches, SQL path (SURVEY.md §2.D7-D9).

One scan, two aggregation levels, both fully built-in (partial+final hash
aggregation, whole-stage codegen, no Python in the path):

  level 1: groupBy(partition) -> per-partition count/nulls/min/max +
           HLL sketch bytes (distinct) + KLL sketch bytes (quantiles)
  level 2: groupBy(column) over the level-1 rows -> snapshot stats via
           hll_union_agg / kll_merge_agg_double (associative sketch merge —
           the same monoid law as the IR's compose-substitutions,
           ref util.clj:106-113)

The long-format output matches the baseline_stats registry shape
(FIXTURES.md F3): one row per (snapshot, partition, column) with numeric
stats inline and sketch bytes as binary — a few KB per partition per
column, so the level-2 shuffle is negligible at any scale.

Sketch notes: KLL is internally randomized — correctness gates use exact
oracles at test scale; sketch outputs are asserted for merge-order
invariance and bounded relative error only (SURVEY.md §5.2-6).
"""

from __future__ import annotations

from typing import Dict, List, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# columns eligible for KLL (numeric/timestamp cast to double)
_NUMERIC_KINDS = {"int", "bigint", "smallint", "tinyint", "float",
                  "double", "decimal"}


def _is_numeric(df: DataFrame, col: str) -> bool:
    dt = dict(df.dtypes)[col]
    return dt.split("(")[0] in _NUMERIC_KINDS


def _is_ts(df: DataFrame, col: str) -> bool:
    return dict(df.dtypes)[col].startswith("timestamp")


def _kll_input(df: DataFrame, col: str) -> Optional[Column]:
    if _is_numeric(df, col):
        return F.col(col).cast("double")
    if _is_ts(df, col):
        return F.unix_timestamp(F.col(col)).cast("double")
    return None


def partition_profile(df: DataFrame, snapshot_id: str,
                      columns: Optional[List[str]] = None,
                      partition_col: str = "bucket") -> DataFrame:
    """Level-1: per-(partition, column) stats in ONE aggregation pass."""
    cols = columns or [c for c in df.columns if c != partition_col]
    aggs: List[Column] = [F.count(F.lit(1)).alias("_total")]
    for c in cols:
        aggs.append(F.count(c).alias(f"{c}__cnt"))
        aggs.append(F.min(F.col(c).cast("string")).alias(f"{c}__min"))
        aggs.append(F.max(F.col(c).cast("string")).alias(f"{c}__max"))
        # HLL accepts int/long/string/binary; normalize via string cast for
        # float-ish types to keep one code path
        hll_in = F.col(c) if not _is_ts(df, c) else F.col(c).cast("string")
        if dict(df.dtypes)[c] in ("float", "double"):
            hll_in = F.col(c).cast("string")
        aggs.append(F.hll_sketch_agg(hll_in).alias(f"{c}__hll"))
        kll_in = _kll_input(df, c)
        aggs.append(
            (F.kll_sketch_agg_double(kll_in) if kll_in is not None
             else F.lit(None).cast("binary")).alias(f"{c}__kll"))
        aggs.append(F.lit(kll_in is not None).alias(f"{c}__kll_ok"))

    wide = df.groupBy(F.col(partition_col).alias("partition_id")).agg(*aggs)

    # unpivot wide -> long: one struct per column, exploded
    structs = [
        F.struct(
            F.lit(c).alias("column"),
            F.col("_total").alias("n_rows"),
            (F.col("_total") - F.col(f"{c}__cnt")).alias("n_nulls"),
            F.col(f"{c}__min").alias("min_str"),
            F.col(f"{c}__max").alias("max_str"),
            F.col(f"{c}__hll").alias("hll"),
            F.col(f"{c}__kll").alias("kll"),
            F.col(f"{c}__kll_ok").alias("kll_ok"),
        ) for c in cols
    ]
    return (wide
            .select("partition_id", F.explode(F.array(*structs)).alias("s"))
            .select(F.lit(snapshot_id).alias("snapshot_id"),
                    "partition_id", "s.*"))


def snapshot_profile(partition_stats: DataFrame) -> DataFrame:
    """Level-2: merge per-partition sketch states into snapshot stats."""
    return (partition_stats
            .groupBy("snapshot_id", "column")
            .agg(F.sum("n_rows").alias("n_rows"),
                 F.sum("n_nulls").alias("n_nulls"),
                 F.min("min_str").alias("min_str"),
                 F.max("max_str").alias("max_str"),
                 F.hll_union_agg("hll").alias("hll"),
                 # guard: merging a NULL-only kll column yields an invalid
                 # buffer; gate on eligibility so string columns stay NULL
                 F.when(F.min("kll_ok"), F.kll_merge_agg_double("kll"))
                 .otherwise(F.lit(None).cast("binary")).alias("kll"))
            .withColumn("distinct_est",
                        F.hll_sketch_estimate("hll"))
            .withColumn("null_rate",
                        F.col("n_nulls") / F.col("n_rows")))


def profile_snapshot(df: DataFrame, snapshot_id: str,
                     columns: Optional[List[str]] = None,
                     partition_col: str = "bucket") -> Dict[str, DataFrame]:
    part = partition_profile(df, snapshot_id, columns, partition_col)
    part = part.cache()  # reused by snapshot level + audit state
    return {"partition": part, "snapshot": snapshot_profile(part)}


def kll_quantiles(spark, kll_bytes: bytes, probs: List[float]) -> List[float]:
    """Quantile estimates from one merged KLL sketch (driver-side, tiny)."""
    row = (spark.createDataFrame([(bytearray(kll_bytes),)], "kll binary")
           .select(*[F.kll_sketch_get_quantile_double("kll", F.lit(p)).alias(f"q{i}")
                     for i, p in enumerate(probs)])
           .first())
    return [row[f"q{i}"] for i in range(len(probs))]


def kll_cdf(spark, kll_bytes: bytes, edges: List[float]) -> List[float]:
    """CDF (rank) estimates at the given edges from one KLL sketch."""
    row = (spark.createDataFrame([(bytearray(kll_bytes),)], "kll binary")
           .select(*[F.kll_sketch_get_rank_double("kll", F.lit(float(e))).alias(f"r{i}")
                     for i, e in enumerate(edges)])
           .first())
    return [row[f"r{i}"] for i in range(len(edges))]
