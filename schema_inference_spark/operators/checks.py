"""Constraint checks D10-D12: uniqueness, referential integrity, ordering.

Each check is a declarative DataFrame plan (Catalyst optimizes; no Python
in the hot path) that emits violation rows in the reference failure-object
shape (FIXTURES.md F5; ref util.clj:153-155):

    (snapshot_id, partition_id, check_id, mgu_failure, schema_1, schema_2,
     conv_id, turn_idx, payload)

Scale design (SURVEY.md §4.3):
- uniqueness (D10): salted two-phase aggregation — partial counts on
  (key, salt) absorb hot keys before the global shuffle; a single hot
  conv_id (agent loop) cannot pin one reducer. AQE skew handling stays on
  as backstop, but the salt is explicit per north_rule.
- referential (D11): broadcast LEFT ANTI join against the (tiny) vocab —
  no shuffle of the fact table at all.
- ordering (D12): one window shuffle on conv_id covers gap, duplicate and
  ts-regression checks in a single pass (shared Exchange+Sort).

Checks never raise on data errors; violations are rows (reference
invariant: by-value failure propagation, algo_w.clj:9-11).
"""

from __future__ import annotations

import json
from typing import Iterable, List

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

VIOLATION_COLS = [
    "snapshot_id", "partition_id", "check_id", "mgu_failure",
    "schema_1", "schema_2", "conv_id", "turn_idx", "payload",
]

VIOLATION_DDL = ("snapshot_id string, partition_id int, check_id string, "
                 "mgu_failure string, schema_1 string, schema_2 string, "
                 "conv_id string, turn_idx bigint, payload string")


def _shape(df: DataFrame, snapshot_id: str, check_id: str,
           payload_col, mgu_failure: str | None = None,
           schema_1=None, schema_2=None) -> DataFrame:
    """Project any check output into the canonical violation schema."""
    return df.select(
        F.lit(snapshot_id).alias("snapshot_id"),
        F.col("partition_id").cast("int").alias("partition_id"),
        F.lit(check_id).alias("check_id"),
        F.lit(mgu_failure).cast("string").alias("mgu_failure"),
        (schema_1 if schema_1 is not None else F.lit(None)).cast("string").alias("schema_1"),
        (schema_2 if schema_2 is not None else F.lit(None)).cast("string").alias("schema_2"),
        F.col("conv_id").cast("string").alias("conv_id"),
        F.col("turn_idx").cast("bigint").alias("turn_idx"),
        payload_col.cast("string").alias("payload"),
    )


def empty_violations(spark) -> DataFrame:
    return spark.createDataFrame([], VIOLATION_DDL)


def stable_order(v: DataFrame) -> DataFrame:
    """Canonical violation ordering for byte-for-byte comparability
    (FIXTURES.md F5; north_rule)."""
    return v.orderBy("snapshot_id", "partition_id", "check_id",
                     "conv_id", "turn_idx", "payload")


# ---------------------------------------------------------------------------
# D10 — uniqueness of (conv_id, turn_idx), salted two-phase
# ---------------------------------------------------------------------------

def check_unique_key(df: DataFrame, snapshot_id: str,
                     keys: Iterable[str] = ("conv_id", "turn_idx"),
                     n_salts: int = 16,
                     partition_col: str = "bucket") -> DataFrame:
    """Duplicate-key detection as salted partial counts + final aggregate.

    Phase 1 groups on (keys..., salt) — map-side partial aggregation plus
    the salt split any hot key across ``n_salts`` reducers. Phase 2
    re-aggregates the (tiny) per-salt counts on the bare key. Only keys
    with total count > 1 survive; violation rows carry the count.
    """
    keys = list(keys)
    salted = (df
              .select(partition_col, *keys,
                      F.pmod(F.crc32(F.concat_ws("", *keys)),
                             F.lit(n_salts)).alias("_salt"))
              .groupBy(*keys, "_salt")
              .agg(F.count(F.lit(1)).alias("_cnt"),
                   F.min(partition_col).alias("_pid")))
    dups = (salted
            .groupBy(*keys)
            .agg(F.sum("_cnt").alias("n_copies"), F.min("_pid").alias("_pid"))
            .filter(F.col("n_copies") > 1))
    return _shape(
        dups.withColumnRenamed("_pid", "partition_id"),
        snapshot_id, "unique_key",
        payload_col=F.to_json(F.struct(F.col("n_copies"))),
    )


# ---------------------------------------------------------------------------
# D11 — referential integrity of vocab columns, broadcast anti-join
# ---------------------------------------------------------------------------

def check_referential(df: DataFrame, snapshot_id: str, column: str,
                      vocab: List[str], check_id: str,
                      partition_col: str = "bucket",
                      nullable: bool = False) -> DataFrame:
    """Rows whose ``column`` value is outside ``vocab`` — the data-level
    enum-subset rule (README.md:273-279) as a broadcast LEFT ANTI join.

    The violation carries the reference's failure-object fields: schema_1
    is the offending singleton enum, schema_2 the vocabulary enum.
    """
    spark = df.sparkSession
    vocab_df = spark.createDataFrame([(v,) for v in vocab], f"{column} string")
    base = df.select(partition_col, "conv_id", "turn_idx", column)
    if nullable:
        base = base.filter(F.col(column).isNotNull())
    bad = base.join(F.broadcast(vocab_df), on=column, how="left_anti")
    vocab_json = json.dumps({"type": "enum", "values": sorted(vocab)},
                            sort_keys=True, separators=(",", ":"))
    return _shape(
        bad.withColumnRenamed(partition_col, "partition_id"),
        snapshot_id, check_id,
        payload_col=F.to_json(F.struct(F.col(column).alias("value"))),
        mgu_failure="non_equal",
        # to_json, not string concat: an out-of-vocab value containing a
        # quote or backslash must still yield parseable canonical JSON
        schema_1=F.to_json(F.struct(
            F.lit("enum").alias("type"),
            F.array(F.col(column)).alias("values"))),
        schema_2=F.lit(vocab_json),
    )


# ---------------------------------------------------------------------------
# D12 — turn ordering: gaps, duplicates, ts regressions in ONE window pass
# ---------------------------------------------------------------------------

def check_ordering(df: DataFrame, snapshot_id: str,
                   partition_col: str = "bucket") -> DataFrame:
    """Window over (conv_id ORDER BY turn_idx, ts): a single shuffle on
    conv_id serves three checks —

    - turn_gap: turn_idx > lag(turn_idx) + 1
    - turn_dup: turn_idx == lag(turn_idx)   (window-level double check of D10)
    - ts_order: ts < lag(ts)                (stable turn ordering invariant)

    Scale note: a conversation's turns must be co-resident for the window;
    per-conv turn counts are bounded in practice (agent loops are the skew
    risk and they are *row* skew, not per-key cardinality beyond memory).
    The prod escape hatch for pathological convs is range-partitioning with
    boundary-turn exchange (SURVEY.md §7.3-4).
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx", "ts")
    base = (df.select(partition_col, "conv_id", "turn_idx", "ts")
            .withColumn("_prev_idx", F.lag("turn_idx").over(w))
            .withColumn("_prev_ts", F.lag("ts").over(w)))

    gap = (base.filter(F.col("_prev_idx").isNotNull()
                       & (F.col("turn_idx") > F.col("_prev_idx") + 1)))
    gap_v = _shape(
        gap.withColumnRenamed(partition_col, "partition_id"),
        snapshot_id, "turn_gap",
        payload_col=F.to_json(F.struct(
            F.col("_prev_idx").cast("bigint").alias("prev_idx"),
            (F.col("turn_idx") - F.col("_prev_idx") - 1).cast("bigint").alias("missing"))),
    )

    dup = base.filter(F.col("_prev_idx").isNotNull()
                      & (F.col("turn_idx") == F.col("_prev_idx")))
    dup_v = _shape(
        dup.withColumnRenamed(partition_col, "partition_id"),
        snapshot_id, "turn_dup",
        payload_col=F.to_json(F.struct(
            F.col("_prev_idx").cast("bigint").alias("prev_idx"))),
    )

    ts_bad = base.filter(F.col("_prev_ts").isNotNull()
                         & (F.col("ts") < F.col("_prev_ts")))
    ts_v = _shape(
        ts_bad.withColumnRenamed(partition_col, "partition_id"),
        snapshot_id, "ts_order",
        payload_col=F.to_json(F.struct(
            F.date_format("_prev_ts", "yyyy-MM-dd'T'HH:mm:ssXXX").alias("prev_ts"),
            F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ssXXX").alias("ts"))),
    )

    return gap_v.unionByName(dup_v).unionByName(ts_v)


def check_ordering_blocked(df: DataFrame, snapshot_id: str,
                           partition_col: str = "bucket",
                           block_size: int = 8192) -> DataFrame:
    """Skew-bounded variant of ``check_ordering`` (SURVEY.md §7.3-4).

    A single hot conversation (agent loop) puts ALL its turns into one
    window task in the plain check — an Amdahl bottleneck no executor
    count can fix. Here the window is partitioned by
    (conv_id, turn_idx div block_size): each task sorts at most
    ~block_size turns. The pair that spans a block boundary is recovered
    by computing each block's last row (one groupBy max-struct) and
    injecting it into the next block as a non-emitting carrier row.
    Output is row-identical to ``check_ordering`` (asserted in tests).
    """
    base = (df.select(partition_col, "conv_id", "turn_idx", "ts")
            .withColumn("_blk", F.floor(F.col("turn_idx") / block_size)))

    # last row of each (conv, block) by (turn_idx, ts): max on a struct
    # ordered by the same keys the window sorts on. The carrier goes to
    # the next NON-EMPTY block (a gap can span whole blocks), found with a
    # lead() over the per-conv block list — rows there = #blocks per conv,
    # so that window is tiny and skew-free by construction.
    blk_last = (base.groupBy("conv_id", "_blk")
                .agg(F.max(F.struct("turn_idx", "ts", partition_col)).alias("_m")))
    wb = Window.partitionBy("conv_id").orderBy("_blk")
    last = (blk_last
            .withColumn("_next_blk", F.lead("_blk").over(wb))
            .filter(F.col("_next_blk").isNotNull())
            .select("conv_id", F.col("_next_blk").alias("_blk"),
                    F.col("_m.turn_idx").alias("turn_idx"),
                    F.col("_m.ts").alias("ts"),
                    F.col(f"_m.{partition_col}").alias(partition_col),
                    F.lit(True).alias("_carrier")))

    unioned = base.withColumn("_carrier", F.lit(False)).unionByName(last)
    w = Window.partitionBy("conv_id", "_blk").orderBy("turn_idx", "ts")
    ordered = (unioned
               .withColumn("_prev_idx", F.lag("turn_idx").over(w))
               .withColumn("_prev_ts", F.lag("ts").over(w))
               .filter(~F.col("_carrier")))

    gap = ordered.filter(F.col("_prev_idx").isNotNull()
                         & (F.col("turn_idx") > F.col("_prev_idx") + 1))
    gap_v = _shape(
        gap.withColumnRenamed(partition_col, "partition_id"),
        snapshot_id, "turn_gap",
        payload_col=F.to_json(F.struct(
            F.col("_prev_idx").cast("bigint").alias("prev_idx"),
            (F.col("turn_idx") - F.col("_prev_idx") - 1).cast("bigint").alias("missing"))),
    )
    dup = ordered.filter(F.col("_prev_idx").isNotNull()
                         & (F.col("turn_idx") == F.col("_prev_idx")))
    dup_v = _shape(
        dup.withColumnRenamed(partition_col, "partition_id"),
        snapshot_id, "turn_dup",
        payload_col=F.to_json(F.struct(
            F.col("_prev_idx").cast("bigint").alias("prev_idx"))),
    )
    ts_bad = ordered.filter(F.col("_prev_ts").isNotNull()
                            & (F.col("ts") < F.col("_prev_ts")))
    ts_v = _shape(
        ts_bad.withColumnRenamed(partition_col, "partition_id"),
        snapshot_id, "ts_order",
        payload_col=F.to_json(F.struct(
            F.date_format("_prev_ts", "yyyy-MM-dd'T'HH:mm:ssXXX").alias("prev_ts"),
            F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ssXXX").alias("ts"))),
    )
    return gap_v.unionByName(dup_v).unionByName(ts_v)


# ---------------------------------------------------------------------------
# D16 — vocabulary diff (set ops): observed-distinct minus baseline
# ---------------------------------------------------------------------------

def vocab_diff(df: DataFrame, column: str, vocab: List[str]) -> DataFrame:
    """Distinct out-of-vocab values (enum-subset check at the schema level,
    README.md:273-279) — exceptAll over pre-aggregated distincts."""
    spark = df.sparkSession
    vocab_df = spark.createDataFrame([(v,) for v in vocab], f"{column} string")
    return (df.select(column).filter(F.col(column).isNotNull())
            .distinct().exceptAll(vocab_df))
