"""Dataset-level anomaly + change checks: outlier fences, volume /
completeness, key-skew profiling, and CDC-style snapshot row diff.

These extend the D7/D10-D13 validation families with the checks a
warehouse owner runs BETWEEN snapshots rather than within one:

- ``outlier_fences``: Tukey IQR fences per numeric column from exact
  interpolated percentiles (sketch-swappable for the 100-TB path) plus
  the out-of-fence row counts — the numeric-sanity twin of the drift
  check (drift compares distributions; fences flag impossible tails).
- ``volume_anomaly``: per-day row-count completeness vs the median
  observed day — catches MISSING days (a day with zero rows never
  appears in a groupBy, so the calendar is densified first) and
  low/high-volume days, the "did yesterday's ingest actually land"
  check.
- ``key_skew_profile``: top-k heaviest keys with their corpus share —
  the measurement side of the skew story (D18 handles skew; this
  detects it and names the keys to salt).
- ``snapshot_row_diff``: keyed added/removed/changed diff of two
  snapshots by payload hash — the CDC primitive behind audit-store
  reconciliation (``violations_diff`` is its specialization to the
  violation store).

Scale shapes (per-operator notes in the docstrings): every operator is
pure built-in column expressions — no Python in any path, no driver
collect anywhere; scalar statistics (fences, medians, totals) join back
via a broadcast of a ONE-ROW aggregate instead of being collected.
"""

from __future__ import annotations

from typing import List, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def outlier_fences(df: DataFrame, cols: Sequence[str], k: float = 1.5,
                   approx: bool = False) -> DataFrame:
    """Tukey fences per numeric column: ``lo = q1 - k*iqr``,
    ``hi = q3 + k*iqr`` from interpolated quartiles, plus the counts of
    rows strictly outside them.

    Returns one row per column, sorted by name:
    ``(col_name, q1, q3, lo, hi, n_rows, n_below, n_above)`` with the
    four fence stats rounded to 4 decimals (counts use the UNROUNDED
    fences; ``n_rows`` is the column's non-null count).

    Scale shape: two corpus scans, both fully whole-stage-codegen —
    scan 1 computes ALL columns' quartiles in one aggregation
    (``percentile`` exact here; pass ``approx=True`` to swap in
    ``approx_percentile``, the KLL-style sketch path for the 100-TB
    run where an exact percentile would materialize a per-column
    sort); scan 2 counts fence violations for all columns in one
    aggregation. The one-row fence frame rides a broadcast
    nested-loop join (a 1-row broadcast, NOT a collect), so the whole
    operator is a single Spark job with no driver round-trip between
    the passes. The long-format pivot is a ``stack`` over the final
    1-row aggregate — zero extra scans.
    """
    fn = "approx_percentile" if approx else "percentile"

    def q(c: str, p: float) -> Column:
        return F.expr(f"{fn}(`{c}`, {p})")

    fences = df.agg(*[e for c in cols
                      for e in (q(c, 0.25).alias(f"{c}__q1"),
                                q(c, 0.75).alias(f"{c}__q3"))])

    aggs: List[Column] = []
    for c in cols:
        q1, q3 = F.col(f"{c}__q1"), F.col(f"{c}__q3")
        lo = q1 - F.lit(float(k)) * (q3 - q1)
        hi = q3 + F.lit(float(k)) * (q3 - q1)
        v = F.col(c).cast("double")
        aggs += [
            F.min(q1).alias(f"{c}__q1"),
            F.min(q3).alias(f"{c}__q3"),
            F.min(lo).alias(f"{c}__lo"),
            F.min(hi).alias(f"{c}__hi"),
            F.count(c).alias(f"{c}__n"),
            F.sum(F.when(v < lo, 1).otherwise(0))
            .cast("bigint").alias(f"{c}__below"),
            F.sum(F.when(v > hi, 1).otherwise(0))
            .cast("bigint").alias(f"{c}__above"),
        ]
    wide = df.crossJoin(F.broadcast(fences)).agg(*aggs)

    groups = ", ".join(
        f"'{c}', `{c}__q1`, `{c}__q3`, `{c}__lo`, `{c}__hi`, "
        f"`{c}__n`, `{c}__below`, `{c}__above`" for c in cols)
    stacked = wide.select(F.expr(
        f"stack({len(cols)}, {groups}) AS "
        "(col_name, q1, q3, lo, hi, n_rows, n_below, n_above)"))
    return (stacked
            .select("col_name",
                    F.round("q1", 4).alias("q1"),
                    F.round("q3", 4).alias("q3"),
                    F.round("lo", 4).alias("lo"),
                    F.round("hi", 4).alias("hi"),
                    "n_rows", "n_below", "n_above")
            .orderBy("col_name"))


def volume_anomaly(df: DataFrame, ts_col: str = "ts",
                   low_bp: int = 5000, high_bp: int = 15000) -> DataFrame:
    """Per-day row-count completeness check against the median observed
    day.

    Densifies the calendar between the min and max observed day (a day
    that lost its whole partition emits ``n_rows = 0`` instead of
    silently vanishing from the groupBy) and verdicts each day by its
    count's share of the median NONZERO day in basis points:
    ``missing`` (zero rows), ``low`` (< ``low_bp``), ``high``
    (> ``high_bp``), else ``ok``.

    Returns ``(day, n_rows, median_n, ratio_bp, verdict)`` — one row
    per calendar day, ``day`` formatted ``yyyy-MM-dd``, ``median_n``
    rounded to 4.

    Scale shape: ONE corpus scan — the groupBy(day) aggregation's
    partial (map-side) combine collapses each input split to at most
    |days| rows before the exchange, so the low-cardinality key cannot
    pin a reducer. The |days|-row counts frame is persisted because two
    downstream subtrees consume it (the calendar/median bounds and the
    join back) and the join-side null-pruning filter would otherwise
    defeat exchange reuse and re-scan the corpus (plan-asserted: one
    FileScan). Everything after operates on |days|-sized frames: the
    median and calendar bounds are a second tiny aggregate that joins
    back via a 1-row broadcast, and the calendar itself is a
    ``sequence``/``explode`` of that row (never a driver loop).
    """
    counts = (df.groupBy(F.date_trunc("day", F.col(ts_col)).alias("_day"))
              .agg(F.count(F.lit(1)).alias("n_rows"))
              .persist())
    bounds = counts.agg(
        F.min("_day").cast("date").alias("_d0"),
        F.max("_day").cast("date").alias("_d1"),
        F.expr("percentile(n_rows, 0.5)").alias("_median"))
    cal = bounds.select(
        "_median",
        F.explode(F.sequence(F.col("_d0"), F.col("_d1"))).alias("_dd"))
    full = cal.join(counts.select(F.col("_day").cast("date").alias("_dd"),
                                  "n_rows"),
                    "_dd", "left")
    n = F.coalesce(F.col("n_rows"), F.lit(0)).cast("bigint")
    ratio = (F.floor(n.cast("double") * 10000.0 / F.col("_median"))
             .cast("bigint"))
    verdict = (F.when(n == 0, F.lit("missing"))
               .when(ratio < low_bp, F.lit("low"))
               .when(ratio > high_bp, F.lit("high"))
               .otherwise(F.lit("ok")))
    return (full.select(F.date_format("_dd", "yyyy-MM-dd").alias("day"),
                        n.alias("n_rows"),
                        F.round("_median", 4).alias("median_n"),
                        ratio.alias("ratio_bp"),
                        verdict.alias("verdict"))
            .orderBy("day"))


def key_skew_profile(df: DataFrame, key_col: str,
                     top_k: int = 20) -> DataFrame:
    """Top-``top_k`` heaviest keys with their corpus share — the
    detection side of the D18 skew story: the keys this emits are the
    ones the salted checks exist for.

    Returns ``(rank, key, n_rows, share_bp)`` — rank 1 is the heaviest;
    ties break by key ascending (total ordering, so both engines pick
    identical boundary rows); ``share_bp`` is the key's share of ALL
    rows in basis points (floor).

    Scale shape: one groupBy(key) shuffle with map-side partials; the
    top-k is ``orderBy(...).limit(k)`` — Catalyst compiles it to
    TakeOrderedAndProject (per-partition heaps + a k-row driver merge),
    never a global sort. The grand total re-aggregates the SAME groupBy
    output (the exchange is reused across the two subtrees, no second
    corpus scan) and joins back as a 1-row broadcast. The ranking
    window runs on the k-row frame only — its single-partition warning
    is bounded by ``top_k``, not the data.
    """
    sizes = (df.groupBy(F.col(key_col).cast("string").alias("key"))
             .agg(F.count(F.lit(1)).alias("n_rows")))
    total = sizes.agg(F.sum("n_rows").alias("_total"))
    top = sizes.orderBy(F.desc("n_rows"), F.asc("key")).limit(top_k)
    w = Window.orderBy(F.desc("n_rows"), F.asc("key"))
    return (top.crossJoin(F.broadcast(total))
            .withColumn("rank", F.row_number().over(w))
            .select("rank", "key", "n_rows",
                    F.floor(F.col("n_rows").cast("double") * 10000.0
                            / F.col("_total").cast("double"))
                    .cast("bigint").alias("share_bp"))
            .orderBy("rank"))


def row_hash_col(cols: Sequence[str]) -> Column:
    """md5 payload hash over ``cols`` with a NUL sentinel for NULLs (so
    a NULL column cannot alias a neighboring value under ``concat_ws``'s
    null-skipping). NOTE: doubles stringify engine-specifically — cast
    floats to fixed-point bigints BEFORE hashing when the hash must
    match an external engine (see ``q_snapshot_diff``)."""
    parts = [F.coalesce(F.col(c).cast("string"), F.lit("\x00"))
             for c in cols]
    return F.md5(F.concat_ws("|", *parts))


def snapshot_row_diff(old: DataFrame, new: DataFrame,
                      key_cols: Sequence[str],
                      hash_col: str = "row_hash") -> DataFrame:
    """CDC-style keyed diff of two snapshots: rows ``added`` (key only
    in ``new``), ``removed`` (key only in ``old``), or ``changed``
    (both sides, differing ``hash_col``). Unchanged rows are dropped —
    output is |delta|-sized, never |snapshot|-sized.

    Both inputs must carry a precomputed payload-hash column (see
    ``row_hash_col``); only ``key_cols + [hash_col]`` ever enter the
    join, so a wide snapshot ships ~48 bytes/row through the exchange
    regardless of payload width.

    Scale shape: one full-outer sort-merge join on the key — the
    canonical CDC plan. On Iceberg both snapshots of one table share a
    bucket layout, so the exchange disappears under storage-partitioned
    joins (the same co-location argument as the audit store's resume
    reads); ``violations_diff`` in checks.py is this operator
    specialized to the violation store's composite key.
    """
    keys = list(key_cols)
    o = old.select(*keys, F.col(hash_col).alias("old_hash"))
    n = new.select(*keys, F.col(hash_col).alias("new_hash"))
    j = o.join(n, keys, "full_outer")
    status = (F.when(F.col("old_hash").isNull(), F.lit("added"))
              .when(F.col("new_hash").isNull(), F.lit("removed"))
              .when(F.col("old_hash") != F.col("new_hash"),
                    F.lit("changed")))
    return (j.withColumn("status", status)
            .filter(F.col("status").isNotNull())
            .select(*keys, "status", "old_hash", "new_hash")
            .orderBy(*keys))


def reconcile_checksum(left: DataFrame, right: DataFrame,
                       cols: Sequence[str],
                       n_buckets: int = 256) -> DataFrame:
    """Aggregate-only copy/migration reconciliation: did a rewrite
    (compaction, re-cluster, format migration, backfill) preserve the
    table's CONTENT — without the keyed full-outer join
    ``snapshot_row_diff`` pays?

    Each side collapses to ``n_buckets`` rows of (bucket, n_rows,
    checksum): bucket = first md5 byte of the row payload, checksum =
    sum over the bucket of the next 12 md5 hex chars as an integer
    (order-independent, so layout changes are invisible; a lost,
    duplicated, or altered row shifts its bucket's count and/or sum).
    The two 256-row frames full-outer join on bucket and only
    disagreeing buckets survive — which buckets disagree localizes the
    damage to 1/256 of the hash space for a row-level follow-up
    (``snapshot_row_diff`` over just those buckets).

    Scale shape: two scans, each folding into a 256-group hash
    aggregate with map-side partials — nothing row-sized ever shuffles
    (vs snapshot_row_diff's |rows| exchange). Collision honesty: a
    per-bucket sum of 48-bit slices detects any single-row change with
    certainty (count or sum must move) and k-row forgeries only by md5
    collision arithmetic; it is a reconciliation audit, not a
    cryptographic commitment. Float columns: cast to fixed-point
    BEFORE hashing (same contract as ``row_hash_col``).
    """
    def side(df: DataFrame, alias: str) -> DataFrame:
        h = row_hash_col(cols)
        return (df.select(
                    F.conv(F.substring(h, 1, 2), 16, 10)
                     .cast("int").alias("bucket"),
                    F.conv(F.substring(h, 3, 12), 16, 10)
                     .cast("decimal(38,0)").alias("_slice"))
                .withColumn("bucket", F.pmod("bucket", F.lit(n_buckets)))
                .groupBy("bucket")
                .agg(F.count(F.lit(1)).cast("bigint").alias(f"n_{alias}"),
                     F.sum("_slice").cast("decimal(38,0)")
                      .alias(f"sum_{alias}")))

    j = side(left, "left").join(side(right, "right"), "bucket",
                                "full_outer")
    return (j.filter(
                ~(F.col("n_left").eqNullSafe(F.col("n_right"))
                  & F.col("sum_left").eqNullSafe(F.col("sum_right"))))
            .select("bucket",
                    F.coalesce("n_left", F.lit(0)).alias("n_left"),
                    F.coalesce("n_right", F.lit(0)).alias("n_right"),
                    F.coalesce(F.col("sum_left"),
                               F.lit(0).cast("decimal(38,0)")).alias("sum_left"),
                    F.coalesce(F.col("sum_right"),
                               F.lit(0).cast("decimal(38,0)")).alias("sum_right"))
            .orderBy("bucket"))
