"""Driver-contract queries for the anomaly/change family
(operators/anomaly.py): outlier fences, volume completeness, key-skew
profiling, snapshot row diff. All four fully oracle-gated.

The volume and snapshot queries PLANT their anomalies deterministically
(modulus filters on event_id / day-of-month, the same pattern as the
PII/dup augmentations) — both engines derive the identical corrupted
views from the pristine parquet, so the gate checks the CHECK, not the
fixture.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .operators import anomaly as A


def _t(spark: SparkSession, sf_dir: str, name: str):
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# Outlier fences (Tukey IQR) over events
# ---------------------------------------------------------------------------

def q_outlier_fences(spark, sf_dir):
    return A.outlier_fences(_t(spark, sf_dir, "events"),
                            ["user_id", "value"], k=1.5)


SQL_OUTLIER_FENCES = """
WITH f AS (
  SELECT quantile_cont(user_id, 0.25) AS u_q1,
         quantile_cont(user_id, 0.75) AS u_q3,
         quantile_cont(value,   0.25) AS v_q1,
         quantile_cont(value,   0.75) AS v_q3
  FROM events),
c AS (
  SELECT count(user_id) AS u_n,
         coalesce(sum(CASE WHEN user_id < u_q1 - 1.5*(u_q3-u_q1)
                           THEN 1 END), 0) AS u_below,
         coalesce(sum(CASE WHEN user_id > u_q3 + 1.5*(u_q3-u_q1)
                           THEN 1 END), 0) AS u_above,
         count(value) AS v_n,
         coalesce(sum(CASE WHEN value < v_q1 - 1.5*(v_q3-v_q1)
                           THEN 1 END), 0) AS v_below,
         coalesce(sum(CASE WHEN value > v_q3 + 1.5*(v_q3-v_q1)
                           THEN 1 END), 0) AS v_above
  FROM events, f)
SELECT 'user_id' AS col_name,
       round(u_q1, 4) AS q1, round(u_q3, 4) AS q3,
       round(u_q1 - 1.5*(u_q3-u_q1), 4) AS lo,
       round(u_q3 + 1.5*(u_q3-u_q1), 4) AS hi,
       u_n AS n_rows, u_below AS n_below, u_above AS n_above
FROM f, c
UNION ALL
SELECT 'value', round(v_q1, 4), round(v_q3, 4),
       round(v_q1 - 1.5*(v_q3-v_q1), 4),
       round(v_q3 + 1.5*(v_q3-v_q1), 4),
       v_n, v_below, v_above
FROM f, c
ORDER BY col_name
"""


# ---------------------------------------------------------------------------
# Volume / completeness: day 7 dropped entirely (missing partition),
# day 14 thinned to event_id % 5 == 0 (low-volume ingest)
# ---------------------------------------------------------------------------

def q_volume_anomaly(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    day = F.dayofmonth("ts")
    corrupted = ev.filter(
        (day != 7) & ((day != 14) | (F.col("event_id") % 5 == 0)))
    return A.volume_anomaly(corrupted, "ts", low_bp=5000, high_bp=15000)


SQL_VOLUME_ANOMALY = """
WITH src AS (
  SELECT * FROM events
  WHERE date_part('day', ts) <> 7
    AND (date_part('day', ts) <> 14 OR event_id % 5 = 0)),
c AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS dd, count(*) AS n_rows
  FROM src GROUP BY 1),
b AS (
  SELECT min(dd) AS d0, max(dd) AS d1,
         quantile_cont(n_rows, 0.5) AS med
  FROM c),
cal AS (
  SELECT CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
                                     CAST(d1 AS TIMESTAMP),
                                     INTERVAL 1 DAY)) AS DATE) AS dd,
         med
  FROM b)
SELECT strftime(cal.dd, '%Y-%m-%d') AS day,
       coalesce(c.n_rows, 0) AS n_rows,
       round(med, 4) AS median_n,
       CAST(floor(coalesce(c.n_rows, 0) * 10000.0 / med) AS BIGINT)
         AS ratio_bp,
       CASE WHEN coalesce(c.n_rows, 0) = 0 THEN 'missing'
            WHEN floor(coalesce(c.n_rows, 0) * 10000.0 / med) < 5000
              THEN 'low'
            WHEN floor(coalesce(c.n_rows, 0) * 10000.0 / med) > 15000
              THEN 'high'
            ELSE 'ok' END AS verdict
FROM cal LEFT JOIN c ON c.dd = cal.dd
ORDER BY day
"""


# ---------------------------------------------------------------------------
# Key-skew profile: top-10 heaviest user_ids
# ---------------------------------------------------------------------------

def q_key_skew(spark, sf_dir):
    return A.key_skew_profile(_t(spark, sf_dir, "events"),
                              "user_id", top_k=10)


SQL_KEY_SKEW = """
WITH s AS (
  SELECT CAST(user_id AS VARCHAR) AS key, count(*) AS n_rows
  FROM events GROUP BY 1),
t AS (SELECT sum(n_rows) AS total FROM s),
top AS (
  SELECT key, n_rows,
         row_number() OVER (ORDER BY n_rows DESC, key ASC) AS rank
  FROM s ORDER BY n_rows DESC, key ASC LIMIT 10)
SELECT rank, key, n_rows,
       CAST(floor(n_rows * 10000.0 / total) AS BIGINT) AS share_bp
FROM top, t
ORDER BY rank
"""


# ---------------------------------------------------------------------------
# Snapshot row diff (CDC): old = events minus every 7th id (-> added),
# with every 11th surviving id's value bumped (-> changed), plus ghost
# ids at +10,000,000 for every 13th id (-> removed). Payload hashes use
# fixed-point bigints for the double so the md5 bytes match across
# engines (doubles stringify engine-specifically).
# ---------------------------------------------------------------------------

def _payload(value_col):
    return F.concat_ws(
        "|",
        F.coalesce(F.col("event_type"), F.lit("\x00")),
        F.floor(value_col * 100).cast("bigint").cast("string"),
        F.col("user_id").cast("string"))


def q_snapshot_diff(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    eid = F.col("event_id")
    new = ev.select(eid.alias("event_id"),
                    F.md5(_payload(F.col("value"))).alias("row_hash"))
    old_val = F.when(eid % 11 == 0, F.col("value") + 1) \
               .otherwise(F.col("value"))
    old_base = (ev.filter(eid % 7 != 0)
                .select(eid.alias("event_id"),
                        F.md5(_payload(old_val)).alias("row_hash")))
    ghosts = (ev.filter(eid % 13 == 0)
              .select((eid + 10_000_000).alias("event_id"),
                      F.md5(_payload(F.col("value"))).alias("row_hash")))
    old = old_base.unionByName(ghosts)
    return A.snapshot_row_diff(old, new, ["event_id"])


SQL_SNAPSHOT_DIFF = """
WITH pay AS (
  SELECT event_id, user_id, event_type, value,
         concat_ws('|', coalesce(event_type, chr(0)),
                   CAST(CAST(floor(value * 100) AS BIGINT) AS VARCHAR),
                   CAST(user_id AS VARCHAR)) AS p_new,
         concat_ws('|', coalesce(event_type, chr(0)),
                   CAST(CAST(floor((CASE WHEN event_id % 11 = 0
                                         THEN value + 1 ELSE value END)
                                   * 100) AS BIGINT) AS VARCHAR),
                   CAST(user_id AS VARCHAR)) AS p_old
  FROM events),
new_s AS (SELECT event_id, md5(p_new) AS new_hash FROM pay),
old_s AS (
  SELECT event_id, md5(p_old) AS old_hash FROM pay WHERE event_id % 7 <> 0
  UNION ALL
  SELECT event_id + 10000000, md5(p_new) FROM pay WHERE event_id % 13 = 0)
SELECT coalesce(old_s.event_id, new_s.event_id) AS event_id,
       CASE WHEN old_s.old_hash IS NULL THEN 'added'
            WHEN new_s.new_hash IS NULL THEN 'removed'
            ELSE 'changed' END AS status,
       old_hash, new_hash
FROM old_s FULL OUTER JOIN new_s ON old_s.event_id = new_s.event_id
WHERE old_hash IS NULL OR new_hash IS NULL OR old_hash <> new_hash
ORDER BY event_id
"""


ANOMALY_QUERIES = {
    "outlier_fences": q_outlier_fences,
    "volume_anomaly": q_volume_anomaly,
    "key_skew": q_key_skew,
    "snapshot_diff": q_snapshot_diff,
}

ANOMALY_ORACLES = {
    "outlier_fences": SQL_OUTLIER_FENCES,
    "volume_anomaly": SQL_VOLUME_ANOMALY,
    "key_skew": SQL_KEY_SKEW,
    "snapshot_diff": SQL_SNAPSHOT_DIFF,
}
