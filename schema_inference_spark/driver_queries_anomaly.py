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


from .driver_queries import _t  # noqa: F401  (plain reader: float aggs)


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


# ---------------------------------------------------------------------------
# Embedding quality: planted corruption — every 89th vector zeroed
# (zero_norm), every 97th gets a NaN element 0 (nonfinite), every 101st
# truncated to 63 elements (bad_dim). Norms are fixed-point bigints
# (floor(double(x)*1e6)^2 summed) so both engines hash byte-identically:
# float->double widening, double multiply, and floor are IEEE-exact.
# ---------------------------------------------------------------------------

def _corrupted_embeddings(spark, sf_dir):
    emb = F.col("embedding")
    vid = F.col("vec_id")
    zero = F.transform(emb, lambda x: F.lit(0.0).cast("float"))
    nan_head = F.concat(F.array(F.lit(float("nan")).cast("float")),
                        F.slice(emb, 2, 63))
    planted = (F.when(vid % 89 == 0, zero)
               .when(vid % 97 == 0, nan_head)
               .when(vid % 101 == 0, F.slice(emb, 1, 63))
               .otherwise(emb))
    return (_t(spark, sf_dir, "embeddings")
            .select("vec_id", planted.alias("embedding")))


def q_embedding_quality(spark, sf_dir):
    from .operators import embeddings as E
    q = E.embedding_quality(_corrupted_embeddings(spark, sf_dir),
                            expected_dim=64)
    return q.filter(F.col("verdict") != "ok").orderBy("vec_id")


SQL_EMBEDDING_QUALITY = """
WITH v AS (
  SELECT vec_id,
         CASE WHEN vec_id % 89 = 0
              THEN list_transform(embedding, x -> CAST(0.0 AS FLOAT))
              WHEN vec_id % 97 = 0
              THEN list_concat([CAST('nan' AS FLOAT)], embedding[2:])
              WHEN vec_id % 101 = 0
              THEN embedding[1:63]
              ELSE embedding END AS emb
  FROM embeddings),
q AS (
  SELECT vec_id,
         CAST(len(emb) AS INTEGER) AS dim,
         CAST(len(emb) - len(list_filter(emb, x -> isfinite(x)))
              AS BIGINT) AS n_nonfinite,
         CAST(coalesce(list_sum(list_transform(
                list_filter(emb, x -> isfinite(x)),
                x -> CAST(floor(CAST(x AS DOUBLE)*1000000) AS BIGINT)
                   * CAST(floor(CAST(x AS DOUBLE)*1000000) AS BIGINT))),
              0) AS BIGINT) AS norm_sq_fp
  FROM v)
SELECT vec_id, dim, n_nonfinite, norm_sq_fp,
       CASE WHEN dim <> 64 THEN 'bad_dim'
            WHEN n_nonfinite > 0 THEN 'nonfinite'
            WHEN norm_sq_fp = 0 THEN 'zero_norm'
            ELSE 'ok' END AS verdict
FROM q
WHERE dim <> 64 OR n_nonfinite > 0 OR norm_sq_fp = 0
ORDER BY vec_id
"""


# ---------------------------------------------------------------------------
# Embedding norm fences: the corpus is unit-normalized (norm_sq_fp
# ~ 1e12 within +-4e6), so rescaled vectors are planted — every 79th
# vector scaled x0.5 (low_norm), every 83rd x2 (high_norm). Powers of
# two are EXACT in float arithmetic, so both engines see identical
# floats; ratio is floored basis points of the ok-population median.
# ---------------------------------------------------------------------------

def q_embedding_norm_fence(spark, sf_dir):
    from .operators import embeddings as E
    emb = F.col("embedding")
    vid = F.col("vec_id")
    half = F.transform(emb, lambda x: (x * F.lit(0.5).cast("float"))
                       .cast("float"))
    twice = F.transform(emb, lambda x: (x * F.lit(2.0).cast("float"))
                        .cast("float"))
    planted = (F.when(vid % 79 == 0, half)
               .when(vid % 83 == 0, twice)
               .otherwise(emb))
    df = (_t(spark, sf_dir, "embeddings")
          .select("vec_id", planted.alias("embedding")))
    q = E.embedding_quality(df, expected_dim=64)
    return (E.embedding_norm_fences(q, low_bp=9000, high_bp=11000)
            .select("vec_id", "norm_sq_fp", "ratio_bp", "fence")
            .orderBy("vec_id"))


SQL_EMBEDDING_NORM_FENCE = """
WITH v AS (
  SELECT vec_id,
         CASE WHEN vec_id % 79 = 0
              THEN list_transform(embedding,
                     x -> CAST(x * CAST(0.5 AS FLOAT) AS FLOAT))
              WHEN vec_id % 83 = 0
              THEN list_transform(embedding,
                     x -> CAST(x * CAST(2.0 AS FLOAT) AS FLOAT))
              ELSE embedding END AS emb
  FROM embeddings),
q AS (
  SELECT vec_id,
         CAST(list_sum(list_transform(
                list_filter(emb, x -> isfinite(x)),
                x -> CAST(floor(CAST(x AS DOUBLE)*1000000) AS BIGINT)
                   * CAST(floor(CAST(x AS DOUBLE)*1000000) AS BIGINT)))
              AS BIGINT) AS norm_sq_fp
  FROM v),
m AS (SELECT median(norm_sq_fp) AS med FROM q),
r AS (
  SELECT vec_id, norm_sq_fp,
         CAST(floor(norm_sq_fp * 10000.0 / med) AS BIGINT) AS ratio_bp
  FROM q, m)
SELECT vec_id, norm_sq_fp, ratio_bp,
       CASE WHEN ratio_bp < 9000 THEN 'low_norm'
            ELSE 'high_norm' END AS fence
FROM r
WHERE ratio_bp < 9000 OR ratio_bp > 11000
ORDER BY vec_id
"""


# ---------------------------------------------------------------------------
# Embedding centroid drift: snapshots = even vs odd vec_ids, with the
# "new" half's dimension 7 shifted by +0.25 (float addition of two
# exactly-representable floats is correctly rounded and identical in
# the JVM and DuckDB). Only dim 7 crosses the 0.1 threshold; the other
# 63 dims establish the no-false-positive baseline.
# ---------------------------------------------------------------------------

def q_embedding_drift(spark, sf_dir):
    from .operators import embeddings as E
    emb_t = _t(spark, sf_dir, "embeddings")
    old = emb_t.filter(F.col("vec_id") % 2 == 0).select("embedding")
    shifted = F.transform(
        F.col("embedding"),
        lambda x, i: F.when(i == 7, (x + F.lit(0.25).cast("float"))
                            .cast("float")).otherwise(x))
    new = (emb_t.filter(F.col("vec_id") % 2 == 1)
           .select(shifted.alias("embedding")))
    return E.embedding_centroid_drift(old, new, threshold_fp=100_000)


SQL_EMBEDDING_DRIFT = """
WITH old_v AS (
  SELECT embedding AS emb FROM embeddings WHERE vec_id % 2 = 0),
new_v AS (
  SELECT list_concat(list_concat(embedding[1:7],
           [CAST(embedding[8] + CAST(0.25 AS FLOAT) AS FLOAT)]),
           embedding[9:]) AS emb
  FROM embeddings WHERE vec_id % 2 = 1),
o AS (
  SELECT dim, CAST(floor(sum(CAST(floor(CAST(x AS DOUBLE)*1000000)
                                  AS BIGINT)) * 1.0 / count(*))
              AS BIGINT) AS mean_fp_old
  FROM (SELECT CAST(unnest(generate_series(1, len(emb))) - 1
               AS INTEGER) AS dim,
               unnest(emb) AS x FROM old_v)
  GROUP BY dim),
n AS (
  SELECT dim, CAST(floor(sum(CAST(floor(CAST(x AS DOUBLE)*1000000)
                                  AS BIGINT)) * 1.0 / count(*))
              AS BIGINT) AS mean_fp_new
  FROM (SELECT CAST(unnest(generate_series(1, len(emb))) - 1
               AS INTEGER) AS dim,
               unnest(emb) AS x FROM new_v)
  GROUP BY dim)
SELECT o.dim, mean_fp_old, mean_fp_new,
       mean_fp_new - mean_fp_old AS delta_fp,
       abs(mean_fp_new - mean_fp_old) > 100000 AS drifted
FROM o JOIN n ON o.dim = n.dim
ORDER BY o.dim
"""


ANOMALY_QUERIES = {
    "outlier_fences": q_outlier_fences,
    "volume_anomaly": q_volume_anomaly,
    "key_skew": q_key_skew,
    "snapshot_diff": q_snapshot_diff,
    "embedding_quality": q_embedding_quality,
    "embedding_norm_fence": q_embedding_norm_fence,
    "embedding_drift": q_embedding_drift,
}

ANOMALY_ORACLES = {
    "outlier_fences": SQL_OUTLIER_FENCES,
    "volume_anomaly": SQL_VOLUME_ANOMALY,
    "key_skew": SQL_KEY_SKEW,
    "snapshot_diff": SQL_SNAPSHOT_DIFF,
    "embedding_quality": SQL_EMBEDDING_QUALITY,
    "embedding_norm_fence": SQL_EMBEDDING_NORM_FENCE,
    "embedding_drift": SQL_EMBEDDING_DRIFT,
}
