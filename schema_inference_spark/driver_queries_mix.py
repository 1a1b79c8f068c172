"""Driver-contract queries: corpus assembly + product-analytics
operators (deterministic train/val/test splitting, collocation
statistics, event funnels, cohort retention, decontamination audit).
Every entry is integer/string-exact, so all six are fully oracle-gated
(rows+schema+hash) — no float drift surface by construction.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .operators import contamination as C
from .operators import curation as CU
from .operators import sessions as S
from .operators import textstats as TS


from .driver_queries import _t_redist as _t  # noqa: F401,E402  (exact-output family: starved-scan-aware reader)


_NORM = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"


# ---------------------------------------------------------------------------
# Deterministic corpus split
# ---------------------------------------------------------------------------

SPLIT_SALT = "v1"

# the md5-hex CASE, written once for both split oracles
_SPLIT_H = f"substr(md5(CAST(doc_id AS VARCHAR) || ':{SPLIT_SALT}'), 1, 2)"
_SPLIT_CASE = (f"CASE WHEN {_SPLIT_H} < 'c0' THEN 'train' "
               f"WHEN {_SPLIT_H} < 'e0' THEN 'val' ELSE 'test' END")


def q_split_assign(spark, sf_dir):
    """Deterministic md5-range train/val/test assignment
    (operators/curation.py split_assign): per-doc split that never
    migrates across re-runs, appends, or engines — one scan, zero
    shuffle, codegen end to end (the orderBy is presentation-only,
    added here at the query boundary, never inside the operator)."""
    return CU.split_assign(_t(spark, sf_dir, "documents"),
                           salt=SPLIT_SALT).orderBy("doc_id")


SQL_SPLIT_ASSIGN = f"""
SELECT doc_id, source,
       {_SPLIT_H} AS bucket,
       {_SPLIT_CASE} AS split,
       len(string_split({_NORM}, ' ')) AS ws_tokens
FROM documents
ORDER BY doc_id
"""


def q_split_balance(spark, sf_dir):
    """Split-balance audit (operators/curation.py split_balance):
    per-split doc/token counts + integer basis-point shares — the
    pre-training holdout check."""
    return CU.split_balance(_t(spark, sf_dir, "documents"),
                            salt=SPLIT_SALT)


SQL_SPLIT_BALANCE = f"""
WITH a AS (SELECT {_SPLIT_CASE} AS split,
                  len(string_split({_NORM}, ' ')) AS ws
           FROM documents),
g AS (SELECT split, count(*) AS n_docs,
             CAST(sum(ws) AS BIGINT) AS ws_tokens
      FROM a GROUP BY split)
SELECT split, n_docs, ws_tokens,
       CAST((10000 * n_docs) // sum(n_docs) OVER () AS BIGINT)
         AS share_bp,
       CAST((10000 * ws_tokens) // sum(ws_tokens) OVER () AS BIGINT)
         AS token_share_bp
FROM g
ORDER BY split
"""


# ---------------------------------------------------------------------------
# Collocations (Dice)
# ---------------------------------------------------------------------------

COLL_K = 50
COLL_MIN = 5


def q_collocations(spark, sf_dir):
    """Top-50 bigram collocations by integer Dice coefficient
    (operators/textstats.py collocations) — the PMI-style vocabulary
    statistic without the int64-overflowing corpus-total product or
    float logs."""
    return TS.collocations(_t(spark, sf_dir, "documents"),
                           k=COLL_K, min_count=COLL_MIN)


SQL_COLLOCATIONS = f"""
WITH b AS (SELECT string_split({_NORM}, ' ') AS w FROM documents),
uc AS (SELECT word, count(*) AS c
       FROM (SELECT unnest(w) AS word FROM b) GROUP BY word),
g AS (SELECT CASE WHEN len(w) > 1
                  THEN list_transform(generate_series(1, len(w) - 1),
                                      i -> w[i] || ' ' || w[i + 1])
                  ELSE CAST([] AS VARCHAR[]) END AS bi
      FROM b),
bc AS (SELECT gram, count(*) AS n_occurrences
       FROM (SELECT unnest(bi) AS gram FROM g)
       GROUP BY gram HAVING count(*) >= {COLL_MIN}),
s AS (SELECT gram, n_occurrences,
             string_split(gram, ' ')[1] AS wl,
             string_split(gram, ' ')[2] AS wr
      FROM bc),
j AS (SELECT s.gram, s.n_occurrences, l.c AS c_left, r.c AS c_right,
             CAST((2 * 10000 * s.n_occurrences) // (l.c + r.c) AS BIGINT)
               AS dice_bp
      FROM s JOIN uc l ON s.wl = l.word JOIN uc r ON s.wr = r.word),
ranked AS (SELECT *, row_number() OVER (
               ORDER BY dice_bp DESC, n_occurrences DESC, gram) AS rank
           FROM j)
SELECT rank, gram, n_occurrences, c_left, c_right, dice_bp
FROM ranked WHERE rank <= {COLL_K}
ORDER BY rank
"""


# ---------------------------------------------------------------------------
# Event funnel + cohort retention
# ---------------------------------------------------------------------------

FUNNEL_STEPS = ["view", "click", "purchase"]


def q_funnel(spark, sf_dir):
    """Ordered view->click->purchase funnel over events
    (operators/sessions.py funnel): min-timestamp cascade, one output
    row per step with integer basis-point conversions."""
    return S.funnel(_t(spark, sf_dir, "events"), FUNNEL_STEPS)


SQL_FUNNEL = f"""
WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
            WHERE event_type = '{FUNNEL_STEPS[0]}' GROUP BY user_id),
s2 AS (SELECT e.user_id, min(e.ts) AS t2
       FROM events e JOIN s1 USING (user_id)
       WHERE e.event_type = '{FUNNEL_STEPS[1]}' AND e.ts >= s1.t1
       GROUP BY e.user_id),
s3 AS (SELECT e.user_id, min(e.ts) AS t3
       FROM events e JOIN s2 USING (user_id)
       WHERE e.event_type = '{FUNNEL_STEPS[2]}' AND e.ts >= s2.t2
       GROUP BY e.user_id),
c AS (SELECT (SELECT count(*) FROM s1) AS n1,
             (SELECT count(*) FROM s2) AS n2,
             (SELECT count(*) FROM s3) AS n3)
SELECT CAST(1 AS BIGINT) AS step_idx, '{FUNNEL_STEPS[0]}' AS step,
       n1 AS n_users,
       CASE WHEN n1 > 0 THEN CAST(10000 AS BIGINT) END AS conv_prev_bp,
       CASE WHEN n1 > 0 THEN CAST(10000 AS BIGINT) END AS conv_first_bp
FROM c
UNION ALL
SELECT 2, '{FUNNEL_STEPS[1]}', n2,
       CASE WHEN n1 > 0 THEN (10000 * n2) // n1 END,
       CASE WHEN n1 > 0 THEN (10000 * n2) // n1 END
FROM c
UNION ALL
SELECT 3, '{FUNNEL_STEPS[2]}', n3,
       CASE WHEN n2 > 0 THEN (10000 * n3) // n2 END,
       CASE WHEN n1 > 0 THEN (10000 * n3) // n1 END
FROM c
ORDER BY step_idx
"""


RETENTION_MAX_OFFSET = 30


def q_cohort_retention(spark, sf_dir):
    """Daily cohort retention over events (operators/sessions.py
    cohort_retention): first-event-date cohorts, per-offset retained
    users + integer basis-point rates."""
    return S.cohort_retention(_t(spark, sf_dir, "events"),
                              max_offset=RETENTION_MAX_OFFSET)


SQL_COHORT_RETENTION = f"""
WITH cohort AS (SELECT user_id, min(CAST(ts AS DATE)) AS cohort_date
                FROM events GROUP BY user_id),
act AS (SELECT DISTINCT e.user_id, c.cohort_date,
               CAST(date_diff('day', c.cohort_date, CAST(e.ts AS DATE))
                    AS BIGINT) AS day_offset
        FROM events e JOIN cohort c USING (user_id)
        WHERE date_diff('day', c.cohort_date, CAST(e.ts AS DATE))
              <= {RETENTION_MAX_OFFSET}),
sizes AS (SELECT cohort_date, count(*) AS sz FROM cohort
          GROUP BY cohort_date),
r AS (SELECT cohort_date, day_offset, count(*) AS n_users
      FROM act GROUP BY cohort_date, day_offset)
SELECT r.cohort_date, r.day_offset, r.n_users,
       CAST((10000 * r.n_users) // s.sz AS BIGINT) AS retained_bp
FROM r JOIN sizes s USING (cohort_date)
ORDER BY r.cohort_date, r.day_offset
"""


# ---------------------------------------------------------------------------
# Decontamination audit
# ---------------------------------------------------------------------------

DECON_MOD = 50  # bench set = documents with doc_id % DECON_MOD = 0


def q_decontaminate(spark, sf_dir):
    """Decontamination audit (operators/contamination.py
    decontaminate_summary): per-source contaminated/kept doc counts and
    surviving token mass, with the eval set carved out of the corpus
    deterministically (doc_id % 50 == 0) so both engines see identical
    bench items and a disjoint corpus."""
    from .driver_queries_extras import _shingled_docs
    # corpus and bench both derive from the session's one persisted
    # shingled frame (decontaminate_summary's with_shingles passes an
    # attested pre-shingled input through) — the query previously
    # re-tokenized the corpus twice more; the source column rides along
    # for the rollup
    docs = _t(spark, sf_dir, "documents").select("doc_id", "source")
    sh = _shingled_docs(spark, sf_dir).join(docs, "doc_id")
    corpus = sh.filter(F.col("doc_id") % DECON_MOD != 0)
    bench = (sh.filter(F.col("doc_id") % DECON_MOD == 0)
             .withColumnRenamed("doc_id", "bench_id"))
    return C.decontaminate_summary(corpus, bench, threshold=0.3)


SQL_DECONTAMINATE = f"""
WITH t AS (SELECT doc_id, string_split({_NORM}, ' ') AS ws
           FROM documents),
sh AS (SELECT doc_id,
              unnest(list_distinct(list_transform(
                  range(1, len(ws) - 1),
                  i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))) AS s
       FROM t WHERE len(ws) >= 3),
bs AS (SELECT doc_id AS bench_id, s FROM sh
       WHERE doc_id % {DECON_MOD} = 0),
bn AS (SELECT doc_id AS bench_id, count(*) AS bench_n FROM sh
       WHERE doc_id % {DECON_MOD} = 0 GROUP BY doc_id),
m AS (SELECT a.doc_id, b.bench_id, count(*) AS nm
      FROM sh a JOIN bs b ON a.s = b.s AND a.doc_id % {DECON_MOD} <> 0
      GROUP BY a.doc_id, b.bench_id),
dirty AS (SELECT DISTINCT m.doc_id
          FROM m JOIN bn USING (bench_id)
          WHERE (10000 * m.nm) // bn.bench_n >= 3000),
base AS (SELECT doc_id, source,
                len(string_split({_NORM}, ' ')) AS ws
         FROM documents WHERE doc_id % {DECON_MOD} <> 0)
SELECT b.source,
       count(*) AS n_docs,
       CAST(sum(CASE WHEN d.doc_id IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_contaminated,
       CAST(sum(CASE WHEN d.doc_id IS NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_kept,
       CAST(sum(CASE WHEN d.doc_id IS NULL THEN b.ws ELSE 0 END)
            AS BIGINT) AS tokens_kept
FROM base b LEFT JOIN dirty d USING (doc_id)
GROUP BY b.source
ORDER BY b.source
"""


MIX_QUERIES = {
    "split_assign": q_split_assign,
    "split_balance": q_split_balance,
    "collocations": q_collocations,
    "funnel": q_funnel,
    "cohort_retention": q_cohort_retention,
    "decontaminate": q_decontaminate,
}

MIX_ORACLES = {
    "split_assign": SQL_SPLIT_ASSIGN,
    "split_balance": SQL_SPLIT_BALANCE,
    "collocations": SQL_COLLOCATIONS,
    "funnel": SQL_FUNNEL,
    "cohort_retention": SQL_COHORT_RETENTION,
    "decontaminate": SQL_DECONTAMINATE,
}


# ---------------------------------------------------------------------------
# Boilerplate discovery + mixture planning
# ---------------------------------------------------------------------------

HOTSEG_WORDS = 10   # same width the dedup_segments pass deduplicates
HOTSEG_K = 50


def q_hot_segments(spark, sf_dir):
    """Boilerplate discovery (operators/dedup.py hot_segments): top-50
    fixed-width segments by document frequency, over the dup-augmented
    corpus (the synthetic corpus has no natural boilerplate, so the
    operator needs planted signal — same augmentation the incremental
    dedup gates use)."""
    from .driver_queries_extras import _dup_aug
    docs = (_t(spark, sf_dir, "documents")
            .withColumn("text", F.expr(_dup_aug("STRING"))))
    from .operators.dedup import hot_segments
    return hot_segments(docs, seg_words=HOTSEG_WORDS, k=HOTSEG_K)


def _sql_hot_segments() -> str:
    from .driver_queries_extras import _dup_aug
    return f"""
WITH docs AS (SELECT doc_id, {_dup_aug('VARCHAR')} AS text
              FROM documents),
base AS (SELECT doc_id, string_split(coalesce(text, ''), ' ') AS w,
                CAST(ceil(len(string_split(coalesce(text, ''), ' '))
                     / {HOTSEG_WORDS}.0) AS BIGINT) AS n_segs
         FROM docs),
ex AS (SELECT doc_id, w, unnest(range(0, n_segs)) AS i FROM base),
segs AS (SELECT doc_id,
                array_to_string(w[(i*{HOTSEG_WORDS}+1):
                                  (i*{HOTSEG_WORDS}+{HOTSEG_WORDS})],
                                ' ') AS seg
         FROM ex),
pd AS (SELECT seg, doc_id, count(*) AS n FROM segs GROUP BY seg, doc_id),
agg AS (SELECT seg, count(*) AS n_docs,
               CAST(sum(n) AS BIGINT) AS n_occurrences
        FROM pd GROUP BY seg HAVING count(*) >= 2),
ranked AS (SELECT *, row_number() OVER (
               ORDER BY n_docs DESC, n_occurrences DESC, seg) AS rank
           FROM agg)
SELECT rank, seg, n_docs, n_occurrences
FROM ranked WHERE rank <= {HOTSEG_K}
ORDER BY rank
"""


SQL_HOT_SEGMENTS = _sql_hot_segments()


MIX_TOKEN_BUDGET = 500_000

# deterministic per-source target weights both engines derive from the
# source name alone (the real artifact is a config table; deriving it
# keeps the gate self-contained)
_WT_EXPR = "200 + 30 * (ascii(substr(source, length(source), 1)) % 7)"


def q_mixture_plan(spark, sf_dir):
    """Epoch/repeat planning (operators/curation.py mixture_plan):
    per-source tokens needed for the target mixture vs tokens
    available, with the fixed-point repeat factor — flags the sources a
    weighted mixture forces to up-sample."""
    docs = _t(spark, sf_dir, "documents")
    weights = (docs.select("source").distinct()
               .withColumn("weight_bp", F.expr(
                   "200 + 30 * (ascii(substring(source, length(source), 1))"
                   " % 7)").cast("bigint")))
    return CU.mixture_plan(docs, weights, MIX_TOKEN_BUDGET)


SQL_MIXTURE_PLAN = f"""
WITH avail AS (SELECT source,
                      CAST(sum(len(string_split({_NORM}, ' ')))
                           AS BIGINT) AS tokens_available
               FROM documents GROUP BY source),
wt AS (SELECT DISTINCT source,
              CAST({_WT_EXPR} AS BIGINT) AS target_weight_bp
       FROM documents),
j AS (SELECT a.source, a.tokens_available, wt.target_weight_bp,
             ({MIX_TOKEN_BUDGET} * wt.target_weight_bp) // 10000
               AS tokens_needed
      FROM avail a JOIN wt USING (source))
SELECT source, tokens_available, target_weight_bp, tokens_needed,
       CASE WHEN tokens_available > 0
            THEN CAST((100 * tokens_needed + tokens_available - 1)
                      // tokens_available AS BIGINT) END AS epochs_x100,
       (CASE WHEN tokens_available > 0
             THEN (100 * tokens_needed + tokens_available - 1)
                  // tokens_available END) > 100 AS oversampled
FROM j
ORDER BY source
"""


MIX_QUERIES.update({
    "hot_segments": q_hot_segments,
    "mixture_plan": q_mixture_plan,
})

MIX_ORACLES.update({
    "hot_segments": SQL_HOT_SEGMENTS,
    "mixture_plan": SQL_MIXTURE_PLAN,
})


# ---------------------------------------------------------------------------
# Split leakage (holdout contamination by near-dups)
# ---------------------------------------------------------------------------

def _split_case(col: str) -> str:
    h = f"substr(md5(CAST({col} AS VARCHAR) || ':{SPLIT_SALT}'), 1, 2)"
    return (f"CASE WHEN {h} < 'c0' THEN 'train' "
            f"WHEN {h} < 'e0' THEN 'val' ELSE 'test' END")


def q_split_leakage(spark, sf_dir):
    """Holdout-leak audit (operators/curation.py split_leakage):
    exact-Jaccard near-dup pairs straddling the md5-range split
    boundary — reuses the session's cached pair graph, splits computed
    (not joined) from the ids."""
    from .driver_queries_extras import _jaccard_pairs_cached
    return CU.split_leakage(_jaccard_pairs_cached(spark, sf_dir),
                            salt=SPLIT_SALT)


def _sql_split_leakage() -> str:
    from .driver_queries_extras import _JACCARD_CTES
    return f"""
WITH {_JACCARD_CTES}
SELECT d1, d2, jaccard,
       {_split_case('d1')} AS split1,
       {_split_case('d2')} AS split2
FROM jp
WHERE {_split_case('d1')} <> {_split_case('d2')}
ORDER BY d1, d2
"""


SQL_SPLIT_LEAKAGE = _sql_split_leakage()

MIX_QUERIES["split_leakage"] = q_split_leakage
MIX_ORACLES["split_leakage"] = SQL_SPLIT_LEAKAGE


FUNNEL_WINDOW_S = 21600  # 6-hour attribution window


def q_funnel_windowed(spark, sf_dir):
    """The funnel with a per-step attribution window (operators/
    sessions.py funnel within_seconds=6h): conversions only count
    within six hours of the previous step — the bounded form every
    production funnel uses."""
    return S.funnel(_t(spark, sf_dir, "events"), FUNNEL_STEPS,
                    within_seconds=FUNNEL_WINDOW_S)


SQL_FUNNEL_WINDOWED = f"""
WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
            WHERE event_type = '{FUNNEL_STEPS[0]}' GROUP BY user_id),
s2 AS (SELECT e.user_id, min(e.ts) AS t2
       FROM events e JOIN s1 USING (user_id)
       WHERE e.event_type = '{FUNNEL_STEPS[1]}' AND e.ts >= s1.t1
         AND e.ts <= s1.t1 + INTERVAL '{FUNNEL_WINDOW_S} seconds'
       GROUP BY e.user_id),
s3 AS (SELECT e.user_id, min(e.ts) AS t3
       FROM events e JOIN s2 USING (user_id)
       WHERE e.event_type = '{FUNNEL_STEPS[2]}' AND e.ts >= s2.t2
         AND e.ts <= s2.t2 + INTERVAL '{FUNNEL_WINDOW_S} seconds'
       GROUP BY e.user_id),
c AS (SELECT (SELECT count(*) FROM s1) AS n1,
             (SELECT count(*) FROM s2) AS n2,
             (SELECT count(*) FROM s3) AS n3)
SELECT CAST(1 AS BIGINT) AS step_idx, '{FUNNEL_STEPS[0]}' AS step,
       n1 AS n_users,
       CASE WHEN n1 > 0 THEN CAST(10000 AS BIGINT) END AS conv_prev_bp,
       CASE WHEN n1 > 0 THEN CAST(10000 AS BIGINT) END AS conv_first_bp
FROM c
UNION ALL
SELECT 2, '{FUNNEL_STEPS[1]}', n2,
       CASE WHEN n1 > 0 THEN (10000 * n2) // n1 END,
       CASE WHEN n1 > 0 THEN (10000 * n2) // n1 END
FROM c
UNION ALL
SELECT 3, '{FUNNEL_STEPS[2]}', n3,
       CASE WHEN n2 > 0 THEN (10000 * n3) // n2 END,
       CASE WHEN n1 > 0 THEN (10000 * n3) // n1 END
FROM c
ORDER BY step_idx
"""

MIX_QUERIES["funnel_windowed"] = q_funnel_windowed
MIX_ORACLES["funnel_windowed"] = SQL_FUNNEL_WINDOWED


# ---------------------------------------------------------------------------
# Fraction hash sampling (the stratified_sample scale path)
# ---------------------------------------------------------------------------

SAMPLE_FRACTION = 0.125  # threshold 0x20000000 — exact in both engines


def q_sample_fraction(spark, sf_dir):
    """Zero-shuffle fraction sampler (operators/sessions.py
    hash_sample): keep docs whose md5(id:salt) 8-hex prefix falls under
    floor(0.125 * 16^8) — the windowless scale path of
    stratified_sample, reproducible across engines and appends."""
    from .operators.sessions import hash_sample
    return (hash_sample(_t(spark, sf_dir, "documents"),
                        SAMPLE_FRACTION, "doc_id", salt=SPLIT_SALT)
            .select("doc_id", "source", "sample_bucket")
            .orderBy("doc_id"))


_SAMPLE_THRESH = format(int(SAMPLE_FRACTION * 16 ** 8), "08x")

SQL_SAMPLE_FRACTION = f"""
SELECT doc_id, source,
       substr(md5(CAST(doc_id AS VARCHAR) || ':{SPLIT_SALT}'), 1, 8)
         AS sample_bucket
FROM documents
WHERE substr(md5(CAST(doc_id AS VARCHAR) || ':{SPLIT_SALT}'), 1, 8)
      < '{_SAMPLE_THRESH}'
ORDER BY doc_id
"""

MIX_QUERIES["sample_fraction"] = q_sample_fraction
MIX_ORACLES["sample_fraction"] = SQL_SAMPLE_FRACTION


def q_mixture_sample_bucketed(spark, sf_dir):
    """The bucketed scale-path twin of mixture_sample
    (operators/curation.py token_budget_sample_bucketed): identical
    outputs from per-(source, hash-bucket) windows + driver prefix-sum
    offsets instead of one window per source — gated against the SAME
    oracle SQL as mixture_sample, which is the identity claim."""
    from .operators.curation import token_budget_sample_bucketed
    docs = _t(spark, sf_dir, "documents")
    budgets = (docs.select("source").distinct()
               .withColumn("token_budget",
                           (F.lit(300) + F.lit(50)
                            * (F.length("source") % 4)).cast("bigint")))
    return token_budget_sample_bucketed(docs, budgets)


MIX_QUERIES["mixture_sample_bucketed"] = q_mixture_sample_bucketed
# deliberately the SAME SQL as mixture_sample: the bucketed plan must
# reproduce the windowed plan's rows exactly
from .driver_queries_extras import SQL_MIXTURE_SAMPLE  # noqa: E402

MIX_ORACLES["mixture_sample_bucketed"] = SQL_MIXTURE_SAMPLE


# ---------------------------------------------------------------------------
# Per-group cardinality (the per-source form of D8's distinct count)
# ---------------------------------------------------------------------------

def q_distinct_by_source(spark, sf_dir):
    """Per-source content cardinality: distinct normalized-content
    hashes vs document count, with the duplicate rate in basis points —
    the per-group form of distinct_exact (two-level aggregate: the
    partial on (source, hash) absorbs repeats map-side before the
    count-distinct exchange)."""
    from .operators.dedup import normalized
    docs = _t(spark, sf_dir, "documents")
    return (docs.select("source",
                        F.md5(normalized(F.col("text"))).alias("_h"))
            .groupBy("source")
            .agg(F.countDistinct("_h").cast("bigint").alias("n_distinct"),
                 F.count(F.lit(1)).cast("bigint").alias("n_docs"))
            .withColumn("dup_bp", F.expr(
                "(10000 * (n_docs - n_distinct)) div n_docs"))
            .orderBy("source"))


SQL_DISTINCT_BY_SOURCE = f"""
SELECT source,
       count(DISTINCT md5({_NORM})) AS n_distinct,
       count(*) AS n_docs,
       (10000 * (count(*) - count(DISTINCT md5({_NORM})))) // count(*)
         AS dup_bp
FROM documents
GROUP BY source
ORDER BY source
"""

MIX_QUERIES["distinct_by_source"] = q_distinct_by_source
MIX_ORACLES["distinct_by_source"] = SQL_DISTINCT_BY_SOURCE
