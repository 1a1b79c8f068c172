"""Curation cascade: the single-scan column builders must agree
doc-for-doc with the canonical textstats operators (they restate the
formulas to avoid three doc_id joins; these tests pin them together),
and the summary must partition the corpus exactly."""

from pyspark.sql import functions as F


def _docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


def test_quality_bp_parity(spark):
    from schema_inference_spark.operators.curation import quality_bp_col
    from schema_inference_spark.operators.textstats import quality_score

    docs = _docs(spark)
    canonical = {r.doc_id: r.quality_bp
                 for r in quality_score(docs).collect()}
    cascade = {r.doc_id: r.quality_bp
               for r in quality_bp_col(docs).select("doc_id",
                                                    "quality_bp").collect()}
    assert cascade == canonical


def test_lang_pred_parity(spark):
    from schema_inference_spark.operators.curation import lang_pred_col
    from schema_inference_spark.operators.textstats import lang_id

    docs = _docs(spark)
    canonical = {r.doc_id: r.lang_pred for r in lang_id(docs).collect()}
    cascade = {r.doc_id: r.p for r in
               docs.select("doc_id", lang_pred_col().alias("p")).collect()}
    assert cascade == canonical


def test_distinct_ratio_parity(spark):
    from schema_inference_spark.operators.curation import (
        distinct_ratio_bp_col,
    )
    from schema_inference_spark.operators.textstats import repetition_stats

    docs = _docs(spark)
    canonical = {r.doc_id: 10000 * r.distinct_words // r.n_words
                 for r in repetition_stats(docs).collect()}
    cascade = {r.doc_id: r.ratio for r in
               docs.select("doc_id",
                           distinct_ratio_bp_col().alias("ratio")).collect()}
    assert cascade == canonical


def test_curation_summary_partitions_corpus(spark):
    """Buckets are disjoint and exhaustive: per-source counts sum to
    n_docs; a planted exact duplicate lands in the dup bucket; the
    kept token sum counts only surviving docs."""
    from schema_inference_spark.operators.curation import curation_summary

    # >= 200 chars (full length marks), no punctuation, high distinct
    # ratio, English stopwords -> survives every stage
    text_en = ("the quick brown fox jumps over a lazy dog and the old "
               "sailor walks to the harbor in the morning light while "
               "it rains softly on green hills and tall trees of the "
               "northern valley where children play games near a quiet "
               "river")
    rows = [
        (1, "s1", text_en),                       # kept
        (2, "s1", text_en),                       # exact dup of 1
        (3, "s1", "el la de que y en un es si no"),  # spanish -> lang
        # English ('the') but 1 distinct word in 40 -> repetitive;
        # long enough that quality passes first
        (4, "s2", "the " * 40),
        # English ('it'), distinct tokens, but short + punct-heavy
        # -> quality
        (5, "s2", "it !!!! ???? ,,,, ;;;;"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, source string, text string")
    got = {r.source: r for r in curation_summary(df).collect()}

    s1 = got["s1"]
    assert (s1.n_docs, s1.n_dup, s1.n_lang, s1.n_kept) == (3, 1, 1, 1)
    assert s1.n_docs == s1.n_dup + s1.n_lang + s1.n_quality \
        + s1.n_repetitive + s1.n_kept
    assert s1.tokens_kept == len(text_en.split())

    s2 = got["s2"]
    assert s2.n_docs == 2 and s2.n_kept == 0
    assert s2.n_repetitive == 1 and s2.n_quality == 1
    assert s2.tokens_kept == 0


def test_token_budget_sample_greedy_prefix(spark):
    """Budget semantics: docs are taken in md5(id) order per source and
    the INCLUSIVE running sum must stay within budget — the first
    overshooting doc is dropped AND nothing after it re-enters, even a
    smaller doc that would still fit (strict prefix, reproducibility
    over packing)."""
    from pyspark.sql import functions as F

    from schema_inference_spark.operators.curation import (
        token_budget_sample,
    )

    docs = spark.createDataFrame(
        [(i, "s", "w " * n) for i, n in
         [(1, 10), (2, 10), (3, 10), (4, 3), (5, 10)]],
        "doc_id bigint, source string, text string")
    budgets = spark.createDataFrame([("s", 25)],
                                    "source string, token_budget bigint")
    got = token_budget_sample(docs, budgets).collect()

    hash_order = [r.doc_id for r in docs.select(
        "doc_id", F.md5(F.col("doc_id").cast("string")).alias("h"))
        .orderBy("h", "doc_id").collect()]
    sizes = {1: 10, 2: 10, 3: 10, 4: 3, 5: 10}
    expect, cum = [], 0
    for d in hash_order:
        cum += sizes[d]
        if cum > 25:
            break           # strict prefix: stop at first overshoot
        expect.append(d)

    assert [r.doc_id for r in got] == expect
    assert all(r.cum_tokens <= r.token_budget for r in got)
    assert [r.mix_rank for r in got] == list(range(1, len(expect) + 1))
