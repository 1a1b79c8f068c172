"""PII detection/redaction and benchmark-contamination operators —
unit semantics on planted fixtures (the sf-scale oracle gate runs via
tests/test_driver_extras.py::test_extra_matches_oracle)."""

from pyspark.sql import functions as F

from schema_inference_spark.operators.contamination import contamination_pairs
from schema_inference_spark.operators.pii import pii_flags, pii_redact


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_pii_flags_counts_each_class(spark):
    df = _docs(spark, [
        (0, "reach me at a.b+c@x-mail.co.uk or root@ex.io today"),
        (1, "ssn 123-45-6789 phone 555-123-4567 ip 10.0.0.1"),
        (2, "no pii here, just 12345 and a.b and x@y"),  # x@y: no TLD
        (3, "1.2.3.4 and 255.255.255.255"),
    ])
    got = {r.doc_id: r for r in pii_flags(df).collect()}
    assert (got[0].n_email, got[0].n_pii) == (2, 2)
    assert (got[1].n_ssn, got[1].n_phone, got[1].n_ipv4,
            got[1].n_pii) == (1, 1, 1, 3)
    assert got[2].n_pii == 0
    assert (got[3].n_ipv4, got[3].n_pii) == (2, 2)


def test_pii_redact_tokens_and_counts(spark):
    df = _docs(spark, [
        (0, "mail bob@corp.example then dial 555-123-4567"),
        (1, "clean"),
    ])
    got = {r.doc_id: r for r in pii_redact(df).collect()}
    assert got[0].redacted == "mail <EMAIL> then dial <PHONE>"
    assert got[0].n_redactions == 2
    assert len(got[0].redacted_sha) == 64
    assert got[1].redacted == "clean" and got[1].n_redactions == 0
    # ssn is redacted before the phone pattern can half-eat it
    ssn = pii_redact(_docs(spark, [(2, "id 123-45-6789 ok")])).collect()[0]
    assert ssn.redacted == "id <SSN> ok"


def test_overlapping_span_contract(spark):
    """One span matched by two classes: a phone-shaped email local-part.
    pii_flags counts it in BOTH classes (documented double-count —
    per-class counts are independent audit signals); pii_redact resolves
    it sequentially (email first), so exactly ONE token is substituted
    and n_redactions counts only that one."""
    df = _docs(spark, [(0, "write 555-123-4567@x.com soon")])
    flags = pii_flags(df).collect()[0]
    assert (flags.n_email, flags.n_phone) == (1, 1)
    assert flags.n_pii == 2          # documented: total class MATCHES,
    #                                  not distinct spans
    red = pii_redact(df).collect()[0]
    assert red.redacted == "write <EMAIL> soon"
    assert red.n_redactions == 1     # the consumed phone match is never
    #                                  substituted, so it is not counted
    # pre-existing token text must not inflate the count
    lit = pii_redact(_docs(spark, [(1, "already <EMAIL> here")])).collect()[0]
    assert lit.redacted == "already <EMAIL> here"
    assert lit.n_redactions == 0


def test_contamination_containment_and_threshold(spark):
    # bench item b1: 4 words -> 2 distinct 3-shingles ("a b c", "b c d")
    bench = spark.createDataFrame([(100, "a b c d")],
                                  "bench_id bigint, text string")
    docs = _docs(spark, [
        (0, "x a b c d y"),          # contains both shingles -> 10000 bp
        (1, "a b c zzz"),            # contains 1 of 2 -> 5000 bp
        (2, "totally different words here"),   # 0
    ])
    out = {(r.doc_id, r.bench_id): r
           for r in contamination_pairs(docs, bench,
                                        threshold=0.5).collect()}
    assert out[(0, 100)].containment_bp == 10000
    assert out[(0, 100)].n_matched == 2 and out[(0, 100)].bench_n == 2
    assert out[(1, 100)].containment_bp == 5000
    assert (2, 100) not in out
    # threshold excludes the partial pair
    strict = contamination_pairs(docs, bench, threshold=0.6).collect()
    assert [(r.doc_id, r.bench_id) for r in strict] == [(0, 100)]


def test_contamination_plan_broadcasts_bench(spark):
    """The corpus side must reach the join without an exchange: the
    bench postings broadcast (eval sets are MBs; the corpus is the
    100-TB side)."""
    bench = spark.createDataFrame([(1, "a b c d e")],
                                  "bench_id bigint, text string")
    docs = _docs(spark, [(i, f"w{i} a b c d") for i in range(10)])
    plan = (contamination_pairs(docs, bench, threshold=0.1)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan
