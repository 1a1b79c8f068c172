"""500k-doc stress probe for the round-5 operators (segment_dedup,
curation_summary): regenerates the dup-heavy 100x corpus (sf0.1
replicated: per source doc ~10 verbatim copies + ~90 near-dup variants
across 15 templates — same recipe as the round-5 dedup stress probe in
BASELINE.md) on tmpfs and times each operator at local[32].

Usage: python BENCH/stress_new_ops.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from schema_inference_spark.functions import get_spark  # noqa: E402

CORPUS = "/dev/shm/docs100x.parquet"
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def build_corpus(spark):
    if os.path.exists(CORPUS):
        return
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    reps = spark.range(100).withColumnRenamed("id", "rep")
    big = (docs.crossJoin(reps)
           .withColumn("doc_id", F.col("doc_id") * 100 + F.col("rep"))
           # rep<10: verbatim copy; else a near-dup variant: one of 15
           # template prefixes prepended (boilerplate head), original tail
           .withColumn("text", F.when(
               F.col("rep") < 10, F.col("text"))
               .otherwise(F.concat(
                   F.lit("shared boilerplate header template "),
                   (F.col("rep") % 15).cast("string"),
                   F.lit(" common across the crawl "),
                   F.col("text"))))
           .drop("rep"))
    big.repartition(32).write.mode("overwrite").parquet(CORPUS)


def main():
    spark = get_spark(app_name="stress-new-ops", master="local[32]",
                      shuffle_partitions=64)
    t0 = time.monotonic()
    build_corpus(spark)
    gen_s = round(time.monotonic() - t0, 1)
    docs = spark.read.parquet(CORPUS)
    n = docs.count()

    from schema_inference_spark.operators.curation import curation_summary
    from schema_inference_spark.operators.dedup import segment_dedup

    t0 = time.monotonic()
    seg = segment_dedup(docs)
    seg_stats = seg.agg(F.sum("n_segs").alias("s"),
                        F.sum("n_kept").alias("k"),
                        F.count(F.lit(1)).alias("n")).collect()[0]
    seg_s = round(time.monotonic() - t0, 1)

    # the dup-heavy fast path (provably identical output)
    t0 = time.monotonic()
    seg_f = (segment_dedup(docs, exact_first=True)
             .agg(F.sum("n_segs").alias("s"), F.sum("n_kept").alias("k"))
             .collect()[0])
    seg_fast_s = round(time.monotonic() - t0, 1)
    assert (seg_f.s, seg_f.k) == (seg_stats.s, seg_stats.k)

    t0 = time.monotonic()
    cur = curation_summary(docs)
    cur_rows = cur.collect()
    cur_s = round(time.monotonic() - t0, 1)
    kept = sum(r.n_kept for r in cur_rows)
    dup = sum(r.n_dup for r in cur_rows)

    print(json.dumps({
        "corpus_docs": n, "gen_sec": gen_s,
        "segment_dedup": {"sec": seg_s, "sec_exact_first": seg_fast_s,
                          "n_segs": seg_stats.s,
                          "n_kept": seg_stats.k,
                          "removed_pct": round(
                              100 * (1 - seg_stats.k / seg_stats.s), 1)},
        "curation_summary": {"sec": cur_s, "n_kept": kept, "n_dup": dup,
                             "sources": len(cur_rows)},
    }))
    spark.stop()


if __name__ == "__main__":
    main()
