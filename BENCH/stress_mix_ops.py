"""Scale stress probe for the corpus-assembly family (same protocol as
stress_conv_ops.py): synthesize a deterministic 50M-row event log and a
5M-doc corpus IN-PLAN (spark.range — no materialization, the generator
is part of the scan), run funnel / cohort_retention / split_assign /
split_balance / mixture_plan at local[32], and report wall + throughput.
The point is shape, not the absolute number: nothing here may go
super-linear or hit a single-task window/collect.

Usage: python BENCH/stress_mix_ops.py [N_EVENTS] [N_DOCS]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from schema_inference_spark.functions import get_spark  # noqa: E402

N_EVENTS = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000_000
N_DOCS = int(sys.argv[2]) if len(sys.argv) > 2 else 5_000_000


def synth_events(spark, n):
    """2M users, 30-day span, 5 event types — id-derived, deterministic."""
    return (spark.range(n)
            .select((F.col("id") % 2_000_000).alias("user_id"),
                    F.timestamp_seconds(
                        F.lit(1704067200)
                        + (F.col("id") * 37) % (30 * 86400)).alias("ts"),
                    F.element_at(
                        F.array(F.lit("view"), F.lit("click"),
                                F.lit("purchase"), F.lit("signup"),
                                F.lit("error")),
                        ((F.col("id") % 5) + 1).cast("int"))
                    .alias("event_type")))


def synth_docs(spark, n):
    return (spark.range(n)
            .select(F.col("id").alias("doc_id"),
                    F.concat(F.lit("document body number "),
                             F.col("id").cast("string"),
                             F.lit(" with a few more words here"))
                    .alias("text"),
                    F.concat(F.lit("src"), (F.col("id") % 20)
                             .cast("string")).alias("source")))


def timed(name, df, rows_in):
    t0 = time.monotonic()
    n = df.count() if name.endswith("_count") else None
    if n is None:
        df.write.mode("overwrite").format("noop").save()
    dt = time.monotonic() - t0
    print(f"{name}: {dt:.1f}s  ({rows_in/dt/1e6:.1f}M rows/s in)"
          + (f"  out={n}" if n is not None else ""), flush=True)
    return dt


def main():
    spark = get_spark(app_name="stress_mix", master="local[32]",
                      shuffle_partitions=64)
    ev = synth_events(spark, N_EVENTS)
    docs = synth_docs(spark, N_DOCS)

    from schema_inference_spark.operators.curation import (
        mixture_plan,
        split_assign,
        split_balance,
    )
    from schema_inference_spark.operators.sessions import (
        cohort_retention,
        funnel,
    )

    timed("funnel", funnel(ev, ["view", "click", "purchase"]), N_EVENTS)
    timed("funnel_windowed",
          funnel(ev, ["view", "click", "purchase"], within_seconds=21600),
          N_EVENTS)
    timed("cohort_retention", cohort_retention(ev, max_offset=30),
          N_EVENTS)
    timed("split_assign", split_assign(docs), N_DOCS)
    timed("split_balance", split_balance(docs), N_DOCS)
    weights = (docs.select("source").distinct()
               .withColumn("weight_bp", F.lit(500).cast("bigint")))
    timed("mixture_plan", mixture_plan(docs, weights, 10**9), N_DOCS)
    spark.stop()


if __name__ == "__main__":
    main()
