"""Transcript-scale stress probe for the conversation NEAR-dup family
over the 19.1M-turn scaling corpus on tmpfs (bench_scaling --gen
layout: bucket=*/ snapshot dirs).

Shapes exercised at corpus scale:
- checks.check_conv_near_dup: the pipeline's scheduled full-corpus
  near-dedup pass — the ONE engine fold that must carry raw text on
  its exchange (shingling is content-dependent), then the capped LSH
  band machinery + exact-Jaccard verify. This is the pass the
  per-ingest and streaming forms exist to keep OFF the ingest path;
  the probe documents what the scheduled job costs when it does run.
- incremental ingest: history = conversations with even
  xxhash64(conv_id), batch = odd; the MinHash (index, sigs) artifact
  pair is BUILT from the history fold (timed separately, it is the
  persisted artifact) and the probe measures the O(new) candidate
  +verify path only (near_dup_candidates -> near_dup_verify), i.e.
  the cost an ingest actually pays.

Usage: python BENCH/stress_conv_near_dup.py [CORPUS_DIR]
Prints one JSON line with per-operator wall seconds + output rows.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from schema_inference_spark.functions import get_spark  # noqa: E402

CORPUS = sys.argv[1] if len(sys.argv) > 1 else "/dev/shm/scaling_r5g/scale"


def main():
    # 512 shuffle partitions, NOT the suite's 64: the assembled fold and
    # the shingle explode carry raw transcript text, and a 19.1M-turn
    # corpus at 64 partitions puts ~1 GB of buffered aggregation state
    # per partition x 32 concurrent tasks on one 32 GB heap (measured
    # OOM). Sizing the text-carrying exchanges so partitions fit
    # executor memory is the standing 100-TB guidance (SURVEY §2.D18);
    # AQE coalesces the small post-fold stages back down.
    spark = get_spark(app_name="stress-conv-near-dup", master="local[32]",
                      shuffle_partitions=512)
    turns = (spark.read.option("basePath", CORPUS)
             .parquet(os.path.join(CORPUS, "bucket=*")))
    n = turns.count()
    out = {"turns": n, "ops": {}}

    from schema_inference_spark.operators import dedup as D
    from schema_inference_spark.operators.checks import check_conv_near_dup
    from schema_inference_spark.operators.conversations import (
        assemble_conversations,
    )

    def probe(name, df):
        t0 = time.monotonic()
        rows = df.count()
        out["ops"][name] = {"sec": round(time.monotonic() - t0, 2),
                            "rows": rows}

    # 1. the scheduled full-corpus pass (pipeline check form)
    probe("check_conv_near_dup",
          check_conv_near_dup(turns, "stress", partition_col="bucket"))
    spark.catalog.clearCache()  # the check persists its shingled fold

    # 2. incremental: artifact build (once) vs per-ingest probe (hot path)
    assembled = (assemble_conversations(
        turns, key_col="conv_id", ts_col="ts", seq_col="text",
        tiebreak_col="turn_idx", sep=" ")
        .select(F.col("conv_id").alias("doc_id"),
                F.col("seq").alias("text")))
    h = F.abs(F.xxhash64("doc_id"))
    hist = assembled.filter(h % 2 == 0)
    batch = assembled.filter(h % 2 == 1)
    t0 = time.monotonic()
    index = D.build_minhash_index(hist).localCheckpoint(eager=True)
    sigs = D.build_minhash_sigs(hist).localCheckpoint(eager=True)
    out["ops"]["conv_mh_index_build"] = {
        "sec": round(time.monotonic() - t0, 2),
        "rows": index.count() + sigs.count()}
    probe("conv_near_dup_ingest_probe",
          D.near_dup_verify(D.near_dup_candidates(batch, index, sigs)))

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
