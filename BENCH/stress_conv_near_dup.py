"""Transcript-scale stress probe for the conversation NEAR-dup family
over the 19.1M-turn scaling corpus on tmpfs (bench_scaling --gen
layout: bucket=*/ snapshot dirs).

The corpus has ZERO natural conversation-level dups (verified: the
capped conv_sigs fold yields 800k distinct signatures), so detection
rows here come from PLANTED re-rollouts derived in-plan — a ~1/64
sample of conversations re-keyed under a "p"-prefixed conv_id with a
divergent extra turn (the check path) or an appended divergent tail
(the incremental path). Expected counts ride in the output, so each
probe evidences RECALL at corpus scale, not just plan shape.

Shapes exercised:
- checks.check_conv_near_dup: the pipeline's scheduled full-corpus
  near-dedup pass — the ONE engine fold that must carry raw text on
  its exchange (shingling is content-dependent), then the capped LSH
  band machinery + exact-Jaccard verify, under the default max_turns
  whale guard (this corpus plants a 1.9M-turn / 360 MB conversation
  that is unsplittable multi-GB single-row work without it).
- incremental ingest: the MinHash (index, sigs) artifact pair is
  BUILT from the even-xxhash half (timed separately — it is the
  persisted artifact) and the probe measures the O(new) candidate +
  verify path only (near_dup_candidates -> near_dup_verify) over the
  planted batch, i.e. the cost an ingest actually pays.

Usage: python BENCH/stress_conv_near_dup.py [CORPUS_DIR]
Prints one JSON line with per-operator wall seconds + output rows +
planted/detected counts.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from schema_inference_spark.functions import get_spark  # noqa: E402

CORPUS = sys.argv[1] if len(sys.argv) > 1 else "/dev/shm/scaling_r5g/scale"
SAMPLE_MOD = 64  # ~1/64 of 800k conversations planted (~12.5k)


def main():
    # 512 shuffle partitions, NOT the suite's 64: the assembled fold and
    # the shingle explode carry raw transcript text, and a 19.1M-turn
    # corpus at 64 partitions puts ~1 GB of buffered aggregation state
    # per partition x 32 concurrent tasks on one heap (measured OOM).
    # Sizing the text-carrying exchanges so partitions fit executor
    # memory is the standing 100-TB guidance (SURVEY §2.D18); AQE
    # coalesces the small post-fold stages back down.
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

    def probe(name, df, **extra):
        t0 = time.monotonic()
        rows = df.count()
        out["ops"][name] = {"sec": round(time.monotonic() - t0, 2),
                            "rows": rows, **extra}

    # 1. the scheduled full-corpus pass (pipeline check form), with a
    # planted re-rollout per sampled conversation: same turns under a
    # "p"-prefixed conv_id plus one divergent extra turn inside the
    # whale-guard cap. 'p' > 'c' so the planted member is the later id
    # and REPORTS, matched to its original.
    sample = turns.filter(F.abs(F.xxhash64("conv_id")) % SAMPLE_MOD == 0)
    n_planted = sample.select("conv_id").distinct().count()
    extra_turn = (sample.groupBy("conv_id", "bucket")
                  .agg(F.max("ts").alias("ts"))
                  .select(F.concat(F.lit("p"), "conv_id").alias("conv_id"),
                          F.lit(1000).cast("int").alias("turn_idx"),
                          F.lit("user").alias("role"),
                          F.lit("planted divergent rerollout tail marker "
                                "words").alias("text"),
                          F.lit(None).cast("string").alias("tool"),
                          (F.col("ts") + F.expr("INTERVAL 1 HOUR"))
                          .alias("ts"), F.col("bucket")))
    planted = (sample
               .withColumn("conv_id", F.concat(F.lit("p"), "conv_id"))
               .unionByName(extra_turn.select(*sample.columns)))
    corpus = turns.unionByName(planted)
    probe("check_conv_near_dup",
          check_conv_near_dup(corpus, "stress", partition_col="bucket"),
          planted=n_planted)
    spark.catalog.clearCache()  # the check persists its assembled fold

    # 2. incremental: artifact build (once) vs per-ingest probe (hot
    # path). Same whale guard as the check — the SHARED constant, so
    # the bench's recall numbers stay tied to the check's default.
    from schema_inference_spark.operators.checks import (
        CONV_NEAR_DUP_MAX_TURNS,
    )
    assembled = (assemble_conversations(
        turns.filter(F.col("turn_idx") < CONV_NEAR_DUP_MAX_TURNS),
        key_col="conv_id", ts_col="ts", seq_col="text",
        tiebreak_col="turn_idx", sep=" ")
        .select(F.col("conv_id").alias("doc_id"),
                F.col("seq").alias("text")))
    h = F.abs(F.xxhash64("doc_id"))
    hist = assembled.filter(h % 2 == 0)
    t0 = time.monotonic()
    index = D.build_minhash_index(hist).localCheckpoint(eager=True)
    sigs = D.build_minhash_sigs(hist).localCheckpoint(eager=True)
    out["ops"]["conv_mh_index_build"] = {
        "sec": round(time.monotonic() - t0, 2),
        "rows": index.count() + sigs.count()}
    # planted ingest batch: indexed conversations re-keyed with a
    # divergent appended tail — every one should cross the index
    batch = (hist.filter(h % SAMPLE_MOD == 0)
             .select(F.concat(F.lit("p"), "doc_id").alias("doc_id"),
                     F.concat("text", F.lit(" planted divergent rerollout"
                                            " tail marker words"))
                     .alias("text")))
    n_batch = batch.count()
    probe("conv_near_dup_ingest_probe",
          D.near_dup_verify(D.near_dup_candidates(batch, index, sigs)),
          planted=n_batch)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
