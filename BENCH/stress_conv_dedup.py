"""Transcript-scale stress probe for the fifth-continuation family
(conv_sigs / conv_dup_groups / conv_dup_against_index /
turn_text_diff) over the 19.1M-turn scaling corpus on tmpfs
(bench_scaling --gen layout: bucket=*/ snapshot dirs).

Shapes exercised at corpus scale:
- conv_dup_groups: ordered fold -> one md5 per conversation -> tiny
  group-by-signature shuffle (whatever natural dup groups the
  deterministic generator produced).
- incremental ingest: history = conversations with even xxhash64,
  batch = odd; the index BUILD is timed separately from the probe so
  the per-ingest cost the operator sells is what the probe measures.
- turn_text_diff: the right replica drops every 997th turn and
  corrupts every 499th (by xxhash64 of the key, derived in-plan), so
  the digest-only full-outer join runs over 2 x 19.1M turns with a
  ~58k-row violation output.

Usage: python BENCH/stress_conv_dedup.py [CORPUS_DIR]
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
    spark = get_spark(app_name="stress-conv-dedup", master="local[32]",
                      shuffle_partitions=64)
    turns = (spark.read.option("basePath", CORPUS)
             .parquet(os.path.join(CORPUS, "bucket=*")))
    n = turns.count()
    out = {"turns": n, "ops": {}}

    from schema_inference_spark.operators.checks import turn_text_diff
    from schema_inference_spark.operators.conversations import (
        build_conv_sig_index,
        conv_dup_against_index,
        conv_dup_groups,
        conv_sigs,
    )

    def probe(name, df):
        t0 = time.monotonic()
        rows = df.count()
        out["ops"][name] = {"sec": round(time.monotonic() - t0, 2),
                            "rows": rows}

    args = dict(key_col="conv_id", ts_col="ts", text_col="text",
                tiebreak_col="turn_idx")

    probe("conv_dup_groups", conv_dup_groups(turns, **args))

    h = F.abs(F.xxhash64("conv_id"))
    hist = turns.filter(h % 2 == 0)
    batch = turns.filter(h % 2 == 1)
    t0 = time.monotonic()
    index = build_conv_sig_index(conv_sigs(hist, **args)) \
        .localCheckpoint(eager=True)
    out["ops"]["conv_index_build"] = {
        "sec": round(time.monotonic() - t0, 2), "rows": index.count()}
    probe("conv_dup_ingest_probe",
          conv_dup_against_index(conv_sigs(batch, **args), index))

    key_h = F.abs(F.xxhash64("conv_id", "turn_idx"))
    left = turns.select("conv_id", "turn_idx", "text")
    right = (turns.filter(key_h % 997 != 0)
             .select("conv_id", "turn_idx",
                     F.when(key_h % 499 == 0,
                            F.concat("text", F.lit(" [corrupted]")))
                      .otherwise(F.col("text")).alias("text")))
    probe("turn_text_diff",
          turn_text_diff(left, right, keys=["conv_id", "turn_idx"]))

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
