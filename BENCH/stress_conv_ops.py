"""Transcript-scale stress probe for the continuation operators
(repeated_runs / context_overflow / json_key_census /
json_schema_drift) over the 19.1M-turn scaling corpus already on
tmpfs (bench_scaling --gen layout: bucket=*/ snapshot dirs).

The JSON operators get a synthesized payload column
(to_json(struct(turn_idx, role, tool))) — real JSON strings at corpus
scale; the census/drift read path (from_json + explode + key-vocab
groupBy) is exactly what production measures, only the bytes differ.

Usage: python BENCH/stress_conv_ops.py [CORPUS_DIR]
Prints one JSON line with per-operator wall seconds + output rows.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from schema_inference_spark.functions import get_spark  # noqa: E402

CORPUS = sys.argv[1] if len(sys.argv) > 1 else "/dev/shm/scale_r05/scale"


def main():
    spark = get_spark(app_name="stress-conv-ops", master="local[32]",
                      shuffle_partitions=64)
    turns = (spark.read.option("basePath", CORPUS)
             .parquet(os.path.join(CORPUS, "bucket=*")))
    n = turns.count()
    out = {"turns": n, "ops": {}}

    from schema_inference_spark.operators.conversations import (
        context_overflow,
        repeated_runs,
    )
    from schema_inference_spark.operators.semistructured import (
        json_key_census,
        json_schema_drift,
    )

    def probe(name, df):
        t0 = time.monotonic()
        rows = df.count()
        out["ops"][name] = {"sec": round(time.monotonic() - t0, 2),
                            "rows": rows}

    probe("repeated_runs", repeated_runs(
        turns, "conv_id", "ts", "role", "turn_idx", min_run=3))
    probe("context_overflow", context_overflow(
        turns, "conv_id", "ts", "turn_idx",
        cost=F.coalesce(F.length("text"), F.lit(0)), budget=4000))
    payload = turns.select(
        F.to_json(F.struct("turn_idx", "role", "tool")).alias("props"),
        "ts")
    probe("json_key_census", json_key_census(payload, "props"))
    probe("json_schema_drift", json_schema_drift(payload, "props", "ts"))

    # range join at full scale: per-conversation [first, last] turn
    # windows (one interval per conversation) probed by EVERY turn —
    # 19M probes x 400k intervals, each probe contained by exactly its
    # own conversation's window, so output rows == input turns is also
    # a correctness check of the binned encoding
    from schema_inference_spark.operators.temporal import interval_join
    spans = (turns.groupBy("conv_id")
             .agg(F.min("ts").alias("s_ts"), F.max("ts").alias("e_ts")))
    probes = turns.select("conv_id", "turn_idx", "ts")
    t0 = time.monotonic()
    rows = interval_join(probes, spans, on=["conv_id"], probe_ts="ts",
                         start_ts="s_ts", end_ts="e_ts",
                         value_cols=[], bin_seconds=3600).count()
    out["ops"]["interval_join"] = {
        "sec": round(time.monotonic() - t0, 2), "rows": rows,
        "contained_all": rows == n}

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
