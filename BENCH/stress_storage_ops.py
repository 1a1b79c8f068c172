"""Transcript-scale stress probe for the third-continuation operators
(fk_orphans_bloom, reconcile_checksum, suggest_constraints) over the
19.1M-turn scaling corpus (/dev/shm/scal_r5d — regenerate with
`python bench_scaling.py --gen /dev/shm/scal_r5d` at
SPARK_GRAFT_SCALING_CONVS=800000). Shapes, not ceilings: run inside
whatever window the host offers and read the numbers against the
probe log.

Usage: python BENCH/stress_storage_ops.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from schema_inference_spark.functions import get_spark  # noqa: E402

ROOT = os.environ.get("SPARK_GRAFT_SCALE_DIR", "/dev/shm/scal_r5d/scale")


def main():
    spark = get_spark(app_name="stress_storage", master="local[32]")
    turns = spark.read.parquet(ROOT)
    n = turns.count()
    out = {"turns": n}

    # 1. bloom-hybrid FK: 19.1M fact rows against a ~740k-key dim with
    #    every 13th conv dropped (the lagging-dim audit regime)
    from schema_inference_spark.operators.checks import (
        fk_orphans,
        fk_orphans_bloom,
    )
    dim = (turns.select("conv_id").distinct()
           .filter(F.abs(F.xxhash64("conv_id")) % 13 != 0))
    dim.write.mode("overwrite").parquet("/dev/shm/stress_dim.parquet")
    dim = spark.read.parquet("/dev/shm/stress_dim.parquet")
    t0 = time.monotonic()
    n_bloom = fk_orphans_bloom(turns, dim, "conv_id", "conv_id",
                               num_bits=1 << 24).count()
    out["fk_orphans_bloom_sec"] = round(time.monotonic() - t0, 2)
    t0 = time.monotonic()
    n_exact = fk_orphans(turns, dim, "conv_id", "conv_id").count()
    out["fk_orphans_shuffle_sec"] = round(time.monotonic() - t0, 2)
    assert n_bloom == n_exact, (n_bloom, n_exact)
    out["orphan_keys"] = n_exact

    # 2. aggregate reconciliation: full-payload md5 both sides, planted
    #    1-in-199 loss — the rewrite-audit shape (nothing row-sized
    #    shuffles; cost is the two hashing scans)
    from schema_inference_spark.operators.anomaly import reconcile_checksum
    right = turns.filter(
        F.abs(F.xxhash64("conv_id", "turn_idx")) % 199 != 0)
    t0 = time.monotonic()
    bad = reconcile_checksum(
        turns, right, ["conv_id", "turn_idx", "role", "tool", "text"]
    ).count()
    out["reconcile_sec"] = round(time.monotonic() - t0, 2)
    out["reconcile_bad_buckets"] = bad

    # 3. constraint inference: exact multi-distinct profile over 19.1M
    #    rows x 4 columns (the Expand + two-phase aggregate under load)
    from schema_inference_spark.operators.constraints import (
        suggest_constraints,
    )
    t0 = time.monotonic()
    sugg = suggest_constraints(
        turns, cols=["conv_id", "turn_idx", "role", "tool"]).collect()
    out["suggest_sec"] = round(time.monotonic() - t0, 2)
    out["suggestions"] = len(sugg)

    for k in ("fk_orphans_bloom", "fk_orphans_shuffle", "reconcile",
              "suggest"):
        out[f"{k}_tps"] = round(n / out[f"{k}_sec"])
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
