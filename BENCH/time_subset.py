"""Time a subset of declared queries through the noop sink (guide §1.4)
against any SF dir, from any repo tree — the round-6 before/after
measurement harness. Prints one JSON line per query plus a bandwidth
probe before and after (this host has co-tenant bandwidth-degradation
windows; a run at < 6 GB/s is not comparable to one at 8).

Usage:
    python BENCH/time_subset.py REPO_ROOT SF_DIR name1 name2 ...

REPO_ROOT lets the same harness time the round-start worktree
(/tmp/r6start) and HEAD against the identical data.
"""
import json
import os
import sys
import time

REPO = sys.argv[1]
SF = sys.argv[2]
NAMES = sys.argv[3:]
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402


def bandwidth_gbps() -> float:
    a = np.zeros(256 * 1024 * 1024 // 8)
    best = 0.0
    for _ in range(3):
        t0 = time.monotonic()
        b = a.copy()
        dt = time.monotonic() - t0
        best = max(best, 2 * a.nbytes / dt / 1e9)
        del b
    return round(best, 1)


def main():
    import __spark_entry__ as e
    from schema_inference_spark.functions import get_spark

    qs = e.queries()
    spark = get_spark(app_name="time_subset")
    spark.sparkContext.setLogLevel("ERROR")

    def noop(df):
        df.write.mode("overwrite").format("noop").save()

    # same warmup as bench.py: one cheap query to absorb janino/codegen,
    # plus the Arrow/Python worker pool (bench.py warms it via the IVF
    # pandas path; a query timed here right after session start would
    # otherwise bill 32 worker forks + numpy imports to itself)
    noop(qs["stats_value"](spark, SF))
    from pyspark.sql import functions as F
    from pyspark.sql import types as _T

    def _wm(batches):
        import numpy as _np  # noqa: F401
        for b in batches:
            yield b

    noop(spark.range(1000).select(F.col("id"))
         .mapInArrow(_wm, _T.StructType([_T.StructField("id", _T.LongType())])))

    if os.environ.get("TS_SETUP") == "1":
        # build the ingest-time seams the incremental/probing queries
        # consume (same builders bench.py runs pre-suite, timed apart)
        from schema_inference_spark.driver_queries_conv import (
            conv_minhash_index_exported,
        )
        from schema_inference_spark.driver_queries_extras import (
            ann_ivf_exported,
            ann_lsh_exported,
            minhash_index_exported,
            simhash_fp_exported,
        )
        setup = {}
        t0 = time.monotonic()
        for part in minhash_index_exported(spark, SF):
            noop(part)
        setup["minhash_index_sec"] = round(time.monotonic() - t0, 3)
        t0 = time.monotonic()
        for part in conv_minhash_index_exported(spark, SF):
            noop(part)
        setup["conv_minhash_index_sec"] = round(time.monotonic() - t0, 3)
        t0 = time.monotonic()
        noop(ann_lsh_exported(spark, SF))
        for part in ann_ivf_exported(spark, SF):
            noop(part)
        setup["ann_blocks_sec"] = round(time.monotonic() - t0, 3)
        t0 = time.monotonic()
        noop(simhash_fp_exported(spark, SF))
        setup["simhash_fp_sec"] = round(time.monotonic() - t0, 3)
        print(json.dumps({"setup": setup}), flush=True)

    print(json.dumps({"bw_pre": bandwidth_gbps()}), flush=True)
    out = {}
    for name in NAMES:
        spark.sparkContext.setJobDescription(name)
        t0 = time.monotonic()
        noop(qs[name](spark, SF))
        sec = round(time.monotonic() - t0, 3)
        out[name] = sec
        print(json.dumps({"query": name, "sec": sec}), flush=True)
    print(json.dumps({"bw_post": bandwidth_gbps(), "total":
                      round(sum(out.values()), 3)}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
