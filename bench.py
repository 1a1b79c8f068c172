"""Per-round bench: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is materialized through the noop sink (full execution, no
driver-side result transfer). A second section benches the engine's own
transcripts validation pipeline (turns/sec), which is the BASELINE.json
metric; the two-parallelism scaling proxy lives in bench_scaling.py and
writes BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from schema_inference_spark.driver_queries import CORE_QUERIES  # noqa: E402
from schema_inference_spark.driver_queries_anomaly import (  # noqa: E402
    ANOMALY_QUERIES,
)
from schema_inference_spark.driver_queries_conv import CONV_QUERIES  # noqa: E402
from schema_inference_spark.driver_queries_extras import EXTRA_QUERIES  # noqa: E402
from schema_inference_spark.driver_queries_mix import MIX_QUERIES  # noqa: E402
from schema_inference_spark.functions import get_spark  # noqa: E402

ALL_QUERIES = {**CORE_QUERIES, **EXTRA_QUERIES, **CONV_QUERIES,
               **ANOMALY_QUERIES, **MIX_QUERIES}

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def materialize(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def bench_queries(spark, probe=None) -> tuple:
    """probe: optional zero-arg GB/s sampler, fired every 10 queries.
    The host's co-tenant bursts are SHORTER than the suite (a 0.63 GB/s
    burst once hit mid-suite, invisible to the pre/post probes, and
    inflated an alphabetical stretch 8-22x) — mid-suite samples let a
    reader attribute per-query outliers to the window they ran in."""
    out = {}
    mid = []
    probe_sec = 0.0
    for i, (name, fn) in enumerate(sorted(ALL_QUERIES.items())):
        if probe is not None and i % 10 == 0:
            p0 = time.monotonic()
            mid.append({"at": name, "gbps": probe()})
            probe_sec += time.monotonic() - p0
        t0 = time.monotonic()
        materialize(fn(spark, SF_DIR))
        out[name] = round(time.monotonic() - t0, 3)
    return out, mid, probe_sec


def bench_validation(spark) -> dict:
    """Engine metric: validated turns/sec over a deterministic synthetic
    transcripts snapshot (stats + all constraint checks)."""
    import tempfile

    from schema_inference_spark.pipeline import validate
    from schema_inference_spark.sources.catalog import SnapshotCatalog
    from schema_inference_spark.sources.transcripts import (
        generate_turns,
        write_snapshot,
    )

    root = tempfile.mkdtemp(prefix="bench_transcripts_")
    table = generate_turns(n_conv=3000, seed=42)
    write_snapshot(root, "bench", table, n_buckets=32)
    cat = SnapshotCatalog(root)

    path = {}

    def one_run() -> float:
        t0 = time.monotonic()
        res = validate(spark, cat, "bench", resume=False, write_audit=False)
        res.violations.count()  # force
        res.violations.unpersist(blocking=True)
        path["check_path"] = res.check_path
        return time.monotonic() - t0

    # steady state is the headline (same protocol as bench_scaling.py: a
    # cluster executor compiles each codegen shape once per lifetime,
    # then runs hours of input through it; the first execution of the
    # validate plan shapes pays janino+C2 for all of them). The cold
    # first run is reported alongside.
    cold = one_run()
    spark.catalog.clearCache()
    wall = one_run()
    n_turns = int(table.num_rows)
    return {"turns": n_turns, "sec": round(wall, 3),
            "sec_cold": round(cold, 3),
            "turns_per_sec": round(n_turns / wall, 1),
            # protocol flag (ADVICE r3): `sec` is the warm second run
            # (steady state — a cluster executor compiles each codegen
            # shape once per lifetime), `sec_cold` the first run. The
            # check path is auto-selected by validate(): at this corpus
            # size (72k turns, below clustered.minRows) that is the
            # fused shuffle path; the clustered native path's fixed
            # cost only amortizes above ~2M rows (see pipeline.py).
            "protocol": "steady-state",
            "check_path": path.get("check_path")}


def bandwidth_gbps() -> float:
    """Single-threaded memcpy probe (same as BENCH/gated_bench.py): this
    host's co-tenant degradation is bandwidth-level and invisible to
    steal%, so the suite JSON self-reports its window (healthy >= 8
    GB/s; degraded windows measured down to 0.3) — a reader comparing
    rounds can attribute a slow suite to the window instead of
    guessing."""
    import numpy as np
    a = np.zeros(256 * 1024 * 1024 // 8)
    best = 0.0
    for _ in range(3):
        t0 = time.monotonic()
        b = a.copy()
        dt = time.monotonic() - t0
        best = max(best, 2 * a.nbytes / dt / 1e9)
        del b
    return round(best, 1)


def main() -> None:
    bw_pre = bandwidth_gbps()
    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")
    # warm the JVM once so timings measure the plans, not one-time janino
    # compilation: a cluster executor compiles each codegen shape once
    # per lifetime, but a fresh local JVM would bill it all to whichever
    # query runs first (alphabetically ann_ivf_topk — which is why it
    # looked 2x slower in round 2). Touch each distinct machinery path:
    # hash agg, window rank, broadcast join, and the Arrow/pandas_udf
    # Python-worker pool.
    materialize(CORE_QUERIES["stats_value"](spark, SF_DIR))
    import numpy as np
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from schema_inference_spark.operators.similarity import with_ivf_cell

    tiny = (spark.range(256).withColumn("k", F.col("id") % 8)
            .withColumn("embedding",
                        F.array(*[F.rand(seed=1) for _ in range(4)])))
    dim = spark.range(8).withColumnRenamed("id", "k")
    w = Window.partitionBy("k").orderBy("id")
    materialize(with_ivf_cell(tiny.join(F.broadcast(dim), "k")
                              .withColumn("r", F.row_number().over(w)),
                              np.eye(4)))

    # ingest-time setup, timed and reported SEPARATELY from the suite:
    # the MinHash index is a persistent artifact that exists before any
    # ingest runs against it (the operator's contract), so the
    # near_dup_incremental query time below measures the O(new) probe —
    # the index build cost is not hidden, it is this number.
    from schema_inference_spark.driver_queries_conv import (
        conv_minhash_index_exported,
    )
    from schema_inference_spark.driver_queries_extras import (
        ann_ivf_exported,
        ann_lsh_exported,
        minhash_index_exported,
        simhash_fp_exported,
    )

    t0 = time.monotonic()
    for part in minhash_index_exported(spark, SF_DIR):
        materialize(part)
    setup = {"minhash_index_sec": round(time.monotonic() - t0, 3)}
    t0 = time.monotonic()
    for part in conv_minhash_index_exported(spark, SF_DIR):
        materialize(part)
    setup["conv_minhash_index_sec"] = round(time.monotonic() - t0, 3)
    t0 = time.monotonic()
    materialize(ann_lsh_exported(spark, SF_DIR))
    for part in ann_ivf_exported(spark, SF_DIR):
        materialize(part)
    setup["ann_blocks_sec"] = round(time.monotonic() - t0, 3)
    # fingerprint GENERATION stays measured in-suite (dedup_simhash,
    # winnow_fingerprints); this is the stored-artifact build their
    # pair-probing consumers read
    t0 = time.monotonic()
    materialize(simhash_fp_exported(spark, SF_DIR))
    setup["simhash_fp_sec"] = round(time.monotonic() - t0, 3)

    t0 = time.monotonic()
    queries, bw_mid, probe_sec = bench_queries(spark, probe=bandwidth_gbps)
    # suite_sec excludes the in-suite probe cost (comparable to the
    # pre-mid-probe rounds' numbers)
    total = round(time.monotonic() - t0 - probe_sec, 3)
    val = bench_validation(spark)
    spark.stop()

    print(json.dumps({
        "metric": "suite_sec",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "setup": setup,
        "sf": SF_DIR,
        "validation": val,
        # window context (see bandwidth_gbps): healthy >= 8 GB/s
        "bw_gbps_pre": bw_pre,
        "bw_gbps_post": bandwidth_gbps(),
        # every-10-queries samples: bursts shorter than the suite land
        # here even when pre/post look healthy
        "bw_gbps_mid": bw_mid,
    }))


if __name__ == "__main__":
    main()
