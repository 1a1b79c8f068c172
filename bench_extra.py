"""Per-query isolation bench (guide §1.4): times named queries through
the noop sink at $SPARK_GRAFT_SF_DIR, optionally dumping
.explain("formatted") to plans/r06/<name>_<tag>.txt.

Usage:
  python bench_extra.py q1 q2 ...            # time listed queries
  python bench_extra.py --plans TAG q1 ...   # also dump plans
  python bench_extra.py --setup              # time the seam builders
  python bench_extra.py --repeat N ...       # N timed runs per query

Does NOT replace bench.py (frozen measurement contract); numbers here are
cited in OPTIMIZATION_r06.md.
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


def main() -> None:
    args = sys.argv[1:]
    plans_tag = None
    repeat = 1
    do_setup = False
    plans_only = False
    names = []
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--plans":
            plans_tag = args[i + 1]
            i += 2
        elif a == "--plans-only":
            plans_tag = args[i + 1]
            plans_only = True
            i += 2
        elif a == "--repeat":
            repeat = int(args[i + 1])
            i += 2
        elif a == "--setup":
            do_setup = True
            i += 1
        else:
            names.append(a)
            i += 1

    spark = get_spark(app_name="bench_extra")
    spark.sparkContext.setLogLevel("ERROR")
    # one tiny warmup so the first timed query does not pay JVM init
    materialize(CORE_QUERIES["stats_value"](spark, SF_DIR))

    out = {"sf": SF_DIR, "queries": {}}
    if do_setup:
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
        for part in minhash_index_exported(spark, SF_DIR):
            materialize(part)
        setup["minhash_index_sec"] = round(time.monotonic() - t0, 3)
        t0 = time.monotonic()
        for part in conv_minhash_index_exported(spark, SF_DIR):
            materialize(part)
        setup["conv_minhash_index_sec"] = round(time.monotonic() - t0, 3)
        t0 = time.monotonic()
        materialize(ann_lsh_exported(spark, SF_DIR))
        for part in ann_ivf_exported(spark, SF_DIR):
            materialize(part)
        setup["ann_blocks_sec"] = round(time.monotonic() - t0, 3)
        t0 = time.monotonic()
        materialize(simhash_fp_exported(spark, SF_DIR))
        setup["simhash_fp_sec"] = round(time.monotonic() - t0, 3)
        out["setup"] = setup

    for name in names:
        fn = ALL_QUERIES[name]
        spark.sparkContext.setJobDescription(f"bench_extra: {name}")
        samples = []
        if not plans_only:
            for _ in range(repeat):
                t0 = time.monotonic()
                materialize(fn(spark, SF_DIR))
                samples.append(round(time.monotonic() - t0, 3))
            out["queries"][name] = samples
        if plans_tag is not None:
            os.makedirs("plans/r06", exist_ok=True)
            plan = fn(spark, SF_DIR)._sc._jvm.PythonSQLUtils.explainString(
                fn(spark, SF_DIR)._jdf.queryExecution(), "formatted")
            with open(f"plans/r06/{name}_{plans_tag}.txt", "w") as fh:
                fh.write(plan)
        spark.sparkContext.setJobDescription(None)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
