"""One-off: clustered vs fused check path at scale, same corpus, same JVM
protocol (fresh JVM per run, warm run discarded, tmpfs). Usage:

    python BENCH/compare_paths.py --gen ROOT
    python BENCH/compare_paths.py --run ROOT {clustered|fused} CPUS OUT
"""
import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def gen(root):
    from schema_inference_spark.sources.transcripts import (generate_turns,
                                                            write_snapshot)
    n_conv = int(os.environ.get("SPARK_GRAFT_SCALING_CONVS", "400000"))
    t = generate_turns(n_conv=n_conv, seed=42)
    write_snapshot(root, "scale", t, n_buckets=64)
    print(f"generated {t.num_rows}")


def run(root, path, cpus, out):
    local = os.path.join("/dev/shm", f"spark-local-cmp-{path}-{cpus}")
    os.makedirs(local, exist_ok=True)
    os.environ["SPARK_LOCAL_DIRS"] = local
    from schema_inference_spark.functions import get_spark
    from schema_inference_spark.pipeline import validate
    from schema_inference_spark.sources.catalog import SnapshotCatalog
    spark = get_spark(app_name=f"cmp-{path}-{cpus}", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus) * 2)
    spark.sparkContext.setLogLevel("ERROR")
    cat = SnapshotCatalog(root)
    kw = {"clustered_checks": path == "clustered"}
    warm = validate(spark, cat, "scale", resume=False, write_audit=False, **kw)
    warm.violations.collect()
    warm.violations.unpersist(blocking=True)
    spark.catalog.clearCache()
    t0 = time.monotonic()
    res = validate(spark, cat, "scale", resume=False, write_audit=False, **kw)
    rows = [tuple(str(v) for v in r) for r in res.violations.collect()]
    wall = time.monotonic() - t0
    digest = hashlib.sha256(
        "\n".join(",".join(r) for r in rows).encode()).hexdigest()
    n = sum(p["n_rows"] for p in cat.manifest("scale")["partitions"])
    spark.stop()
    rec = {"path": path, "cpus": int(cpus), "wall_s": round(wall, 2),
           "turns_per_sec": round(n / wall, 1), "n_violations": len(rows),
           "sha256": digest}
    with open(out, "w") as f:
        json.dump(rec, f)
    print(json.dumps(rec))


if __name__ == "__main__":
    if sys.argv[1] == "--gen":
        os.makedirs(sys.argv[2], exist_ok=True)
        gen(sys.argv[2])
    else:
        run(sys.argv[2], sys.argv[3], sys.argv[4], sys.argv[5])
