"""Per-executor-bandwidth decomposition proof (VERDICT r2 item 2).

The north_rule's >=0.8 criterion is N -> 4N EXECUTORS on a cluster,
where each executor owns its memory controller. The sandbox proxy
(local[2] vs local[8] threads in ONE process) shares one controller, so
the measured efficiency conflates (a) engine/plan scaling with (b) the
host's memory-bandwidth ceiling. This experiment separates them:

  - K INDEPENDENT single-core Spark processes (separate JVMs, disjoint
    8-bucket corpus slices, zero coordination — the closest single-host
    proxy for K one-core executors) run concurrently at K=2 and K=8.
    Each process's workload is IDENTICAL across K, so with per-process
    resources the walls would match and "efficiency" would be 1.0.
  - A pure-ALU control (numpy integer loop, no memory traffic) at the
    same K values separates CPU capacity from bandwidth.

If the independent-process efficiency at K=8 degrades like the
local[2]->local[8] thread pair does, the residual below 1.0 is the
HOST's shared bandwidth — engine coordination cannot be the cause,
because there is none. Output: one JSON line + a table appended to
BENCH/ISOLATION.md.

Usage: python BENCH/isolation_proof.py /dev/shm/scale19m
"""
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import sys, time, os
sys.path.insert(0, {repo!r})
from schema_inference_spark.functions import get_spark
from schema_inference_spark.pipeline import validate
from schema_inference_spark.sources.catalog import SnapshotCatalog
os.environ["SPARK_LOCAL_DIRS"] = "/dev/shm/spark-iso-{idx}"
os.makedirs(os.environ["SPARK_LOCAL_DIRS"], exist_ok=True)
spark = get_spark(app_name="iso-{idx}", master="local[1]",
                  shuffle_partitions=2)
spark.sparkContext.setLogLevel("ERROR")
cat = SnapshotCatalog({root!r})
parts = {parts!r}
spark.range(1000).selectExpr("sum(id)").collect()
warm = validate(spark, cat, "scale", resume=False, write_audit=False,
                partitions=parts)
warm.violations.collect()
warm.violations.unpersist(blocking=True)
spark.catalog.clearCache()
t0 = time.monotonic()
r = validate(spark, cat, "scale", resume=False, write_audit=False,
             partitions=parts)
n = r.violations.count()
print("WALL", time.monotonic() - t0, n, flush=True)
spark.stop()
"""

ALU = r"""
import time
import numpy as np
x = np.uint64(88172645463325252)
t0 = time.monotonic()
acc = np.uint64(0)
for _ in range(40_000_000):
    x ^= (x << np.uint64(13)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    x ^= x >> np.uint64(7)
    acc += x & np.uint64(0xFF)
print("WALL", time.monotonic() - t0, int(acc) % 97, flush=True)
"""


def run_batch(scripts):
    procs = [subprocess.Popen([sys.executable, "-c", s], cwd=REPO,
                              stdout=subprocess.PIPE,
                              stderr=subprocess.DEVNULL, text=True)
             for s in scripts]
    walls = []
    for p in procs:
        out, _ = p.communicate()
        for line in out.splitlines():
            if line.startswith("WALL"):
                walls.append(float(line.split()[1]))
    return walls


def main():
    root = sys.argv[1]
    slices = [list(range(8 * i, 8 * i + 8)) for i in range(8)]
    res = {}
    for k in (2, 8):
        scripts = [WORKER.format(repo=REPO, root=root, parts=slices[i],
                                 idx=i) for i in range(k)]
        walls = run_batch(scripts)
        res[f"validate_k{k}"] = walls
    for k in (2, 8):
        walls = run_batch([ALU] * k)
        res[f"alu_k{k}"] = walls

    def mean(xs):
        return sum(xs) / max(len(xs), 1)

    v2, v8 = mean(res["validate_k2"]), mean(res["validate_k8"])
    a2, a8 = mean(res["alu_k2"]), mean(res["alu_k8"])
    summary = {
        "metric": "isolation_proof",
        "validate_wall_k2": round(v2, 2), "validate_wall_k8": round(v8, 2),
        # per-process walls would be equal with per-executor resources;
        # the ratio IS the shared-host penalty with zero engine
        # coordination in the loop
        "validate_process_efficiency": round(v2 / v8, 3),
        "alu_wall_k2": round(a2, 2), "alu_wall_k8": round(a8, 2),
        "alu_process_efficiency": round(a2 / a8, 3),
        "walls": {k: [round(w, 2) for w in v] for k, v in res.items()},
    }
    print(json.dumps(summary))
    lines = [
        "",
        f"## Isolation run ({time.strftime('%Y-%m-%d %H:%M')})",
        "",
        "| workload | K=2 mean wall (s) | K=8 mean wall (s) | "
        "process efficiency (K2/K8 walls) |",
        "|---|---|---|---|",
        f"| validate, 1 core x disjoint 8-bucket slice | {v2:.2f} | "
        f"{v8:.2f} | {v2 / v8:.3f} |",
        f"| ALU control (no memory traffic) | {a2:.2f} | {a8:.2f} | "
        f"{a2 / a8:.3f} |",
        "",
        "Identical per-process workloads; no Spark coordination between "
        "processes. A validate ratio below the ALU ratio is host "
        "memory-bandwidth contention, not engine scaling.",
    ]
    with open(os.path.join(REPO, "BENCH", "ISOLATION.md"), "a") as f:
        f.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
