"""Subset preflight: same gate as preflight.py but only for the query
names given on the command line. Usage:

    python BENCH/preflight_subset.py SF_DIR name1 name2 ...
"""
import math
import sys
import time

sys.path.insert(0, '/root/repo')
import duckdb
from pyspark.sql import SparkSession

import __spark_entry__ as e

SF = sys.argv[1]
NAMES = sys.argv[2:]
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")


def norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                v = "nan" if math.isnan(v) else round(v, 6)
            vals.append(str(v))
        out.append(tuple(vals))
    return sorted(out)


qs, oracles = e.queries(), e.oracle_sql()
ok = bad = 0
fails = []
for name in NAMES:
    t0 = time.monotonic()
    try:
        sdf = qs[name](spark, SF)
        srows = [tuple(r) for r in sdf.collect()]
        scols = sdf.columns
        if name not in oracles:
            print(f"{name}: rows-only {len(srows)} rows "
                  f"({time.monotonic()-t0:.1f}s)", flush=True)
            ok += 1
            continue
        con = duckdb.connect()
        for t in TABLES:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
        res = con.execute(oracles[name])
        dcols = [d[0] for d in res.description]
        drows = res.fetchall()
        con.close()
        good = (sorted(scols) == sorted(dcols) and len(srows) == len(drows)
                and norm(srows, scols) == norm(drows, dcols))
        print(f"{name}: {'OK' if good else 'MISMATCH'} {len(srows)} vs "
              f"{len(drows)} rows ({time.monotonic()-t0:.1f}s)", flush=True)
        if good:
            ok += 1
        else:
            bad += 1
            fails.append(name)
    except Exception as ex:  # noqa: BLE001
        bad += 1
        fails.append(name)
        print(f"{name}: ERROR {type(ex).__name__}: {ex}", flush=True)
print(f"TOTAL ok={ok} bad={bad} fails={fails}")
