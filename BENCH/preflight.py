"""Local mirror of the driver's correctness gate: runs every
__spark_entry__.queries() entry at sf0.01 on local[32] and compares
rows/schema/values against its oracle_sql() twin in DuckDB (column-name
-sorted, float-rounded — the same normalization the driver hashes).
Rows-only entries (no oracle) are executed and counted. Usage:

    python BENCH/preflight.py [SF_DIR]

Exit line: `TOTAL ok=.. bad=.. fails=[..]`.
"""
import sys, math, time
sys.path.insert(0, '/root/repo')
from pyspark.sql import SparkSession
import duckdb
import __spark_entry__ as e

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.ui.enabled", "false").getOrCreate())

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
for name in sorted(qs):
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
        print(f"{name}: {'PASS' if good else 'FAIL'} {len(srows)} rows "
              f"({time.monotonic()-t0:.1f}s)", flush=True)
        ok += good; bad += not good
        if not good: fails.append(name)
    except Exception as ex:
        print(f"{name}: ERR {ex}", flush=True)
        bad += 1; fails.append(name)
print(f"TOTAL ok={ok} bad={bad} fails={fails}", flush=True)
spark.stop()
