"""Dump .explain('formatted') for named declared queries to
plans/r06/<name>_<suffix>.txt. Usage:
    [DP_REPO=/path/to/tree] python BENCH/dump_plans.py SF_DIR SUFFIX name...

DP_REPO lets the same harness dump plans from another worktree (e.g.
the round-start tree) for before/after evidence; files always land in
/root/repo/plans/r06.
"""
import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.environ.get("DP_REPO", "/root/repo"))

SF = sys.argv[1]
SUFFIX = sys.argv[2]
NAMES = sys.argv[3:]


def main():
    import __spark_entry__ as e
    from schema_inference_spark.functions import get_spark
    spark = get_spark(app_name="dump_plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = e.queries()
    os.makedirs("/root/repo/plans/r06", exist_ok=True)
    for name in NAMES:
        df = qs[name](spark, SF)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        out = f"/root/repo/plans/r06/{name}_{SUFFIX}.txt"
        with open(out, "w") as fh:
            fh.write(buf.getvalue())
        print("wrote", out)
    spark.stop()


if __name__ == "__main__":
    main()
