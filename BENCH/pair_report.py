"""Per-cycle N->4N efficiency: pairs each rep's local[N] and local[4N]
runs (executed back-to-back inside one bandwidth-gated window), so both
ends of a ratio saw the same host conditions — best-of across levels
from DIFFERENT windows biases the ratio either way.

Usage: python BENCH/pair_report.py ROOT [N 4N]
"""
import glob
import json
import os
import sys


def main():
    root = sys.argv[1]
    lo, hi = (int(sys.argv[2]), int(sys.argv[3])) if len(sys.argv) > 3 \
        else (2, 8)
    reps = {}
    for path in glob.glob(os.path.join(root, "level_*_*.json")):
        name = os.path.basename(path)[len("level_"):-len(".json")]
        cpus, r = (int(x) for x in name.split("_"))
        with open(path) as f:
            reps.setdefault(r, {})[cpus] = json.load(f)
    rows = []
    for r in sorted(reps):
        if lo in reps[r] and hi in reps[r]:
            a, b = reps[r][lo], reps[r][hi]
            eff = (b["turns_per_sec"] / a["turns_per_sec"]) / (hi / lo)
            rows.append({"rep": r, f"wall_{lo}": a["wall_s"],
                         f"wall_{hi}": b["wall_s"],
                         "efficiency": round(eff, 3),
                         "identical": a["violations_sha256"]
                         == b["violations_sha256"]})
    print(json.dumps({"pairs": rows,
                      "best": max((r["efficiency"] for r in rows),
                                  default=None)}))


if __name__ == "__main__":
    main()
