"""Bandwidth-gated scaling bench driver.

This host's co-tenant degradation is BANDWIDTH-level (invisible to
/proc/stat steal and to spin-proc CPU probes): 20-min windows where
identical runs go 3-13x slower at ~0% steal and full ALU scaling. A
single-threaded numpy memcpy probe detects it directly (healthy: >=8
GB/s; degraded windows measured at 2.3 GB/s). This driver probes before
every rep-cycle and only runs the bench levels inside healthy windows;
poisoned cycles are skipped, not recorded. Reps still interleave levels
(bench_scaling protocol) and the final report is best-of per level.

Usage: python BENCH/gated_bench.py ROOT REPS LEVEL[,LEVEL...]
"""
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
THRESH_GBPS = float(os.environ.get("SPARK_GRAFT_BW_GATE", "8"))


def bandwidth_gbps() -> float:
    import numpy as np
    a = np.zeros(256 * 1024 * 1024 // 8)
    best = 0.0
    for _ in range(3):
        t0 = time.monotonic()
        b = a.copy()
        dt = time.monotonic() - t0
        best = max(best, 2 * a.nbytes / dt / 1e9)
        del b
    return best


def main():
    root, reps, levels = sys.argv[1], int(sys.argv[2]), [
        int(x) for x in sys.argv[3].split(",")]
    done = 0
    probe_log = []
    existing = len([f for f in os.listdir(root)
                    if f.startswith(f"level_{levels[0]}_")])
    r = existing
    while done < reps:
        bw = bandwidth_gbps()
        probe_log.append({"t": time.strftime("%H:%M:%S"),
                          "gbps": round(bw, 1)})
        print(f"[gate] bandwidth {bw:.1f} GB/s "
              f"({'RUN' if bw >= THRESH_GBPS else 'wait'})", flush=True)
        if bw < THRESH_GBPS:
            time.sleep(90)
            continue
        for cpus in levels:
            # windows shift within a multi-minute cycle: re-probe before
            # every level and stall mid-cycle rather than record poison
            while True:
                bw = bandwidth_gbps()
                if bw >= THRESH_GBPS:
                    break
                print(f"[gate] mid-cycle {bw:.1f} GB/s — stall", flush=True)
                time.sleep(90)
            out = os.path.join(root, f"level_{cpus}_{r}.json")
            subprocess.run(
                [sys.executable, os.path.join(REPO, "bench_scaling.py"),
                 "--run", str(cpus), root, out],
                check=True, cwd=REPO,
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
            with open(out) as f:
                rec = json.load(f)
            print(f"[gate] rep {r} local[{cpus}]: {rec['wall_s']}s "
                  f"steal {rec['steal_pct']}% (bw {bw:.1f})", flush=True)
        r += 1
        done += 1
    with open(os.path.join(root, "probes.json"), "w") as f:
        json.dump(probe_log, f)
    env = dict(os.environ,
               SPARK_GRAFT_SCALING_LEVELS=",".join(map(str, levels)))
    subprocess.run([sys.executable,
                    os.path.join(REPO, "bench_scaling.py"),
                    "--report", root], check=True, cwd=REPO, env=env)


if __name__ == "__main__":
    main()
