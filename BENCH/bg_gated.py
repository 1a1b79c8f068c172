"""Opportunistic bandwidth-gated scaling cycles (round-3 background runner).

Same gate as gated_bench.py (memcpy >= SPARK_GRAFT_BW_GATE GB/s), plus a
lockfile handshake: while /dev/shm/claude_busy exists the foreground
session is running its own Spark work, so we probe-and-wait instead of
recording a rep that both workloads would poison.  Runs until CYCLES
healthy interleaved cycles complete or DEADLINE_S elapses, whichever is
first, then writes a report row.  Probe history goes to
/dev/shm/bw_probes.log either way so the round can document the window
conditions it saw.

Usage: python BENCH/bg_gated.py ROOT CYCLES LEVEL[,LEVEL...] [DEADLINE_S]
"""
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
THRESH_GBPS = float(os.environ.get("SPARK_GRAFT_BW_GATE", "8"))
BUSY_FLAG = "/dev/shm/claude_busy"
PROBE_LOG = "/dev/shm/bw_probes.log"


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


def probe(tag: str) -> float:
    bw = bandwidth_gbps()
    with open(PROBE_LOG, "a") as f:
        f.write(json.dumps({"t": time.strftime("%H:%M:%S"),
                            "gbps": round(bw, 2), "tag": tag}) + "\n")
    return bw


def main():
    root = sys.argv[1]
    cycles = int(sys.argv[2])
    levels = [int(x) for x in sys.argv[3].split(",")]
    deadline = time.monotonic() + (
        float(sys.argv[4]) if len(sys.argv) > 4 else 4.5 * 3600)
    done = 0
    r = 100  # rep index offset: keep round-3 reps distinct from round-2's
    while os.path.exists(os.path.join(root, f"level_{levels[0]}_{r}.json")):
        r += 1
    while done < cycles and time.monotonic() < deadline:
        bw = probe("idle")
        busy = os.path.exists(BUSY_FLAG)
        if bw < THRESH_GBPS or busy:
            time.sleep(75)
            continue
        ok = True
        for cpus in levels:
            # re-probe before every level; abandon the cycle (don't record
            # poison) if the window closes or the foreground goes busy
            bw = probe(f"pre-level{cpus}")
            if bw < THRESH_GBPS or os.path.exists(BUSY_FLAG):
                ok = False
                break
            out = os.path.join(root, f"level_{cpus}_{r}.json")
            subprocess.run(
                [sys.executable, os.path.join(REPO, "bench_scaling.py"),
                 "--run", str(cpus), root, out],
                check=True, cwd=REPO,
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
            with open(out) as f:
                rec = json.load(f)
            print(f"[bg-gate] rep {r} local[{cpus}]: {rec['wall_s']}s "
                  f"steal {rec['steal_pct']}% (bw {bw:.1f})", flush=True)
        if ok:
            r += 1
            done += 1
    print(f"[bg-gate] finished: {done}/{cycles} healthy cycles", flush=True)


if __name__ == "__main__":
    main()
