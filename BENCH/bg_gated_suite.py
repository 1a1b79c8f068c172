"""Opportunistic bandwidth-gated 100-query suite run.

Same gate + busy-flag handshake as bg_gated.py: probe memcpy every
~75s; when a window >= SPARK_GRAFT_BW_GATE GB/s opens AND the
foreground session is idle, fire one full `bench.py` suite run at
sf0.1 and save its JSON line to BENCH/r5_suite_gated.json with the
pre/post probes attached. One successful run, then exit (the suite
itself re-probes inside bench.py, so the record self-describes).

Usage: python BENCH/bg_gated_suite.py [DEADLINE_S] [OUT_JSON]
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
OUT = os.path.join(REPO, "BENCH", "r5_suite_gated.json")


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
    global OUT
    deadline = time.monotonic() + (
        float(sys.argv[1]) if len(sys.argv) > 1 else 4 * 3600)
    if len(sys.argv) > 2:
        OUT = sys.argv[2]
    while time.monotonic() < deadline:
        bw = probe("suite-idle")
        if bw < THRESH_GBPS or os.path.exists(BUSY_FLAG):
            time.sleep(75)
            continue
        t0 = time.monotonic()
        res = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            cwd=REPO, capture_output=True, text=True)
        wall = time.monotonic() - t0
        post = probe("suite-post")
        line = next((ln for ln in res.stdout.splitlines()
                     if ln.startswith('{"metric"')), None)
        if res.returncode != 0 or line is None:
            print(f"[bg-suite] run failed rc={res.returncode}", flush=True)
            time.sleep(75)
            continue
        rec = {"pre_gbps": round(bw, 2), "post_gbps": round(post, 2),
               "wall_s": round(wall, 1), "parsed": json.loads(line)}
        with open(OUT, "w") as f:
            json.dump(rec, f, indent=1)
        print(f"[bg-suite] gated suite recorded: {rec['parsed']['value']}s "
              f"(bw {bw:.1f}/{post:.1f})", flush=True)
        return
    print("[bg-suite] deadline reached, gate never opened", flush=True)


if __name__ == "__main__":
    main()
