"""Saturated-pair bottleneck profiling (VERDICT r05 #5).

The local[8] → local[32] pair at 32M rows scales at ~0.45 efficiency
while the unsaturated pair reaches ~0.86. The builder's standing claim
is "shared memory bus"; this script replaces the claim with counters
(no `perf` binary in this container, so three independent probes):

1. **Memory-bandwidth probe** (Spark-free): aggregate numpy copy
   bandwidth with 1 / 8 / 32 single-pinned-core worker processes.
   If the 32-worker aggregate ≈ the 8-worker aggregate, the bus
   saturates below 32 cores and ANY memory-touching workload inherits
   that ceiling going 8→32 on this box.
2. **GC pause accounting**: each pipeline run writes -Xlog:gc and the
   total pause time is reported as a fraction of wall. A large fraction
   would instead indict GC.
3. **/proc/stat per-core utilization** sampled at 1 Hz over the run,
   restricted to the pinned core range. Low busy% would instead indict
   scheduling gaps / stragglers / shuffle stalls.

Plus ONE targeted conf experiment (off-heap memory) at both core
counts, before/after medians.

Writes BENCH/saturated_profile.json. Run on an idle box.

Usage: python tools/profile_saturated.py [rows] [reps]
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import threading
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 32_000_000
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 2

# ---------------------------------------------------------------- probe 1

BW_SNIPPET = r"""
import os, sys, time
import numpy as np
core = int(sys.argv[1]); seconds = float(sys.argv[2])
os.sched_setaffinity(0, {core})
a = np.ones(32 * 1024 * 1024, dtype=np.float64)   # 256 MB
b = np.empty_like(a)                               # 256 MB
t0 = time.time(); n = 0
while time.time() - t0 < seconds:
    np.copyto(b, a); n += 1
dt = time.time() - t0
# one copy touches 2x the buffer (read + write)
print((2 * a.nbytes * n) / dt / 1e9)
"""


def bandwidth(n_workers: int, seconds: float = 4.0) -> float:
    procs = []
    for w in range(n_workers):
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", BW_SNIPPET, str(w), str(seconds)],
                stdout=subprocess.PIPE, text=True,
            )
        )
    total = 0.0
    for p in procs:
        out, _ = p.communicate(timeout=120)
        total += float(out.strip().splitlines()[-1])
    return round(total, 2)


# ---------------------------------------------------------------- probe 2+3

RUN_SNIPPET = r"""
import json, os, shutil, sys, time
sys.path.insert(0, {root!r})
from logboost_spark.session import get_spark
from logboost_spark.fixtures.lookups import build_lookup_dfs
from logboost_spark.plans.pipeline import run_pipeline
conf = json.loads({conf!r})
spark = get_spark(app_name="prof", cores={cores}, extra_conf=conf)
transcripts = spark.read.parquet({cache!r})
lookups = build_lookup_dfs(spark)
out = "/dev/shm/prof_sinks"
shutil.rmtree(out, ignore_errors=True)
t0 = time.time()
run_pipeline(spark, transcripts, lookups, out, n_groups=4,
             group_col_name="cgroup", use_whois=False, use_idb=False)
wall = time.time() - t0
shutil.rmtree(out, ignore_errors=True)
print("RESULT " + json.dumps({{"wall": wall}}))
"""


def read_proc_stat(cores: list[int]) -> dict[int, tuple[int, int]]:
    """{core: (busy_jiffies, total_jiffies)}."""
    out = {}
    with open("/proc/stat") as f:
        for line in f:
            m = re.match(r"cpu(\d+) (.*)", line)
            if m and int(m.group(1)) in cores:
                v = [int(x) for x in m.group(2).split()]
                idle = v[3] + v[4]  # idle + iowait
                out[int(m.group(1))] = (sum(v) - idle, sum(v))
    return out


def run_profiled(cores: int, gc_log: str, extra: dict | None = None) -> dict:
    conf = {
        "spark.driver.extraJavaOptions": (
            "-Djava.net.preferIPv4Stack=true "
            f"-Xlog:gc:file={gc_log}:time,uptime"
        ),
    }
    conf.update(extra or {})
    cache = os.path.join(ROOT, "data", f"bench_transcripts_{ROWS}_g4")
    code = RUN_SNIPPET.format(
        root=ROOT, conf=json.dumps(conf), cores=cores, cache=cache
    )
    core_list = list(range(cores))
    samples: list[dict[int, tuple[int, int]]] = []
    stop = threading.Event()

    def sampler():
        while not stop.is_set():
            samples.append(read_proc_stat(core_list))
            time.sleep(1.0)

    th = threading.Thread(target=sampler, daemon=True)
    th.start()
    p = subprocess.run(
        ["taskset", "-c", f"0-{cores - 1}", sys.executable, "-c", code],
        capture_output=True, text=True, timeout=5400,
    )
    stop.set()
    th.join(timeout=5)
    wall = None
    for line in p.stdout.splitlines():
        if line.startswith("RESULT "):
            wall = json.loads(line[7:])["wall"]
    if wall is None:
        sys.stderr.write(p.stdout[-2000:] + p.stderr[-4000:])
        raise SystemExit("profiled run failed")
    # utilization over the run (first vs last sample)
    busy = tot = 0
    if len(samples) >= 2:
        for c in core_list:
            b0, t0 = samples[0][c]
            b1, t1 = samples[-1][c]
            busy += b1 - b0
            tot += t1 - t0
    gc_ms = 0.0
    n_gc = 0
    if os.path.exists(gc_log):
        with open(gc_log) as f:
            for line in f:
                # unified-logging pause lines end "... 24M->8M(254M) 3.456ms";
                # match the TRAILING ms value on any Pause line (an earlier
                # r"Pause[^)]*\)[^0-9]*([\d.]+)ms" form could not cross the
                # heap-size digits and silently missed every Young/Full
                # pause — caught by the round-6 self-review)
                if "Pause" not in line:
                    continue
                m = re.search(r"\s([\d.]+)ms\s*$", line)
                if m:
                    gc_ms += float(m.group(1))
                    n_gc += 1
        os.remove(gc_log)
    return {
        "cores": cores,
        "wall": round(wall, 1),
        "busy_frac": round(busy / tot, 3) if tot else None,
        "gc_pause_s": round(gc_ms / 1000, 1),
        "gc_frac": round(gc_ms / 1000 / wall, 4),
        "n_gc": n_gc,
    }


def med(runs, key):
    import statistics

    return round(statistics.median(r[key] for r in runs), 3)


def main():
    result = {"rows": ROWS, "measured_at": time.strftime("%Y-%m-%dT%H:%M:%S")}

    print("memory-bandwidth probe (numpy copy, pinned workers)...", flush=True)
    bw = {n: bandwidth(n) for n in (1, 8, 32)}
    result["memcpy_gbps"] = bw
    print("  aggregate GB/s:", bw, flush=True)

    for label, extra in [("baseline", None),
                         ("offheap16g", {
                             "spark.memory.offHeap.enabled": "true",
                             "spark.memory.offHeap.size": str(16 * 1024**3),
                         })]:
        for cores in (8, 32):
            runs = []
            for rep in range(REPS):
                r = run_profiled(cores, f"/tmp/gc_{label}_{cores}_{rep}.log",
                                 extra)
                runs.append(r)
                print(f"  {label} cores={cores} rep={rep}: {r}", flush=True)
            result[f"{label}_c{cores}"] = {
                "wall_median": med(runs, "wall"),
                "runs": runs,
            }
        w8 = result[f"{label}_c8"]["wall_median"]
        w32 = result[f"{label}_c32"]["wall_median"]
        result[f"{label}_eff_8_32"] = round((w8 / w32) / 4, 3)
        print(f"  {label}: eff(8->32) = {result[f'{label}_eff_8_32']}", flush=True)

    os.makedirs(os.path.join(ROOT, "BENCH"), exist_ok=True)
    with open(os.path.join(ROOT, "BENCH", "saturated_profile.json"), "w") as f:
        json.dump(result, f, indent=1)
    print("wrote BENCH/saturated_profile.json")


if __name__ == "__main__":
    main()
