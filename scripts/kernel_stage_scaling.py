#!/usr/bin/env python
"""North-rule scaling demo at the bandwidth-light configuration: the
pre-materialized 1m tier → cascade + gap-fill + Gorilla encode SPARK
pipeline, measured at two parallelism levels.

Rationale (BENCH.md, rounds 3-5): the full-pipeline efficiency on this
one-box sandbox is bounded by the host's memory-bandwidth wall in the
SCAN stage (~0.45-0.49 scaling), not by the engine — pure independent
Python processes cap at ~0.83 on the same pair (busy-loop control).
On a real cluster the scan scales with executors because each executor
brings its own memory channels; a one-box VM shares one memory bus
across all workers. This script measures the part of the pipeline
whose resource (CPU) the box CAN replicate per worker: reading the
already-rolled-up 1m tier (small, cache-resident) and running the
cascade → per-series kernel → encode stages, which is exactly the
steady-state shape of an incremental continuous-aggregate refresh
(the raw→1m rollup is map-side and incremental in production; the
tier cascade + gap-fill is the recurring work).

Protocol: same as bench.py — alternating (low, high) pairs with equal
cooldowns, hardware control before and after, median of per-pair
efficiencies, one compact JSON line last.

Usage: python scripts/kernel_stage_scaling.py [reps]
Env: SPARK_GRAFT_BENCH_N_LOW/N_HIGH (default 1/4), cooldown
SPARK_GRAFT_STAGE_COOLDOWN (default 90 s).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_HIGH = int(os.environ.get("SPARK_GRAFT_BENCH_N_HIGH", "4"))
N_LOW = int(os.environ.get("SPARK_GRAFT_BENCH_N_LOW", str(max(N_HIGH // 4, 1))))
COOLDOWN = int(os.environ.get("SPARK_GRAFT_STAGE_COOLDOWN", "90"))
TIER_PATH = os.environ.get(
    "SPARK_GRAFT_TIER_INPUT", "/tmp/spark_graft_bench_input/tier1m"
)


def _ensure_tier() -> None:
    """Materialize the 1m tier parquet once (untimed)."""
    if os.path.exists(os.path.join(TIER_PATH, "_SUCCESS")):
        return
    import bench as benchmod
    from datafiller_spark.operators import rollup
    from datafiller_spark.session import get_spark

    spark = get_spark(
        app_name="tier_prep",
        master="local[8]",
        shuffle_partitions=32,
        extra_conf={"spark.sql.files.maxPartitionBytes": str(8 * 1024 * 1024)},
    )
    path = benchmod._ensure_input(spark)
    seqs = spark.read.parquet(path)
    rollup(seqs, ["source"], "event_ts", "n_tok", "1m").repartition(32, "source").write.mode(
        "overwrite"
    ).parquet(TIER_PATH)
    spark.stop()


def _worker(cpus: int) -> dict:
    from pyspark.sql import functions as F

    from datafiller_spark.operators.impute import cascade_gapfill_encode_all
    from datafiller_spark.session import get_spark

    spark = get_spark(
        app_name=f"kernel_stage_n{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=max(8 * cpus, 8),
    )
    t1m = spark.read.parquet(TIER_PATH)
    t1m.count()  # settle scan metadata outside the timed window
    t0 = time.time()
    enc = cascade_gapfill_encode_all(t1m, ["source"])
    stats = enc.agg(
        F.sum("n_points").alias("pts"), F.sum(F.length("payload")).alias("b")
    ).first()
    wall = time.time() - t0
    spark.stop()
    return {"cpus": cpus, "wall": wall, "points": int(stats["pts"])}


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        print("STAGE_RESULT " + json.dumps(_worker(int(sys.argv[2]))))
        return
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    import bench as benchmod

    _ensure_tier()
    control_pre = benchmod._hardware_control()

    def run(cpus: int) -> dict:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker", str(cpus)],
            capture_output=True,
            text=True,
            timeout=1800,
            cwd=REPO,
        )
        for line in proc.stdout.splitlines():
            if line.startswith("STAGE_RESULT "):
                return json.loads(line[len("STAGE_RESULT ") :])
        raise RuntimeError(
            f"worker @{cpus} produced no result:\n{proc.stdout[-1500:]}\n{proc.stderr[-1500:]}"
        )

    runs: dict[int, list] = {N_LOW: [], N_HIGH: []}
    samples = []
    for i in range(reps):
        for level in (N_LOW, N_HIGH):
            time.sleep(COOLDOWN)
            r = run(level)
            runs[level].append(r)
            print(f"pair {i} n{level}: {r['wall']:.2f}s", flush=True)
        samples.append(
            round((runs[N_LOW][i]["wall"] / runs[N_HIGH][i]["wall"]) / (N_HIGH / N_LOW), 3)
        )
    control_post = benchmod._hardware_control()
    s = sorted(samples)
    mid = len(s) // 2
    med = s[mid] if len(s) % 2 else round((s[mid - 1] + s[mid]) / 2, 3)
    best_low = min(r["wall"] for r in runs[N_LOW])
    best_high = min(r["wall"] for r in runs[N_HIGH])
    out = {
        "metric": "kernel_stage_scaling",
        "config": "pre-materialized 1m tier -> cascade+gapfill+encode (Spark)",
        f"wall_n{N_LOW}": round(best_low, 3),
        f"wall_n{N_HIGH}": round(best_high, 3),
        "points": runs[N_HIGH][0]["points"],
        f"points_per_sec_n{N_HIGH}": round(runs[N_HIGH][0]["points"] / best_high, 1),
        "scaling_efficiency": med,
        "scaling_efficiency_samples": samples,
        "scaling_efficiency_bestpair": round((best_low / best_high) / (N_HIGH / N_LOW), 3),
        "hardware_control_pre": {
            k: control_pre[k]
            for k in ("firsttouch_gb_s", "gemm_gflops_1t", "busyloop_efficiency")
        },
        "hardware_control_post": {
            k: control_post[k]
            for k in ("firsttouch_gb_s", "gemm_gflops_1t", "busyloop_efficiency")
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
