#!/usr/bin/env python
"""Decompose the bench pipeline wall into scan+rollup vs kernel stage at
one parallelism level. Run separately per level with cooldowns:

    python scripts/pipeline_stage_probe.py 4
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = int(sys.argv[1]) if len(sys.argv) > 1 else 4
SHUF = int(sys.argv[2]) if len(sys.argv) > 2 else max(CPUS, 8)


def main() -> None:
    import bench as benchmod
    from datafiller_spark.operators import rollup
    from datafiller_spark.operators.impute import cascade_gapfill_encode_all
    from datafiller_spark.session import get_spark
    from pyspark.sql import functions as F

    spark = get_spark(
        app_name=f"stage_probe_{CPUS}",
        master=f"local[{CPUS}]",
        shuffle_partitions=SHUF,
        extra_conf={"spark.sql.files.maxPartitionBytes": str(8 * 1024 * 1024)},
    )
    path = benchmod._ensure_input(spark)
    seqs = spark.read.parquet(path)

    t0 = time.time()
    t1m = rollup(seqs, ["source"], "event_ts", "n_tok", "1m").cache()
    n = t1m.count()
    t_rollup = time.time() - t0
    print(f"[n{CPUS}] scan+rollup+cache: {t_rollup:.2f}s ({n} tier rows)", flush=True)

    t0 = time.time()
    enc = cascade_gapfill_encode_all(t1m, ["source"])
    stats = enc.agg(F.sum("n_points").alias("pts"), F.sum(F.length("payload")).alias("b")).first()
    t_kernel = time.time() - t0
    print(f"[n{CPUS}] kernel stage (from cache): {t_kernel:.2f}s ({stats['pts']} pts)", flush=True)
    print(f"[n{CPUS}] total {t_rollup + t_kernel:.2f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
