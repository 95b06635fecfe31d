#!/usr/bin/env python
"""Round-7 measurement harness (bench.py is FROZEN — this file carries
the extra instrumentation the optimization round needs).

Times individual declared queries with the same methodology as
bench.py's _queries_worker (df.count(), best of N runs, local[$CPUS])
and optionally:
  --noop     use the noop sink instead of count() (times every column)
  --plans D  write .explain("formatted") for each query into directory D
  --ui       enable the Spark UI + REST API (stage-level drilldown)

Usage:
  python bench_extra.py [--sf DIR] [--runs N] [--noop] [--plans DIR] q1 q2 ...
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*", help="query names (default: all)")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--noop", action="store_true")
    ap.add_argument("--plans", default=None, help="dir for explain('formatted') dumps")
    ap.add_argument("--ui", action="store_true")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from datafiller_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    extra = {"spark.ui.enabled": "true"} if args.ui else {}
    spark = get_spark(
        app_name="bench_extra",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
        extra_conf=extra,
    )
    qs = entrymod.queries()
    names = args.queries or list(qs)
    out: dict[str, object] = {"sf": args.sf, "mode": "noop" if args.noop else "count"}
    timings: dict[str, float] = {}
    for name in names:
        if name not in qs:
            raise SystemExit(f"unknown query {name!r}")
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        walls = []
        for _ in range(args.runs):
            t0 = time.time()
            df = qs[name](spark, args.sf)
            if args.noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            walls.append(round(time.time() - t0, 3))
        timings[name] = min(walls)
        out[f"{name}_runs"] = walls
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            df = qs[name](spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(args.plans, f"{name}.txt"), "w") as f:
                f.write(plan)
        print(f"RUN {name}: {walls}", file=sys.stderr, flush=True)
    out["queries"] = timings
    print("BENCH_EXTRA " + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
