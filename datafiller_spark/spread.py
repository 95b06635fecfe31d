"""Conditional input re-split ahead of compute-heavy stages.

A scan's task count is bounded by the input's physical split count —
for parquet, the row-group layout. A single-row-group file (however
small) produces ONE effective scan task, and every narrow stage chained
on it (pandas UDFs, ``mapInPandas`` decode/shingle kernels, interpreted
higher-order expressions) inherits that width: one core works, the rest
idle. That is the "one huge unsplittable file" input-skew case of the
optimization playbook, and the standard fix is to repartition right
after the read.

``spread_input`` applies that fix *conditionally*: when the frame
already has at least ``defaultParallelism × multiplier`` partitions
(any well-laid-out production table — 100 TB inputs arrive as many
files/row groups), it is a no-op and adds nothing to the plan. Only an
under-split input pays one round-robin exchange of the (projected)
rows about to enter the expensive stage. Callers project to the needed
columns first so the exchange carries minimal bytes (§2.3 of the
guide: project before the exchange).

The target is derived from ``sparkContext.defaultParallelism`` — the
cluster's core count, not a constant — so the same code sizes itself
on a laptop, this sandbox, and a 1000-executor cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_input(df: DataFrame, multiplier: int = 1) -> DataFrame:
    """Repartition ``df`` to ``defaultParallelism × multiplier`` if (and
    only if) it currently has fewer partitions than that. Row values are
    untouched; only their distribution over tasks changes."""
    sc = df.sparkSession.sparkContext
    target = max(int(sc.defaultParallelism), 1) * max(int(multiplier), 1)
    try:
        current = df.rdd.getNumPartitions()
    except Exception:  # pragma: no cover - defensive: never break a plan
        return df
    if current >= target:
        return df
    return df.repartition(target)
