"""As-of join: match each left row to the latest right row at or before it.

Spark has no ASOF JOIN primitive; the scalable formulation is the
union-and-carry trick: tag both sides, union on a shared schema, sort by
(key, ts, side) within the window, and carry the last right-side payload
forward — one shuffle on the key, no range explosion, no driver loop.
Equivalent to DuckDB's ``ASOF JOIN`` (used as the oracle).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: Sequence[str],
    left_ts: str,
    right_ts: str,
    payload_cols: Sequence[str],
) -> DataFrame:
    """Left rows + latest right ``payload_cols`` with right_ts ≤ left_ts.

    Rows with no prior right row keep NULL payloads. The payload columns
    are carried as ONE struct, so they always come from the same right
    row (never a nondeterministic mix of columns from different rows);
    when the right side has duplicate (key, right_ts) rows the struct
    with the greatest payload values wins — a deterministic tiebreak
    that does not depend on partitioning or scan order.
    """
    keys = list(key_cols)
    payloads = list(payload_cols)
    payload_type = StructType(
        [StructField(p, right.schema[p].dataType) for p in payloads]
    )

    left_cols = [c for c in left.columns]
    l = left.select(
        *left_cols,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(payload_type).alias("__p"),
    )
    r = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols if c not in keys],
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.struct(*[F.col(p).alias(p) for p in payloads]).alias("__p"),
    ).select(*l.columns)

    unioned = l.unionByName(r)
    # right rows (side 0) sort before left rows at equal ts → "at or
    # before"; __p breaks ties among duplicate right rows deterministically
    w = (
        Window.partitionBy(*keys)
        .orderBy("__ts", "__side", "__p")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.select(
        "*",
        F.last("__p", ignorenulls=True).over(w).alias("__c"),
    )
    return carried.where(F.col("__side") == 1).select(
        *left_cols,
        *[F.col(f"__c.{p}").alias(p) for p in payloads],
    )
