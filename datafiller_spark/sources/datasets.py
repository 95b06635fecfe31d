"""Dataset loaders (S1/S2) — the reference's loaders minus the network.

The reference fetches these with pooch (md5-pinned downloads) and then
normalizes (reference src/datafiller/datasets/_datasets.py:6-72). By
policy this engine uses NO external data, so the loaders take a LOCAL
path and reproduce the post-download normalization exactly:

- ``load_titanic``: the CSV as-is — mixed numeric/categorical with
  missing values in both (the M16/M19 fixture shape).
- ``load_pems_bay``: first column parsed as a DatetimeIndex named
  ``time``, columns axis named ``sensor_id``, reindexed to a strict
  5-minute frequency (missing timestamps become NaN rows).

Spark forms read the same files cluster-side; the wide sensor matrix
becomes the long (time, sensor_id, value) shape — the relational idiom
for a 100 TB table — with the 5-minute grid reinserted per sensor by
the engine's ``regular_grid`` operator.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def load_titanic(path: str) -> pd.DataFrame:
    """Local-source mirror of the reference's ``load_titanic``
    (reference _datasets.py:6-35 minus the pooch fetch)."""
    return pd.read_csv(path)


def load_pems_bay(path: str) -> pd.DataFrame:
    """Local-source mirror of the reference's ``load_pems_bay``
    normalization (reference _datasets.py:38-72 minus the pooch fetch):
    DatetimeIndex named ``time``, columns ``sensor_id``, strict 5-min
    frequency."""
    df = pd.read_csv(path, index_col=0, parse_dates=[0])
    df = df.rename_axis(index="time", columns="sensor_id")
    return df.asfreq("5min")


def load_titanic_spark(spark: SparkSession, path: str) -> DataFrame:
    """Cluster-side titanic load: schema inferred, blanks → null (the
    same missingness the pandas form carries as NaN)."""
    return spark.read.csv(path, header=True, inferSchema=True, nullValue="")


def load_pems_bay_spark(spark: SparkSession, path: str) -> DataFrame:
    """Cluster-side PEMS-BAY load in LONG form: (time, sensor_id,
    value) with the strict 5-minute grid reinserted per sensor —
    missing timestamps appear as null-value rows, matching the pandas
    form's ``asfreq`` NaN rows cell-for-cell (every sensor spans the
    same wide-row index, so the per-sensor grid equals the global one).
    Same sequence()+explode calendar pattern as ``regular_grid``, at
    the dataset's native 5-minute step."""
    wide = spark.read.csv(path, header=True, inferSchema=True)
    time_col = wide.columns[0]
    sensors = wide.columns[1:]
    long = wide.select(
        F.col(time_col).cast("timestamp").alias("time"),
        F.explode(
            F.map_from_arrays(
                F.array(*[F.lit(c) for c in sensors]),
                F.array(*[F.col(c).cast("double") for c in sensors]),
            )
        ).alias("sensor_id", "value"),
    )
    span = long.groupBy("sensor_id").agg(
        F.min("time").alias("__first"), F.max("time").alias("__last")
    )
    calendar = span.select(
        "sensor_id",
        F.explode(
            F.sequence(F.col("__first"), F.col("__last"), F.expr("interval 5 minutes"))
        ).alias("time"),
    )
    return calendar.join(long, ["sensor_id", "time"], "left").select(
        "time", "sensor_id", "value"
    )
