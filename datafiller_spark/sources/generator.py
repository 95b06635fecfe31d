"""Deterministic synthetic sequence generator for benchmarks.

Produces the input-hint table shape ``(doc_id string, tokens
array<int32>, n_tok int32, source string, event_ts timestamp)`` at any
row count with a *skewed* source distribution (60/20/12/8) so the
salting/AQE paths are actually exercised. Fully deterministic: every
column is a pure function of the row id (xxhash64 with fixed seed), so
two runs — or two cluster sizes — see identical input.

Scale posture: built on ``spark.range`` (parallelized across the
cluster, no driver-side data), token arrays materialized by Spark
built-ins (``sequence`` + ``transform``), never Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def synth_sequences(
    spark: SparkSession,
    n_docs: int,
    mean_tokens: int = 128,
    span_minutes: int = 2880,
    partitions: int | None = None,
    n_sources: int = 64,
) -> DataFrame:
    """Deterministic skewed sequence table with ``n_docs`` rows.

    ``n_sources`` controls series-key cardinality: 30% of rows land on
    one hot source ("web"), 20% on "books", the rest spread uniformly
    over ``n_sources - 2`` cold "wiki-NN" shards — skew for the salting
    path plus realistic key parallelism for the per-series stages.
    """
    n_tail = max(n_sources - 2, 1)
    df = spark.range(0, n_docs, 1, partitions or spark.sparkContext.defaultParallelism)
    h = F.abs(F.xxhash64(F.col("id"), F.lit(7)))
    bucket1000 = (h % 1000).cast("int")
    source = (
        F.when(bucket1000 < 300, F.lit("web"))
        .when(bucket1000 < 500, F.lit("books"))
        .otherwise(
            F.concat(F.lit("wiki-"), (F.abs(F.xxhash64(F.col("id"), F.lit(23))) % n_tail).cast("string"))
        )
    )
    n_tok = (F.lit(mean_tokens // 2) + (h % F.lit(mean_tokens))).cast("int")
    tokens = F.transform(
        F.sequence(F.lit(1), n_tok),
        lambda i: (F.abs(F.xxhash64(F.col("id"), i, F.lit(13))) % 50257).cast("int"),
    )
    event_ts = F.to_timestamp_ntz(F.lit("2024-01-01 00:00:00")) + F.make_interval(
        mins=(F.col("id") % span_minutes).cast("int")
    )
    return df.select(
        F.format_string("doc-%012d", F.col("id")).alias("doc_id"),
        tokens.alias("tokens"),
        n_tok.alias("n_tok"),
        source.alias("source"),
        event_ts.alias("event_ts"),
    )
