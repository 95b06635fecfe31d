"""Table readers and the pre-tokenized sequence source.

The engine's production input is an Iceberg table of pre-tokenized
training sequences ``(doc_id string, tokens array<int32>, n_tok int32,
source string)``. In this sandbox there is no Iceberg catalog, so
``spark.read.parquet`` stands in — the scan-level properties we rely on
(partition pruning, predicate pushdown, column pruning, snapshot pinning
via immutable files) behave the same way through the DataSource V2 API.

``tokenized_sequences`` derives that exact table shape deterministically
from the driver-generated ``documents`` table: whitespace tokenization,
crc32 token ids, and a hash-free event-time assignment (``doc_id mod
1440`` minutes past a fixed epoch) that DuckDB can reproduce in SQL for
the correctness oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Epoch for the deterministic sequence event-time derivation.
TOKEN_TIME_BASE = "2024-01-01 00:00:00"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLES}")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def tokenized_sequences(spark: SparkSession, sf_dir: str, spread: bool = True) -> DataFrame:
    """The input-hint table (doc_id, tokens, n_tok, source [, event_ts]).

    Deterministic derivation from ``documents``:
    - ``tokens``: md5-derived int32 id per whitespace-separated word
      (first 8 hex digits of md5, mod the Mersenne prime 2^31-1) —
      reproducible in ANSI SQL, so the per-row token-array equality
      invariant is oracle-checkable value by value;
    - ``n_tok``: token count (0 for blank text);
    - ``event_ts``: ``TOKEN_TIME_BASE + (doc_id % 1440) minutes`` —
      a synthetic but deterministic ingest time that spreads sequences
      over one day at minute grain, reproducible in ANSI SQL.
    """
    from ..spread import spread_input

    # the tokenize projection (md5 per word) and every Python kernel
    # downstream (SimHash, bigrams, token explode) inherit the scan's
    # task count; a single-row-group documents file would run them
    # one-wide (spread_input is a no-op on well-split production
    # tables). Consumers that only read n_tok/source — never the token
    # arrays — pass ``spread=False``: for them the respread exchange is
    # pure cost (the n_tok split+size is cheap JVM codegen).
    docs = load_table(spark, sf_dir, "documents")
    if spread:
        docs = spread_input(docs)
    words = F.split(F.trim(F.col("text")), r"\s+")
    n_tok = F.when(F.length(F.trim(F.col("text"))) == 0, F.lit(0)).otherwise(F.size(words))
    return docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.when(
            F.length(F.trim(F.col("text"))) == 0, F.array().cast("array<int>")
        )
        .otherwise(
            # md5-hex prefix → bigint → int32 domain (ANSI-safe fold)
            F.transform(
                words,
                lambda w: F.pmod(
                    F.conv(F.substring(F.md5(w), 1, 8), 16, 10).cast("long"),
                    F.lit(2147483647),
                ).cast("int"),
            )
        )
        .alias("tokens"),
        n_tok.cast("int").alias("n_tok"),
        F.col("source"),
        (
            # timestamp_ntz: bucket math stays identical whatever session
            # timezone the caller's SparkSession runs with
            F.to_timestamp_ntz(F.lit(TOKEN_TIME_BASE))
            + F.make_interval(mins=(F.col("doc_id") % 1440).cast("int"))
        ).alias("event_ts"),
    )
