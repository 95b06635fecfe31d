"""Deterministic corpus curation operators: hash sampling + packing.

Training-data pipelines need reproducible row selection and
fixed-token-budget context packing. Both are pure DataFrame expressions
(no RNG state, no Python rows), so they are cheap at any scale and
cross-engine checkable: the sampling hash is md5-based (identical in
Spark and DuckDB), and packing is a window cumsum.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: modulus of the sampling hash space
_HASH_BUCKETS = 10_000


def sample_by_hash(
    df: DataFrame,
    id_col: str,
    fraction: float,
    salt: str = "",
) -> DataFrame:
    """Deterministic ~``fraction`` sample keyed on ``md5(id:salt)``.

    Unlike ``DataFrame.sample`` this is reproducible across engines,
    partitionings, and reruns — the same (id, salt) always lands on the
    same side — which is what incremental pipelines need: a resumed run
    samples exactly the rows the first run would have. Change ``salt``
    to draw an independent sample. The predicate is a scan-side filter
    (no shuffle)."""
    if not (0.0 <= fraction <= 1.0):
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    key = F.concat(F.col(id_col).cast("string"), F.lit(":" + salt))
    bucket = F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long") % _HASH_BUCKETS
    return df.where(bucket < int(round(fraction * _HASH_BUCKETS)))


def pack_sequences(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    n_tok_col: str,
    budget: int,
) -> DataFrame:
    """First-fit contiguous packing of sequences into fixed token-budget
    bins per key (the "pack documents into 4096-token contexts" step of
    a pretraining pipeline).

    Documents are laid out in ``order_cols`` order; each starts at its
    exclusive running-token offset and belongs to the bin that offset
    falls in. One window cumsum per key — a single shuffle, no Python.
    A document longer than ``budget`` overflows its bin (callers chunk
    long documents first); bins are dense per key starting at 0.

    Output: input columns + ``bin_id`` (long) + ``bin_offset`` (long,
    token offset of the document inside its bin).

    Precision note: the bin division goes through float64 (as does the
    DuckDB oracle), exact while a key's running token count stays below
    2^53 ≈ 9·10^15 — beyond any single source's plausible token count;
    shard the key first if one ever approaches it.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    keys = list(key_cols)
    w = Window.partitionBy(*keys).orderBy(*[F.col(c) for c in order_cols])
    start = F.coalesce(
        F.sum(F.col(n_tok_col)).over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    ).cast("long")
    return df.withColumn("bin_id", (start / F.lit(budget)).cast("long")).withColumn(
        "bin_offset", start % F.lit(budget)
    )
