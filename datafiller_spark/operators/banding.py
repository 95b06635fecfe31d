"""Shared LSH banding → candidate-pair generation.

One shuffle: groupBy the band key collecting member ids, cap degenerate
hot buckets, then expand each bucket's pair combinations in a single
vectorized Arrow stage (``np.triu_indices`` over the sorted id array).
Replaces the window-count + banded⋈banded self-join + distinct shape,
which costs three exchanges — and whose JVM higher-order pair expansion
runs interpreted (~µs per struct). Used by MinHash-LSH (dedup.py) and
embedding near-dup LSH (similarity.py).

Per-task memory is one bucket's id list (≤ ``max_bucket_size``), the
same bound the window form had. Oversize buckets contribute no
candidates; genuinely similar pairs still surface via their other
bands/tables.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def banded_pairs(
    banded: DataFrame,
    band_cols: list[str],
    id_col: str,
    id_type: str,
    max_bucket_size: int,
) -> DataFrame:
    """(band_cols..., id) rows → distinct candidate (id_a < id_b) pairs."""
    members = (
        banded.groupBy(*band_cols)
        .agg(F.sort_array(F.collect_list(id_col)).alias("ids"))
        .where((F.size("ids") >= 2) & (F.size("ids") <= max_bucket_size))
    )

    def _gen_pairs(batches):
        for pdf in batches:
            out_a, out_b = [], []
            for ids in pdf["ids"]:
                arr = np.asarray(ids)
                i, j = np.triu_indices(len(arr), k=1)
                out_a.append(arr[i])
                out_b.append(arr[j])
            if out_a:
                yield pd.DataFrame(
                    {"id_a": np.concatenate(out_a), "id_b": np.concatenate(out_b)}
                )

    return (
        members.select("ids")
        .mapInPandas(_gen_pairs, schema=f"id_a {id_type}, id_b {id_type}")
        .distinct()
    )
