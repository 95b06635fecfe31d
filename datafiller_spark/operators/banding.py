"""Shared LSH banding → candidate-pair generation.

One shuffle: groupBy the band key collecting member ids, cap degenerate
hot buckets, then expand each bucket's pair combinations in a single
vectorized Arrow stage (``np.triu_indices`` over the sorted id array).
Replaces the window-count + banded⋈banded self-join + distinct shape,
which costs three exchanges — and whose JVM higher-order pair expansion
runs interpreted (~µs per struct). Used by MinHash-LSH and SimHash
(dedup.py); embedding near-dup LSH (similarity.py) fuses its own
expansion with cosine verification in one kernel instead.

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
    payload_col: str | None = None,
    payload_type: str | None = None,
) -> DataFrame:
    """(band_cols..., id[, payload]) rows → distinct candidate
    (id_a < id_b) pairs.

    With ``payload_col`` set, each member's payload (e.g. its SimHash
    signature) rides along through the bucket and comes back as
    ``payload_a``/``payload_b`` — the verification step then needs no
    join back to the signature table. ``distinct`` stays correct
    because a pair's payloads are functionally determined by its ids.
    (Callers needing heavier fusion — pair expansion + verification in
    one kernel, no pre-verify distinct — inline their own expansion the
    way ``embedding_near_dupes_lsh`` does.)
    """
    if payload_col is None:
        collected = F.sort_array(F.collect_list(id_col)).alias("ids")
    else:
        # sort_array on array<struct> orders by the first field (the id)
        collected = F.sort_array(
            F.collect_list(F.struct(F.col(id_col).alias("i"), F.col(payload_col).alias("p")))
        ).alias("ids")
    members = (
        banded.groupBy(*band_cols)
        .agg(collected)
        .where((F.size("ids") >= 2) & (F.size("ids") <= max_bucket_size))
    )

    def _gen_pairs(batches):
        for pdf in batches:
            out_a, out_b, out_pa, out_pb = [], [], [], []
            for ids in pdf["ids"]:
                if payload_col is None:
                    arr = np.asarray(ids)
                else:
                    arr = np.asarray([m["i"] for m in ids])
                    pay = np.asarray([m["p"] for m in ids])
                i, j = np.triu_indices(len(arr), k=1)
                # duplicate id VALUES in one bucket would pair with
                # themselves here; the strict id_a < id_b contract (what
                # the self-join form enforced) drops them
                keep = arr[i] != arr[j]
                i, j = i[keep], j[keep]
                out_a.append(arr[i])
                out_b.append(arr[j])
                if payload_col is not None:
                    out_pa.append(pay[i])
                    out_pb.append(pay[j])
            if out_a:
                cols = {"id_a": np.concatenate(out_a), "id_b": np.concatenate(out_b)}
                if payload_col is not None:
                    cols["payload_a"] = np.concatenate(out_pa)
                    cols["payload_b"] = np.concatenate(out_pb)
                yield pd.DataFrame(cols)

    schema = f"id_a {id_type}, id_b {id_type}"
    if payload_col is not None:
        schema += f", payload_a {payload_type}, payload_b {payload_type}"
    return (
        members.select("ids")
        .mapInPandas(_gen_pairs, schema=schema)
        .distinct()
    )
