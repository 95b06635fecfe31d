"""The distributed feature-score query reproduces the scoring kernel.

q_feature_scores computes Score(target, feature) = shared-observation
fraction × |corr| from pairwise co-moment AGGREGATES (bucket join of
centered series) — no pivoted matrix, no single-task funnel. This pins
it against the NumPy kernel (kernels/scoring.py) run on the pivoted
matrix, within the tolerance introduced by the query's round-at-4
intermediate sums (the cross-engine float policy)."""

import numpy as np
import pandas as pd

from datafiller_spark.kernels import score_features


def test_distributed_scores_match_kernel(spark, sf_dir):
    import __spark_entry__ as entrymod

    got = {
        (r.target, r.feature): r.score
        for r in entrymod.q_feature_scores(spark, sf_dir).collect()
    }

    tier = entrymod._events_tier(spark, sf_dir, "1h").toPandas()
    pivot = tier.pivot_table(
        index="bucket", columns="event_type", values="avg_value", aggfunc="first"
    ).sort_index()
    cols = list(pivot.columns)
    scores = score_features(pivot.to_numpy(dtype="float64"), np.arange(len(cols)))

    assert len(got) == len(cols) * (len(cols) - 1)
    for i, target in enumerate(cols):
        for j, feature in enumerate(cols):
            if i == j:
                continue
            assert abs(got[(target, feature)] - scores[i, j]) < 1e-5, (target, feature)
