"""End-to-end pipeline: salting equivalence, checkpoint/resume, retention."""

import datetime
import os

import pytest
from pyspark.sql import functions as F

from datafiller_spark.operators import rollup
from datafiller_spark.plans import run_pipeline
from datafiller_spark.plans.pipeline import apply_retention, salted_rollup
from datafiller_spark.sources import synth_sequences


@pytest.fixture(scope="module")
def seqs(spark):
    return synth_sequences(spark, 3000, mean_tokens=32, span_minutes=360).cache()


def test_salted_rollup_equals_direct(spark, seqs):
    direct = rollup(seqs, ["source"], "event_ts", "n_tok", "1m")
    salted = salted_rollup(seqs, ["source"], "event_ts", "n_tok", "1m", salt_buckets=8, salt_col="doc_id")
    d = direct.orderBy("source", "bucket").collect()
    s = salted.orderBy("source", "bucket").collect()
    assert len(d) == len(s)
    for a, b in zip(d, s):
        assert (a.source, a.bucket, a.n_points, a.min_value, a.max_value) == (
            b.source,
            b.bucket,
            b.n_points,
            b.min_value,
            b.max_value,
        )
        assert a.sum_value == b.sum_value  # integer-valued sums compose exactly


def test_pipeline_counters_and_tiers(spark, seqs, tmp_path):
    res = run_pipeline(
        spark,
        seqs,
        ["source"],
        "event_ts",
        "n_tok",
        output_dir=str(tmp_path / "out"),
        min_samples_train=10,
        salt_buckets=8,
        salt_col="doc_id",
    )
    assert res.counters["tier_1m_rows"] > res.counters["tier_1h_rows"] > res.counters["tier_1d_rows"]
    assert res.points == sum(res.counters[f"tier_{t}_rows"] for t in ("1m", "1h", "1d"))
    for tier in ("1m", "1h", "1d"):
        assert res.counters[f"tier_{tier}_bytes"] > 0
        assert res.filled[tier].where(F.col("avg_value").isNull()).count() == 0
    # artifacts written
    out = tmp_path / "out"
    assert (out / "tier=1m").exists()
    assert (out / "metrics").exists()
    assert (out / "lineage").exists()
    assert (out / "_checkpoint_high_water").exists()


def test_resume_is_incremental_and_consistent(spark, tmp_path):
    full = synth_sequences(spark, 2000, mean_tokens=16, span_minutes=240).cache()
    cutoff = datetime.datetime(2024, 1, 1, 2, 0)
    first = full.where(F.col("event_ts") < F.lit(cutoff))
    second = full  # the resume run sees everything, filters via checkpoint

    out = str(tmp_path / "ckpt")
    run_pipeline(spark, first, ["source"], "event_ts", "n_tok", output_dir=out,
                 gapfill=False, encode=False)

    hw_rows = spark.read.parquet(os.path.join(out, "_checkpoint_high_water")).collect()
    hw_max = max(r.max_bucket for r in hw_rows)
    hw_min = min(r.max_bucket for r in hw_rows)
    assert hw_max < cutoff

    res2 = run_pipeline(spark, second, ["source"], "event_ts", "n_tok", output_dir=out,
                        gapfill=False, encode=False, resume=True)
    incr_1m = res2.tiers["1m"].select("source", "bucket", "n_points").collect()
    # resume processed only post-checkpoint buckets
    assert min(r.bucket for r in incr_1m) >= hw_min

    # incremental union == single-shot run on everything
    single = rollup(full, ["source"], "event_ts", "n_tok", "1m")
    incr_first = rollup(first, ["source"], "event_ts", "n_tok", "1m")
    a = sorted(
        [tuple(r) for r in incr_first.select("source", "bucket", "n_points").collect()]
        + [tuple(r) for r in incr_1m]
    )
    b = sorted(map(tuple, single.select("source", "bucket", "n_points").collect()))
    assert a == b


def test_retention(spark, seqs, tmp_path):
    out = str(tmp_path / "ret")
    run_pipeline(spark, seqs, ["source"], "event_ts", "n_tok", output_dir=out,
                 gapfill=False, encode=False)
    path = os.path.join(out, "tier=1m")
    before = spark.read.parquet(path).count()
    keep_after = datetime.datetime(2024, 1, 1, 3, 0)
    kept = apply_retention(spark, out, "1m", keep_after)
    assert 0 < kept < before
    assert spark.read.parquet(path).agg(F.min("bucket")).first()[0] >= keep_after
