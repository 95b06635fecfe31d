"""The continuous-aggregate pipeline: raw → 1m → 1h → 1d, gap-filled,
encoded, checkpointed, with per-partition lineage and metrics rows.

Scale design (what survives 1000 executors / 10^12 sequences):

- Raw is scanned ONCE (the 1m rollup); coarser tiers cascade from the
  tier below. Spark's hash aggregate already does map-side partial
  aggregation; for heavily skewed sources an explicit salt stage
  pre-aggregates on (key, bucket, salt) first, bounding any single
  reducer's input to 1/S of the hottest key — this composes exactly
  because the metrics are count/sum/min/max.
- Gap-fill (pandas ridge kernel) runs per (source) group on tier rows,
  never raw rows: the expensive Python stage sees orders of magnitude
  fewer rows than the scan.
- Persisted state: ``tier=<t>`` holds the OBSERVED tier rows (the
  mergeable ground truth — count/sum/min/max compose, so (key, bucket)
  replacement is always safe); the gap-filled representation is
  persisted as Gorilla chunks. Derived data is never the merge source
  of truth: a partial re-derivation can then never clobber history.
- Resume: the 1m delta (from the high-water filter) merges into the
  observed 1m tier; every DERIVED product — 1h/1d cascade, gap-fill,
  chunks — is then recomputed from the MERGED tier restricted to the
  keys the delta touched. Cascade boundaries and open chunks are thus
  always rebuilt from complete history, and the merge replaces complete
  rows with complete rows (the same contract the streaming path keeps
  per micro-batch). Untouched keys are never read or rewritten.
- Lineage: one row per (tier, spark partition) recording row counts and
  bucket ranges — enough to re-drive any partition.
- Metrics: per (source, tier): rows in, grid size, gaps filled by each
  policy step (observed / interpolated+modeled), bytes out.
"""

from __future__ import annotations

import os
import shutil
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..exceptions import EngineValueError
from ..operators import cascade, encode_tier, model_gapfill, regular_grid, rollup
from ..operators.impute import cascade_gapfill_encode_all, model_gapfill_encode
from .checkpoint import incremental_filter, read_high_water, write_high_water

TIER_CHAIN = ("1m", "1h", "1d")


@dataclass
class PipelineResult:
    tiers: dict[str, DataFrame]
    filled: dict[str, DataFrame]
    encoded: dict[str, DataFrame]
    metrics: DataFrame | None = None
    lineage: DataFrame | None = None
    points: int = 0
    wall_seconds: float = 0.0
    counters: dict[str, int] = field(default_factory=dict)
    snapshot_id: str | None = None
    #: the 1m rows actually re-aggregated from raw this run (on resume:
    #: only buckets at/past the pinned high-water marks)
    delta: DataFrame | None = None


def salted_rollup(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    tier: str,
    salt_buckets: int = 16,
    salt_col: str = "doc_id",
) -> DataFrame:
    """Two-phase rollup for skewed keys: partial agg on (key, bucket,
    hash(salt_col) % S), then final agg on (key, bucket). Results are
    identical to the direct rollup (count/sum/min/max compose); the salt
    only bounds per-reducer fan-in."""
    keys = list(key_cols)
    salted = df.withColumn("__salt", F.pmod(F.hash(F.col(salt_col)), F.lit(salt_buckets)))
    partial = rollup(salted, keys + ["__salt"], ts_col, value_col, tier)
    return (
        partial.groupBy(*keys, "bucket")
        .agg(
            F.sum("n_points").alias("n_points"),
            F.sum("sum_value").alias("sum_value"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
        )
        .withColumn("avg_value", F.col("sum_value") / F.col("n_points"))
    )


def _heal_dir(path: str) -> None:
    """Recover a directory from a crash mid-swap.

    ``_replace_dir`` renames the live dir aside (``__old``) before
    renaming the new one into place, so every crash window leaves a
    recoverable state: ``__old`` without ``path`` → the second rename
    never happened, restore the old dir; ``__old`` beside ``path`` →
    the swap completed, drop the leftover; a stray ``__merge_tmp`` is an
    unfinished staging write and is discarded either way."""
    old = path + "__old"
    if os.path.exists(old):
        if os.path.exists(path):
            shutil.rmtree(old)
        else:
            os.rename(old, path)
    tmp = path + "__merge_tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)


def _replace_dir(path: str, staged: str) -> None:
    """Atomically (to within one rename) swap ``staged`` into ``path``:
    no crash instant leaves the data unrecoverable (see ``_heal_dir``)."""
    old = path + "__old"
    if os.path.exists(old):
        shutil.rmtree(old)
    os.rename(path, old)
    os.rename(staged, path)
    shutil.rmtree(old)


def _merge_write(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    merge_keys: list[str],
    partition_by: list[str] | None = None,
    merge: bool = False,
) -> None:
    """Persist ``df``; with ``merge=True`` new rows REPLACE prior rows
    sharing the same merge key and untouched keys keep their history —
    the parquet stand-in for Iceberg MERGE / dynamic partition
    overwrite. A static overwrite on a resume run would truncate the
    whole directory and drop previously persisted data. The directory
    swap is rename-based with crash recovery (``_heal_dir``)."""

    def _write(d: DataFrame, p: str) -> None:
        w = d.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(p)

    _heal_dir(path)
    if merge and os.path.exists(path):
        prior = spark.read.parquet(path)
        keep = prior.join(df.select(*merge_keys).distinct(), on=merge_keys, how="left_anti")
        merged = keep.select(*df.columns).unionByName(df)
        tmp = path + "__merge_tmp"
        _write(merged, tmp)
        _replace_dir(path, tmp)
    else:
        _write(df, path)


def _new_snapshot_id() -> str:
    import uuid

    return str(uuid.uuid4())


# Persisted-warehouse layout contract version. v2: tier=<t> directories
# hold OBSERVED rows (gap-filled values live only in chunks/ and query
# results); v1 (pre round-3) persisted gap-filled rows in tier=<t>.
# Merging v2 observed deltas into a v1 directory would silently retain
# synthetic values as ground truth, so resumes refuse on version skew.
LAYOUT_VERSION = 2


def _check_layout(output_dir: str) -> None:
    """Stamp the layout version on fresh warehouses; refuse to write
    into one written under an older (or unversioned) layout contract."""
    marker = os.path.join(output_dir, "_layout_version")
    if os.path.exists(marker):
        with open(marker) as fh:
            found = int(fh.read().strip() or 0)
        if found != LAYOUT_VERSION:
            raise EngineValueError(
                f"warehouse at {output_dir!r} has layout v{found}, engine "
                f"expects v{LAYOUT_VERSION}: tier directories predate the "
                "observed-rows contract. Rebuild the warehouse from raw "
                "(a full, non-resume run into a fresh output_dir) instead "
                "of resuming into it."
            )
        return
    has_prior = os.path.exists(os.path.join(output_dir, "_snapshots")) or os.path.exists(
        os.path.join(output_dir, "tier=1m")
    )
    if has_prior:
        # refuse EVEN for non-resume runs: stamping v2 onto a pre-
        # versioning warehouse would bless its leftover v1 artifacts
        # (old chunk dirs, the prior snapshot chain) as v2, and the next
        # resume would merge against mixed state with no way to tell
        raise EngineValueError(
            f"warehouse at {output_dir!r} has no layout marker — it was "
            "written before layout versioning (pre-v2, gap-filled tier "
            "rows). Refusing to write into it; rebuild from raw into a "
            "fresh output_dir."
        )
    os.makedirs(output_dir, exist_ok=True)
    with open(marker, "w") as fh:
        fh.write(str(LAYOUT_VERSION))


def latest_snapshot_id(spark: SparkSession, output_dir: str) -> str | None:
    """Head of the snapshot chain, or None for a fresh warehouse."""
    path = os.path.join(output_dir, "_snapshots")
    if not os.path.exists(path):
        return None
    rows = spark.read.parquet(path).orderBy(F.desc("committed_at")).limit(1).collect()
    return rows[0]["snapshot_id"] if rows else None


def read_snapshot(spark: SparkSession, output_dir: str, snapshot_id: str):
    """One commit row by id (raises on unknown ids)."""
    rows = (
        read_snapshots(spark, output_dir)
        .where(F.col("snapshot_id") == F.lit(snapshot_id))
        .collect()
    )
    if not rows:
        raise ValueError(f"unknown snapshot_id {snapshot_id!r}")
    return rows[0]


def _commit_snapshot(
    spark: SparkSession,
    output_dir: str,
    counters: dict,
    resume: bool,
    snapshot_id: str,
    anchor_id: str | None,
) -> str:
    """Append one commit row to the warehouse's snapshot log — the
    parquet stand-in for Iceberg's snapshot chain: id, parent id, the
    anchor a resume pinned its high-water read to, the run's counters,
    and whether it was incremental. Read it back with
    :func:`read_snapshots`; the parent chain is the audit trail a resume
    or a re-rollup anchors to."""
    import json
    import time as _time

    path = os.path.join(output_dir, "_snapshots")
    parent = latest_snapshot_id(spark, output_dir)
    spark.createDataFrame(
        [
            (
                snapshot_id,
                parent,
                anchor_id,
                bool(resume),
                float(_time.time()),
                json.dumps(counters),
            )
        ],
        "snapshot_id string, parent_id string, anchor_id string, "
        "resume boolean, committed_at double, counters string",
    ).coalesce(1).write.mode("append").parquet(path)
    return snapshot_id


def read_snapshots(spark: SparkSession, output_dir: str) -> DataFrame:
    """The warehouse's commit log, newest first."""
    return spark.read.parquet(os.path.join(output_dir, "_snapshots")).orderBy(
        F.desc("committed_at")
    )


def _lineage(df: DataFrame, tier: str, key_cols: list[str]) -> DataFrame:
    return (
        df.withColumn("__pid", F.spark_partition_id())
        .groupBy("__pid")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("bucket").alias("min_bucket"),
            F.max("bucket").alias("max_bucket"),
            F.countDistinct(*key_cols).alias("n_keys"),
        )
        .select(
            F.lit(tier).alias("tier"),
            F.col("__pid").alias("partition_id"),
            "n_rows",
            "min_bucket",
            "max_bucket",
            "n_keys",
        )
    )


def run_pipeline(
    spark: SparkSession,
    raw: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    output_dir: str | None = None,
    lags: tuple[int, ...] = (1, 2, 3, -1, -2, -3),
    min_samples_train: int = 20,
    interpolate_gaps_less_than: int | None = 4,
    salt_buckets: int | None = None,
    salt_col: str | None = None,
    gapfill: bool = True,
    encode: bool = True,
    resume: bool = False,
    pin_snapshot: str | None = None,
    collect_metrics: bool = True,
    fused: bool = False,
    fused_from_raw: bool = False,
) -> PipelineResult:
    """Run the full tier pipeline; optionally persist + checkpoint.

    ``resume=True`` anchors the high-water read to a snapshot —
    ``pin_snapshot`` names one explicitly, otherwise the current head is
    pinned at start. A writer committing between the pin and this run's
    commit cannot change which rows this run reprocesses (the pinned
    per-snapshot marks are immutable)."""
    t0 = time.time()
    keys = list(key_cols)
    merging = bool(resume and output_dir)
    if output_dir:
        _check_layout(output_dir)
    if fused_from_raw and not (fused and gapfill and encode and not collect_metrics):
        # the in-kernel 1m aggregation only exists inside the fused fast
        # path; failing loudly beats silently benchmarking the wrong plan
        raise EngineValueError(
            "fused_from_raw requires fused=True, gapfill=True, encode=True, "
            "collect_metrics=False (it is ignored-with-docs only for "
            "warehouse/salted/resume runs)."
        )

    prior_hw = None
    anchor_id = None
    if merging:
        anchor_id = pin_snapshot if pin_snapshot is not None else latest_snapshot_id(spark, output_dir)
        prior_hw = read_high_water(spark, output_dir, snapshot_id=anchor_id)
        raw = incremental_filter(raw, prior_hw, keys, ts_col, tier="1m")
    snapshot_id = _new_snapshot_id() if output_dir else None

    if salt_buckets and salt_col:
        t1m_delta = salted_rollup(raw, keys, ts_col, value_col, "1m", salt_buckets, salt_col)
    else:
        t1m_delta = rollup(raw, keys, ts_col, value_col, "1m")
    if output_dir:
        # reused by the tier write, the affected-keys probe and the
        # high-water write; without a warehouse the fused path consumes
        # it exactly once, and caching would only add a full memory-store
        # materialization of the tier to the critical path
        t1m_delta = t1m_delta.cache()

    tier1m_path = os.path.join(output_dir, "tier=1m") if output_dir else None
    if output_dir:
        # observed rows are the persisted source of truth; written FIRST
        # so every derived product below can re-derive from the merged
        # tier (resume) and a crash mid-run is heal-by-rerun
        _merge_write(
            spark,
            t1m_delta,
            tier1m_path,
            merge_keys=keys + ["bucket"],
            partition_by=keys[:1],
            merge=merging,
        )
    if merging:
        # Derived products (cascades, fills, chunks) must never be built
        # from the delta alone: a delta-only 1h boundary row or open
        # chunk would REPLACE its complete prior version on merge. Read
        # back the merged tier, restricted to the keys the delta touched
        # — work scales with the affected keys' history, not the table.
        affected = t1m_delta.select(*keys).distinct()
        t1m = spark.read.parquet(tier1m_path).join(F.broadcast(affected), keys, "left_semi")
        t1m = t1m.cache()
    else:
        t1m = t1m_delta
        if not fused:
            t1m = t1m.cache()  # the staged path reads it for 1h + the fill

    if fused and gapfill and encode and not collect_metrics:
        # Fast path: the whole cascade + fill + encode collapses into ONE
        # job — scan → 1m rollup → per-series kernel that cascades,
        # fills, and encodes all three tiers → stats agg. Per-job
        # scheduling/UDF-worker fixed costs are paid once, not 6-9 times;
        # results match the staged path (pinned by tests).
        tiers = {"1m": t1m, "1h": cascade(t1m, keys, "1h"), "1d": None}
        tiers["1d"] = cascade(tiers["1h"], keys, "1d")
        if fused_from_raw and not output_dir and not (salt_buckets and salt_col):
            # (with a warehouse the rollup runs anyway for the persisted
            # observed tier, so from-raw would only add a second raw scan)
            # scan → ONE exchange → sort → kernel: the 1m aggregation
            # happens inside the per-series kernel, so the rollup's own
            # shuffle disappears. Only for bounded-volume keys (see
            # cascade_gapfill_encode_all); resume/salted runs need the
            # materialized tier and keep the two-exchange form.
            all_enc = cascade_gapfill_encode_all(
                raw,
                keys,
                lags=lags,
                min_samples_train=min_samples_train,
                interpolate_gaps_less_than=interpolate_gaps_less_than,
                raw_ts_col=ts_col,
                raw_value_col=value_col,
            )
        else:
            all_enc = cascade_gapfill_encode_all(
                t1m,
                keys,
                lags=lags,
                min_samples_train=min_samples_train,
                interpolate_gaps_less_than=interpolate_gaps_less_than,
            )
        # chunk rows are small (one per key × calendar period); caching
        # them means the returned encoded/tiers frames don't re-run the
        # whole scan→rollup→kernel chain if the caller consumes them
        all_enc = all_enc.cache()
        enc = {tier: all_enc.where(F.col("tier") == tier) for tier in TIER_CHAIN}
        if output_dir:
            _merge_write(
                spark,
                all_enc,
                os.path.join(output_dir, "chunks"),
                merge_keys=keys + ["tier", "chunk_start"],
                partition_by=["tier"],
                merge=merging,
            )
        stats = {
            r["tier"]: r
            for r in all_enc.groupBy("tier")
            .agg(F.sum(F.length("payload")).alias("bytes"), F.sum("n_points").alias("pts"))
            .collect()
        }
        counters = {}
        total_points = 0
        for tier in TIER_CHAIN:
            row = stats.get(tier)
            counters[f"tier_{tier}_bytes"] = int(row["bytes"]) if row else 0
            counters[f"tier_{tier}_points"] = int(row["pts"]) if row else 0
            total_points += counters[f"tier_{tier}_points"]
        if output_dir:
            write_high_water(t1m_delta, keys, output_dir, prior=prior_hw, snapshot_id=snapshot_id)
            _commit_snapshot(spark, output_dir, counters, resume, snapshot_id, anchor_id)
        return PipelineResult(
            tiers=tiers,
            filled={},
            encoded=enc,
            metrics=None,
            lineage=None,
            points=total_points,
            wall_seconds=time.time() - t0,
            counters=counters,
            snapshot_id=snapshot_id,
            delta=t1m_delta,
        )

    tiers: dict[str, DataFrame] = {"1m": t1m}
    tiers["1h"] = cascade(t1m, keys, "1h").cache()
    tiers["1d"] = cascade(tiers["1h"], keys, "1d").cache()

    filled: dict[str, DataFrame] = {}
    encoded: dict[str, DataFrame] = {}
    metrics_rows = []
    lineage_parts = []
    counters: dict[str, int] = {}
    total_points = 0

    for tier in TIER_CHAIN:
        tdf = tiers[tier]
        if collect_metrics:
            n_rows = tdf.count()
            counters[f"tier_{tier}_rows"] = n_rows
            total_points += n_rows
            lineage_parts.append(_lineage(tdf, tier, keys))
        else:
            n_rows = -1

        if output_dir and tier != "1m":  # 1m observed rows already persisted above
            _merge_write(
                spark,
                tdf,
                os.path.join(output_dir, f"tier={tier}"),
                merge_keys=keys + ["bucket"],
                partition_by=keys[:1],
                merge=merging,
            )

        if fused and gapfill and encode:
            # one shuffle + one Python stage per tier: fill and encode in
            # the same kernel (identical output to the two-stage path)
            t_enc = time.time()
            edf = model_gapfill_encode(
                tdf,
                keys,
                "bucket",
                "avg_value",
                tier,
                lags=lags,
                min_samples_train=min_samples_train,
                interpolate_gaps_less_than=interpolate_gaps_less_than,
            ).cache()
            encoded[tier] = edf
            filled[tier] = tdf
            stats = edf.agg(
                F.sum(F.length("payload")).alias("bytes"), F.sum("n_points").alias("pts")
            ).first()
            counters[f"tier_{tier}_bytes"] = int(stats["bytes"] or 0)
            counters[f"tier_{tier}_points"] = int(stats["pts"] or 0)
            counters[f"tier_{tier}_wall_ms"] = int((time.time() - t_enc) * 1000)
            if not collect_metrics:
                total_points += int(stats["pts"] or 0)
            metrics_rows.append(
                (tier, n_rows, int(stats["pts"] or 0), 0, int(stats["bytes"] or 0))
            )
            if output_dir:
                _merge_write(
                    spark,
                    encoded[tier],
                    os.path.join(output_dir, f"chunks_tier={tier}"),
                    merge_keys=keys + ["chunk_start"],
                    merge=merging,
                )
            continue

        if gapfill:
            fdf = model_gapfill(
                tdf,
                keys,
                "bucket",
                ["avg_value"],
                lags=lags,
                min_samples_train=min_samples_train,
                interpolate_gaps_less_than=interpolate_gaps_less_than,
            ).cache()
            filled[tier] = fdf
            if collect_metrics:
                n_filled = fdf.count()
                counters[f"tier_{tier}_grid_rows"] = n_filled
                counters[f"tier_{tier}_gaps_filled"] = n_filled - n_rows
        else:
            filled[tier] = tdf

        if encode:
            t_enc = time.time()
            edf = encode_tier(filled[tier], keys, "bucket", "avg_value", tier).cache()
            encoded[tier] = edf
            stats = edf.agg(
                F.sum(F.length("payload")).alias("bytes"), F.sum("n_points").alias("pts")
            ).first()
            counters[f"tier_{tier}_bytes"] = int(stats["bytes"] or 0)
            counters[f"tier_{tier}_points"] = int(stats["pts"] or 0)
            counters[f"tier_{tier}_wall_ms"] = int((time.time() - t_enc) * 1000)
            if not collect_metrics:
                total_points += int(stats["pts"] or 0)
            if output_dir:
                _merge_write(
                    spark,
                    encoded[tier],
                    os.path.join(output_dir, f"chunks_tier={tier}"),
                    merge_keys=keys + ["chunk_start"],
                    merge=merging,
                )

        metrics_rows.append(
            (
                tier,
                n_rows,
                counters.get(f"tier_{tier}_grid_rows", n_rows),
                counters.get(f"tier_{tier}_gaps_filled", 0),
                counters.get(f"tier_{tier}_bytes", 0),
            )
        )

    metrics = spark.createDataFrame(
        metrics_rows, ["tier", "rows_in", "grid_rows", "gaps_filled", "bytes_out"]
    )
    lineage = None
    if lineage_parts:
        lineage = lineage_parts[0]
        for extra in lineage_parts[1:]:
            lineage = lineage.unionByName(extra)

    if output_dir:
        metrics.coalesce(1).write.mode("overwrite").parquet(os.path.join(output_dir, "metrics"))
        if lineage is not None:
            lineage.coalesce(1).write.mode("overwrite").parquet(os.path.join(output_dir, "lineage"))
        write_high_water(t1m_delta, keys, output_dir, prior=prior_hw, snapshot_id=snapshot_id)
        _commit_snapshot(spark, output_dir, counters, resume, snapshot_id, anchor_id)

    return PipelineResult(
        tiers=tiers,
        filled=filled,
        encoded=encoded,
        metrics=metrics,
        lineage=lineage,
        points=total_points,
        wall_seconds=time.time() - t0,
        counters=counters,
        snapshot_id=snapshot_id,
        delta=t1m_delta,
    )


def apply_retention(spark: SparkSession, output_dir: str, tier: str, keep_after) -> int:
    """Retention: rewrite a tier keeping only buckets >= ``keep_after``.

    On Iceberg this is a metadata-only partition drop; on parquet we
    rewrite the tier directory (crash-safe rename swap). Returns rows
    retained."""
    path = os.path.join(output_dir, f"tier={tier}")
    _heal_dir(path)
    df = spark.read.parquet(path).where(F.col("bucket") >= F.lit(keep_after))
    kept = df.count()
    tmp = path + "__merge_tmp"
    df.write.mode("overwrite").parquet(tmp)
    _replace_dir(path, tmp)
    return kept


def scan_chunks(
    spark: SparkSession,
    output_dir: str,
    tier: str,
    key_cols: list[str],
    start=None,
    end=None,
    value_col: str = "avg_value",
) -> DataFrame:
    """Read a tier back from its Gorilla chunks for a time range,
    decoding ONLY the chunks whose calendar period intersects
    [start, end) — the chunk_start predicate prunes at the parquet scan
    (row-group min/max stats), so a narrow time window over years of
    history touches a handful of chunk rows per key. Bucket-level edges
    are trimmed after decode. Returns (keys…, bucket, value)."""
    from ..operators.encode import _CHUNK_UNIT, decode_tier

    df = spark.read.parquet(os.path.join(output_dir, f"chunks_tier={tier}"))
    if start is not None:
        # a chunk starting before `start` may still contain it: include
        # the whole boundary period, trim per-bucket after decode
        df = df.where(
            F.col("chunk_start") >= F.date_trunc(_CHUNK_UNIT[tier], F.lit(start))
        )
    if end is not None:
        df = df.where(F.col("chunk_start") < F.lit(end))
    out = decode_tier(df, list(key_cols), "bucket", value_col)
    if start is not None:
        out = out.where(F.col("bucket") >= F.lit(start))
    if end is not None:
        out = out.where(F.col("bucket") < F.lit(end))
    return out


def apply_chunk_retention(
    spark: SparkSession,
    output_dir: str,
    tier: str,
    key_cols: list[str],
    keep_after,
    value_col: str = "avg_value",
) -> int:
    """Retention over the ENCODED chunks of a tier.

    Chunks whose whole calendar period precedes ``keep_after`` drop by
    the ``chunk_start`` predicate alone — no payload is ever decoded
    (the Iceberg partition-drop analogue); only the single boundary
    chunk per key is decoded, filtered to ``bucket >= keep_after``, and
    re-encoded. Work is O(keys), not O(points). Returns chunks retained.
    """
    from ..operators.encode import _CHUNK_UNIT, decode_tier, encode_tier

    keys = list(key_cols)
    path = os.path.join(output_dir, f"chunks_tier={tier}")
    _heal_dir(path)
    df = spark.read.parquet(path)
    boundary = F.date_trunc(_CHUNK_UNIT[tier], F.lit(keep_after))
    whole = df.where(F.col("chunk_start") >= F.lit(keep_after))
    partial = df.where(
        (F.col("chunk_start") == boundary) & (F.col("chunk_start") < F.lit(keep_after))
    )
    reencoded = encode_tier(
        decode_tier(partial, keys, "bucket", value_col).where(
            F.col("bucket") >= F.lit(keep_after)
        ),
        keys,
        "bucket",
        value_col,
        tier,
    )
    retained = whole.unionByName(reencoded)
    tmp = path + "__merge_tmp"
    retained.write.mode("overwrite").parquet(tmp)
    _replace_dir(path, tmp)
    return spark.read.parquet(path).count()
