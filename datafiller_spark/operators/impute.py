"""Model-based gap-fill: the reference imputation kernel under Spark.

``model_gapfill`` runs the full TimeSeriesImputer recipe (grid
regularization → small-gap linear interpolation → lag/calendar ridge
imputation → mean fallback) per series group via ``applyInPandas`` —
one Arrow batch per key group, NumPy math inside, no per-row Python.

Determinism at scale: rows are sorted by bucket *inside* the kernel, so
the result is independent of Spark partitioning and Arrow batch order;
all order-sensitive float math happens on that sorted frame. This is
the property that keeps tiers reproducible when the same job runs at N
and 4N executors.
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from ..exceptions import EngineError
from ..kernels.timeseries import TimeSeriesImputer


def model_gapfill(
    df: DataFrame,
    key_cols: Sequence[str],
    bucket_col: str,
    value_cols: Sequence[str],
    lags: Sequence[int] = (1, 2, 3, -1, -2, -3),
    min_samples_train: int = 20,
    interpolate_gaps_less_than: int | None = None,
    n_nearest_features: int | float | None = None,
    add_time_features: bool = True,
    use_gram: bool | None = None,
    regressor_factory=None,
) -> DataFrame:
    """Gap-fill ``value_cols`` per key group with the ridge kernel (or a
    custom regressor built per group by ``regressor_factory`` — e.g. the
    ExtremeLearningMachine; the factory must be picklable).

    Input rows may be sparse (missing buckets) — the kernel reinserts
    the full regular grid, so the output generally has MORE rows than
    the input: one per grid bucket. Output schema: key cols + bucket +
    value cols (double).
    """
    keys = list(key_cols)
    values = list(value_cols)

    out_schema = StructType()
    for k in keys:
        out_schema.add(df.schema[k])
    out_schema.add(df.schema[bucket_col])
    for v in values:
        out_schema.add(v, "double")

    lags_list = [int(x) for x in lags]

    def fill_group(pdf: pd.DataFrame) -> pd.DataFrame:
        key_values = {k: pdf[k].iloc[0] for k in keys}
        frame = (
            pdf[[bucket_col] + values]
            .sort_values(bucket_col)
            .set_index(bucket_col)
            .astype("float64")
        )
        imputer = TimeSeriesImputer(
            lags=lags_list,
            regressor=regressor_factory() if regressor_factory is not None else None,
            min_samples_train=min_samples_train,
            interpolate_gaps_less_than=interpolate_gaps_less_than,
            add_time_features=add_time_features,
            use_gram=use_gram,
        )
        try:
            filled = imputer(frame, n_nearest_features=n_nearest_features)
        except EngineError:
            # A group too short for frequency inference (or a single row)
            # passes through unfilled rather than failing the stage.
            # Only the engine's own validation errors are expected here;
            # anything else is a genuine kernel bug and must propagate.
            filled = frame
        out = filled.reset_index().rename(columns={"index": bucket_col})
        for k, v in key_values.items():
            out[k] = v
        return out[[*keys, bucket_col, *values]]

    return df.select(*keys, bucket_col, *values).groupBy(*keys).applyInPandas(
        fill_group, schema=out_schema
    )


def gapfill_metrics(
    df: DataFrame,
    key_cols: Sequence[str],
    bucket_col: str,
    value_col: str,
    lags: Sequence[int] = (1, 2, 3, -1, -2, -3),
    min_samples_train: int = 20,
    interpolate_gaps_less_than: int | None = 4,
) -> DataFrame:
    """Per-series gap-fill metrics rows, one per key group:
    (keys..., n_observed, n_grid, gaps_by_interp, gaps_by_model,
    gaps_by_fallback, gaps_unfilled) — the lineage/metrics contract's
    3-step-policy attribution (reference policy: docs/algorithm.rst:22-32).
    """
    keys = list(key_cols)
    out_schema = StructType()
    for k in keys:
        out_schema.add(df.schema[k])
    for c in ("n_observed", "n_grid", "gaps_by_interp", "gaps_by_model",
              "gaps_by_fallback", "gaps_unfilled"):
        out_schema.add(c, "long")

    lags_list = [int(x) for x in lags]

    def stats_group(pdf: pd.DataFrame) -> pd.DataFrame:
        key_values = {k: [pdf[k].iloc[0]] for k in keys}
        frame = (
            pdf[[bucket_col, value_col]]
            .sort_values(bucket_col)
            .set_index(bucket_col)
            .astype("float64")
        )
        imputer = TimeSeriesImputer(
            lags=lags_list,
            min_samples_train=min_samples_train,
            interpolate_gaps_less_than=interpolate_gaps_less_than,
        )
        try:
            filled = imputer(frame)
            counts = imputer.fill_counts_
            n_grid = len(filled)
            unfilled = int(filled.isna().sum().sum())
        except EngineError:
            counts = {"interp": 0, "model": 0, "fallback": 0}
            n_grid = len(frame)
            unfilled = int(frame.isna().sum().sum())
        return pd.DataFrame(
            {
                **key_values,
                "n_observed": [len(pdf)],
                "n_grid": [n_grid],
                "gaps_by_interp": [counts["interp"]],
                "gaps_by_model": [counts["model"]],
                "gaps_by_fallback": [counts["fallback"]],
                "gaps_unfilled": [unfilled],
            }
        )

    return df.select(*keys, bucket_col, value_col).groupBy(*keys).applyInPandas(
        stats_group, schema=out_schema
    )


def _chunk_slices(idx, ts_seconds, period_code):
    """(chunk_start, start, end) slices of a SORTED DatetimeIndex grouped
    by calendar period, in one O(n) pass. Day periods are pure int64
    arithmetic (the hot 1m-tier case: the per-chunk ``period == start``
    mask scans cost ~4 ms per 5760-bucket series); month/year periods
    (coarse tiers, few rows) go through ``to_period`` once."""
    import numpy as np
    import pandas as pd

    n = len(ts_seconds)
    if not n:
        return
    if period_code == "D":
        trunc = ts_seconds - ts_seconds % 86400
        cut = np.flatnonzero(np.diff(trunc)) + 1
        starts = np.concatenate(([0], cut))
        ends = np.concatenate((cut, [n]))
        for s, e in zip(starts, ends):
            yield pd.Timestamp(int(trunc[s]), unit="s"), int(s), int(e)
    else:
        period = idx.to_period(period_code).start_time
        tr = period.view("int64")
        cut = np.flatnonzero(np.diff(tr)) + 1
        starts = np.concatenate(([0], cut))
        ends = np.concatenate((cut, [n]))
        for s, e in zip(starts, ends):
            yield period[s], int(s), int(e)


def model_gapfill_encode(
    df: DataFrame,
    key_cols: Sequence[str],
    bucket_col: str,
    value_col: str,
    tier: str,
    lags: Sequence[int] = (1, 2, 3, -1, -2, -3),
    min_samples_train: int = 20,
    interpolate_gaps_less_than: int | None = None,
    use_gram: bool | None = None,
) -> DataFrame:
    """Fused gap-fill + Gorilla encode: ONE shuffle and ONE Python stage
    per tier instead of two. The kernel fills the series, then chunks it
    by the tier's calendar period and emits one binary payload per chunk
    — identical output to ``encode_tier(model_gapfill(...))``.
    """
    from ..kernels.codec import encode_points
    import numpy as np

    keys = list(key_cols)
    chunk_unit = {"1m": "D", "1h": "M", "1d": "Y"}[tier]  # pandas period codes

    out_schema = StructType()
    for k in keys:
        out_schema.add(df.schema[k])
    out_schema.add("chunk_start", "timestamp")
    out_schema.add("tier", "string")
    out_schema.add("n_points", "integer")
    out_schema.add("payload", "binary")

    lags_list = [int(x) for x in lags]

    def fill_encode_group(pdf: pd.DataFrame) -> pd.DataFrame:
        key_values = {k: pdf[k].iloc[0] for k in keys}
        frame = (
            pdf[[bucket_col, value_col]]
            .sort_values(bucket_col)
            .set_index(bucket_col)
            .astype("float64")
        )
        imputer = TimeSeriesImputer(
            lags=lags_list,
            min_samples_train=min_samples_train,
            interpolate_gaps_less_than=interpolate_gaps_less_than,
            use_gram=use_gram,
        )
        try:
            filled = imputer(frame)
        except EngineError:
            filled = frame
        idx = filled.index
        vals = filled[value_col].to_numpy()
        ts = idx.view("int64") // 10**9
        rows = []
        for chunk_start, s, e in _chunk_slices(idx, ts, chunk_unit):
            payload = encode_points(ts[s:e].astype(np.int64), vals[s:e])
            row = dict(key_values)
            row["chunk_start"] = chunk_start
            row["tier"] = tier
            row["n_points"] = int(e - s)
            row["payload"] = payload
            rows.append(row)
        return pd.DataFrame(rows, columns=[*keys, "chunk_start", "tier", "n_points", "payload"])

    return df.select(*keys, bucket_col, value_col).groupBy(*keys).applyInPandas(
        fill_encode_group, schema=out_schema
    )


def cascade_gapfill_encode_all(
    df_1m: DataFrame,
    key_cols: Sequence[str],
    lags: Sequence[int] = (1, 2, 3, -1, -2, -3),
    min_samples_train: int = 20,
    interpolate_gaps_less_than: int | None = None,
    use_gram: bool | None = None,
    raw_ts_col: str | None = None,
    raw_value_col: str | None = None,
) -> DataFrame:
    """One shuffle for the whole per-series tier chain.

    Input: observed 1m tier rows (bucket, n_points, sum_value) per key.
    The kernel — one call per series — cascades the observed aggregates
    to 1h and 1d (sum/count compose in time order, deterministically),
    gap-fills each tier's grid with the ridge kernel, and Gorilla-encodes
    each tier's chunks. Output: chunk rows for ALL tiers.

    Versus running the cascade in Spark + one applyInPandas per tier,
    this trades three shuffles and three Python stages for one of each;
    at 10^12 scale it also means the 1m tier is shuffled exactly once.

    **from-raw mode** (``raw_ts_col``/``raw_value_col`` set): the input
    is the RAW event table and the 1m aggregation itself happens inside
    the kernel (minute-truncate + ``reduceat``), removing the separate
    rollup shuffle — the whole chain is scan → ONE exchange → sort →
    kernel. Bit-exact vs the groupBy rollup for integral value columns
    (the north-rule table's ``n_tok:int32``; integer sums are
    order-free — float values would pick up last-ulp differences from
    summation order and should keep the two-exchange path). Choose by
    key volume: from-raw co-locates ALL raw rows of a key in one task,
    so it is the right plan when per-key raw volume is bounded (bench
    shape: ≤6×10^5 rows/key); the two-exchange path's map-side partial
    aggregation is the right plan when single keys carry unbounded raw
    volume (10^12-sequence hot sources) — the same bounded-vs-skewed
    split that picks direct vs salted rollup.

    Execution shape: ``repartition(keys) → sortWithinPartitions(keys,
    bucket) → mapInPandas`` rather than ``groupBy().applyInPandas``.
    Same single hash shuffle, but Arrow moves PARTITION-sized batches
    instead of one tiny frame per series — the per-group fixed cost
    (Arrow batch framing + pandas construction, ~8 ms) otherwise
    dominates wall and serializes scaling when groups are thousands of
    small series (measured: the bare kernel scales 0.98 at 1→4 procs
    while the applyInPandas stage scaled 0.56). Groups are split with
    NumPy key-change scans; a series spanning two Arrow batches is
    carried over, so results are identical to the per-group form
    (pinned by tests/test_impute_spark.py cross-path equality).
    """
    import numpy as np

    from ..kernels.codec import encode_points

    keys = list(key_cols)
    chunk_code = {"1m": "D", "1h": "M", "1d": "Y"}
    freq_code = {"1m": "min", "1h": "h", "1d": "D"}

    out_schema = StructType()
    for k in keys:
        out_schema.add(df_1m.schema[k])
    out_schema.add("chunk_start", "timestamp")
    out_schema.add("tier", "string")
    out_schema.add("n_points", "integer")
    out_schema.add("payload", "binary")
    out_cols = [*keys, "chunk_start", "tier", "n_points", "payload"]

    lags_list = [int(x) for x in lags]

    def _cascade_sums(ts_sec: np.ndarray, npts: np.ndarray, sv: np.ndarray, step: int):
        """Re-aggregate SORTED observed buckets to a coarser step in one
        ``np.add.reduceat`` pass — the output equals pandas
        ``resample().agg(sum)`` filtered to non-empty buckets (both sum
        sequentially in time order; only observed buckets are emitted)."""
        trunc = ts_sec - ts_sec % step
        starts = np.concatenate(([0], np.flatnonzero(np.diff(trunc)) + 1))
        return (
            trunc[starts],
            np.add.reduceat(npts, starts),
            np.add.reduceat(sv, starts),
        )

    def tier_chain_rows(key_values: dict, ts_sec, npts, sv, rows: list) -> None:
        """Cascade + fill + encode ONE series (sorted arrays); appends
        chunk rows."""

        step_sec = {"1m": 60, "1h": 3600, "1d": 86400}

        def emit(tier: str, t: np.ndarray, n: np.ndarray, s_: np.ndarray) -> None:
            avg = s_.astype("float64") / n
            # the full grid directly from epoch-second arithmetic —
            # same rows as DatetimeIndex(...).asfreq(...) (UTC tiers are
            # fixed-width), minus its get_indexer/reindex machinery;
            # date_range carries freq, so the imputer's regularize pass
            # short-circuits too
            step = step_sec[tier]
            pos = (t - t[0]) // step
            vals = np.full(int(pos[-1]) + 1, np.nan)
            vals[pos] = avg
            index = pd.date_range(
                pd.Timestamp(int(t[0]), unit="s"), periods=len(vals), freq=freq_code[tier]
            )
            frame = pd.DataFrame({"avg_value": vals}, index=index)
            imputer = TimeSeriesImputer(
                lags=lags_list,
                min_samples_train=min_samples_train,
                interpolate_gaps_less_than=interpolate_gaps_less_than,
                use_gram=use_gram,
            )
            try:
                filled = imputer(frame)
            except EngineError:
                filled = frame
            idx = filled.index
            ts = idx.view("int64") // 10**9
            vals = filled["avg_value"].to_numpy()
            for chunk_start, s, e in _chunk_slices(idx, ts, chunk_code[tier]):
                row = dict(key_values)
                row["chunk_start"] = chunk_start
                row["tier"] = tier
                row["n_points"] = int(e - s)
                row["payload"] = encode_points(ts[s:e].astype(np.int64), vals[s:e])
                rows.append(row)

        emit("1m", ts_sec, npts, sv)
        t1h, n1h, s1h = _cascade_sums(ts_sec, npts, sv, 3600)
        emit("1h", t1h, n1h, s1h)
        t1d, n1d, s1d = _cascade_sums(t1h, n1h, s1h, 86400)
        emit("1d", t1d, n1d, s1d)

    from_raw = raw_ts_col is not None

    def emit_chunk(pdf: pd.DataFrame) -> pd.DataFrame:
        """Run every complete series in ``pdf`` (sorted by keys, time)."""
        rows: list = []
        # group boundaries via key-change scan — no pandas groupby machinery
        change = np.zeros(len(pdf), dtype=bool)
        change[0] = True
        for k in keys:
            kv = pdf[k].to_numpy()
            change[1:] |= kv[1:] != kv[:-1]
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], len(pdf))
        if from_raw:
            # 1m aggregation inside the kernel: minute-truncate + reduceat
            # over the (key, ts)-sorted rows — the rollup without its
            # shuffle. Counts/sums equal the groupBy form exactly for
            # integral values (order-free sums).
            ts_raw = pdf[raw_ts_col].to_numpy().astype("datetime64[s]").astype(np.int64)
            trunc = ts_raw - ts_raw % 60
            vraw = pdf[raw_value_col].to_numpy()
            if np.issubdtype(vraw.dtype, np.integer):
                # Spark's sum() promotes to int64; reduceat would keep
                # int32 and silently WRAP on >2^31 per-bucket sums
                vraw = vraw.astype(np.int64)
            for s, e in zip(starts, ends):
                key_values = {k: pdf[k].iloc[s] for k in keys}
                t = trunc[s:e]
                bstarts = np.concatenate(([0], np.flatnonzero(np.diff(t)) + 1))
                ts_sec = t[bstarts]
                npts = np.diff(np.append(bstarts, e - s))
                sv = np.add.reduceat(vraw[s:e], bstarts)
                tier_chain_rows(key_values, ts_sec, npts, sv, rows)
            return pd.DataFrame(rows, columns=out_cols)
        ts_sec = pdf["bucket"].to_numpy().astype("datetime64[s]").astype(np.int64)
        npts = pdf["n_points"].to_numpy()
        sv = pdf["sum_value"].to_numpy()
        for s, e in zip(starts, ends):
            key_values = {k: pdf[k].iloc[s] for k in keys}
            tier_chain_rows(key_values, ts_sec[s:e], npts[s:e], sv[s:e], rows)
        return pd.DataFrame(rows, columns=out_cols)

    def process_partition(batches):
        carry: pd.DataFrame | None = None
        for pdf in batches:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
            if not len(pdf):
                continue
            # hold back the trailing series — it may continue in the
            # next Arrow batch of this partition
            tail = np.ones(len(pdf), dtype=bool)
            for k in keys:
                kv = pdf[k].to_numpy()
                tail &= kv == kv[-1]
            # rows are key-sorted, so the last group is a contiguous tail
            first_of_last = len(pdf) - int(tail[::-1].argmin()) if not tail.all() else 0
            carry = pdf.iloc[first_of_last:]
            head = pdf.iloc[:first_of_last]
            if len(head):
                yield emit_chunk(head)
        if carry is not None and len(carry):
            yield emit_chunk(carry)

    if from_raw:
        # count(value)/sum(value) ignore nulls in the groupBy rollup;
        # match by dropping null-value rows before the kernel (the one
        # divergence: an all-null bucket yields a null-avg tier row
        # there, no row here — both gap-fill identically downstream)
        df_1m = df_1m.where(F.col(raw_value_col).isNotNull())
        cols = [*keys, raw_ts_col, raw_value_col]
        sort_cols = [*keys, raw_ts_col]
    else:
        cols = [*keys, "bucket", "n_points", "sum_value"]
        sort_cols = [*keys, "bucket"]
    return (
        df_1m.select(*cols)
        .repartition(*keys)
        .sortWithinPartitions(*sort_cols)
        .mapInPandas(process_partition, schema=out_schema)
    )
