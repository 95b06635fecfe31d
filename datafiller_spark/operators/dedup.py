"""Deduplication operators for web-scale training corpora.

Four tiers, cheap to expensive — all shuffle-on-key designs that scale
by adding executors (no driver-side state, no pairwise all-to-all except
within candidate buckets):

- exact:   hash-groupBy on a normalized-content fingerprint. One shuffle.
- n-gram Jaccard: word-shingle explode → self-join on shingle →
  intersection counts. Exact but quadratic within a shingle's posting
  list; at 100 TB this is the *verifier*, run only inside candidate
  buckets produced by MinHash-LSH.
- MinHash + LSH: k min-hashes per doc from shingle md5-low-32 hashes
  (affine hash family mod a Mersenne prime), banded into b buckets;
  only same-band collisions are verified. Linear shuffle volume; the
  scale path. Every hash (gram → int, band → bucket) is md5-based so
  the ENTIRE pipeline — signatures, banding, candidate generation,
  verification — has an exact cross-engine SQL mirror and runs under
  the DuckDB value oracle, not just a rows-only check.
- SimHash: 64-bit sign-aggregated token hash via a vectorized pandas
  UDF; near-dups = identical simhash (or small Hamming distance via
  band rotation).

Embedding near-dup lives in similarity.py (cosine threshold).
"""

from __future__ import annotations

import re
import sys

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from ..spread import spread_input
from .banding import banded_pairs

_MERSENNE = (1 << 31) - 1

# _simhash64 views uint64 hashes as bytes (unpackbits) and packs the
# majority bits back through a little-endian byte view; a big-endian
# host would compute silently different signatures. Fail loudly at
# import (executors re-import this module, so the guard runs there too).
if sys.byteorder != "little":  # pragma: no cover - no big-endian CI host
    raise ImportError(
        "datafiller_spark.operators.dedup requires a little-endian host: "
        "SimHash packs/unpacks signature bits through native byte views."
    )

# pair-expansion block: two int64 index arrays of this length ≈ 64 MB
# peak — the memory unit for streamed posting-list pair expansion
_PAIR_BLOCK = 1 << 22


def _triu_blocks(L: int, block: int):
    """Yield (i, j) index-array blocks covering the strict upper
    triangle of an L×L grid, each block holding ≤ ``block`` pairs
    (a single row wider than ``block`` is split by column range).
    Equivalent to ``np.triu_indices(L, k=1)`` streamed in bounded
    allocations."""
    r0 = 0
    while r0 < L - 1:
        row_pairs = L - 1 - r0
        if row_pairs > block:
            # one row alone exceeds the block: walk its columns
            for c0 in range(r0 + 1, L, block):
                j = np.arange(c0, min(c0 + block, L), dtype=np.int64)
                yield np.full(len(j), r0, dtype=np.int64), j
            r0 += 1
            continue
        # greedily take rows [r0, r1) while the pair total fits
        total, r1 = 0, r0
        while r1 < L - 1 and total + (L - 1 - r1) <= block:
            total += L - 1 - r1
            r1 += 1
        rows = np.arange(r0, r1, dtype=np.int64)
        counts = L - 1 - rows
        i = np.repeat(rows, counts)
        starts = np.cumsum(counts) - counts
        j = np.arange(total, dtype=np.int64) - np.repeat(starts, counts) + i + 1
        yield i, j
        r0 = r1


def exact_duplicates(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Groups of identical (whitespace/case-normalized) documents.

    Returns one row per duplicated document: (fp, group_size, doc_id,
    canonical_id) where canonical_id is the smallest member id.
    """
    normalized = F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "))
    # NULL text → NULL fp. The SQL contract form joins fps back to the
    # per-fp groups, and a NULL key never joins — but a window PARTITION
    # BY groups NULLs together and would emit all NULL documents as one
    # spurious duplicate group. fp is NULL iff text is NULL (md5 of a
    # non-null string is never null; trim/lower/regexp preserve
    # non-nullness), so drop NULL TEXT before hashing: the predicate
    # pushes to the parquet scan, whereas a post-hoc isnotnull(fp) gets
    # rewritten to isnotnull(md5(...)) below the respread exchange and
    # evaluates the whole regexp+md5 twice, once at scan width.
    fps = spread_input(
        df.select(id_col, text_col).where(F.col(text_col).isNotNull())
    ).select(F.col(id_col), F.md5(normalized).alias("fp"))
    # group stats via a window over fp instead of agg + join-back: ONE
    # exchange and ONE pass over the normalized text (the join form
    # re-ran the scan+regexp+md5 on both sides) — identical rows out
    w = Window.partitionBy("fp")
    return (
        fps.withColumn("group_size", F.count(F.lit(1)).over(w))
        .withColumn("canonical_id", F.min(id_col).over(w))
        .where(F.col("group_size") > 1)
        .select("fp", "group_size", F.col(id_col), "canonical_id")
    )


def _shingles_expr(text_col: str, n: int):
    """Distinct word n-grams per document (space-joined) as a pure SQL
    expression — the cross-engine CONTRACT the DuckDB oracles mirror.
    Documents with fewer than ``n`` words yield an empty array
    (sequence() would count downward on a negative span otherwise).
    The hot path computes the same values in ``_shingles`` (pinned
    equal by tests/test_dedup_similarity.py): this form's per-element
    ``transform`` lambdas run in Spark's interpreted evaluator and cost
    ~2.8 s per 5000-doc scan."""
    words = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    idx = F.sequence(F.lit(0), F.size(words) - n)
    grams = F.transform(idx, lambda i: F.array_join(F.slice(words, i + 1, n), " "))
    return F.when(F.size(words) >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


# Java regex \s is ASCII-only ([ \t\n\x0B\f\r]) and Spark's trim()
# strips only 0x20 — replicate BOTH exactly or unicode whitespace
# splits differently than the SQL contract form
_WS_ASCII = re.compile(r"[ \t\n\x0b\f\r]+")


def _shingle_list(t: str | None, n: int) -> list[str]:
    """Distinct word n-grams of one document, first-occurrence order —
    the Python twin of ``_shingles_expr`` (pinned equal by tests).
    Shared by the ``_shingles`` UDF and the broadcast-index stream so
    both compute the identical gram sets."""
    if t is None:
        # size(null) fails the >= n condition in the SQL form,
        # which then yields the empty array
        return []
    words = _WS_ASCII.split(t.strip(" ").lower())
    if len(words) < n:
        return []
    grams = (" ".join(words[i : i + n]) for i in range(len(words) - n + 1))
    return list(dict.fromkeys(grams))


def _shingles(text_col: str, n: int):
    """Distinct word n-grams in ONE Arrow stage — value-identical to
    ``_shingles_expr`` (first-occurrence order preserved, like
    ``array_distinct``)."""

    @F.pandas_udf("array<string>")
    def shingle(texts: pd.Series) -> pd.Series:
        return pd.Series([_shingle_list(t, n) for t in texts])

    # non-deterministic mark (optimization guide §4.4): without it the
    # optimizer pushes filters on the output column (size(grams) > 0,
    # join-key isnotnull) BELOW this UDF's projection and evaluates the
    # whole shingler twice — once below the respread exchange at scan
    # width. Values are pure; the mark only forbids duplication.
    return shingle.asNondeterministic()(F.col(text_col))


#: default budget for the broadcast posting index of the n-gram
#: Jaccard fast path, in total (doc, gram) entries. The per-worker
#: deserialized cost is dict overhead + gram-string keys + int64 id
#: arrays ≈ 200-300 bytes/entry worst case, i.e. ~2-2.5 GB per Python
#: worker at this cap — bounded on any executor sized for pandas work,
#: and EVERY worker of an executor pays it simultaneously during the
#: counting stage, so the cap must stay conservative (32 M entries
#: would be ~10 GB/worker: an OOM, not a fast path). sf1.0 of the
#: bench corpus is 2.6 M entries; corpora past the budget take the
#: streamed shuffle path, which is the 100 TB shape anyway.
_INDEX_MAX_ENTRIES = 8_000_000

_INT_ID_TYPES = ("tinyint", "smallint", "int", "bigint")


def _jaccard_via_broadcast_index(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    n: int,
    threshold: float,
    max_posting_len: int | None,
    max_entries: int,
    id_type: str,
) -> DataFrame | None:
    """Small/medium-corpus fast path for exact n-gram Jaccard: broadcast
    the posting index, count intersections per document with one
    ``np.unique`` — ZERO pair shuffle.

    The shuffle form expands every (doc_a, doc_b, shared-gram) occurrence
    into a row (O(Σ L²) rows — ~10⁸ at 50 k docs), Arrow-ships them to
    the JVM, partially aggregates, exchanges ~1 GB and aggregates again,
    all to find the handful of above-threshold pairs. When the inverted
    index fits a broadcast (≤ ``max_entries`` total (doc, gram) entries),
    the same counts fall out of a per-document vectorized pass:
    concatenate the (pre-sorted) posting lists of the doc's grams, keep
    ids > doc (each pair counted exactly once, from its smaller id), and
    ``np.unique(…, return_counts=True)`` IS the per-pair shared-gram
    count. Candidate work is identical to the shuffle form (same Σ L²
    elements touched) but at NumPy sort speed with nothing crossing the
    wire. The same hybrid-by-bound pattern as ``dup_clusters``' driver
    union-find; above the bound the shuffle path runs unchanged — that
    remains the 100 TB shape.

    Job shape (each job costs ~1.5 s of fixed dispatch on the bench
    box): (1) a JVM-only budget gate — Σ max(words − n + 1, 0) upper-
    bounds the distinct-gram entries without running any Python; (2) ONE
    shingle pass, collected, from which the driver inverts the posting
    index vectorized (factorize + lexsort) and broadcasts it; the
    returned plan re-shingles inline inside the counting kernel
    (``_shingle_list``), so the caller's action is one more job and the
    whole path runs the Python shingler exactly twice with no persist.

    Jaccard values are bit-identical to the shuffle form: the division
    is the same float64 op, and the final round(…, 6) + threshold filter
    stay JVM-side (Python applies only a provably-loose raw prefilter,
    ``j ≥ threshold − 1e-6``: a raw value below that cannot round up to
    ``threshold`` since round6 moves a value by ≤ 5e-7).

    Returns None (caller falls back) when the gate exceeds the budget.
    Integer id columns only — candidate ordering relies on numpy/JVM
    agreeing on id order, which holds for ints but not for non-ASCII
    strings (numpy compares code points, Spark compares UTF-8 bytes).
    """
    spark = docs.sparkSession
    # JVM-only gate: distinct grams per doc ≤ max(n_words − n + 1, 0)
    words = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    upper = docs.agg(
        F.sum(F.greatest(F.size(words) - (n - 1), F.lit(0))).alias("e")
    ).first()["e"] or 0
    if upper == 0 or upper > max_entries:
        return None
    shingled = docs.select(
        F.col(id_col).alias("id"), _shingles(text_col, n).alias("grams")
    ).where(F.size("grams") > 0)
    pdf = shingled.toPandas()
    ids = pdf["id"].to_numpy().astype(np.int64)
    gram_arrays = pdf["grams"].to_numpy()
    lens = np.fromiter((len(g) for g in gram_arrays), dtype=np.int64, count=len(pdf))
    # driver-side posting inversion, vectorized. Docs are processed in
    # ASCENDING id order, so after a STABLE argsort by gram code each
    # posting slice is already id-sorted — a single-key stable sort
    # instead of a two-key lexsort.
    doc_order = np.argsort(ids, kind="stable")
    ids = ids[doc_order]
    lens = lens[doc_order]
    gram_arrays = gram_arrays[doc_order]
    flat_ids = np.repeat(ids, lens)
    if len(gram_arrays):
        flat_grams = np.concatenate([np.asarray(g, dtype=object) for g in gram_arrays])
    else:
        flat_grams = np.array([], dtype=object)
    codes, gram_names = pd.factorize(flat_grams)
    order = np.argsort(codes, kind="stable")
    sorted_flat_ids = flat_ids[order]
    counts = np.bincount(codes, minlength=len(gram_names))
    starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
    cap = max_posting_len if max_posting_len is not None else np.iinfo(np.int64).max
    index = {
        gram_names[c]: sorted_flat_ids[starts[c] : starts[c] + counts[c]]
        for c in np.nonzero((counts >= 2) & (counts <= cap))[0]
    }
    sorted_ids = ids
    sorted_n = lens
    bc = spark.sparkContext.broadcast((index, sorted_ids, sorted_n))
    loose = threshold - 1e-6

    def _count(batches):
        idx, sid, sn = bc.value
        for pdf in batches:
            out_a, out_b, out_i, out_u = [], [], [], []
            for a, text in zip(pdf[id_col], pdf[text_col]):
                grams = _shingle_list(text, n)
                na = len(grams)
                if not na:
                    continue
                a = int(a)
                lists = []
                for g in grams:
                    arr = idx.get(g)
                    if arr is not None:
                        # pre-sorted posting list: slice to ids > a so the
                        # pair (a, b) is counted once, from its smaller id
                        tail = arr[np.searchsorted(arr, a, side="right") :]
                        if len(tail):
                            lists.append(tail)
                if not lists:
                    continue
                cand = np.concatenate(lists)
                b, inter = np.unique(cand, return_counts=True)
                nb = sn[np.searchsorted(sid, b)]
                union = na + nb - inter
                keep = inter >= loose * union  # loose raw prefilter only
                if not keep.any():
                    continue
                out_a.append(np.full(int(keep.sum()), a, dtype=np.int64))
                out_b.append(b[keep])
                out_i.append(inter[keep].astype(np.int64))
                out_u.append(union[keep].astype(np.int64))
            if out_a:
                yield pd.DataFrame(
                    {
                        "id_a": np.concatenate(out_a),
                        "id_b": np.concatenate(out_b),
                        "inter": np.concatenate(out_i),
                        "union_size": np.concatenate(out_u),
                    }
                )

    raw = docs.mapInPandas(
        _count,
        schema=f"id_a {id_type}, id_b {id_type}, inter bigint, union_size bigint",
    )
    # round + threshold stay JVM-side: Spark's HALF_UP round is the
    # cross-engine contract (numpy rounds half-to-even)
    return (
        raw.withColumn("jaccard", F.round(F.col("inter") / F.col("union_size"), 6))
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "inter", "union_size", "jaccard")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    max_posting_len: int | None = None,
    pair_block: int = _PAIR_BLOCK,
    broadcast_index_max_entries: int | None = _INDEX_MAX_ENTRIES,
) -> DataFrame:
    """Exact Jaccard-similar pairs over word n-gram shingle sets.

    Output: (id_a, id_b, inter, union_size, jaccard) with id_a < id_b.

    Quadratic in posting-list density — this is the VERIFIER; the scale
    path is ``minhash_lsh_pairs``. ``max_posting_len`` caps the pair
    work: shingles shared by more than that many documents are dropped
    before pairing (a boilerplate shingle carries almost no Jaccard
    signal, but its posting list alone costs O(len²) pairs — at a cap
    of 10 000 that is ≤ 5·10⁷ pairs per shingle; with no cap a shingle
    shared by 10⁵ docs is ~5·10⁹ pairs of pure work). With a cap the
    counts are a lower bound on the true intersection, so reported
    jaccard values can only shrink — pairs never appear that the exact
    form would reject. The DEFAULT is ``None`` (fully exact Jaccard —
    library callers get textbook semantics unless they opt into the
    approximation); production pipelines over open-web corpora should
    pass a finite cap (the entry queries use 10 000, mirrored in their
    DuckDB oracle). Peak task memory stays bounded either way because
    pair expansion is streamed in ``pair_block``-sized blocks (default
    ``_PAIR_BLOCK`` ≈ 64 MB of index arrays); with ``None`` only total
    CPU work is unbounded.

    ``broadcast_index_max_entries`` bounds the small-corpus broadcast-
    index fast path (see ``_jaccard_via_broadcast_index``); its budget
    gate runs one eager JVM-only scan of the text column at call time.
    Callers at known over-budget scale should pass ``0``/``None``,
    which skips the gate entirely and keeps the call fully lazy on the
    streamed shuffle path.
    """
    docs = spread_input(df.select(id_col, text_col))
    id_type = df.schema[id_col].dataType.simpleString()
    if broadcast_index_max_entries and id_type in _INT_ID_TYPES:
        fast = _jaccard_via_broadcast_index(
            docs,
            id_col,
            text_col,
            n,
            threshold,
            max_posting_len,
            broadcast_index_max_entries,
            id_type,
        )
        if fast is not None:
            return fast
    shingled = docs.select(
        F.col(id_col).alias("id"), _shingles(text_col, n).alias("grams")
    ).where(F.size("grams") > 0)
    sizes = shingled.select("id", F.size("grams").alias("n_grams"))
    posting = shingled.select("id", F.explode("grams").alias("gram"))
    # group each gram's posting list and expand its pairs in ONE Arrow
    # kernel (np.triu_indices over the sorted ids): the same pair
    # multiset the posting⋈posting SQL self-join produced, minus one
    # full shuffle of the join build side and its JVM row-at-a-time
    # pair materialization. A doc's shingles are DISTINCT, so ids are
    # unique within a group and id_a < id_b falls out of the sort.
    # The posting cap becomes a plain size filter (the window-count
    # form cost an extra shuffle).
    members = posting.groupBy("gram").agg(F.sort_array(F.collect_list("id")).alias("ids"))
    members = members.where(F.size("ids") >= 2)
    if max_posting_len is not None:
        members = members.where(F.size("ids") <= max_posting_len)
    # pair-expansion work is O(L²) per posting list while the list ROWS
    # are tiny: AQE's byte-based coalescing would shrink this exchange
    # to a handful of tasks and serialize the CPU-heavy expansion, so
    # re-spread the lists round-robin over the cluster (4 waves/core
    # smooths the L² skew between lists)
    members = members.select("ids").repartition(
        max(df.sparkSession.sparkContext.defaultParallelism, 1) * 4
    )

    def _expand(batches):
        # Streamed pair expansion: pairs are emitted in ≤ pair_block
        # blocks, so one hot posting list can never materialize its full
        # O(L²) index set in a single allocation (a 10⁵-doc shingle is
        # ~5·10⁹ pairs ≈ 80 GB if expanded at once). Small lists batch
        # together; a list whose pair count exceeds the block is walked
        # by row range (and a single row wider than the block by column
        # range), so peak memory is ~2 · pair_block ids regardless of L.
        buf_a, buf_b, buffered = [], [], 0
        for pdf in batches:
            for ids in pdf["ids"]:
                arr = np.asarray(ids)
                L = len(arr)
                n_pairs = L * (L - 1) // 2
                if n_pairs <= pair_block:
                    i, j = np.triu_indices(L, k=1)
                    buf_a.append(arr[i])
                    buf_b.append(arr[j])
                    buffered += n_pairs
                    if buffered >= pair_block:
                        yield pd.DataFrame(
                            {"id_a": np.concatenate(buf_a), "id_b": np.concatenate(buf_b)}
                        )
                        buf_a, buf_b, buffered = [], [], 0
                    continue
                if buffered:
                    yield pd.DataFrame(
                        {"id_a": np.concatenate(buf_a), "id_b": np.concatenate(buf_b)}
                    )
                    buf_a, buf_b, buffered = [], [], 0
                for bi, bj in _triu_blocks(L, pair_block):
                    yield pd.DataFrame({"id_a": arr[bi], "id_b": arr[bj]})
        if buffered:
            yield pd.DataFrame(
                {"id_a": np.concatenate(buf_a), "id_b": np.concatenate(buf_b)}
            )

    inter = (
        members.select("ids")
        .mapInPandas(_expand, schema=f"id_a {id_type}, id_b {id_type}")
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_grams").alias("na"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_grams").alias("nb"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("union_size", F.col("na") + F.col("nb") - F.col("inter"))
        .withColumn("jaccard", F.round(F.col("inter") / F.col("union_size"), 6))
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "inter", "union_size", "jaccard")
    )


def _minhash_params(k: int, seed: int = 11) -> list[tuple[int, int]]:
    rng = np.random.RandomState(seed)
    return [
        (int(rng.randint(1, _MERSENNE)), int(rng.randint(0, _MERSENNE)))
        for _ in range(k)
    ]


def _gram_hash(g):
    """Deterministic 31-bit gram hash: low 32 md5 bits mod the Mersenne
    prime. md5 (not crc32/xxhash) so DuckDB computes the identical
    value: ``('0x' || substr(md5(g), 1, 8))::BIGINT % p``. This SQL
    expression form is the cross-engine CONTRACT; the hot path computes
    the same value in ``_signature_udf`` (pinned equal by
    tests/test_dedup_similarity.py)."""
    return F.conv(F.substring(F.md5(F.encode(g, "utf-8")), 1, 8), 16, 10).cast("long") % _MERSENNE


def _signature_udf(params: list[tuple[int, int]]):
    """grams → MinHash signature in ONE Arrow stage.

    The pure-SQL form (``transform(grams, md5→conv)`` + 32
    ``array_min(transform(...))`` passes) runs in Spark's *interpreted*
    higher-order-function evaluator — md5/conv per gram plus
    k·|grams| lambda evals cost whole seconds per 10^5 grams (measured
    3.3 s for 5000 docs × 52 grams). Here hashlib computes each gram
    md5 once (C speed) and the k affine mins are one vectorized
    ``(k, |grams|)`` NumPy pass in exact int64 (h, a < 2^31 so h·a+b <
    2^62 never overflows). Values are identical to the SQL form —
    that expression remains the DuckDB oracle contract."""
    import hashlib

    ab = np.asarray(params, dtype=np.int64)  # (k, 2)

    @F.pandas_udf("array<long>")
    def signature(grams: pd.Series) -> pd.Series:
        out = []
        a = ab[:, 0][:, None]
        b = ab[:, 1][:, None]
        for gs in grams:
            h = np.fromiter(
                (
                    int.from_bytes(hashlib.md5(g.encode()).digest()[:4], "big")
                    % _MERSENNE
                    for g in gs
                ),
                dtype=np.int64,
                count=len(gs),
            )
            out.append((h[None, :] * a + b) % _MERSENNE if len(gs) else None)
        return pd.Series([o.min(axis=1) if o is not None else None for o in out])

    # §4.4 non-deterministic mark: stop the optimizer duplicating the
    # signature computation below exchanges (values are pure)
    return signature.asNondeterministic()


def _shingled_signatures(
    df: DataFrame, id_col: str, text_col: str, n: int, num_hashes: int
) -> DataFrame:
    """One frame carrying BOTH the shingle set and the MinHash signature
    per doc: (id, grams, signature).

    The signature is computed per row (vectorized UDF, see
    ``_signature_udf``) instead of explode → groupBy: the whole MinHash
    stage costs ZERO shuffles, and the shingle arrays are produced
    exactly once for signatures and verification alike.
    """
    params = _minhash_params(num_hashes)
    shingled = spread_input(df.select(id_col, text_col)).select(
        F.col(id_col).alias("id"), _shingles(text_col, n).alias("grams")
    ).where(F.size("grams") > 0)
    return shingled.select(
        "id", "grams", _signature_udf(params)(F.col("grams")).alias("signature")
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 32,
) -> DataFrame:
    """Per-doc MinHash signature: array of k min over affine hashes of
    shingle crc32s — shuffle-free (per-row array math, no explode)."""
    return _shingled_signatures(df, id_col, text_col, n, num_hashes).select(
        "id", "signature"
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 16,
    threshold: float = 0.5,
    max_bucket_size: int = 200,
    materialize: bool = True,
) -> DataFrame:
    """Candidate pairs via banded LSH, verified with exact Jaccard.

    Output matches ``ngram_jaccard_pairs`` (a subset of it: candidates
    the bands caught). At scale this replaces the quadratic self-join.

    CONTRACT NOTE — this operator is EAGER by default: the verified
    pairs are computed and cached at call time (``materialize=True``),
    because the shingle+signature frame is persisted across the banding
    and verification sides and must be released before returning.
    ``materialize=False`` returns the fully lazy plan with NO hidden
    cache at all: the shingle+signature stage is then recomputed by
    each side of the plan (one extra scan) — lazy composition and
    zero retained executor storage, at the price of duplicate shingle
    work. Pick eager for interactive/pipeline use, lazy when a caller
    composes further pruning that must push into the pair build.

    ``max_bucket_size`` guards the band self-join against degenerate hot
    buckets (boilerplate-heavy corpora hash thousands of docs into one
    (band, band_hash) bucket, which is quadratic *within* the bucket):
    larger buckets are skipped. Genuinely similar pairs in a skipped
    bucket are still caught by any of their other ``bands - 1`` bands.
    """
    rows_per_band = num_hashes // bands
    # shingles + signatures in ONE frame; eager mode caches it for the
    # banding and verification sides and drops it before returning (the
    # result below is materialized first), so repeated calls can't
    # accumulate large shingle blocks in storage. Lazy mode skips the
    # persist entirely — both sides recompute, nothing is retained.
    sig_grams = _shingled_signatures(df, id_col, text_col, n, num_hashes)
    if materialize:
        sig_grams = sig_grams.persist()
    # band bucket = md5 of the comma-joined signature slice (engine- and
    # SQL-computable, unlike F.hash's murmur)
    banded = sig_grams.select(
        "id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.md5(
                    F.concat_ws(
                        ",",
                        F.transform(
                            F.slice("signature", b * rows_per_band + 1, rows_per_band),
                            lambda x: x.cast("string"),
                        ),
                    )
                ),
            )
        ).alias("band", "band_hash"),
    )
    cand = banded_pairs(
        banded,
        ["band", "band_hash"],
        "id",
        df.schema[id_col].dataType.simpleString(),
        max_bucket_size,
    )
    # Verify candidates locally (array_intersect on the two shingle sets)
    # instead of a global posting-list self-join: per-candidate cost, so
    # verification scales with |candidates|, not |corpus|².
    ga = sig_grams.select(F.col("id").alias("id_a"), F.col("grams").alias("__ga"))
    gb = sig_grams.select(F.col("id").alias("id_b"), F.col("grams").alias("__gb"))
    inter = F.size(F.array_intersect("__ga", "__gb"))
    union_size = F.size("__ga") + F.size("__gb") - inter
    out = (
        cand.join(ga, "id_a")
        .join(gb, "id_b")
        .select(
            "id_a",
            "id_b",
            inter.alias("inter"),
            union_size.alias("union_size"),
            F.round(inter / union_size, 6).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )
    if not materialize:
        return out
    # materialize the (small) verified-pair result while the shingle
    # cache is hot, then release it — the pair rows stay cached, the
    # shingle+signature blocks (the big allocation) do not
    out = out.persist()
    out.count()
    sig_grams.unpersist()
    return out


def dup_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
    driver_threshold: int = 1_000_000,
) -> DataFrame:
    """Connected components over near-duplicate PAIRS → one canonical id
    per duplicate cluster (the "keep one copy per cluster" step every
    dedup pipeline ends with; pairs alone under-delete when dups chain
    A~B~C without A~C).

    Hybrid by edge count — the standard shape for this op:

    - ≤ ``driver_threshold`` pairs: union-find on the driver. Verified
      near-dup pair sets are tiny relative to the corpus, and the
      distributed loop's ~4 jobs/round of pure scheduling overhead
      dwarf milliseconds of union-find (measured 20.7 s → sub-second
      on the sf0.1 query's few hundred edges). The edges arrive via
      Arrow (``toPandas``), two plain columns — at the 1M default
      that's ~16 MB for long ids (~2×8 B/edge; strings cost their
      bytes + ~50 B object overhead each), plus the union-find dict at
      ~100 B/node. Multi-GB py4j Row lists are not possible on this
      path by default.
    - above it: min-label propagation with pointer jumping — each round
      every node takes the min of its neighbors' labels and then
      shortcuts through its label's own label, so labels race down long
      paths exponentially: O(log diameter) rounds, two shuffles each.
      Each round is ``localCheckpoint``-ed so the plan doesn't grow.

    Both paths are deterministic (canonical id = cluster minimum) and
    produce identical output (cross-path equality is pinned in
    tests/test_curation.py; the driver query stays under the DuckDB
    recursive-CTE value oracle either way).

    Output: (doc_id, canonical_id, cluster_size) for every node that
    appears in ``pairs``.
    """
    collected = None
    if driver_threshold:
        # ONE materialization decides the path AND feeds it: limit+1
        # rows prove over/under threshold without a separate count job
        # (which would recompute the whole upstream pairs pipeline).
        # Arrow-collected into two plain columns — never py4j Rows.
        pdf = pairs.select(id_a, id_b).limit(driver_threshold + 1).toPandas()
        if len(pdf) <= driver_threshold:
            collected = (pdf[id_a].to_numpy(), pdf[id_b].to_numpy())
        del pdf
    if collected is not None:
        spark = pairs.sparkSession
        parent: dict = {}

        def find(x):
            root = x
            while parent[root] != root:
                root = parent[root]
            while parent[x] != root:  # path compression
                parent[x], x = root, parent[x]
            return root

        for a, b in zip(*collected):
            a, b = a.item() if hasattr(a, "item") else a, b.item() if hasattr(b, "item") else b
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            ra, rb = find(a), find(b)
            if ra != rb:
                # union by MIN id so the root IS the canonical id
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo
        roots = {x: find(x) for x in parent}
        sizes: dict = {}
        for root in roots.values():
            sizes[root] = sizes.get(root, 0) + 1
        rows = [(x, roots[x], sizes[roots[x]]) for x in roots]
        id_type = pairs.schema[id_a].dataType.simpleString()
        return spark.createDataFrame(
            rows, f"doc_id {id_type}, canonical_id {id_type}, cluster_size long"
        )

    edges = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    edges = (
        edges.unionByName(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .persist()
    )
    labels = edges.select(F.col("src").alias("id")).distinct().withColumn("label", F.col("id"))
    labels = labels.localCheckpoint()
    for _ in range(max_iter):
        prop = (
            edges.join(labels, edges["dst"] == labels["id"])
            .groupBy("src")
            .agg(F.min("label").alias("nbr_label"))
        )
        cand = labels.join(prop, labels["id"] == prop["src"], "left").select(
            labels["id"],
            F.least(labels["label"], F.coalesce(prop["nbr_label"], labels["label"])).alias(
                "label"
            ),
        )
        # pointer jump: adopt my label's own (possibly smaller) label
        mapping = cand.select(F.col("id").alias("__mid"), F.col("label").alias("__mlabel"))
        new_labels = (
            cand.join(mapping, cand["label"] == mapping["__mid"], "left")
            .select(
                cand["id"],
                F.least(cand["label"], F.coalesce("__mlabel", cand["label"])).alias("label"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .where(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    else:
        edges.unpersist()
        raise RuntimeError(f"dup_clusters did not converge in {max_iter} rounds")
    edges.unpersist()
    sizes = labels.groupBy("label").agg(F.count("*").alias("cluster_size"))
    return labels.join(sizes, "label").select(
        F.col("id").alias("doc_id"),
        F.col("label").alias("canonical_id"),
        "cluster_size",
    )


@F.pandas_udf(LongType())
def _simhash64_impl(tokens: pd.Series) -> pd.Series:
    """64-bit SimHash over int token-id arrays — ONE vectorized pass for
    the whole Arrow batch: all token ids are avalanched flat, their hash
    bits unpacked to a (total_tokens, 64) matrix, and per-document bit
    votes come from ``np.add.reduceat`` over the document offsets. The
    per-document loop form this replaces paid ~30 µs of small-array
    overhead per doc. Values are identical: majority vote
    ``Σ(2b−1) > 0  ⇔  2·ones > n_tokens``, same splitmix64 constants
    the DuckDB oracle mirrors in exact mod-2^64 SQL."""
    n = len(tokens)
    out = np.zeros(n, dtype=np.int64)
    arrs = tokens.to_numpy()
    lens = np.fromiter(
        (0 if a is None else len(a) for a in arrs), dtype=np.int64, count=n
    )
    nz = np.nonzero(lens)[0]
    if not len(nz):
        return pd.Series(out)
    h = np.concatenate([np.asarray(arrs[i], dtype=np.uint64) for i in nz])
    # splitmix64-style avalanche for bit diffusion
    h = h * np.uint64(0x9E3779B97F4A7C15)
    h ^= h >> np.uint64(30)
    h *= np.uint64(0xBF58476D1CE4E5B9)
    h ^= h >> np.uint64(27)
    h *= np.uint64(0x94D049BB133111EB)
    h ^= h >> np.uint64(31)
    bits = np.unpackbits(h.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little")
    doc_lens = lens[nz]
    starts = np.zeros(len(nz), dtype=np.int64)
    np.cumsum(doc_lens[:-1], out=starts[1:])
    # int64 ACCUMULATOR over the uint8 bit matrix: materializing the
    # bits as int64 first would stream 8x the bytes (512 MB per 1M
    # tokens) through this box's starved memory bus
    ones = np.add.reduceat(bits, starts, axis=0, dtype=np.int64)  # (docs, 64)
    majority = (2 * ones) > doc_lens[:, None]
    sims = np.packbits(majority, axis=1, bitorder="little").view(np.int64).ravel()
    out[nz] = sims
    return pd.Series(out)


# §4.4 non-deterministic mark: joins on the simhash column push an
# isnotnull filter below the projection and re-evaluate the whole UDF
# at scan width (measured: the duplicated evaluation dominated
# q_simhash's wall). Values are pure; the mark only blocks duplication.
_simhash64 = _simhash64_impl.asNondeterministic()


def simhash_duplicates(
    df: DataFrame, id_col: str = "doc_id", tokens_col: str = "tokens"
) -> DataFrame:
    """Documents sharing an identical 64-bit SimHash (near-dup at the
    token-multiset level). Output: (simhash, group_size, doc_id,
    canonical_id)."""
    sigs = spread_input(df.select(id_col, tokens_col)).select(
        F.col(id_col), _simhash64(F.col(tokens_col)).alias("simhash")
    )
    # window over simhash instead of agg + join-back: one exchange, one
    # SimHash evaluation (the join form re-tokenized and re-hashed the
    # corpus on both sides) — identical rows out
    w = Window.partitionBy("simhash")
    return (
        sigs.withColumn("group_size", F.count(F.lit(1)).over(w))
        .withColumn("canonical_id", F.min(id_col).over(w))
        .where(F.col("group_size") > 1)
        .select("simhash", "group_size", F.col(id_col), "canonical_id")
    )


def simhash_near_dupes(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    max_hamming: int = 3,
    max_bucket_size: int = 200,
) -> DataFrame:
    """Pairs within ``max_hamming`` bits of each other's 64-bit SimHash.

    Pigeonhole banding: split the signature into ``max_hamming + 1``
    bands — two signatures within ``max_hamming`` bits MUST agree on at
    least one whole band, so candidates come from a band-equality
    self-join (one shuffle on (band, value), never all-pairs) and the
    exact Hamming distance verifies each candidate via ``bit_count``
    (JVM-side). Hot band buckets are capped like MinHash-LSH.

    Output: (id_a, id_b, hamming) with id_a < id_b.
    """
    n_bands = max_hamming + 1
    width = 64 // n_bands
    sigs = spread_input(df.select(id_col, tokens_col)).select(
        F.col(id_col).alias("id"), _simhash64(F.col(tokens_col)).alias("simhash")
    )
    band_vals = F.array(
        *[
            F.shiftrightunsigned(F.col("simhash"), b * width).bitwiseAND(
                F.lit((1 << width) - 1 if (b + 1) * width <= 64 else -1)
            )
            for b in range(n_bands)
        ]
    )
    banded = sigs.select("id", "simhash", F.posexplode(band_vals).alias("band", "val"))
    # one-shuffle candidate generation (operators/banding.py); the
    # signature rides through the bucket as the payload, so Hamming
    # verification needs no join back to the signature table
    cand = banded_pairs(
        banded,
        ["band", "val"],
        "id",
        df.schema[id_col].dataType.simpleString(),
        max_bucket_size,
        payload_col="simhash",
        payload_type="long",
    )
    hamming = F.bit_count(F.col("payload_a").bitwiseXOR(F.col("payload_b")))
    return (
        cand.select("id_a", "id_b", hamming.alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
    )
