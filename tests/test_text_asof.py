"""Text operators, as-of join, and multimodal plumbing."""

import datetime

import pytest
from pyspark.sql import functions as F

from datafiller_spark.operators import (
    asof_join,
    fingerprint,
    lang_id,
    quality_score,
    tokenize_counts,
)
from datafiller_spark.operators.multimodal import extract_features, sample_frames


@pytest.fixture(scope="module")
def texts(spark):
    rows = [
        (1, "the cat and the dog sat in the house for tea"),
        (2, "le chat est dans la maison et les gens sont la"),
        (3, "xyzzy plugh 12345 !!!"),
        (4, ""),
        (5, "   "),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_token_count(texts):
    out = {r.doc_id: r.n_tok for r in tokenize_counts(texts).collect()}
    assert out[1] == 11
    assert out[3] == 4
    assert out[4] == 0 and out[5] == 0


def test_quality_score_ranges(texts):
    out = {r.doc_id: r for r in quality_score(texts).collect()}
    assert 0.0 <= out[1].q_score <= 1.0
    assert out[1].q_stopwords >= 4
    assert out[1].q_score > out[3].q_score  # stopwordy english beats garbage
    assert out[4].q_score == 0.0


def test_lang_id(texts):
    out = {r.doc_id: r.lang_guess for r in lang_id(texts).collect()}
    assert out[1] == "en"
    assert out[2] == "fr"
    assert out[3] == "und"


def test_fingerprint_normalizes(spark):
    df = spark.createDataFrame(
        [(1, "Hello   World"), (2, "hello world"), (3, " HELLO WORLD ")], ["doc_id", "text"]
    )
    fps = [r.fp for r in fingerprint(df).collect()]
    assert len(set(fps)) == 1


def test_asof_join_picks_latest_at_or_before(spark):
    left = spark.createDataFrame(
        [
            (1, "k", datetime.datetime(2024, 1, 5)),
            (2, "k", datetime.datetime(2024, 1, 10)),
            (3, "k", datetime.datetime(2024, 1, 1)),
            (4, "z", datetime.datetime(2024, 1, 5)),
        ],
        ["event_id", "key", "ts"],
    )
    right = spark.createDataFrame(
        [
            ("k", datetime.datetime(2024, 1, 2), 10.0),
            ("k", datetime.datetime(2024, 1, 5), 20.0),
            ("k", datetime.datetime(2024, 1, 8), 30.0),
        ],
        ["key", "rts", "payload"],
    )
    out = {r.event_id: r.payload for r in asof_join(left, right, ["key"], "ts", "rts", ["payload"]).collect()}
    assert out[1] == 20.0  # equal ts matches ("at or before")
    assert out[2] == 30.0
    assert out[3] is None  # no prior right row
    assert out[4] is None  # key with no right rows at all


def test_extract_features_shapes(spark):
    """Metadata (n_bytes) is always emitted; undecodable payloads get
    decode_ok=false with NULL features instead of failing the stage.
    Real-decode coverage lives in tests/test_media.py."""
    df = spark.createDataFrame(
        [("a1", "image", bytearray(b"imagebytes")), ("a2", "audio", bytearray(b"audiobytes" * 50))],
        ["asset_id", "kind", "payload"],
    )
    out = {r.asset_id: r for r in extract_features(df).collect()}
    assert out["a1"].n_bytes == 10
    assert out["a1"].decode_ok is False and out["a1"].features is None
    assert out["a2"].n_bytes == 500
    assert out["a2"].decode_ok is False and out["a2"].features is None


def test_sample_frames_only_video(spark):
    df = spark.createDataFrame(
        [("v1", "video", bytearray(b"x" * 5000)), ("i1", "image", bytearray(b"y" * 5000))],
        ["asset_id", "kind", "payload"],
    )
    out = sample_frames(df, every_n_bytes=1024, max_frames=3).collect()
    assert {r.asset_id for r in out} == {"v1"}
    assert sorted(r.offset for r in out) == [0, 1024, 2048]


def test_asof_join_duplicate_right_rows_atomic(spark):
    """Duplicate (key, right_ts) rows: payload columns must come from ONE
    right row (carried as a struct), with a deterministic winner."""
    import datetime

    from datafiller_spark.operators import asof_join

    t = datetime.datetime(2024, 1, 2)
    left = spark.createDataFrame([(1, "k", datetime.datetime(2024, 1, 3))],
                                 ["event_id", "key", "ts"])
    right = spark.createDataFrame(
        [("k", t, 1, 100.0), ("k", t, 2, 50.0)], ["key", "rts", "n", "p"]
    )
    for n_part in (1, 7):
        out = asof_join(
            left, right.repartition(n_part), ["key"], "ts", "rts", ["n", "p"]
        ).collect()[0]
        # atomic: (1,100) or (2,50), never (1,50)/(2,100); deterministic:
        # the struct ordering picks the greatest payload tuple
        assert (out.n, out.p) == (2, 50.0)
