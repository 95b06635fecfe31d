"""Gorilla XOR / delta-of-delta codec round-trip properties."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from datafiller_spark.kernels.codec import (
    decode_points,
    decode_timestamps,
    decode_values,
    encode_points,
    encode_timestamps,
    encode_values,
)


def _roundtrip_values(vals):
    arr = np.asarray(vals, dtype=np.float64)
    out = decode_values(encode_values(arr))
    np.testing.assert_array_equal(out.view(np.uint64), arr.view(np.uint64))


def _roundtrip_ts(ts):
    arr = np.asarray(ts, dtype=np.int64)
    out = decode_timestamps(encode_timestamps(arr))
    np.testing.assert_array_equal(out, arr)


def test_empty_and_singleton():
    _roundtrip_values([])
    _roundtrip_values([3.14])
    _roundtrip_ts([])
    _roundtrip_ts([1700000000])


def test_constant_series_compresses_well():
    vals = np.full(1000, 42.5)
    payload = encode_values(vals)
    assert len(payload) < 200  # ~1 bit per repeated value
    _roundtrip_values(vals)


def test_regular_timestamps_compress_well():
    ts = np.arange(0, 60_000, 60, dtype=np.int64)
    payload = encode_timestamps(ts)
    assert len(payload) < 200
    _roundtrip_ts(ts)


def test_nan_values_roundtrip():
    vals = np.array([1.0, np.nan, 2.0, np.nan, np.nan, 3.0])
    _roundtrip_values(vals)


def test_random_walk_roundtrip():
    rng = np.random.default_rng(0)
    vals = np.cumsum(rng.normal(size=5000))
    _roundtrip_values(vals)


def test_irregular_timestamps_roundtrip():
    rng = np.random.default_rng(1)
    ts = np.cumsum(rng.integers(1, 10_000_000, size=2000)).astype(np.int64)
    _roundtrip_ts(ts)


def test_negative_and_extreme_values():
    _roundtrip_values([-0.0, 0.0, np.inf, -np.inf, 1e-300, -1e300, 5e-324])
    _roundtrip_ts([-(2**62), 0, 2**62])


def test_points_payload_roundtrip():
    ts = np.arange(100, dtype=np.int64) * 60
    rng = np.random.default_rng(2)
    vals = rng.normal(size=100)
    vals[10:20] = np.nan
    rts, rvals = decode_points(encode_points(ts, vals))
    np.testing.assert_array_equal(rts, ts)
    np.testing.assert_array_equal(rvals.view(np.uint64), vals.view(np.uint64))


@settings(max_examples=50, deadline=None)
@given(st.lists(st.floats(allow_nan=True, allow_infinity=True, width=64), max_size=300))
def test_value_roundtrip_property(vals):
    _roundtrip_values(vals)


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-(2**40), max_value=2**40),
        max_size=300,
    )
)
def test_timestamp_roundtrip_property(deltas):
    ts = np.cumsum(np.asarray(deltas, dtype=np.int64)) if deltas else np.array([], dtype=np.int64)
    _roundtrip_ts(ts)


# ---------------------------------------------------------------------------
# property-based round-trip (hypothesis): arbitrary float64 bit patterns
# (NaN/inf/subnormals/-0.0) and any sorted int64-second timestamps must
# survive encode∘decode exactly — the docstring's contract, fuzzed.

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=120, deadline=None)
@given(
    data=st.lists(
        st.one_of(
            st.floats(allow_nan=True, allow_infinity=True, width=64),
            st.just(-0.0),
            st.just(5e-324),  # smallest subnormal
        ),
        min_size=1,
        max_size=300,
    ),
    deltas=st.lists(st.integers(min_value=0, max_value=10**10), min_size=0, max_size=299),
    t0=st.integers(min_value=-(2**40), max_value=2**40),
)
def test_codec_roundtrip_property(data, deltas, t0):
    from datafiller_spark.kernels.codec import decode_points, encode_points

    n = len(data)
    ts = np.empty(n, dtype=np.int64)
    ts[0] = t0
    for i in range(1, n):
        ts[i] = ts[i - 1] + (deltas[i - 1] if i - 1 < len(deltas) else 1) + 1  # strictly increasing
    vals = np.asarray(data, dtype=np.float64)

    dts, dvals = decode_points(encode_points(ts, vals))
    np.testing.assert_array_equal(dts, ts)
    # bit-pattern equality: NaN payloads and signed zeros included
    np.testing.assert_array_equal(dvals.view(np.uint64), vals.view(np.uint64))
