"""optimask behavioral tests (reference analogue: tests/test_optimask.py:6-57)."""

import numpy as np
import pytest

from datafiller_spark.kernels import optimask


def _run(matrix: np.ndarray, min_rows: int = 1):
    iy, ix = np.nonzero(np.isnan(matrix))
    m, n = matrix.shape
    return optimask(
        iy.astype(np.uint32),
        ix.astype(np.uint32),
        rows=np.arange(m, dtype=np.uint32),
        cols=np.arange(n, dtype=np.uint32),
        global_matrix_size=(m, n),
        min_rows=min_rows,
    )


def test_no_nans_keeps_everything():
    m = np.ones((5, 4))
    rows, cols = _run(m)
    np.testing.assert_array_equal(np.sort(rows), np.arange(5))
    np.testing.assert_array_equal(np.sort(cols), np.arange(4))


def test_result_is_nan_free():
    rng = np.random.default_rng(3)
    for trial in range(25):
        m = rng.normal(size=(30, 8))
        mask = rng.random(m.shape) < 0.15
        m[mask] = np.nan
        rows, cols = _run(m)
        if rows.size and cols.size:
            assert not np.isnan(m[np.ix_(rows, cols)]).any()


def test_single_bad_row_dropped():
    m = np.ones((6, 4))
    m[2, :] = np.nan
    rows, cols = _run(m)
    assert 2 not in rows
    assert len(rows) == 5 and len(cols) == 4


def test_single_bad_col_dropped():
    m = np.ones((6, 4))
    m[:, 1] = np.nan
    rows, cols = _run(m)
    assert 1 not in cols
    assert len(rows) == 6 and len(cols) == 3


def test_min_rows_preference():
    # Dropping the NaN column keeps all 10 rows; dropping rows would keep
    # more cells only if min_rows were ignored.
    m = np.ones((10, 3))
    m[:8, 0] = np.nan
    rows, cols = _run(m, min_rows=10)
    assert len(rows) == 10
    assert 0 not in cols


def test_all_nan_matrix_returns_empty():
    m = np.full((4, 4), np.nan)
    rows, cols = _run(m)
    assert rows.size == 0 and cols.size == 0
