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


def test_unique_bool_rows_wide_matches_npunique_fuzz():
    """The multi-word packed path (k > 64: packbits + lexsort) must
    agree with np.unique(axis=0) on the pattern SET and reconstruct the
    input through its inverse, across width boundaries (63/64/65/128)
    and degenerate shapes."""
    import numpy as np

    from datafiller_spark.kernels.optimask import unique_bool_rows

    rng = np.random.default_rng(5)
    shapes = [(200, 63), (200, 64), (200, 65), (123, 128), (50, 425),
              (1, 70), (2, 65), (7, 200), (100, 1)]
    for m, k in shapes:
        for density in (0.05, 0.5, 0.95):
            mat = rng.random((m, k)) < density
            patterns, inverse = unique_bool_rows(mat)
            ref_patterns, _ = np.unique(mat, axis=0, return_inverse=True)
            assert np.array_equal(patterns[inverse], mat), (m, k, density)
            assert len(patterns) == len(ref_patterns), (m, k, density)
            assert {p.tobytes() for p in patterns} == {
                p.tobytes() for p in ref_patterns
            }, (m, k, density)
