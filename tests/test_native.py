"""Native C++ sparse-utility tests (and their numpy fallbacks)."""

import numpy as np
import pytest

from hiop_tpu import native


def _roundtrip_case(m, n, rows, cols, vals):
    perm, merge_to, out_rows, out_cols, row_ptr = native.coo_to_csr_index(
        m, n, rows, cols
    )
    v = np.zeros(out_rows.size)
    np.add.at(v, merge_to, np.asarray(vals)[perm])
    dense = np.zeros((m, n))
    dense[out_rows, out_cols] = v
    ref = np.zeros((m, n))
    np.add.at(ref, (rows, cols), vals)
    assert np.allclose(dense, ref)
    assert row_ptr[-1] == out_rows.size
    # rows sorted, cols sorted within rows
    assert np.all(np.diff(out_rows) >= 0)


def test_coo_to_csr_with_duplicates():
    rows = np.array([2, 0, 1, 0, 2, 2])
    cols = np.array([1, 0, 2, 0, 1, 0])
    vals = np.array([1.0, 2.0, 3.0, 4.0, 5.0, 6.0])
    _roundtrip_case(3, 3, rows, cols, vals)


def test_coo_to_csr_random():
    rng = np.random.default_rng(0)
    m, n, nnz = 50, 40, 300
    rows = rng.integers(0, m, nnz)
    cols = rng.integers(0, n, nnz)
    vals = rng.standard_normal(nnz)
    _roundtrip_case(m, n, rows, cols, vals)


def test_coo_invalid_row_raises():
    if not native.native_available():
        pytest.skip("native library unavailable")
    with pytest.raises(ValueError):
        native.coo_to_csr_index(2, 2, np.array([5]), np.array([0]))


def test_csr_transpose():
    rng = np.random.default_rng(1)
    m, n, nnz = 20, 30, 100
    rows = rng.integers(0, m, nnz)
    cols = rng.integers(0, n, nnz)
    vals = rng.standard_normal(nnz)
    perm, merge_to, orows, ocols, row_ptr = native.coo_to_csr_index(m, n, rows, cols)
    v = np.zeros(orows.size)
    np.add.at(v, merge_to, vals[perm])
    t_row_ptr, t_cols, tperm = native.csr_transpose_index(m, n, row_ptr, ocols)
    A = np.zeros((m, n))
    A[orows, ocols] = v
    At = np.zeros((n, m))
    t_rows = np.repeat(np.arange(n), np.diff(t_row_ptr))
    At[t_rows, t_cols] = v[tperm]
    assert np.allclose(At, A.T)


def test_rcm_is_permutation_and_reduces_bandwidth():
    # banded-ish graph scrambled by a random permutation
    n = 60
    rng = np.random.default_rng(2)
    p = rng.permutation(n)
    pairs = set()
    for i in range(n - 1):
        a, b = p[i], p[i + 1]
        pairs.add((a, b))
        pairs.add((b, a))
    for i in range(n):
        pairs.add((i, i))
    rows, cols = zip(*sorted(pairs))
    _, _, orows, ocols, row_ptr = native.coo_to_csr_index(
        n, n, np.array(rows), np.array(cols)
    )
    order = native.rcm_ordering(n, row_ptr, ocols)
    assert sorted(order.tolist()) == list(range(n))
    inv = np.empty(n, np.int64)
    inv[order] = np.arange(n)
    bw_orig = max(abs(r - c) for r, c in pairs)
    bw_rcm = max(abs(int(inv[r]) - int(inv[c])) for r, c in pairs)
    assert bw_rcm <= bw_orig


def test_native_build_succeeds_in_this_env():
    # g++ is baked into the image; the native path should be active
    assert native.native_available()
