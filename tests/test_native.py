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


def _grid_laplacian_pattern(side):
    """5-point-stencil Laplacian pattern on a side x side grid (CSR)."""
    n = side * side
    rows, cols = [], []
    for i in range(side):
        for j in range(side):
            u = i * side + j
            rows.append(u); cols.append(u)
            for di, dj in ((0, 1), (1, 0), (0, -1), (-1, 0)):
                a, b = i + di, j + dj
                if 0 <= a < side and 0 <= b < side:
                    rows.append(u); cols.append(a * side + b)
    _, _, _, ocols, row_ptr = native.coo_to_csr_index(
        n, n, np.array(rows), np.array(cols)
    )
    return n, row_ptr, ocols


def _ldl_fill(n, row_ptr, cols, order=None):
    """|L| of the (permuted) pattern via the native symbolic analysis."""
    import scipy.sparse as sp
    from hiop_tpu.native import ldl as nldl

    lib = nldl._try_load()
    A = sp.csr_matrix(
        (np.ones(cols.size), cols, row_ptr), shape=(n, n)
    ).tocsc()
    if order is not None:
        A = A[order][:, order].tocsc()
    U = sp.triu(A, format="csc")
    Ap = np.ascontiguousarray(U.indptr, np.int64)
    Ai = np.ascontiguousarray(U.indices, np.int64)
    parent = np.empty(n, np.int64); Lnz = np.empty(n, np.int64)
    Lp = np.empty(n + 1, np.int64); flag = np.empty(n, np.int64)
    return lib.ldl_symbolic(n, Ap, Ai, parent, Lnz, Lp, flag)


def test_amd_is_permutation_and_reduces_fill():
    if not native.native_available():
        pytest.skip("native library unavailable")
    n, row_ptr, cols = _grid_laplacian_pattern(24)
    order = native.amd_ordering(n, row_ptr, cols)
    assert sorted(order.tolist()) == list(range(n))
    fill_nat = _ldl_fill(n, row_ptr, cols)
    fill_amd = _ldl_fill(n, row_ptr, cols, order)
    rcm = native.rcm_ordering(n, row_ptr, cols)
    fill_rcm = _ldl_fill(n, row_ptr, cols, rcm)
    # AMD must beat the natural ordering clearly and not lose badly to RCM
    assert fill_amd < 0.7 * fill_nat
    assert fill_amd <= fill_rcm


def test_amd_disconnected_and_dense_rows():
    if not native.native_available():
        pytest.skip("native library unavailable")
    # two components: a path and a star (dense row), plus an isolated node
    n = 12
    pairs = set()
    for i in range(4):  # path 0-1-2-3-4
        pairs.add((i, i + 1)); pairs.add((i + 1, i))
    for i in range(6, 11):  # star centered at 5
        pairs.add((5, i)); pairs.add((i, 5))
    rows, cols = zip(*sorted(pairs))
    _, _, _, ocols, row_ptr = native.coo_to_csr_index(
        n, n, np.array(rows), np.array(cols)
    )
    order = native.amd_ordering(n, row_ptr, ocols)
    assert sorted(order.tolist()) == list(range(n))
    inv = np.empty(n, np.int64)
    inv[order] = np.arange(n)
    # star center (degree 5) must come after most of its leaves (ties with
    # the final leaf are legitimate minimum-degree behavior)
    assert sum(inv[5] > inv[i] for i in range(6, 11)) >= 4


def test_native_ldl_amd_ordering_roundtrip_and_inertia():
    from hiop_tpu.native.ldl import NativeLdlFactorization, native_available

    if not native_available():
        pytest.skip("no C++ toolchain")
    A = _random_sym_indefinite(40, 11)
    f = NativeLdlFactorization(A, ordering="amd")
    b = np.arange(1.0, 41.0)
    x = f.solve(b)
    assert np.allclose(A @ x, b, atol=1e-8)
    w = np.linalg.eigvalsh(A.toarray())
    npos, nneg, _ = f.inertia()
    assert npos == int(np.sum(w > 0)) and nneg == int(np.sum(w < 0))


def test_native_build_succeeds_in_this_env():
    # g++ is baked into the image; the native path should be active
    assert native.native_available()


# ---------------------------------------------------------------- native LDL
def _random_sym_indefinite(n, seed, density=0.3):
    import scipy.sparse as sp

    rng = np.random.default_rng(seed)
    A = sp.random(n, n, density=density, random_state=rng, format="csc")
    A = (A + A.T) * 0.5
    A = A + sp.diags(rng.uniform(-3, 3, n))
    return A.tocsc()


def test_native_ldl_matches_scipy_and_eig_inertia():
    from hiop_tpu.native.ldl import NativeLdlFactorization, native_available

    if not native_available():
        pytest.skip("no C++ toolchain")
    for seed in (0, 1, 2):
        A = _random_sym_indefinite(30, seed)
        f = NativeLdlFactorization(A, ordering="none")
        b = np.random.default_rng(seed + 100).standard_normal(30)
        x = f.solve(b)
        assert np.allclose(A @ x, b, atol=1e-8)
        # multi-rhs
        B = np.random.default_rng(seed + 200).standard_normal((30, 3))
        X = f.solve(B)
        assert np.allclose(A @ X, B, atol=1e-8)
        w = np.linalg.eigvalsh(A.toarray())
        npos, nneg, nzero = f.inertia()
        assert nzero == 0
        assert npos == int(np.sum(w > 0))
        assert nneg == int(np.sum(w < 0))


def test_native_ldl_rcm_ordering_roundtrip():
    from hiop_tpu.native.ldl import NativeLdlFactorization, native_available

    if not native_available():
        pytest.skip("no C++ toolchain")
    A = _random_sym_indefinite(40, 7)
    f = NativeLdlFactorization(A, ordering="rcm")
    b = np.arange(1.0, 41.0)
    x = f.solve(b)
    assert np.allclose(A @ x, b, atol=1e-8)


def test_native_ldl_singular_raises():
    from hiop_tpu.native.ldl import (
        NativeLdlFactorization,
        SingularError,
        native_available,
    )

    if not native_available():
        pytest.skip("no C++ toolchain")
    import scipy.sparse as sp

    A = sp.diags([1.0, 2.0, 0.0, 3.0]).tocsc()
    with pytest.raises(SingularError):
        NativeLdlFactorization(A, ordering="none")


def test_sparse_ex1_with_native_ldl_inertia_acceptance():
    """End-to-end Newton solve through the native LDL backend with the
    reference's default inertia-correction acceptor."""
    from hiop_tpu.native.ldl import native_available

    if not native_available():
        pytest.skip("no C++ toolchain")
    import examples.sparse_ex1 as sx1

    r = sx1.solve(
        50, verbosity_level=0,
        linear_solver_sparse="native_ldl",
        fact_acceptor="inertia_correction",
    )
    assert r.status.is_success
    ref, tol = sx1.SELFCHECK[50]
    assert abs((r.obj - ref) / (1 + abs(ref))) <= tol
