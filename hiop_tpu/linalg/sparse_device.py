"""Device-resident fixed-pattern sparse LDL^T refactorization.

The ReSolve pattern (/root/reference/src/LinAlg/ReSolve/
RefactorizationSolver.hpp:74): SYMBOLIC analysis once on the host — the
native up-looking LDL (native/ldl.cpp) supplies the elimination tree and
the exact L pattern — then every NUMERIC (re)factorization and triangular
solve runs as one jitted XLA program of level-scheduled gather/scatter
ops, so the IPM's regularization retries (new delta values, same pattern)
never round-trip to the host.  The reference realizes this with
cusolverRf/cusolverGLU numeric refactorization + GPU triangular solves;
the TPU realization builds a static "op program" from the pattern:

- columns are grouped into LEVELS by elimination-tree height (leaves
  first).  Column j's left-looking updates come only from descendants of
  j, which live in strictly earlier levels, so all columns of one level
  factorize concurrently;
- each level is two vectorized steps: (1) scatter-add all update products
  L[i,k] * d_k * L[j,k] into the target columns (XLA scatter handles
  duplicate targets), (2) finalize the level's pivots d_j and scale the
  level's columns (unique-index scatter);
- triangular solves use the same level structure (forward: leaves->root,
  backward: root->leaves, exploiting that col j's below-diagonal rows are
  exactly ancestors of j in the etree).

No numerical pivoting — like the reference's cusolverRf and MAGMA-nopiv
paths, a tiny pivot fails the factorization (``ok`` False) and the IPM
ladder retries with larger regularization; inertia comes from the pivot
signs (Sylvester), the MA57 contract (hiopLinSolverSymSparseMA57.hpp:109).
"""

from __future__ import annotations

import ctypes
from typing import NamedTuple, Optional

import numpy as np


class DeviceLdlFactors(NamedTuple):
    Lx: "object"       # (lnz,) scaled unit-lower factor values (device)
    d: "object"        # (n,) pivots (device)
    n_neg: "object"    # int32 count of negative pivots
    ok: "object"       # bool: finite factorization
    n_clamped: "object"  # int32: pivots statically clamped to +/-tau — when
    #                      nonzero the inertia count is unreliable and the
    #                      factors approximate A + E (certify solves by IR),
    #                      the SuperLU_DIST static-pivoting discipline


class DeviceSparseLDL:
    """Symbolic-once / device-numeric-per-retry sparse LDL^T.

    Parameters
    ----------
    rows, cols : assembler COO coordinates (duplicates allowed — summed),
        FULL symmetric matrix (both triangles or mixed; mirrored entries
        collapse onto the lower triangle).
    n : dimension.
    ordering : 'amd' (default — fill-reducing; safe without pivoting
        because the IPM's regularized KKT systems are quasi-definite,
        hence strongly factorizable under ANY symmetric permutation
        [Vanderbei]), 'rcm', or 'none' (natural order).
    max_ops : guard on the scalar-update count (the flop count of the
        factorization); patterns denser than this raise ValueError so
        callers fall back to a host backend instead of building a
        multi-GB index program.
    max_lnz : guard on the symbolic fill.
    """

    def __init__(self, rows, cols, n: int, ordering: str = "amd",
                 max_ops: int = 30_000_000, max_lnz: int = 30_000_000,
                 perm=None, weights=None):
        rows = np.asarray(rows, np.int64)
        cols = np.asarray(cols, np.int64)
        self.n = int(n)
        n = self.n
        if weights is not None:
            weights = np.asarray(weights, np.float64)
            assert weights.shape == rows.shape

        # ---- fill-reducing permutation -----------------------------------
        self._perm = None
        if perm is not None:
            perm = np.asarray(perm, np.int64)
            rank = np.empty(n, np.int64)
            rank[perm] = np.arange(n)
            rows = rank[rows]
            cols = rank[cols]
            self._perm = perm
            self._rank = rank
        elif ordering not in ("none", None):
            import scipy.sparse as _sp
            from hiop_tpu.native import amd_ordering, rcm_ordering

            S = _sp.coo_matrix(
                (np.ones(rows.size), (rows, cols)), shape=(n, n)
            ).tocsr()
            fn = amd_ordering if ordering == "amd" else rcm_ordering
            perm = np.asarray(
                fn(n, np.asarray(S.indptr, np.int64),
                   np.asarray(S.indices, np.int64)),
                np.int64,
            )
            rank = np.empty(n, np.int64)
            rank[perm] = np.arange(n)
            rows = rank[rows]
            cols = rank[cols]
            self._perm = perm
            self._rank = rank

        # ---- collapse the assembler COO onto the lower triangle ----------
        # orientation-aware symmetrization: an off-diagonal entry whose
        # OPPOSITE orientation is also listed (assemblers emit Jc and Jc^T,
        # H upper + strict-lower mirror, ...) contributes with weight 1/2 —
        # the mirrored pair sums back to the full value — while a
        # lone-orientation entry (e.g. the condensed path's lower-only
        # J^T D J product triplets) contributes with weight 1.  True
        # duplicates at one (i, j) still sum.  This stays correct under
        # the fill-reducing permutation, which can flip an entry's triangle.
        # weights may also be CALLER-declared (overlapping patterns — e.g.
        # the condensed union of mirrored H and lower-only J^T D J triplets
        # — defeat the orientation heuristic)
        self._nnz_in = rows.size
        if weights is not None:
            self._e_w = weights
        else:
            is_diag = rows == cols
            okeys = np.unique(rows * (n + 1) + cols)
            rev = cols * (n + 1) + rows
            pos = np.searchsorted(okeys, rev)
            pos = np.minimum(pos, okeys.size - 1)
            has_mirror = (okeys[pos] == rev) & ~is_diag
            self._e_w = np.where(has_mirror, 0.5, 1.0)
        lr = np.maximum(rows, cols)
        lc = np.minimum(rows, cols)

        # unique lower-tri pattern (CSC by column then row)
        keys = lc * (n + 1) + lr
        uniq, inv = np.unique(keys, return_inverse=True)
        u_cols = (uniq // (n + 1)).astype(np.int64)
        u_rows = (uniq % (n + 1)).astype(np.int64)
        diag_mask = u_rows == u_cols
        if int(diag_mask.sum()) != n:
            raise ValueError("pattern must contain every diagonal entry")

        # ---- host symbolic via the native up-looking LDL -----------------
        import scipy.sparse as sp
        from hiop_tpu.native import ldl as _nldl

        lib = _nldl._try_load()
        if lib is None:
            raise RuntimeError("native LDL library unavailable")
        # upper-triangle CSC pattern for ldl_symbolic
        A_lo = sp.coo_matrix(
            (np.ones(uniq.size), (u_rows, u_cols)), shape=(n, n)
        ).tocsc()
        U = sp.triu(A_lo.T).tocsc()
        Ap = np.ascontiguousarray(U.indptr, np.int64)
        Ai = np.ascontiguousarray(U.indices, np.int64)
        parent = np.empty(n, np.int64)
        Lnz = np.empty(n, np.int64)
        Lp = np.empty(n + 1, np.int64)
        flag = np.empty(n, np.int64)
        lnz = lib.ldl_symbolic(n, Ap, Ai, parent, Lnz, Lp, flag)
        if lnz < 0:
            raise ValueError("invalid pattern")
        if lnz > max_lnz:
            raise ValueError(
                f"symbolic fill lnz={lnz} exceeds max_lnz={max_lnz} "
                f"(ordering={ordering!r})"
            )
        self.lnz = int(lnz)
        # surrogate numeric (diagonally dominant => completes without
        # pivoting) to materialize the row indices Li of the L pattern
        Ax = np.full(Ai.size, 1e-3)
        Ax[Ai == np.repeat(np.arange(n), np.diff(Ap))] = float(n)
        Li = np.empty(self.lnz, np.int64)
        Lx = np.empty(self.lnz, np.float64)
        D = np.empty(n, np.float64)
        npos = ctypes.c_int64()
        nneg = ctypes.c_int64()
        nzero = ctypes.c_int64()
        pattern = np.empty(n, np.int64)
        lnz_cnt = np.empty(n, np.int64)
        Y = np.empty(n, np.float64)
        bad = lib.ldl_numeric(
            n, Ap, Ai, Ax, Lp, parent, Li, Lx, D, 0.0,
            ctypes.byref(npos), ctypes.byref(nneg), ctypes.byref(nzero),
            flag, pattern, lnz_cnt, Y,
        )
        assert bad < 0, "surrogate numeric hit a zero pivot"
        self.Lp, self.Li, self.parent = Lp, Li, parent

        # ---- levels: etree height, leaves first --------------------------
        lvl = np.zeros(n, np.int64)
        for j in range(n):
            p = parent[j]
            if p >= 0 and lvl[p] < lvl[j] + 1:
                lvl[p] = lvl[j] + 1
        self.n_levels = int(lvl.max()) + 1 if n else 0
        self._lvl = lvl

        # ---- A-entry -> L-slot map (strictly-lower vs diagonal) ----------
        # dedup slot -> (L position | diag index)
        l_keys = np.empty(self.lnz, np.int64)
        col_of = np.repeat(np.arange(n), np.diff(Lp))
        l_keys = Li * (n + 1) + col_of  # key by (row, col) -> match uniq keys
        order = np.argsort(l_keys)
        sl_keys = l_keys[order]
        off_mask = ~diag_mask
        off_keys = u_rows[off_mask] * (n + 1) + u_cols[off_mask]
        pos_in_sorted = np.searchsorted(sl_keys, off_keys)
        if not (
            pos_in_sorted.size == 0
            or (
                (pos_in_sorted < sl_keys.size).all()
                and np.array_equal(sl_keys[pos_in_sorted], off_keys)
            )
        ):
            raise ValueError("pattern entry missing from the symbolic L")
        slot_to_lpos = np.full(uniq.size, -1, np.int64)
        slot_to_lpos[off_mask] = order[pos_in_sorted]
        slot_is_diag = diag_mask
        slot_diag_idx = np.where(diag_mask, u_cols, 0)
        # assembler-entry -> kind (0 offdiag, 1 diag) + index + weight
        kind = np.where(slot_is_diag[inv], 1, 0).astype(np.int8)
        self._e_kind = kind
        self._e_idx = np.where(
            kind == 1, slot_diag_idx[inv], np.maximum(slot_to_lpos[inv], 0)
        ).astype(np.int32)

        # ---- update-op program -------------------------------------------
        deg = np.diff(Lp).astype(np.int64)
        n_pairs_per_col = deg * (deg + 1) // 2
        total_pairs = int(n_pairs_per_col.sum())
        if total_pairs > max_ops:
            raise ValueError(
                f"update-op count {total_pairs} exceeds max_ops={max_ops}"
            )
        # vectorized all (a <= b) local index pairs per column
        sq = deg * deg
        cum = np.concatenate([[0], np.cumsum(sq)])
        tot_sq = int(cum[-1])
        op_col = np.repeat(np.arange(n), sq)
        local = np.arange(tot_sq) - cum[op_col]
        a = local // np.maximum(deg[op_col], 1)
        b = local % np.maximum(deg[op_col], 1)
        keep = a <= b
        op_col = op_col[keep]
        a = a[keep]
        b = b[keep]
        # the native up-looking LDL emits each column's rows in etree-
        # topological order, NOT sorted by row index: decide target (row i,
        # col j) = (max, min) of the two row values explicitly
        pa = (Lp[op_col] + a).astype(np.int64)
        pb = (Lp[op_col] + b).astype(np.int64)
        ra, rb = Li[pa], Li[pb]
        a_is_j = ra <= rb
        p_jk = np.where(a_is_j, pa, pb)            # L[j,k] position
        p_ik = np.where(a_is_j, pb, pa)            # L[i,k] position
        j_t = np.minimum(ra, rb)                   # target column j
        i_t = np.maximum(ra, rb)                   # target row i
        is_diag_op = a == b
        # off-diagonal targets: position of (i_t, j_t) in L
        off = ~is_diag_op
        t_keys = i_t[off] * (n + 1) + j_t[off]
        t_sorted = np.searchsorted(sl_keys, t_keys)
        assert t_keys.size == 0 or np.array_equal(sl_keys[t_sorted], t_keys), (
            "fill pattern closure violated"
        )
        tgt_off = order[t_sorted]
        op_level = lvl[j_t]

        # group by level (exact sizes; the jitted program unrolls levels)
        self._lv_off = []   # (tgt, p_ik, p_jk, kcol) per level
        self._lv_diag = []  # (jcol, p_jk, kcol) per level
        self._lv_scale = []  # (lpos, lcol) entries of columns in the level
        self._lv_cols = []   # columns in the level
        ent_lvl = lvl[col_of]
        for L in range(self.n_levels):
            m_off = off & (op_level == L)
            sel_off = np.flatnonzero(m_off)
            # positions in the compressed off arrays
            off_idx = np.cumsum(off) - 1
            self._lv_off.append(
                (
                    tgt_off[off_idx[sel_off]].astype(np.int32),
                    p_ik[sel_off].astype(np.int32),
                    p_jk[sel_off].astype(np.int32),
                    op_col[sel_off].astype(np.int32),
                )
            )
            m_d = is_diag_op & (op_level == L)
            sel_d = np.flatnonzero(m_d)
            self._lv_diag.append(
                (
                    j_t[sel_d].astype(np.int32),
                    p_jk[sel_d].astype(np.int32),
                    op_col[sel_d].astype(np.int32),
                )
            )
            e_sel = np.flatnonzero(ent_lvl == L)
            self._lv_scale.append(
                (e_sel.astype(np.int32), col_of[e_sel].astype(np.int32))
            )
            self._lv_cols.append(np.flatnonzero(lvl == L).astype(np.int32))

        self._col_of = col_of.astype(np.int32)
        self._jitted = {}

    # ------------------------------------------------------------------
    def _build_numeric(self, dtype):
        import jax
        import jax.numpy as jnp

        lv_off = [tuple(jnp.asarray(x) for x in t) for t in self._lv_off]
        lv_diag = [tuple(jnp.asarray(x) for x in t) for t in self._lv_diag]
        lv_scale = [tuple(jnp.asarray(x) for x in t) for t in self._lv_scale]
        e_idx = jnp.asarray(self._e_idx)
        e_kind = jnp.asarray(self._e_kind)
        e_w = jnp.asarray(self._e_w.astype(np.dtype(dtype).name))
        lnz, n = self.lnz, self.n

        lv_cols = [jnp.asarray(c) for c in self._lv_cols]
        sqrt_eps = float(np.sqrt(np.finfo(np.dtype(dtype).name).eps))

        def numeric(coo_vals):
            v = coo_vals.astype(dtype) * e_w
            # static-pivot threshold (SuperLU_DIST discipline): a pivot
            # smaller than tau is replaced by sign * tau instead of failing
            # — the factorization completes as LDL^T of A + E and the IR
            # certification absorbs/rejects the perturbation
            scale = jnp.maximum(jnp.max(jnp.abs(v)), 1.0)
            tau = sqrt_eps * scale
            # scatter assembler entries into L storage / diagonal
            # accumulator; wrong-kind entries park at an out-of-bounds
            # index (mode="drop")
            Lx = jnp.zeros((lnz,), dtype).at[
                jnp.where(e_kind == 0, e_idx, lnz)
            ].add(jnp.where(e_kind == 0, v, 0.0), mode="drop")
            d = jnp.zeros((n,), dtype).at[
                jnp.where(e_kind == 1, e_idx, n)
            ].add(jnp.where(e_kind == 1, v, 0.0), mode="drop")
            n_clamped = jnp.asarray(0, jnp.int32)
            for L in range(self.n_levels):
                tgt, pik, pjk, kc = lv_off[L]
                jc, pjk_d, kc_d = lv_diag[L]
                if tgt.size:
                    prod = Lx[pik] * (d[kc] * Lx[pjk])
                    Lx = Lx.at[tgt].add(-prod)
                if jc.size:
                    w = Lx[pjk_d]
                    d = d.at[jc].add(-(w * w * d[kc_d]))
                cols = lv_cols[L]
                if cols.size:
                    dl = d[cols]
                    small = jnp.abs(dl) < tau
                    n_clamped = n_clamped + jnp.sum(small).astype(jnp.int32)
                    dl = jnp.where(small, jnp.where(dl < 0, -tau, tau), dl)
                    d = d.at[cols].set(dl, unique_indices=True)
                epos, ecol = lv_scale[L]
                if epos.size:
                    inv_d = jnp.where(
                        jnp.abs(d) > 0, 1.0 / jnp.where(d == 0, 1.0, d), 0.0
                    )
                    Lx = Lx.at[epos].set(
                        Lx[epos] * inv_d[ecol], unique_indices=True
                    )
            ok = jnp.all(jnp.isfinite(Lx)) & jnp.all(jnp.isfinite(d))
            n_neg = jnp.sum(d < 0).astype(jnp.int32)
            return DeviceLdlFactors(Lx, d, n_neg, ok, n_clamped)

        return numeric

    def _build_solve(self, dtype):
        import jax.numpy as jnp

        lv_scale = [tuple(jnp.asarray(x) for x in t) for t in self._lv_scale]
        Li = jnp.asarray(self.Li.astype(np.int32))
        perm = (
            jnp.asarray(self._perm.astype(np.int32))
            if self._perm is not None
            else None
        )
        rank = (
            jnp.asarray(self._rank.astype(np.int32))
            if self._perm is not None
            else None
        )

        def solve(f: DeviceLdlFactors, b):
            if perm is not None:
                b = b[perm]
            x = b.astype(f.Lx.dtype)
            # forward: L y = b, leaves -> root
            for L in range(self.n_levels):
                epos, ecol = lv_scale[L]
                if epos.size:
                    upd = f.Lx[epos] * x[ecol]
                    x = x.at[Li[epos]].add(-upd)
            inv_d = jnp.where(
                jnp.abs(f.d) > 0, 1.0 / jnp.where(f.d == 0, 1.0, f.d), 0.0
            )
            x = x * inv_d
            # backward: L^T z = y, root -> leaves
            for L in reversed(range(self.n_levels)):
                epos, ecol = lv_scale[L]
                if epos.size:
                    prod = f.Lx[epos] * x[Li[epos]]
                    x = x.at[ecol].add(-prod)
            if rank is not None:
                x = x[rank]
            return x

        return solve

    def get_numeric(self, dtype=np.float32):
        """Jitted ``numeric(coo_vals) -> DeviceLdlFactors`` for the
        assembler's COO value vector (same entry order as the (rows, cols)
        the symbolic was built from)."""
        import jax

        key = ("num", np.dtype(dtype).name)
        if key not in self._jitted:
            self._jitted[key] = jax.jit(self._build_numeric(np.dtype(dtype).type))
        return self._jitted[key]

    def get_solve(self):
        """Jitted ``solve(factors, b) -> x`` (level-scheduled triangular
        solves; b may be f64 — computed at the factor dtype)."""
        import jax

        key = ("solve",)
        if key not in self._jitted:
            self._jitted[key] = jax.jit(self._build_solve(None))
        return self._jitted[key]
