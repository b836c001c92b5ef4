"""Sparse condensed KKT with device CSR two-phase products.

Parity with ``hiopKKTLinSysCondensedSparse``'s CSR machinery
(/root/reference/src/LinAlg/hiopMatrixSparseCSR.hpp:116-261:
``times_mat_alloc/symbolic/numeric`` + ``add_matrix_alloc/symbolic/
numeric``, CUDA realization hiopMatrixSparseCsrCuda.cpp) done TPU-first:

- **symbolic once on host**: the J_d^T D J_d product pattern is the set of
  Jacobian-nonzero pairs sharing a row (built vectorized, lower triangle
  only), and the union pattern of K = H + diag(Dx) + J^T D J is the
  de-duplication pass inside :class:`DeviceSparseLDL` — the two-phase
  ``*_symbolic`` calls of the reference collapse into one static op
  program;
- **numeric per iteration on device**: one jitted gather/multiply forms
  the product values from (jd_vals, Dd-tilde), one concatenation scatters
  every term into the union COO, and the device sparse LDL factorizes —
  for the SPD condensed system all pivots are positive, making it the
  sparse-Cholesky analogue of the reference's cuSOLVER path
  (hiopLinSolverCholCuSparse.hpp:76).

Selected through the condensed strategy for sparse inequality-only NLPs
above the densification threshold (see FilterIPMNewton._make_strategy),
replacing the dense materialization of kkt/condensed.py.
"""

from __future__ import annotations

import numpy as np


class CondensedSparseDeviceKKT:
    """K = H + Dx + delta_wx I + J_d^T Dd_tilde J_d in sparse triplet form,
    factorized on device; solves IR-certified in f64."""

    def __init__(self, nlp, max_pairs: int = 30_000_000):
        import jax
        import jax.numpy as jnp

        from hiop_tpu.linalg.sparse_device import DeviceSparseLDL

        n, mi = nlp.n, nlp.m_ineq
        self.n, self.m_ineq = n, mi
        jr = np.asarray(nlp.jac_in_rows, np.int64)
        jc = np.asarray(nlp.jac_in_cols, np.int64)
        hr = np.asarray(nlp.hess_rows, np.int64)
        hc = np.asarray(nlp.hess_cols, np.int64)

        # ---- times_mat symbolic: pairs of J nonzeros sharing a row -------
        order = np.argsort(jr, kind="stable")
        counts = np.bincount(jr, minlength=mi)
        sq = counts.astype(np.int64) ** 2
        if int(sq.sum()) > max_pairs:
            raise ValueError(
                f"J^T D J pair count {int(sq.sum())} exceeds {max_pairs}"
            )
        cum = np.concatenate([[0], np.cumsum(sq)])
        row_of = np.repeat(np.arange(mi), sq)
        local = np.arange(int(cum[-1])) - cum[row_of]
        d = np.maximum(counts[row_of], 1)
        a = local // d
        b = local % d
        pa = order[np.concatenate([[0], np.cumsum(counts)])[row_of] + a]
        pb = order[np.concatenate([[0], np.cumsum(counts)])[row_of] + b]
        # keep the lower triangle of the product (col[pa] >= col[pb]);
        # DeviceSparseLDL accepts lower-only entries with no mirrors
        keep = jc[pa] >= jc[pb]
        self._pa = pa[keep].astype(np.int32)
        self._pb = pb[keep].astype(np.int32)
        self._prow = jr[self._pa].astype(np.int32)
        pi = jc[self._pa]
        pj = jc[self._pb]

        # ---- add_matrix symbolic: union COO of H (mirrored) + diag + JtDJ
        # explicit symmetrization weights: H's mirrored pair halves sum
        # back to the full value; lone-orientation product entries carry
        # weight 1 (the heuristic cannot tell these apart when the H and
        # product patterns overlap)
        off = hr != hc
        rows = np.concatenate([hr, hc[off], np.arange(n), pi])
        cols = np.concatenate([hc, hr[off], np.arange(n), pj])
        w = np.concatenate([
            np.where(off, 0.5, 1.0),
            np.full(int(off.sum()), 0.5),
            np.ones(n),
            np.ones(pi.size),
        ])
        self._off = off
        self._ldl = DeviceSparseLDL(rows, cols, n, weights=w)
        self._rows32 = jnp.asarray(rows.astype(np.int32))
        self._cols32 = jnp.asarray(cols.astype(np.int32))
        self._fact_dtype = (
            np.float32
            if nlp.options.str_("kkt_fact_dtype") == "float32"
            else np.float64
        )
        self._numeric = self._ldl.get_numeric(self._fact_dtype)
        self._dev_solve = self._ldl.get_solve()
        self._ir_tol = min(nlp.options.num("ir_inner_tol_min"), 1e-9)

        pa_j = jnp.asarray(self._pa)
        pb_j = jnp.asarray(self._pb)
        prow_j = jnp.asarray(self._prow)
        off_j = jnp.asarray(np.flatnonzero(off).astype(np.int32))
        jr_j = jnp.asarray(jr.astype(np.int32))
        jc_j = jnp.asarray(jc.astype(np.int32))
        rows32, cols32 = self._rows32, self._cols32

        def values_device(h_vals, Dx, jd_vals, dd_tilde, dwx):
            # times_mat numeric + add_matrix numeric in one concatenation
            prod = jd_vals[pa_j] * jd_vals[pb_j] * dd_tilde[prow_j]
            return jnp.concatenate(
                [h_vals, h_vals[off_j], Dx + dwx, prod]
            )

        def equilibrate(vals):
            rmax = jnp.zeros((n,), vals.dtype).at[rows32].max(jnp.abs(vals))
            s = jnp.where(
                rmax > 0, 1.0 / jnp.sqrt(jnp.maximum(rmax, 1e-300)), 1.0
            )
            return vals * s[rows32] * s[cols32], s

        def jd_mv(jd_vals, x):
            return jnp.zeros((mi,), x.dtype).at[jr_j].add(jd_vals * x[jc_j])

        def jdT_mv(jd_vals, y):
            return jnp.zeros((n,), y.dtype).at[jc_j].add(jd_vals * y[jr_j])

        e_w64 = jnp.asarray(w)

        def k_mv(vals64, x):
            # symmetrized COO matvec with the SAME per-entry weights the
            # factorization's assembly uses: y += w v (E_rc + E_cr^[r!=c]) x
            wv = vals64 * e_w64
            lo = jnp.zeros((n,), x.dtype).at[rows32].add(wv * x[cols32])
            strict = rows32 != cols32
            up = jnp.zeros((n,), x.dtype).at[
                jnp.where(strict, cols32, n)
            ].add(jnp.where(strict, wv * x[rows32], 0.0), mode="drop")
            return lo + up

        def solve_refined(factors, s, vals64, rhs, tol, max_ir: int = 10):
            def approx_solve(r):
                return s * self._dev_solve(factors, s * r).astype(jnp.float64)

            x = approx_solve(rhs)
            b_norm = jnp.linalg.norm(rhs)
            m_norm = jnp.max(jnp.abs(vals64))

            def relres(x, r):
                return jnp.linalg.norm(r) / jnp.maximum(
                    b_norm + m_norm * jnp.linalg.norm(x), 1e-300
                )

            r = rhs - k_mv(vals64, x)

            def cond(c):
                k, x, r = c
                return (relres(x, r) > tol) & (k < max_ir)

            def body(c):
                k, x, r = c
                x = x + approx_solve(r)
                r = rhs - k_mv(vals64, x)
                return k + 1, x, r

            _k, x, r = jax.lax.while_loop(
                cond, body, (jnp.asarray(0, jnp.int32), x, r)
            )
            cert = (relres(x, r) <= tol) & jnp.all(jnp.isfinite(x))
            return x, cert

        self._values_device = jax.jit(values_device)
        self._equilibrate = jax.jit(equilibrate)
        self._jd_mv = jax.jit(jd_mv)
        self._jdT_mv = jax.jit(jdT_mv)
        self._solve_refined = jax.jit(
            solve_refined, static_argnames=("max_ir",)
        )
        self._state = None

    # ------------------------------------------------------------------
    def factorize(self, h_vals, Dx, Dd, jd_vals, deltas) -> bool:
        """SPD acceptance: a completed factorization with every pivot
        positive and no static clamps. Returns False otherwise — the
        strategy treats it as wrong curvature (a failed Cholesky,
        kkt/condensed.py semantics) and bumps delta_w."""
        import jax.numpy as jnp

        dwx, dwd, dcd = (float(x) for x in deltas)
        dd_tot = jnp.asarray(Dd, jnp.float64) + dwd
        T = 1.0 / (1.0 + dcd * dd_tot)
        dd_tilde = dd_tot * T
        vals = self._values_device(
            jnp.asarray(h_vals, jnp.float64), jnp.asarray(Dx, jnp.float64),
            jnp.asarray(jd_vals, jnp.float64), dd_tilde, dwx,
        )
        vals_s, s = self._equilibrate(vals)
        f = self._numeric(vals_s)
        spd = bool(f.ok) and int(f.n_neg) == 0 and int(f.n_clamped) == 0
        if not spd:
            self._state = None
            return False
        self._state = (f, s, vals, jnp.asarray(jd_vals, jnp.float64),
                       dd_tot, T, dcd)
        return True

    def solve(self, rx_t, rd_t, ryd):
        """Direction recovery (kkt/condensed.py solve, sparse matvecs);
        returns (dx, dd, dyd) or None when IR cannot certify."""
        import jax.numpy as jnp

        f, s, vals, jd_vals, dd_tot, T, dcd = self._state
        rx_t = jnp.asarray(rx_t, jnp.float64)
        rd_t = jnp.asarray(rd_t, jnp.float64)
        ryd = jnp.asarray(ryd, jnp.float64)
        dd_tilde = dd_tot * T
        rhs = rx_t + self._jdT_mv(
            jd_vals, dd_tilde * (ryd - dcd * rd_t) + rd_t
        )
        dx, cert = self._solve_refined(f, s, vals, rhs, self._ir_tol)
        if not bool(cert):
            return None
        dd = T * (self._jd_mv(jd_vals, dx) - ryd + dcd * rd_t)
        dyd = dd_tot * dd - rd_t
        return dx, dd, dyd
