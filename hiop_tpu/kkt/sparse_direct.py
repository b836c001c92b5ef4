"""Sparse-direct XDYcYd KKT realization (host factorization).

Parity with ``hiopKKTLinSysCompressedSparseXDYcYd``
(/root/reference/src/Optimization/hiopKKTLinSysSparse.hpp:133): the
symmetric-indefinite augmented system

  [ H + Dx + delta_wx I   0                  Jc^T          Jd^T        ]
  [ 0                     Dd + delta_wd I    0             -I          ]
  [ Jc                    0                  -delta_cc I   0           ]
  [ Jd                    -I                 0             -delta_cd I ]

(doc hiopKKTLinSys.hpp:334-345) assembled in sparse triplet form and
handed to a host sparse direct solver selected from the
:mod:`hiop_tpu.linalg.solver_registry` (``splu`` = SuperLU by default,
playing the reference's MA57 role; the reference's per-iteration flow is
symbolic-once + numeric-per-iteration, mirrored here by precomputing the
static COO pattern at construction and refreshing only the value vector).

A sparse LU carries no inertia information, so with the ``splu`` backend
the caller uses the inertia-free curvature acceptor — the reference's
pairing for non-inertia backends.  The ``native_ldl`` backend
(hiop_tpu/native/ldl.cpp, the MA57 role) reports pivot-sign inertia
through :attr:`last_inertia`, enabling the reference's default
inertia-correction acceptance (hiopFactAcceptorIC,
hiopFactAcceptor.hpp:97).  O(nnz) assembly + fill-limited factorization
replaces the dense O(n^2) Hessian materialization for large sparse
problems with equality constraints (which the condensed/matrix-free paths
cannot take).
"""

from __future__ import annotations

import numpy as np


class SparseXDYcYdKKT:
    """Static-pattern assembler + registry-backed factorization."""

    def __init__(self, nlp, solver_name: str = "splu"):
        import functools
        import inspect

        from hiop_tpu.linalg import solver_registry

        factory = solver_registry.get_solver_factory(solver_name)
        # backends that accept an `ordering` kwarg get the
        # linear_solver_sparse_ordering option (the reference's
        # cuSOLVER-chol AMD/sym-RCM selector, hiopLinSolverCholCuSparse)
        if "ordering" in inspect.signature(factory).parameters:
            factory = functools.partial(
                factory, ordering=nlp.options.str_("linear_solver_sparse_ordering")
            )
        self._factory = factory
        self.n = nlp.n
        self.m_eq = nlp.m_eq
        self.m_ineq = nlp.m_ineq
        n, me, mi = self.n, self.m_eq, self.m_ineq
        self.ntot = n + mi + me + mi

        hr = np.asarray(nlp.hess_rows)
        hc = np.asarray(nlp.hess_cols)
        jer = np.asarray(nlp.jac_eq_rows)
        jec = np.asarray(nlp.jac_eq_cols)
        jir = np.asarray(nlp.jac_in_rows)
        jic = np.asarray(nlp.jac_in_cols)
        off = hr != hc  # mirrored below the diagonal

        rows = [hr, hc[off]]                      # H upper + strict-lower mirror
        cols = [hc, hr[off]]
        rows += [np.arange(n)]                    # Dx + delta_wx
        cols += [np.arange(n)]
        rows += [np.arange(n, n + mi)]            # Dd + delta_wd
        cols += [np.arange(n, n + mi)]
        yc0, yd0 = n + mi, n + mi + me
        rows += [yc0 + jer, jec]                  # Jc and Jc^T
        cols += [jec, yc0 + jer]
        rows += [yd0 + jir, jic]                  # Jd and Jd^T
        cols += [jic, yd0 + jir]
        ii = np.arange(mi)
        rows += [n + ii, yd0 + ii]                # -I blocks (d,yd)/(yd,d)
        cols += [yd0 + ii, n + ii]
        rows += [yc0 + np.arange(me)]             # -delta_cc
        cols += [yc0 + np.arange(me)]
        rows += [yd0 + ii]                        # -delta_cd
        cols += [yd0 + ii]
        self._rows = np.concatenate(rows)
        self._cols = np.concatenate(cols)
        self._off = off
        self._nnz_h = hr.size
        self._nnz_je = jer.size
        self._nnz_ji = jir.size
        self._solver = None
        #: (n_pos, n_neg, n_zero) from the last factorization when the
        #: backend reports it (native_ldl), else None (splu/LU backends)
        self.last_inertia = None

    def _values(self, hvals, Dx, Dd, je_vals, ji_vals, deltas):
        dwx, dwd, dcc, dcd = deltas
        n, me, mi = self.n, self.m_eq, self.m_ineq
        return np.concatenate(
            [
                hvals,
                hvals[self._off],
                np.asarray(Dx, dtype=np.float64) + dwx,
                np.asarray(Dd, dtype=np.float64) + dwd,
                je_vals, je_vals,
                ji_vals, ji_vals,
                np.full(2 * mi, -1.0),
                np.full(me, -dcc),
                np.full(mi, -dcd),
            ]
        )

    def factorize(self, hvals, Dx, Dd, je_vals, ji_vals, deltas) -> bool:
        """Numeric phase. Returns False on a (near-)singular matrix."""
        import scipy.sparse as sp

        vals = self._values(
            np.asarray(hvals, dtype=np.float64), Dx, Dd,
            np.asarray(je_vals, dtype=np.float64),
            np.asarray(ji_vals, dtype=np.float64), deltas,
        )
        A = sp.coo_matrix(
            (vals, (self._rows, self._cols)), shape=(self.ntot, self.ntot)
        ).tocsc()
        try:
            self._solver = self._factory(A)
        except RuntimeError:  # SuperLU / native LDL raise on singular input
            self._solver = None
            self.last_inertia = None
            return False
        inert = getattr(self._solver, "inertia", None)
        self.last_inertia = inert() if callable(inert) else None
        return True

    def solve(self, rx_t, rd_t, ryc, ryd):
        n, me, mi = self.n, self.m_eq, self.m_ineq
        rhs = np.concatenate(
            [np.asarray(rx_t), np.asarray(rd_t), np.asarray(ryc), np.asarray(ryd)]
        )
        sol = self._solver.solve(rhs)
        # a backend may invalidate its inertia mid-solve (splu's pivoted
        # refactorization fallback); re-read so acceptance sees the truth
        inert = getattr(self._solver, "inertia", None)
        self.last_inertia = inert() if callable(inert) else None
        if not np.all(np.isfinite(sol)):
            return None
        return (
            sol[:n],
            sol[n:n + mi],
            sol[n + mi:n + mi + me],
            sol[n + mi + me:],
        )


class SparseXYcYdKKT:
    """Sparse-direct realization of the *XYcYd* compressed linearization
    (hiopKKTLinSysCompressedSparseXYcYd,
    /root/reference/src/Optimization/hiopKKTLinSysSparse.hpp:74): the
    inequality slack row is eliminated too, leaving the 3-block symmetric
    system ordered [x, yc, yd]::

      [ H + Dx + delta_wx   Jc^T        Jd^T                         ]
      [ Jc                  -delta_cc                                ]
      [ Jd                              -(Dd+delta_wd)^{-1}-delta_cd ]

    (n + m_eq + m_ineq unknowns vs XDYcYd's n + 2*m_ineq + m_eq). Expected
    inertia (n, m_eq + m_ineq, 0) — the same negative count as XDYcYd, so
    the strategy's acceptance test is shared. ``solve`` takes the XDYcYd
    rhs 4-tuple, forms ryd_tilde = ryd + Dd_tot^{-1} rd_t internally, and
    recovers dd = Dd_tot^{-1}(rd_t + dyd) (hiopKKTLinSys.cpp:620,670)."""

    def __init__(self, nlp, solver_name: str = "splu"):
        import functools
        import inspect

        from hiop_tpu.linalg import solver_registry

        factory = solver_registry.get_solver_factory(solver_name)
        if "ordering" in inspect.signature(factory).parameters:
            factory = functools.partial(
                factory, ordering=nlp.options.str_("linear_solver_sparse_ordering")
            )
        self._factory = factory
        self.n = nlp.n
        self.m_eq = nlp.m_eq
        self.m_ineq = nlp.m_ineq
        n, me, mi = self.n, self.m_eq, self.m_ineq
        self.ntot = n + me + mi

        hr = np.asarray(nlp.hess_rows)
        hc = np.asarray(nlp.hess_cols)
        jer = np.asarray(nlp.jac_eq_rows)
        jec = np.asarray(nlp.jac_eq_cols)
        jir = np.asarray(nlp.jac_in_rows)
        jic = np.asarray(nlp.jac_in_cols)
        off = hr != hc

        yc0, yd0 = n, n + me
        rows = [hr, hc[off]]                      # H upper + strict-lower mirror
        cols = [hc, hr[off]]
        rows += [np.arange(n)]                    # Dx + delta_wx
        cols += [np.arange(n)]
        rows += [yc0 + jer, jec]                  # Jc and Jc^T
        cols += [jec, yc0 + jer]
        rows += [yd0 + jir, jic]                  # Jd and Jd^T
        cols += [jic, yd0 + jir]
        rows += [yc0 + np.arange(me)]             # -delta_cc
        cols += [yc0 + np.arange(me)]
        ii = np.arange(mi)
        rows += [yd0 + ii]                        # -(Dd_tot)^{-1} - delta_cd
        cols += [yd0 + ii]
        self._rows = np.concatenate(rows)
        self._cols = np.concatenate(cols)
        self._off = off
        self._solver = None
        self._dd_inv = None
        self.last_inertia = None

    def factorize(self, hvals, Dx, Dd, je_vals, ji_vals, deltas) -> bool:
        import scipy.sparse as sp

        dwx, dwd, dcc, dcd = deltas
        n, me, mi = self.n, self.m_eq, self.m_ineq
        hvals = np.asarray(hvals, dtype=np.float64)
        dd_tot = np.asarray(Dd, dtype=np.float64) + dwd
        dd_inv = np.where(dd_tot > 0, 1.0 / np.maximum(dd_tot, 1e-300), 0.0)
        self._dd_inv = dd_inv
        je_vals = np.asarray(je_vals, dtype=np.float64)
        ji_vals = np.asarray(ji_vals, dtype=np.float64)
        vals = np.concatenate(
            [
                hvals,
                hvals[self._off],
                np.asarray(Dx, dtype=np.float64) + dwx,
                je_vals, je_vals,
                ji_vals, ji_vals,
                np.full(me, -dcc),
                -(dd_inv + dcd),
            ]
        )
        A = sp.coo_matrix(
            (vals, (self._rows, self._cols)), shape=(self.ntot, self.ntot)
        ).tocsc()
        try:
            self._solver = self._factory(A)
        except RuntimeError:
            self._solver = None
            self.last_inertia = None
            return False
        inert = getattr(self._solver, "inertia", None)
        self.last_inertia = inert() if callable(inert) else None
        return True

    def solve(self, rx_t, rd_t, ryc, ryd):
        n, me, mi = self.n, self.m_eq, self.m_ineq
        rd_t = np.asarray(rd_t, dtype=np.float64)
        ryd_t = np.asarray(ryd, dtype=np.float64) + self._dd_inv * rd_t
        rhs = np.concatenate([np.asarray(rx_t), np.asarray(ryc), ryd_t])
        sol = self._solver.solve(rhs)
        inert = getattr(self._solver, "inertia", None)
        self.last_inertia = inert() if callable(inert) else None
        if not np.all(np.isfinite(sol)):
            return None
        dx = sol[:n]
        dyc = sol[n:n + me]
        dyd = sol[n + me:]
        dd = self._dd_inv * (rd_t + dyd)
        return dx, dd, dyc, dyd


class DeviceSparseXDYcYdKKT(SparseXDYcYdKKT):
    """Device-resident numeric refactorization of the sparse XDYcYd
    augmented system (``linear_solver_sparse=device_ldl``).

    The ReSolve discipline (RefactorizationSolver.hpp:74) on TPU: the
    symbolic analysis (etree, L pattern, level-scheduled op program) runs
    once on the host via linalg/sparse_device.DeviceSparseLDL; every
    numeric factorization of the regularization ladder — only the delta
    scalars change — assembles the value vector ON DEVICE (a jitted
    mirror of ``_values``) and runs the jitted level-scheduled numeric,
    so retries cost no host round trip beyond the 2-scalar inertia sync
    used by the acceptance test.  With kkt_fact_dtype=float32 the factors
    are f32 and every solve is certified by f64 iterative refinement
    through the device COO matvec (the existing mixed-precision
    contract); an uncertified solve returns None and the strategy's
    singularity handler regularizes.
    """

    def __init__(self, nlp, solver_name: str = "device_ldl"):
        import jax
        import jax.numpy as jnp

        from hiop_tpu.linalg.sparse_device import DeviceSparseLDL

        # parent builds the static COO structure; give it a real host
        # factory (native_ldl) it will never use
        super().__init__(nlp, "native_ldl")
        # ordering policy (linear_solver_sparse_ordering):
        #   auto/amd -> unrestricted AMD (fill-optimal; interleaved dual
        #     pivots can go tiny at small deltas, which the numeric's
        #     static pivot clamping + IR certification absorb);
        #   qd_amd -> AMD restricted so every primal column (x, d) comes
        #     before any dual row: a strictly quasi-definite elimination
        #     (stable without pivoting [Vanderbei], exact inertia), at the
        #     cost of dual-Schur fill on non-local structures;
        #   rcm/none -> as named.
        ordering = nlp.options.str_("linear_solver_sparse_ordering")
        if ordering == "qd_amd":
            from hiop_tpu.native import amd_ordering
            import scipy.sparse as _sp

            S = _sp.coo_matrix(
                (np.ones(self._rows.size), (self._rows, self._cols)),
                shape=(self.ntot, self.ntot),
            ).tocsr()
            full_amd = np.asarray(
                amd_ordering(
                    self.ntot,
                    np.asarray(S.indptr, np.int64),
                    np.asarray(S.indices, np.int64),
                ),
                np.int64,
            )
            primal = full_amd < (self.n + self.m_ineq)
            qd_perm = np.concatenate([full_amd[primal], full_amd[~primal]])
            self._ldl = DeviceSparseLDL(
                self._rows, self._cols, self.ntot, perm=qd_perm
            )
        else:
            self._ldl = DeviceSparseLDL(
                self._rows, self._cols, self.ntot,
                ordering={"auto": "amd"}.get(ordering, ordering),
            )
        self._fact_dtype = (
            np.float32
            if nlp.options.str_("kkt_fact_dtype") == "float32"
            else np.float64
        )
        self._numeric = self._ldl.get_numeric(self._fact_dtype)
        self._dev_solve = self._ldl.get_solve()
        rows = jnp.asarray(self._rows.astype(np.int32))
        cols = jnp.asarray(self._cols.astype(np.int32))
        ntot = self.ntot
        n, me, mi = self.n, self.m_eq, self.m_ineq

        def values_device(hvals, hvals_off, Dx, Dd, je, ji, dwx, dwd, dcc, dcd):
            return jnp.concatenate(
                [
                    hvals, hvals_off,
                    Dx + dwx, Dd + dwd,
                    je, je, ji, ji,
                    jnp.full((2 * mi,), -1.0, hvals.dtype),
                    jnp.full((me,), -dcc, hvals.dtype),
                    jnp.full((mi,), -dcd, hvals.dtype),
                ]
            )

        def coo_matvec(vals, x):
            return jnp.zeros((ntot,), vals.dtype).at[rows].add(vals * x[cols])

        def equilibrate(vals):
            """Symmetric row-max scaling s A s (a congruence — inertia
            preserved): bounds the f32 factorization's conditioning under
            the barrier-diagonal blowup, like the fused saddle mp path
            (kkt/mds.py factorize_saddle_device_mp)."""
            rmax = jnp.zeros((ntot,), vals.dtype).at[rows].max(jnp.abs(vals))
            s = jnp.where(rmax > 0, 1.0 / jnp.sqrt(jnp.maximum(rmax, 1e-300)), 1.0)
            return vals * s[rows] * s[cols], s

        def solve_refined(factors, s, vals64, rhs, tol, max_ir: int = 10):
            def approx_solve(r):
                # factors hold s A s: A^{-1} r ~= s (sAs)^{-1} (s r)
                return s * self._dev_solve(factors, s * r).astype(jnp.float64)

            x = approx_solve(rhs)
            b_norm = jnp.linalg.norm(rhs)
            m_norm = jnp.max(jnp.abs(vals64))

            def relres(x, r):
                return jnp.linalg.norm(r) / jnp.maximum(
                    b_norm + m_norm * jnp.linalg.norm(x), 1e-300
                )

            r = rhs - coo_matvec(vals64, x)

            def cond(c):
                k, x, r = c
                return (relres(x, r) > tol) & (k < max_ir)

            def body(c):
                k, x, r = c
                x = x + approx_solve(r)
                r = rhs - coo_matvec(vals64, x)
                return k + 1, x, r

            _k, x, r = jax.lax.while_loop(
                cond, body, (jnp.asarray(0, jnp.int32), x, r)
            )
            cert = (relres(x, r) <= tol) & jnp.all(jnp.isfinite(x))
            return x, cert

        self._values_device = jax.jit(values_device)
        self._equilibrate = jax.jit(equilibrate)
        self._solve_refined = jax.jit(solve_refined, static_argnames=("max_ir",))
        self._ir_tol = min(nlp.options.num("ir_inner_tol_min"), 1e-9)
        self._factors = None
        self._vals64 = None

    def factorize(self, hvals, Dx, Dd, je_vals, ji_vals, deltas) -> bool:
        import jax.numpy as jnp

        dwx, dwd, dcc, dcd = (float(x) for x in deltas)
        hv = jnp.asarray(hvals, jnp.float64)
        vals = self._values_device(
            hv, hv[jnp.asarray(self._off)],
            jnp.asarray(Dx, jnp.float64), jnp.asarray(Dd, jnp.float64),
            jnp.asarray(je_vals, jnp.float64), jnp.asarray(ji_vals, jnp.float64),
            dwx, dwd, dcc, dcd,
        )
        vals_s, s = self._equilibrate(vals)
        f = self._numeric(vals_s)
        ok = bool(f.ok)
        if not ok:
            self._factors = None
            self.last_inertia = None
            return False
        self._factors = f
        self._scale = s
        self._vals64 = vals
        if int(f.n_clamped) > 0:
            # statically clamped pivots: the factorization is of A + E and
            # pivot signs are unreliable — report no inertia (the strategy
            # then uses the inertia-free curvature acceptance) but keep the
            # factors: solves remain IR-certified
            self.last_inertia = None
        else:
            n_neg = int(f.n_neg)
            self.last_inertia = (self.ntot - n_neg, n_neg, 0)
        return True

    def solve(self, rx_t, rd_t, ryc, ryd):
        import jax.numpy as jnp

        n, me, mi = self.n, self.m_eq, self.m_ineq
        rhs = jnp.concatenate(
            [
                jnp.asarray(rx_t, jnp.float64), jnp.asarray(rd_t, jnp.float64),
                jnp.asarray(ryc, jnp.float64), jnp.asarray(ryd, jnp.float64),
            ]
        )
        sol, cert = self._solve_refined(
            self._factors, self._scale, self._vals64, rhs, self._ir_tol
        )
        if not bool(cert):
            return None  # strategy regularizes (singularity handler)
        return (
            sol[:n],
            sol[n:n + mi],
            sol[n + mi:n + mi + me],
            sol[n + mi + me:],
        )
