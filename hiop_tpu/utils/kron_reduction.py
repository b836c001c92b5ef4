"""Kron reduction of complex admittance matrices.

Parity with ``hiopKronReduction``
(/root/reference/src/Utils/hiopKronReduction.hpp:69 and the complex LA it
drives — hiopMatrixComplexDense/SparseTriplet, hiopLinSolverUMFPACKZ): the
power-grid network reduction

  Y_red = Y_aa - Y_ab * Y_bb^{-1} * Y_ba

over a complex bus-admittance matrix partitioned into auxiliary (b) and
non-auxiliary (a) buses. The reference keeps the UMFPACK LU of Y_bb to later
map non-aux quantities onto aux buses (``apply_nonaux_to_aux``).

Here both matrix representations of the reference are supported:

- **dense complex** (hiopMatrixComplexDense): any array-like input; the
  Y_bb factorization is a host LAPACK LU (scipy ``lu_factor``), since this
  environment's TPU compiler implements LU only for f32/c64;
- **sparse complex** (hiopMatrixComplexSparseTriplet + UMFPACKZ): any
  ``scipy.sparse`` input; the Y_bb factorization is scipy's ``splu``
  (SuperLU — the same role UMFPACK plays in the reference) and the off-
  diagonal blocks stay sparse until the final Schur product.

The reduced matrix is returned as a jax array (TPU-resident complex ==
real/imag pair under XLA); the once-per-network symbolic+numeric
factorization is host work by design, exactly like the reference's
UMFPACK path.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp


def _is_sparse(A) -> bool:
    try:
        import scipy.sparse as sp

        return sp.issparse(A)
    except Exception:  # pragma: no cover
        return False


class KronReduction:
    def __init__(self, Ybus, aux_idx: Sequence[int]):
        """Ybus: (n, n) complex admittance matrix — dense array-like or any
        scipy.sparse matrix; aux_idx: indices of the auxiliary buses to
        eliminate."""
        self._sparse = _is_sparse(Ybus)
        if self._sparse:
            import scipy.sparse as sp
            import scipy.sparse.linalg as spla

            Y = sp.csc_matrix(Ybus, dtype=np.complex128)
            n = Y.shape[0]
            aux = np.asarray(sorted(aux_idx), dtype=np.int64)
            keep = np.asarray(
                [i for i in range(n) if i not in set(aux.tolist())], np.int64
            )
            self.aux_idx = aux
            self.nonaux_idx = keep
            self._Yab_sp = Y[keep][:, aux].tocsc()
            self._Yba_sp = Y[aux][:, keep].tocsc()
            self._Yaa = jnp.asarray(Y[keep][:, keep].toarray())
            # complex sparse LU of Y_bb (UMFPACKZ role; SuperLU here)
            self._lu_sp = spla.splu(Y[aux][:, aux].tocsc()) if aux.size else None
        else:
            import scipy.linalg as _sla

            Y = np.asarray(Ybus, dtype=np.complex128)
            n = Y.shape[0]
            aux = np.asarray(sorted(aux_idx), dtype=np.int64)
            keep = np.asarray(
                [i for i in range(n) if i not in set(aux.tolist())], np.int64
            )
            self.aux_idx = aux
            self.nonaux_idx = keep
            self._Yab = jnp.asarray(Y[np.ix_(keep, aux)])
            self._Yba = jnp.asarray(Y[np.ix_(aux, keep)])
            self._Yaa = jnp.asarray(Y[np.ix_(keep, keep)])
            self._lu = _sla.lu_factor(Y[np.ix_(aux, aux)]) if aux.size else None

    def _solve_bb(self, B: np.ndarray) -> np.ndarray:
        """Y_bb^{-1} B on the host (keeps the factorization, like the
        reference keeps its UMFPACK object)."""
        if self._sparse:
            return self._lu_sp.solve(np.asarray(B, np.complex128))
        import scipy.linalg as _sla

        return _sla.lu_solve(self._lu, np.asarray(B, np.complex128))

    def reduce(self) -> jax.Array:
        """Y_red = Yaa - Yab Ybb^{-1} Yba (buildKronRed)."""
        if self.aux_idx.size == 0:
            return self._Yaa
        if self._sparse:
            X = self._solve_bb(self._Yba_sp.toarray())
            return self._Yaa - jnp.asarray(self._Yab_sp @ X)
        X = jnp.asarray(self._solve_bb(np.asarray(self._Yba)))
        return self._Yaa - self._Yab @ X

    def apply_nonaux_to_aux(self, v_nonaux) -> jax.Array:
        """Recover aux-bus voltages from non-aux voltages:
        v_aux = -Ybb^{-1} Yba v_nonaux (apply_nonaux_to_aux)."""
        v = np.asarray(v_nonaux, np.complex128)
        Yba_v = (self._Yba_sp @ v) if self._sparse else (np.asarray(self._Yba) @ v)
        return -jnp.asarray(self._solve_bb(Yba_v))
