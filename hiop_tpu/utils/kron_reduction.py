"""Kron reduction of complex admittance matrices.

Parity with ``hiopKronReduction``
(/root/reference/src/Utils/hiopKronReduction.hpp:69 and the complex LA it
drives — hiopMatrixComplexDense/SparseTriplet, hiopLinSolverUMFPACKZ): the
power-grid network reduction

  Y_red = Y_aa - Y_ab * Y_bb^{-1} * Y_ba

over a complex bus-admittance matrix partitioned into auxiliary (b) and
non-auxiliary (a) buses. The reference keeps the UMFPACK LU of Y_bb to later
map non-aux quantities onto aux buses (``apply_nonaux_to_aux``); here the
complex LU lives as a jax lu_factor (complex128 on CPU-backed hosts; TPU
executes complex arithmetic via real/imag decomposition).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp


class KronReduction:
    def __init__(self, Ybus, aux_idx: Sequence[int]):
        """Ybus: (n, n) complex admittance matrix (dense or convertible);
        aux_idx: indices of the auxiliary buses to eliminate."""
        Y = np.asarray(Ybus, dtype=np.complex128)
        n = Y.shape[0]
        aux = np.asarray(sorted(aux_idx), dtype=np.int64)
        keep = np.asarray([i for i in range(n) if i not in set(aux.tolist())], np.int64)
        self.aux_idx = aux
        self.nonaux_idx = keep
        self._Yab = jnp.asarray(Y[np.ix_(keep, aux)])
        self._Yba = jnp.asarray(Y[np.ix_(aux, keep)])
        self._Yaa = jnp.asarray(Y[np.ix_(keep, keep)])
        # the complex LU stays on the host (scipy/UMFPACK-analogue): this
        # environment's TPU compiler implements LU only for f32/c64
        import scipy.linalg as _sla

        self._lu = _sla.lu_factor(Y[np.ix_(aux, aux)])

    def reduce(self) -> jax.Array:
        """Y_red = Yaa - Yab Ybb^{-1} Yba (buildKronRed)."""
        if self.aux_idx.size == 0:
            return self._Yaa
        import scipy.linalg as _sla

        X = jnp.asarray(_sla.lu_solve(self._lu, np.asarray(self._Yba)))
        return self._Yaa - self._Yab @ X

    def apply_nonaux_to_aux(self, v_nonaux) -> jax.Array:
        """Recover aux-bus voltages from non-aux voltages:
        v_aux = -Ybb^{-1} Yba v_nonaux (apply_nonaux_to_aux)."""
        import scipy.linalg as _sla

        v = np.asarray(v_nonaux, np.complex128)
        return -jnp.asarray(_sla.lu_solve(self._lu, np.asarray(self._Yba) @ v))
