"""Dense-constrained NLP formulation.

Parity with ``hiopNlpDenseConstraints``
(/root/reference/src/Optimization/hiopNlpFormulation.hpp:428): few global
constraints whose Jacobian is dense (m x n). In the reference the Jacobian is
an MPI column-distributed ``hiopMatrixDenseRowMajor``; here it is a (m, n)
jax.Array whose n axis may be sharded over the device mesh — J @ x and
J @ M^{-1} @ J^T contract over n and lower to psum, the exact analogue of
hiopMatrixDenseRowMajor.cpp:487,699.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import jax.numpy as jnp

from hiop_tpu.formulation.base import NlpFormulation
from hiop_tpu.utils.logger import Verbosity


class NlpDenseConstraints(NlpFormulation):
    def finalize_initialization(self) -> None:
        super().finalize_initialization()

    def maybe_setup_scaling(self, x0) -> None:
        if self._scaling_done:
            return
        # reduce ON DEVICE: x0 (and hence grad/jac) may be n-axis sharded
        # over a multi-process mesh, where gathering n-sized arrays to host
        # is both wasteful and (for non-addressable shards) impossible; the
        # inf-norm reductions land replicated, exactly the reference's
        # MPI_Allreduce'd gradient norms (hiopNlpFormulation.cpp scaling)
        import jax

        grad0 = self.problem.eval_grad_f(x0)
        jac0 = self.problem.eval_jac_cons(x0)
        gnorm = np.asarray(jax.jit(lambda g: jnp.max(jnp.abs(g)))(grad0))
        row_norms = (
            np.asarray(jax.jit(lambda j: jnp.max(jnp.abs(j), axis=1))(jac0))
            if self.m
            else np.zeros(0)
        )
        self._setup_scaling(np.asarray([gnorm]), row_norms)

    def eval_jac(self, x) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Returns (Jc (m_eq, n), Jd (m_ineq, n)), scaled."""
        if getattr(self.problem, "jac_constant", False):
            cached = getattr(self, "_jac_cache", None)
            if cached is not None:
                return cached
        self.runstats.n_eval_jac += 1
        with self.runstats.tm_eval_jac:
            J = jnp.asarray(self.problem.eval_jac_cons(x))
        J = J * jnp.asarray(self._scale_cons)[:, None]
        mesh = getattr(self, "_mesh", None)
        if mesh is not None:
            # explicit column-sharded placement (hiopMatrixDenseRowMajor's
            # MPI layout): m replicated rows x n sharded cols, rather than
            # leaving the layout to propagation from x
            import jax
            from jax.sharding import NamedSharding, PartitionSpec as P

            sh = NamedSharding(mesh, P(None, getattr(self, "_mesh_axis", "n")))
            J = (
                jax.lax.with_sharding_constraint(J, sh)
                if isinstance(J, jax.core.Tracer)
                else jax.device_put(J, sh)
            )
        out = (J[self.eq_idx, :], J[self.ineq_idx, :])
        if getattr(self.problem, "jac_constant", False):
            self._jac_cache = out
        return out

    def eval_hess(self, x, obj_factor, yc, yd):
        """Dense scaled Lagrangian Hessian: requires the problem to provide
        eval_hess_lagr(x, obj_factor, lam) (AutoDiffNlpProblem derives it via
        jax.hessian)."""
        self.runstats.n_eval_hess += 1
        lam = self._lam_user_order(yc, yd)
        with self.runstats.tm_eval_hess:
            H = jnp.asarray(
                self.problem.eval_hess_lagr(x, obj_factor * self.scale_obj, lam)
            )
        return H
