"""Problem transformations.

Parity with ``hiopNlpTransforms``
(/root/reference/src/Optimization/hiopNlpTransforms.hpp:80-555): the
fixed-variable *remover* (hiopFixedVarsRemover, :150) squeezes variables
with xl == xu out of the problem, maintaining full<->reduced index maps and
compressing dense Jacobian columns. It is a construction-time (pre-jit)
index transformation — shapes are static by the time anything is traced
(SURVEY.md §7 "dynamic shapes" note). The relaxer (:318) and bounds
relaxer (:506) live in formulation/base.py; gradient-based scaling (:351)
in _setup_scaling.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import jax.numpy as jnp

from hiop_tpu.interface.base import DenseConstraintsProblem


class FixedVarsRemover(DenseConstraintsProblem):
    """Wrap a dense-Jacobian problem, removing variables fixed at their
    bounds. The wrapped problem sees the reduced space; ``expand``/
    ``restrict`` convert between the two."""

    def __init__(self, problem, fixed_mask: np.ndarray, fixed_vals: np.ndarray):
        self.inner = problem
        self.fixed_mask = np.asarray(fixed_mask, bool)
        self.free_idx = np.nonzero(~self.fixed_mask)[0]
        self.fixed_idx = np.nonzero(self.fixed_mask)[0]
        self._fixed_vals = jnp.asarray(np.asarray(fixed_vals)[self.fixed_idx])
        self.n_full = self.fixed_mask.size
        self.n_red = int(self.free_idx.size)
        self.jittable = getattr(problem, "jittable", False)
        self._free_j = jnp.asarray(self.free_idx)
        self._fixed_j = jnp.asarray(self.fixed_idx)

    # -- maps ---------------------------------------------------------------
    def expand(self, x_red):
        x = jnp.zeros((self.n_full,), jnp.asarray(x_red).dtype)
        x = x.at[self._free_j].set(x_red)
        return x.at[self._fixed_j].set(self._fixed_vals)

    def restrict(self, x_full):
        return jnp.asarray(x_full)[self._free_j]

    # -- interface ----------------------------------------------------------
    def get_prob_sizes(self):
        _, m = self.inner.get_prob_sizes()
        return self.n_red, m

    def get_vars_info(self):
        xl, xu = self.inner.get_vars_info()
        return np.asarray(xl)[self.free_idx], np.asarray(xu)[self.free_idx]

    def get_cons_info(self):
        return self.inner.get_cons_info()

    def get_starting_point(self):
        return np.asarray(self.inner.get_starting_point())[self.free_idx]

    def eval_f(self, x_red):
        return self.inner.eval_f(self.expand(x_red))

    def eval_grad_f(self, x_red):
        return jnp.asarray(self.inner.eval_grad_f(self.expand(x_red)))[self._free_j]

    def eval_cons(self, x_red):
        return self.inner.eval_cons(self.expand(x_red))

    def eval_jac_cons(self, x_red):
        J = jnp.asarray(self.inner.eval_jac_cons(self.expand(x_red)))
        return J[:, self._free_j]

    def eval_hess_lagr(self, x_red, obj_factor, lam):
        H = jnp.asarray(self.inner.eval_hess_lagr(self.expand(x_red), obj_factor, lam))
        return H[jnp.ix_(self._free_j, self._free_j)]

    def iterate_callback(self, info):
        return self.inner.iterate_callback(info)

    def solution_callback(self, status, x, zl, zu, g, lam, obj):
        self.inner.solution_callback(status, self.expand(x), zl, zu, g, lam, obj)
