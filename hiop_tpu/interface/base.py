"""User-facing NLP problem interfaces (L4).

Parity with the reference's interface hierarchy
(/root/reference/src/Interface/hiopInterface.hpp:134,518,586,779):

- :class:`NlpProblem` — base: sizes, bounds, f/grad/cons evaluations, starting
  point, iterate/solution callbacks.
- :class:`DenseConstraintsProblem` — few global constraints with a dense
  Jacobian (hiopInterfaceDenseConstraints); pairs with the distributed
  quasi-Newton solver; the variable axis may be sharded over a device mesh
  (the reference's ``get_vecdistrib_info`` MPI column partition becomes a
  sharding hint).
- :class:`SparseProblem` — general sparse Jacobian + symmetric sparse Hessian
  in (static-structure) triplet form (hiopInterfaceSparse).
- :class:`MdsProblem` — mixed dense-sparse block structure (hiopInterfaceMDS).
- :class:`AutoDiffNlpProblem` — TPU-native addition with no reference
  equivalent: the user supplies jax-traceable ``f`` and ``c`` only; gradients,
  Jacobians and Hessians come from JAX autodiff, and the entire evaluation
  pipeline stays on device and fuses under jit.

All array inputs/outputs are 1-D (or 2-D for Jacobians) and may be numpy or
jax arrays. Problems whose evaluations are jax-traceable should set
``jittable = True`` so the solver can fuse evaluations into compiled
iteration steps.

Unlike the reference (which calls ``eval_cons`` separately for equality and
inequality subsets via ``idx_cons``), this interface always evaluates all m
constraints in one call; the formulation layer splits eq/ineq internally
(the reference's "one-call" mode, hiopNlpFormulation.hpp:389-401).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Tuple

import numpy as np

INF = 1e20  # bound magnitude treated as infinity, same convention as the reference


@dataclasses.dataclass
class IterateCallbackInfo:
    """Per-iteration scalars streamed to the user (hiopInterface.hpp:446-467)."""

    iter: int
    obj_value: float
    logbar_obj_value: float
    x: Any
    z_L: Any
    z_U: Any
    s: Any
    g: Any
    yc: Any
    yd: Any
    inf_pr: float
    inf_du: float
    onenorm_pr: float
    mu: float
    alpha_du: float
    alpha_pr: float
    ls_trials: int


class NlpProblem:
    """Abstract NLP: min f(x) s.t. cl <= c(x) <= cu, xl <= x <= xu."""

    #: True when eval_* are jax-traceable pure functions (enables fused jit).
    jittable: bool = False
    #: True when ALL constraints are linear (the reference's hiopLinear
    #: NonlinearityType): the Jacobian is evaluated once and cached.
    jac_constant: bool = False

    # -- sizes & data -------------------------------------------------------
    def get_prob_sizes(self) -> Tuple[int, int]:
        raise NotImplementedError

    def get_vars_info(self) -> Tuple[np.ndarray, np.ndarray]:
        """Return (xlow, xupp); entries <=-1e20 / >=1e20 mean unbounded."""
        raise NotImplementedError

    def get_cons_info(self) -> Tuple[np.ndarray, np.ndarray]:
        """Return (clow, cupp); clow==cupp marks an equality."""
        raise NotImplementedError

    def get_starting_point(self) -> np.ndarray:
        n, _ = self.get_prob_sizes()
        return np.zeros(n)

    def get_warmstart_point(self):
        """Optionally return (x0, z_L0, z_U0, yc0, yd0, d0, vl0, vu0)."""
        return None

    # -- evaluations --------------------------------------------------------
    def eval_f(self, x) -> float:
        raise NotImplementedError

    def eval_grad_f(self, x):
        raise NotImplementedError

    def eval_cons(self, x):
        raise NotImplementedError

    def eval_cons_subset(self, x, idx_cons):
        """Two-call constraint evaluation (optional).

        The reference's ``eval_cons`` has two conventions
        (hiopInterface.hpp:303-366): a *two-call* form that evaluates only
        the constraint subset ``idx_cons`` (the formulation calls it once
        with the equality indexes and once with the inequality indexes) and
        a *one-call* form evaluating the whole constraint body.  There a
        user signals "not implemented" by returning ``false`` and HiOp
        falls back to the other convention
        (hiopNlpFormulation.hpp:389-401's internal buffers).

        Override this to opt into the two-call convention; return the
        values of constraints ``idx_cons`` (in that order) at ``x``.  The
        default returns :data:`NotImplemented`, which makes the
        formulation use the one-call :meth:`eval_cons`.
        """
        return NotImplemented

    # -- distribution -------------------------------------------------------
    def get_vecdistrib_info(self, global_n: int):
        """Sharding hint for the variable axis; None = replicate/auto."""
        return None

    # -- callbacks ----------------------------------------------------------
    def iterate_callback(self, info: IterateCallbackInfo) -> bool:
        """Return False to stop the solver (User_Stopped)."""
        return True

    def solution_callback(self, status, x, z_L, z_U, g, lam, obj_value) -> None:
        pass

    def force_update_x(self, x):
        """Hook to overwrite the primal point (hiopInterface.hpp force_update_x)."""
        return x


class DenseConstraintsProblem(NlpProblem):
    """Dense-Jacobian NLP (hiopInterfaceDenseConstraints, hiopInterface.hpp:518)."""

    def eval_jac_cons(self, x):
        """Return the dense (m, n) Jacobian of all constraints."""
        raise NotImplementedError


class SparseProblem(NlpProblem):
    """Fully sparse NLP (hiopInterfaceSparse, hiopInterface.hpp:779).

    Structure is static (declared once); only values are re-evaluated. The
    Hessian is the upper triangle of the Lagrangian Hessian
     obj_factor * H_f + sum lam_i * H_{c_i}.
    """

    def get_sparse_blocks_info(self) -> Tuple[int, int, int]:
        """Return (n, nnz_jac, nnz_hess_upper_triangle)."""
        raise NotImplementedError

    def jac_structure(self) -> Tuple[np.ndarray, np.ndarray]:
        """Static (rows, cols) of the Jacobian triplets."""
        raise NotImplementedError

    def eval_jac_vals(self, x):
        """Values aligned with jac_structure()."""
        raise NotImplementedError

    def hess_structure(self) -> Tuple[np.ndarray, np.ndarray]:
        """Static (rows, cols) of the upper-triangle Hessian triplets."""
        raise NotImplementedError

    def eval_hess_vals(self, x, obj_factor, lam):
        """Values aligned with hess_structure()."""
        raise NotImplementedError


class MdsProblem(NlpProblem):
    """Mixed dense-sparse NLP (hiopInterfaceMDS, hiopInterface.hpp:586).

    Variables are ordered [x_sparse, x_dense]. Jacobians have a sparse triplet
    block over the sparse variables and a dense block over the dense
    variables; the Hessian is block-diagonal: a *diagonal* sparse block (the
    MDS KKT's Schur elimination requires it, as in the reference,
    hiopKKTLinSysMDS.cpp:172-276) and a dense block.
    """

    def get_sparse_dense_blocks_info(self) -> Tuple[int, int]:
        """Return (n_sparse, n_dense)."""
        raise NotImplementedError

    def jac_sparse_structure(self) -> Tuple[np.ndarray, np.ndarray]:
        """Static (rows, cols) of the sparse-block Jacobian triplets (all m rows)."""
        raise NotImplementedError

    def eval_jac_blocks(self, x):
        """Return (sparse_vals, dense_block) with dense_block shape (m, n_dense)."""
        raise NotImplementedError

    def eval_hess_blocks(self, x, obj_factor, lam):
        """Return (hss_diag (n_sparse,), hdd (n_dense, n_dense))."""
        raise NotImplementedError


class AutoDiffNlpProblem(NlpProblem):
    """Define an NLP from jax-traceable ``f`` and ``c`` alone.

    >>> p = AutoDiffNlpProblem(f=lambda x: jnp.sum(x**2), c=lambda x: x[:1],
    ...                        xl=..., xu=..., cl=..., cu=..., x0=...)
    """

    jittable = True

    def __init__(
        self,
        f: Callable,
        c: Optional[Callable],
        xl,
        xu,
        cl,
        cu,
        x0,
        name: str = "autodiff_nlp",
    ):
        import jax
        import jax.numpy as jnp

        self.name = name
        self._f = jax.jit(f)
        self._c = jax.jit(c if c is not None else (lambda x: jnp.zeros((0,), x.dtype)))
        self._grad_f = jax.jit(jax.grad(lambda x: jnp.asarray(f(x)).sum()))
        self._jac_c = jax.jit(jax.jacfwd(self._c))
        self._xl = np.asarray(xl, dtype=np.float64)
        self._xu = np.asarray(xu, dtype=np.float64)
        self._cl = np.atleast_1d(np.asarray(cl, dtype=np.float64))
        self._cu = np.atleast_1d(np.asarray(cu, dtype=np.float64))
        self._x0 = np.asarray(x0, dtype=np.float64)

        def lagr(x, obj_factor, lam):
            return obj_factor * jnp.asarray(f(x)).sum() + jnp.dot(
                lam, self._c(x)
            )

        self._hess_lagr = jax.jit(jax.hessian(lagr, argnums=0))

    def get_prob_sizes(self):
        return self._x0.shape[0], self._cl.shape[0]

    def get_vars_info(self):
        return self._xl, self._xu

    def get_cons_info(self):
        return self._cl, self._cu

    def get_starting_point(self):
        return self._x0

    def eval_f(self, x):
        return self._f(x)

    def eval_grad_f(self, x):
        return self._grad_f(x)

    def eval_cons(self, x):
        return self._c(x)

    def eval_jac_cons(self, x):
        return self._jac_c(x)

    def eval_hess_lagr(self, x, obj_factor, lam):
        return self._hess_lagr(x, obj_factor, lam)
