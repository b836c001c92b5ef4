"""hiop_tpu — a TPU-native nonlinear-programming framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of LLNL/HiOp
(reference: /root/reference, see SURVEY.md): filter line-search interior-point
methods (quasi-Newton and Newton) over dense-constrained, sparse, and mixed
dense-sparse NLP formulations, a primal-decomposition solver for two-stage
stochastic programs, sharded distributed linear algebra over a
``jax.sharding.Mesh`` (replacing the reference's MPI layer), and the full
operational surface (typed options, leveled logging, run statistics,
checkpointing, feasibility restoration, KKT dumping).

Precision note: the reference is float64 throughout (it is an optimizer that
converges to 1e-8 KKT tolerances). We enable x64 at import; hot KKT
factorizations can run in float32 with float64 iterative refinement via the
``kkt_fact_dtype`` option (the ReSolve-style mixed-precision pattern,
cf. reference src/LinAlg/ReSolve/).
"""

import os as _os

import jax as _jax

_jax.config.update("jax_enable_x64", True)

# TPU MXU float32 matmuls default to ONE bf16 pass (~8 mantissa bits) — fatal
# for KKT factorizations (measured: the blocked no-pivot LDL^T miscounts the
# inertia and its factor error reaches 1e5x at default precision, while at
# 'highest' it matches the CPU result). Every f32 matmul in this library is
# real linear algebra feeding a factorization or a Krylov solve, so the
# library-wide default is full-f32 ('highest' = 6-pass bf16 emulation).
# Override with HIOP_TPU_MATMUL_PRECISION={default,high,highest}.
_jax.config.update(
    "jax_default_matmul_precision",
    _os.environ.get("HIOP_TPU_MATMUL_PRECISION", "highest"),
)

# Persistent XLA compilation cache. NOTE: this must be a config update, not
# the JAX_COMPILATION_CACHE_DIR env var — environments that import jax at
# interpreter start (e.g. a sitecustomize registering a TPU plugin) latch
# the env-derived default before user code runs, silently disabling an
# env-var-only setting. Opt out with HIOP_TPU_COMPILE_CACHE="".
_cache_dir = _os.environ.get(
    "HIOP_TPU_COMPILE_CACHE",
    _os.path.join(_os.path.expanduser("~"), ".cache", "hiop_tpu_xla"),
)
if _cache_dir:
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)

# The host environment may force a platform at interpreter start (e.g. a
# sitecustomize registering a TPU plugin overrides JAX_PLATFORMS). Honor an
# explicit override so CLI drivers/tests can pick the backend:
#   HIOP_TPU_PLATFORM=cpu python examples/dense_ex1.py ...
if _os.environ.get("HIOP_TPU_PLATFORM"):
    _jax.config.update("jax_platforms", _os.environ["HIOP_TPU_PLATFORM"])

from hiop_tpu.status import SolveStatus  # noqa: E402
from hiop_tpu.utils.options import NlpOptions, PriDecOptions  # noqa: E402
from hiop_tpu.utils.logger import Logger, Verbosity  # noqa: E402
from hiop_tpu.interface.base import (  # noqa: E402
    NlpProblem,
    DenseConstraintsProblem,
    SparseProblem,
    MdsProblem,
    AutoDiffNlpProblem,
)
from hiop_tpu.formulation.base import NlpFormulation  # noqa: E402
from hiop_tpu.formulation.dense import NlpDenseConstraints  # noqa: E402
from hiop_tpu.formulation.sparse import NlpSparse  # noqa: E402
from hiop_tpu.formulation.mds import NlpMDS  # noqa: E402
from hiop_tpu.optimization.filter_ipm import (  # noqa: E402
    FilterIPMQuasiNewton,
    FilterIPMNewton,
)
from hiop_tpu.optimization.pridec import PriDecSolver  # noqa: E402
from hiop_tpu.interface.pridec import PriDecProblem, RecourseApproxEvaluator  # noqa: E402

__version__ = "0.1.0"

__all__ = [
    "SolveStatus",
    "NlpOptions",
    "PriDecOptions",
    "Logger",
    "Verbosity",
    "NlpProblem",
    "DenseConstraintsProblem",
    "SparseProblem",
    "MdsProblem",
    "AutoDiffNlpProblem",
    "NlpFormulation",
    "NlpDenseConstraints",
    "NlpSparse",
    "NlpMDS",
    "FilterIPMQuasiNewton",
    "FilterIPMNewton",
    "PriDecSolver",
    "PriDecProblem",
    "RecourseApproxEvaluator",
]
