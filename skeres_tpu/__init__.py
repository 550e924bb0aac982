"""skeres_tpu — a TPU-native nonlinear least-squares framework.

A from-scratch re-design (not a port) of the skeres/Ceres capability
surface for TPU: residual blocks are pure JAX functions batched with
``vmap``; Jacobians come from ``jax.jvp``/``jacfwd``; the block-sparse
Jacobian lives as batched dense blocks in HBM; trust-region control runs as
a host-side loop over jitted device programs; linear solves are XLA/Pallas
kernels; multi-chip scaling shards residual blocks over a
``jax.sharding.Mesh`` with ``psum`` reduction of the normal equations.
"""

import jax as _jax

# TPU MXUs multiply f32 operands at bfloat16 precision by default — three
# decimal digits, far short of the 1e-6..1e-10 tolerances this solver
# chases (and of the reference, which is all f64). Force true-f32 matmuls
# framework-wide; the hot path is latency-bound, not MXU-bound, so the
# extra passes are free in practice. Users can still override per-call.
_jax.config.update("jax_default_matmul_precision", "highest")

from skeres_tpu.ops.loss import (
    ArctanLoss,
    CauchyLoss,
    ComposedLoss,
    HuberLoss,
    LossFunction,
    LossFunctionWrapper,
    ScaledLoss,
    SoftLOneLoss,
    TolerantLoss,
    TrivialLoss,
    TukeyLoss,
)
from skeres_tpu.models.manifolds import (
    AngleManifold,
    EigenQuaternionManifold,
    EuclideanManifold,
    LineManifold,
    Manifold,
    ProductManifold,
    QuaternionManifold,
    SphereManifold,
    SubsetManifold,
)

__version__ = "0.1.0"

# Solver-facing API is imported lazily to keep `import skeres_tpu` light and
# to avoid import cycles while the core grows.


def __getattr__(name):
    from importlib import import_module

    _core = {
        "Problem": "skeres_tpu.core.problem",
        "ResidualBlockId": "skeres_tpu.core.problem",
        "EvaluationCallback": "skeres_tpu.core.callbacks",
        "StateUpdatingCallback": "skeres_tpu.core.callbacks",
        "LoggingCallback": "skeres_tpu.core.callbacks",
        "SolverOptions": "skeres_tpu.core.options",
        "Summary": "skeres_tpu.core.summary",
        "solve": "skeres_tpu.core.solver",
        "Covariance": "skeres_tpu.core.covariance",
        "GradientProblem": "skeres_tpu.core.gradient_problem",
        "GradientProblemSolver": "skeres_tpu.core.gradient_problem",
    }
    if name in _core:
        return getattr(import_module(_core[name]), name)
    raise AttributeError(f"module 'skeres_tpu' has no attribute {name!r}")
