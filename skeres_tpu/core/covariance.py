"""Covariance estimation of the solution.

TPU-native counterpart of the reference lineage's covariance layer
(``include/ceres/covariance.h``, ``internal/ceres/covariance_impl.cc``),
dense-SVD algorithm only (the sparse-QR path is a general-sparse CPU
factorization with no good TPU mapping — documented deviation, SURVEY.md
§3.6): the tangent-space covariance is the Moore-Penrose pseudo-inverse of
J^T J with the reference's rank handling (``null_space_rank``,
``min_reciprocal_condition_number``), lifted back to ambient coordinates
through the manifold plus-Jacobians exactly like the reference's
``GetCovarianceBlock``.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["Covariance", "CovarianceOptions"]


@dataclasses.dataclass
class CovarianceOptions:
    """Reference: ``Covariance::Options`` (dense-SVD relevant fields)."""

    min_reciprocal_condition_number: float = 1e-14
    # >= 0: treat exactly this many trailing singular values as null space
    # (reference semantics: -1 = automatic via the condition number test)
    null_space_rank: int = 0
    apply_loss_function: bool = True


class Covariance:
    """Compute and query covariance blocks of a solved problem."""

    def __init__(self, options: Optional[CovarianceOptions] = None):
        self.options = options or CovarianceOptions()
        self._cov_tangent: Optional[np.ndarray] = None
        self._program = None
        self._rank: Optional[int] = None

    def compute(self, problem, program=None) -> bool:
        """Dense-SVD covariance of the whole tangent space.

        Returns False when J^T J is rank-deficient beyond what the options
        allow (the reference returns false from Compute in that case).
        """
        from skeres_tpu.core.evaluator import Evaluator

        program = program or problem.compile()
        ev = Evaluator(program)
        state = program.initial_state(ev.dtype)
        _, blocks = jax.jit(ev.blocks)(state)
        jtj = np.asarray(jax.jit(ev.jtj_dense)(blocks), dtype=np.float64)

        # restrict to free coordinates; constant blocks get zero covariance
        free = program.free_mask > 0.0
        jtj_f = jtj[np.ix_(free, free)]

        u, s, _ = np.linalg.svd(jtj_f, hermitian=True)
        if s.size == 0:
            return False
        o = self.options
        if o.null_space_rank < 0:
            keep = s > o.min_reciprocal_condition_number * s[0]
        else:
            keep = np.ones_like(s, dtype=bool)
            cutoff = len(s) - o.null_space_rank
            keep[cutoff:] = False
            # reference: with automatic detection off, a kept singular value
            # below the threshold is an error (rank deficiency)
            bad = s[:cutoff] <= o.min_reciprocal_condition_number * s[0]
            if bad.any():
                self._rank = int(np.sum(~bad))
                return False
        with np.errstate(divide="ignore"):
            inv_s = np.where(keep, 1.0 / np.where(keep, s, 1.0), 0.0)
        cov_f = (u * inv_s[None, :]) @ u.T

        n = program.num_tangent
        cov = np.zeros((n, n))
        idx = np.nonzero(free)[0]
        cov[np.ix_(idx, idx)] = cov_f

        self._cov_tangent = cov
        self._program = program
        self._rank = int(np.sum(keep))
        return True

    # -- queries -------------------------------------------------------------

    def _tangent_span(self, block) -> Tuple[int, int]:
        program = self._program
        g = program.groups[block.group_index]
        off = program.tangent_offset[block.group_index] + block.row * g.tangent_size
        return off, g.tangent_size

    def get_covariance_block_in_tangent_space(self, b1, b2) -> np.ndarray:
        assert self._cov_tangent is not None, "call compute() first"
        o1, t1 = self._tangent_span(b1)
        o2, t2 = self._tangent_span(b2)
        return self._cov_tangent[o1 : o1 + t1, o2 : o2 + t2].copy()

    def get_covariance_block(self, b1, b2) -> np.ndarray:
        """Ambient-space covariance: J_plus(x1) C J_plus(x2)^T
        (reference: CovarianceImpl::GetCovarianceBlockInTangentOrAmbientSpace)."""
        ct = self.get_covariance_block_in_tangent_space(b1, b2)
        g1 = self._program.groups[b1.group_index]
        g2 = self._program.groups[b2.group_index]
        j1 = np.asarray(
            g1.manifold.plus_jacobian(jnp.asarray(b1.value)), dtype=np.float64
        )
        j2 = np.asarray(
            g2.manifold.plus_jacobian(jnp.asarray(b2.value)), dtype=np.float64
        )
        return j1 @ ct @ j2.T

    @property
    def rank(self) -> Optional[int]:
        return self._rank
