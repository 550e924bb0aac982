"""Gradient checking: jvp-Jacobians vs numeric differentiation.

TPU-native counterpart of the reference lineage's gradient-checking layer
(``include/ceres/gradient_checker.h``,
``internal/ceres/gradient_checking_cost_function.cc``,
``internal/ceres/numeric_diff.h``). The reference wraps every CostFunction
in a checking proxy; here the check runs once per *batch* (all blocks of a
batch share one residual function, so checking the whole batch at the
initial state covers every block's actual evaluation point).

Central finite differences are taken in the *tangent space* of each block
(through ``manifold.plus``), matching how the solver's Jacobians are
defined, and compared against the ``jax.linearize`` Jacobian.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["check_program_gradients", "numeric_jacobian"]


def numeric_jacobian(f, t_dim: int, dtype, relative_step_size: float = 1e-6):
    """Central-difference Jacobian of ``f: (T,) -> (m,)`` at 0.

    Step size per coordinate follows the reference's NumericDiffOptions:
    ``h = relative_step_size`` around the zero tangent (the tangent origin
    has no scale, so the relative step degenerates to an absolute one —
    same as the reference at x = 0).
    """
    h = relative_step_size
    basis = jnp.eye(t_dim, dtype=dtype)

    def col(e):
        return (f(h * e) - f(-h * e)) / (2.0 * h)

    cols = jax.vmap(col)(basis)  # (T, m)
    return jnp.swapaxes(cols, 0, 1)  # (m, T)


def check_program_gradients(
    program,
    evaluator,
    relative_precision: float = 1e-8,
    step_size: float = 1e-6,
) -> Tuple[bool, str]:
    """Check every batch's analytic-vs-numeric Jacobian at the current state.

    Returns (ok, message); message names the first offending batch and the
    worst relative error, mirroring the reference's log-and-abort behavior.
    """
    state = program.initial_state(evaluator.dtype)
    dtype = evaluator.dtype

    for bi, batch in enumerate(program.batches):
        if batch.numeric_diff:
            # this batch SOLVES with numeric derivatives — comparing them
            # against themselves is vacuous, and against jax.linearize is
            # exactly the mismatch the user opted out of
            continue
        data, idx, _, _, _ = evaluator._batch_const[bi]
        xs = evaluator._gather_slots(batch, idx, state)
        manifolds = [program.groups[gi].manifold for gi in batch.slot_groups]
        T = batch.block_tangent_size

        def one_block(data_row, *x_row):
            def f(delta):
                ds = evaluator._split_delta(batch, delta)
                xp = tuple(
                    m.plus(x, d) for m, x, d in zip(manifolds, x_row, ds)
                )
                return batch.fn(xp, data_row)

            zero = jnp.zeros((T,), dtype=dtype)
            r, lin = jax.linearize(f, zero)
            basis = jnp.eye(T, dtype=dtype)
            j_analytic = jnp.swapaxes(jax.vmap(lin)(basis), 0, 1)
            j_numeric = numeric_jacobian(f, T, dtype, step_size)
            return j_analytic, j_numeric

        if data is None:
            ja, jn = jax.vmap(lambda *x: one_block(None, *x))(*xs)
        else:
            ja, jn = jax.vmap(one_block)(data, *xs)

        ja = np.asarray(ja)
        jn = np.asarray(jn)
        scale = np.maximum(np.abs(ja), np.abs(jn))
        # absolute tolerance floor mirrors the reference: entries whose
        # magnitude is below sqrt(precision) are compared absolutely
        denom = np.maximum(scale, np.sqrt(relative_precision))
        rel_err = np.abs(ja - jn) / denom
        worst = float(rel_err.max()) if rel_err.size else 0.0
        if worst > relative_precision * 1e4 and worst > np.sqrt(step_size):
            bad = np.unravel_index(int(rel_err.argmax()), rel_err.shape)
            return False, (
                f"batch '{batch.name}' (index {bi}): max relative error "
                f"{worst:.3e} at block {bad[0]}, residual {bad[1]}, "
                f"tangent coord {bad[2]} (analytic={ja[bad]:.6e}, "
                f"numeric={jn[bad]:.6e})"
            )
    return True, ""
