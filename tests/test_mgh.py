"""More-Garbow-Hillstrom convergence certification.

Counterpart of the reference lineage's ``examples/more_garbow_hillstrom.cc``
and the NIST-style certification in ``system_test.cc``: classic
zero-residual test problems must reach their certified minima from the
standard starting points. Cost convention: 0.5 * sum r_i^2, so certified
F* = 0 means final_cost -> 0.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import skeres_tpu as st
from skeres_tpu.core.options import SolverOptions
from skeres_tpu.core.types import LinearSolverType


def _solve(residual_fn, x0, m, max_iterations=200, **kw):
    problem = st.Problem()
    x = problem.add_parameter_block(np.asarray(x0, dtype=np.float64))

    def fn(params, data):
        (p,) = params
        return residual_fn(p)

    problem.add_residual_block(fn, None, [x])
    options = SolverOptions(
        linear_solver_type=LinearSolverType.DENSE_QR,
        max_num_iterations=max_iterations,
        use_nonmonotonic_steps=True,
        **kw,
    )
    summary = st.solve(options, problem)
    return summary, np.asarray(x.value)


def test_mgh01_rosenbrock():
    def r(p):
        return jnp.stack([10.0 * (p[1] - p[0] ** 2), 1.0 - p[0]])

    summary, x = _solve(r, [-1.2, 1.0], 2)
    assert summary.final_cost < 1e-12
    np.testing.assert_allclose(x, [1.0, 1.0], atol=1e-5)


def test_mgh03_powell_badly_scaled():
    def r(p):
        return jnp.stack(
            [1e4 * p[0] * p[1] - 1.0, jnp.exp(-p[0]) + jnp.exp(-p[1]) - 1.0001]
        )

    summary, x = _solve(r, [0.0, 1.0], 2, max_iterations=400)
    assert summary.final_cost < 1e-12


def test_mgh05_beale():
    def r(p):
        return jnp.stack(
            [
                1.5 - p[0] * (1.0 - p[1]),
                2.25 - p[0] * (1.0 - p[1] ** 2),
                2.625 - p[0] * (1.0 - p[1] ** 3),
            ]
        )

    summary, x = _solve(r, [1.0, 1.0], 3)
    assert summary.final_cost < 1e-12
    np.testing.assert_allclose(x, [3.0, 0.5], atol=1e-5)


def test_mgh07_helical_valley():
    def r(p):
        theta = jnp.arctan2(p[1], p[0]) / (2.0 * jnp.pi)
        return jnp.stack(
            [
                10.0 * (p[2] - 10.0 * theta),
                10.0 * (jnp.sqrt(p[0] ** 2 + p[1] ** 2) - 1.0),
                p[2],
            ]
        )

    summary, x = _solve(r, [-1.0, 0.0, 0.0], 3)
    assert summary.final_cost < 1e-12
    np.testing.assert_allclose(x, [1.0, 0.0, 0.0], atol=1e-5)


def test_mgh09_gaussian():
    y = jnp.asarray(
        [
            0.0009, 0.0044, 0.0175, 0.0540, 0.1295, 0.2420, 0.3521, 0.3989,
            0.3521, 0.2420, 0.1295, 0.0540, 0.0175, 0.0044, 0.0009,
        ]
    )

    def r(p):
        t = (8.0 - jnp.arange(1.0, 16.0)) / 2.0
        return p[0] * jnp.exp(-p[1] * (t - p[2]) ** 2 / 2.0) - y

    summary, x = _solve(r, [0.4, 1.0, 0.0], 15)
    # certified: F* = 1.12793e-8 (sum of squares) -> cost = F*/2
    np.testing.assert_allclose(summary.final_cost, 1.12793e-8 / 2, rtol=1e-3)


def test_mgh14_wood():
    def r(p):
        return jnp.stack(
            [
                10.0 * (p[1] - p[0] ** 2),
                1.0 - p[0],
                jnp.sqrt(90.0) * (p[3] - p[2] ** 2),
                1.0 - p[2],
                jnp.sqrt(10.0) * (p[1] + p[3] - 2.0),
                (p[1] - p[3]) / jnp.sqrt(10.0),
            ]
        )

    summary, x = _solve(r, [-3.0, -1.0, -3.0, -1.0], 6, max_iterations=400)
    # MGH: global minimum F = 0 at (1,1,1,1); from the standard start many
    # descent methods land in the documented local minimum F ~ 7.87697
    # near (-0.97, 0.95, -0.97, 0.95). Accept either certified value.
    local_f = 7.876972
    assert (
        summary.final_cost < 1e-12
        or abs(summary.final_cost - local_f / 2.0) < 1e-3
    ), summary.final_cost


def test_mgh16_brown_dennis():
    t = jnp.arange(1.0, 21.0) / 5.0

    def r(p):
        a = p[0] + t * p[1] - jnp.exp(t)
        b = p[2] + p[3] * jnp.sin(t) - jnp.cos(t)
        return a * a + b * b

    summary, x = _solve(r, [25.0, 5.0, -5.0, -1.0], 20, max_iterations=400)
    # certified minimum: F* = 85822.2 (sum of squares)
    np.testing.assert_allclose(summary.final_cost, 85822.2 / 2.0, rtol=1e-4)


def test_mgh18_biggs_exp6():
    t = jnp.arange(1.0, 14.0) / 10.0
    y = jnp.exp(-t) - 5.0 * jnp.exp(-10.0 * t) + 3.0 * jnp.exp(-4.0 * t)

    def r(p):
        return (
            p[2] * jnp.exp(-t * p[0])
            - p[3] * jnp.exp(-t * p[1])
            + p[5] * jnp.exp(-t * p[4])
            - y
        )

    summary, x = _solve(
        r, [1.0, 2.0, 1.0, 1.0, 1.0, 1.0], 13, max_iterations=600
    )
    # converges to F* = 0 (global) or 5.65565e-3 (local) per MGH
    assert summary.final_cost < 5.66e-3 / 2.0 + 1e-6
