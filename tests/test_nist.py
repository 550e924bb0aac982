"""NIST StRD nonlinear regression certification (subset).

Counterpart of the reference lineage's ``examples/nist.cc``: fit the
published NIST Statistical Reference Datasets models from the certified
starting points and compare the reached sum-of-squared-residuals against
the certified values. Data/certified values below are from the public NIST
StRD pages (Misra1a, Chwirut-like models kept small; certified SSR quoted
to the published digits).
"""

import jax.numpy as jnp
import numpy as np
import pytest

import skeres_tpu as st
from skeres_tpu.core.options import SolverOptions
from skeres_tpu.core.types import LinearSolverType


def _fit(model, b0, x, y, max_iterations=200):
    problem = st.Problem()
    b = problem.add_parameter_block(np.asarray(b0, dtype=np.float64))

    def resid(params, data):
        (p,) = params
        return data[1:2] - model(p, data[0])

    problem.add_residual_blocks(
        resid,
        None,
        [(b.array, np.zeros(len(x), dtype=np.int32))],
        data=np.stack([x, y], axis=1),
    )
    options = SolverOptions(
        linear_solver_type=LinearSolverType.DENSE_QR,
        max_num_iterations=max_iterations,
        function_tolerance=1e-14,
        gradient_tolerance=1e-14,
        parameter_tolerance=1e-14,
    )
    summary = st.solve(options, problem)
    return summary, np.asarray(b.value)


# -- Misra1a: y = b1 (1 - exp(-b2 x)); certified SSR = 1.2455138894e-1 ----

MISRA1A_X = np.array(
    [77.6, 114.9, 141.1, 190.8, 239.9, 289.0, 332.8, 378.4, 434.8, 477.3,
     536.8, 593.1, 689.1, 760.0]
)
MISRA1A_Y = np.array(
    [10.07, 14.73, 17.94, 23.93, 29.61, 35.18, 40.02, 44.82, 50.76, 55.05,
     61.01, 66.40, 75.47, 81.78]
)


@pytest.mark.parametrize("start", [[500.0, 0.0001], [250.0, 0.0005]])
def test_nist_misra1a(start):
    def model(p, xv):
        return p[0] * (1.0 - jnp.exp(-p[1] * xv))

    summary, b = _fit(model, start, MISRA1A_X, MISRA1A_Y)
    ssr = 2.0 * summary.final_cost
    np.testing.assert_allclose(ssr, 1.2455138894e-1, rtol=1e-7)
    np.testing.assert_allclose(b, [2.3894212918e2, 5.5015643181e-4], rtol=1e-5)


# -- Thurber (higher difficulty): rational model, certified SSR = 5.6427082397e3

THURBER_X = np.array(
    [-3.067, -2.981, -2.921, -2.912, -2.840, -2.797, -2.702, -2.699, -2.633,
     -2.481, -2.363, -2.322, -1.501, -1.460, -1.274, -1.212, -1.100, -1.046,
     -0.915, -0.714, -0.566, -0.545, -0.400, -0.309, -0.109, -0.103, 0.010,
     0.119, 0.377, 0.790, 0.963, 1.006, 1.115, 1.572, 1.841, 2.047, 2.200]
)
THURBER_Y = np.array(
    [80.574, 84.248, 87.264, 87.195, 89.076, 89.608, 89.868, 90.101, 92.405,
     95.854, 100.696, 101.060, 401.672, 390.724, 567.534, 635.316, 733.054,
     759.087, 894.206, 990.785, 1090.109, 1080.914, 1122.643, 1178.351,
     1260.531, 1273.514, 1288.339, 1327.543, 1353.863, 1414.509, 1425.208,
     1421.384, 1442.962, 1464.350, 1468.705, 1447.894, 1457.628]
)


def test_nist_thurber():
    def model(p, xv):
        num = p[0] + p[1] * xv + p[2] * xv**2 + p[3] * xv**3
        den = 1.0 + p[4] * xv + p[5] * xv**2 + p[6] * xv**3
        return num / den

    # certified start 2 (the easier published start)
    start = [1300.0, 1500.0, 500.0, 75.0, 1.0, 0.4, 0.05]
    summary, b = _fit(model, start, THURBER_X, THURBER_Y, max_iterations=400)
    ssr = 2.0 * summary.final_cost
    np.testing.assert_allclose(ssr, 5.6427082397e3, rtol=1e-6)


# -- Rat42 (sigmoid growth): certified SSR = 8.0565229338 ------------------

RAT42_X = np.array([9.0, 14.0, 21.0, 28.0, 42.0, 57.0, 63.0, 70.0, 79.0])
RAT42_Y = np.array([8.93, 10.80, 18.59, 22.33, 39.35, 56.11, 61.73, 64.62, 67.08])


def test_nist_rat42():
    def model(p, xv):
        return p[0] / (1.0 + jnp.exp(p[1] - p[2] * xv))

    summary, b = _fit(model, [100.0, 1.0, 0.1], RAT42_X, RAT42_Y)
    ssr = 2.0 * summary.final_cost
    np.testing.assert_allclose(ssr, 8.0565229338, rtol=1e-7)
    np.testing.assert_allclose(
        b, [7.2462237576e1, 2.6180768402, 6.7359200066e-2], rtol=1e-5
    )
