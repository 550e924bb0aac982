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
        # certification-grade convergence: Watson-12's certified 4.72238e-10
        # and Penalty2's 2.93660e-4 are only reached with tight tolerances
        function_tolerance=1e-16,
        gradient_tolerance=1e-16,
        parameter_tolerance=1e-16,
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


# ---------------------------------------------------------------------------
# Completion of the full 35-function MGH set (VERDICT r2 next #4).
# Certified minima are the paper's F* values in the sum-of-squares
# convention (our final_cost = F/2). Where the paper documents a local
# minimum reachable from the standard start, either value is accepted —
# the same policy as the reference lineage's more_garbow_hillstrom.cc
# expected-value tables.
# ---------------------------------------------------------------------------


def test_mgh02_freudenstein_roth():
    def r(p):
        return jnp.stack([
            -13.0 + p[0] + ((5.0 - p[1]) * p[1] - 2.0) * p[1],
            -29.0 + p[0] + ((p[1] + 1.0) * p[1] - 14.0) * p[1],
        ])

    summary, x = _solve(r, [0.5, -2.0], 2, max_iterations=400)
    # F* = 0 at (5, 4); documented local minimum F = 48.9842... at
    # (11.41..., -0.8968...) is what most descent methods reach from the
    # standard start
    assert (summary.final_cost < 1e-10
            or abs(2.0 * summary.final_cost - 48.98425) < 1e-3), (
        summary.final_cost)


def test_mgh04_brown_badly_scaled():
    def r(p):
        return jnp.stack([p[0] - 1e6, p[1] - 2e-6, p[0] * p[1] - 2.0])

    summary, x = _solve(r, [1.0, 1.0], 3, max_iterations=400)
    assert summary.final_cost < 1e-10
    np.testing.assert_allclose(x, [1e6, 2e-6], rtol=1e-4)


def test_mgh06_jennrich_sampson():
    i = jnp.arange(1.0, 11.0)

    def r(p):
        return 2.0 + 2.0 * i - (jnp.exp(i * p[0]) + jnp.exp(i * p[1]))

    summary, x = _solve(r, [0.3, 0.4], 10)
    # F* = 124.362 at x1 = x2 = 0.2578
    np.testing.assert_allclose(2.0 * summary.final_cost, 124.362, rtol=1e-4)


def test_mgh08_bard():
    y = jnp.asarray([0.14, 0.18, 0.22, 0.25, 0.29, 0.32, 0.35, 0.39, 0.37,
                     0.58, 0.73, 0.96, 1.34, 2.10, 4.39])
    u = jnp.arange(1.0, 16.0)
    v = 16.0 - u
    w = jnp.minimum(u, v)

    def r(p):
        return y - (p[0] + u / (v * p[1] + w * p[2]))

    summary, x = _solve(r, [1.0, 1.0, 1.0], 15)
    # F* = 8.21487e-3; documented second minimum F = 17.4286
    assert (abs(2.0 * summary.final_cost - 8.21487e-3) < 1e-7
            or abs(2.0 * summary.final_cost - 17.4286) < 1e-3), (
        summary.final_cost)


def test_mgh10_meyer():
    t = 45.0 + 5.0 * jnp.arange(1.0, 17.0)
    y = jnp.asarray([34780.0, 28610.0, 23650.0, 19630.0, 16370.0, 13720.0,
                     11540.0, 9744.0, 8261.0, 7030.0, 6005.0, 5147.0,
                     4427.0, 3820.0, 3307.0, 2872.0])

    def r(p):
        return p[0] * jnp.exp(p[1] / (t + p[2])) - y

    summary, x = _solve(r, [0.02, 4000.0, 250.0], 16, max_iterations=800)
    np.testing.assert_allclose(2.0 * summary.final_cost, 87.9458, rtol=1e-5)


def test_mgh11_gulf():
    m = 99
    t = jnp.arange(1.0, m + 1.0) / 100.0
    y = 25.0 + (-50.0 * jnp.log(t)) ** (2.0 / 3.0)

    def r(p):
        return jnp.exp(-(jnp.abs(y - p[1]) ** p[2]) / p[0]) - t

    summary, x = _solve(r, [5.0, 2.5, 0.15], m, max_iterations=800)
    assert summary.final_cost < 1e-10
    np.testing.assert_allclose(x, [50.0, 25.0, 1.5], rtol=1e-3)


def test_mgh12_box_3d():
    t = 0.1 * jnp.arange(1.0, 11.0)

    def r(p):
        return (jnp.exp(-t * p[0]) - jnp.exp(-t * p[1])
                - p[2] * (jnp.exp(-t) - jnp.exp(-10.0 * t)))

    summary, x = _solve(r, [0.0, 10.0, 20.0], 10, max_iterations=400)
    # F = 0 at (1,10,1), (10,1,-1), and along x1=x2, x3=0
    assert summary.final_cost < 1e-12


def test_mgh13_powell_singular():
    def r(p):
        return jnp.stack([
            p[0] + 10.0 * p[1],
            jnp.sqrt(5.0) * (p[2] - p[3]),
            (p[1] - 2.0 * p[2]) ** 2,
            jnp.sqrt(10.0) * (p[0] - p[3]) ** 2,
        ])

    summary, x = _solve(r, [3.0, -1.0, 0.0, 1.0], 4, max_iterations=400)
    # singular Hessian at the solution: convergence is slow but monotone
    assert summary.final_cost < 1e-12
    np.testing.assert_allclose(x, np.zeros(4), atol=1e-2)


def test_mgh15_kowalik_osborne():
    y = jnp.asarray([0.1957, 0.1947, 0.1735, 0.1600, 0.0844, 0.0627,
                     0.0456, 0.0342, 0.0323, 0.0235, 0.0246])
    u = jnp.asarray([4.0, 2.0, 1.0, 0.5, 0.25, 0.167, 0.125, 0.1,
                     0.0833, 0.0714, 0.0625])

    def r(p):
        return y - p[0] * (u ** 2 + u * p[1]) / (u ** 2 + u * p[2] + p[3])

    summary, x = _solve(r, [0.25, 0.39, 0.415, 0.39], 11)
    np.testing.assert_allclose(2.0 * summary.final_cost, 3.07505e-4,
                               rtol=1e-4)


def test_mgh17_osborne1():
    y = jnp.asarray([0.844, 0.908, 0.932, 0.936, 0.925, 0.908, 0.881,
                     0.850, 0.818, 0.784, 0.751, 0.718, 0.685, 0.658,
                     0.628, 0.603, 0.580, 0.558, 0.538, 0.522, 0.506,
                     0.490, 0.478, 0.467, 0.457, 0.448, 0.438, 0.431,
                     0.424, 0.420, 0.414, 0.411, 0.406])
    t = 10.0 * jnp.arange(33.0)

    def r(p):
        return y - (p[0] + p[1] * jnp.exp(-t * p[3])
                    + p[2] * jnp.exp(-t * p[4]))

    summary, x = _solve(r, [0.5, 1.5, -1.0, 0.01, 0.02], 33,
                        max_iterations=400)
    np.testing.assert_allclose(2.0 * summary.final_cost, 5.46489e-5,
                               rtol=1e-4)


def test_mgh19_osborne2():
    y = jnp.asarray([1.366, 1.191, 1.112, 1.013, 0.991, 0.885, 0.831,
                     0.847, 0.786, 0.725, 0.746, 0.679, 0.608, 0.655,
                     0.616, 0.606, 0.602, 0.626, 0.651, 0.724, 0.649,
                     0.649, 0.694, 0.644, 0.624, 0.661, 0.612, 0.558,
                     0.533, 0.495, 0.500, 0.423, 0.395, 0.375, 0.372,
                     0.391, 0.396, 0.405, 0.428, 0.429, 0.523, 0.562,
                     0.607, 0.653, 0.672, 0.708, 0.633, 0.668, 0.645,
                     0.632, 0.591, 0.559, 0.597, 0.625, 0.739, 0.710,
                     0.729, 0.720, 0.636, 0.581, 0.428, 0.292, 0.162,
                     0.098, 0.054])
    t = jnp.arange(65.0) / 10.0

    def r(p):
        return y - (p[0] * jnp.exp(-t * p[4])
                    + p[1] * jnp.exp(-((t - p[8]) ** 2) * p[5])
                    + p[2] * jnp.exp(-((t - p[9]) ** 2) * p[6])
                    + p[3] * jnp.exp(-((t - p[10]) ** 2) * p[7]))

    summary, x = _solve(
        r, [1.3, 0.65, 0.65, 0.7, 0.6, 3.0, 5.0, 7.0, 2.0, 4.5, 5.5], 65,
        max_iterations=400,
    )
    np.testing.assert_allclose(2.0 * summary.final_cost, 4.01377e-2,
                               rtol=1e-4)


@pytest.mark.parametrize("n,fstar", [(6, 2.28767e-3), (9, 1.39976e-6),
                                     (12, 4.72238e-10)])
def test_mgh20_watson(n, fstar):
    t = jnp.arange(1.0, 30.0) / 29.0

    def r(p):
        powers = t[:, None] ** jnp.arange(n)  # (29, n)
        s1 = powers[:, :-1] @ (jnp.arange(1.0, n) * p[1:])
        s2 = powers @ p
        main = s1 - s2 ** 2 - 1.0
        return jnp.concatenate([main, jnp.stack([p[0], p[1] - p[0] ** 2 - 1.0])])

    summary, x = _solve(r, np.zeros(n), 31, max_iterations=800)
    np.testing.assert_allclose(2.0 * summary.final_cost, fstar, rtol=1e-3,
                               atol=1e-12)


def test_mgh21_extended_rosenbrock():
    n = 10

    def r(p):
        even = p[0:n:2]
        odd = p[1:n:2]
        return jnp.concatenate([10.0 * (odd - even ** 2), 1.0 - even])

    x0 = np.tile([-1.2, 1.0], n // 2)
    summary, x = _solve(r, x0, n, max_iterations=400)
    assert summary.final_cost < 1e-12
    np.testing.assert_allclose(x, np.ones(n), atol=1e-5)


def test_mgh22_extended_powell_singular():
    n = 12

    def r(p):
        a = p[0:n:4]
        b = p[1:n:4]
        c = p[2:n:4]
        d = p[3:n:4]
        return jnp.concatenate([
            a + 10.0 * b,
            jnp.sqrt(5.0) * (c - d),
            (b - 2.0 * c) ** 2,
            jnp.sqrt(10.0) * (a - d) ** 2,
        ])

    x0 = np.tile([3.0, -1.0, 0.0, 1.0], n // 4)
    summary, x = _solve(r, x0, n, max_iterations=400)
    assert summary.final_cost < 1e-12


@pytest.mark.parametrize("n,fstar", [(4, 2.24997e-5), (10, 7.08765e-5)])
def test_mgh23_penalty1(n, fstar):
    a = jnp.sqrt(1e-5)

    def r(p):
        return jnp.concatenate([a * (p - 1.0),
                                jnp.stack([jnp.sum(p ** 2) - 0.25])])

    # the penalty structure forces thousands of tiny LM steps (scipy's
    # MINPACK lm needs the same order of work to certify n=10)
    summary, x = _solve(r, np.arange(1.0, n + 1.0), n + 1,
                        max_iterations=20000)
    np.testing.assert_allclose(2.0 * summary.final_cost, fstar, rtol=1e-4)


@pytest.mark.parametrize("n,fstar", [(4, 9.37629e-6), (10, 2.93660e-4)])
def test_mgh24_penalty2(n, fstar):
    a = jnp.sqrt(1e-5)
    i = jnp.arange(2.0, n + 1.0)
    y = jnp.exp(i / 10.0) + jnp.exp((i - 1.0) / 10.0)

    def r(p):
        r1 = jnp.stack([p[0] - 0.2])
        r2 = a * (jnp.exp(p[1:] / 10.0) + jnp.exp(p[:-1] / 10.0) - y)
        r3 = a * (jnp.exp(p[1:] / 10.0) - jnp.exp(-0.1))
        w = jnp.arange(n, 0.0, -1.0)
        r4 = jnp.stack([jnp.sum(w * p ** 2) - 1.0])
        return jnp.concatenate([r1, r2, r3, r4])

    summary, x = _solve(r, np.full(n, 0.5), 2 * n, max_iterations=800)
    np.testing.assert_allclose(2.0 * summary.final_cost, fstar, rtol=1e-4)


def test_mgh25_variably_dimensioned():
    n = 10
    j = jnp.arange(1.0, n + 1.0)

    def r(p):
        s = jnp.sum(j * (p - 1.0))
        return jnp.concatenate([p - 1.0, jnp.stack([s, s ** 2])])

    x0 = 1.0 - np.arange(1.0, n + 1.0) / n
    summary, x = _solve(r, x0, n + 2, max_iterations=400)
    assert summary.final_cost < 1e-12
    np.testing.assert_allclose(x, np.ones(n), atol=1e-6)


def test_mgh26_trigonometric():
    n = 10
    i = jnp.arange(1.0, n + 1.0)

    def r(p):
        return (n - jnp.sum(jnp.cos(p)) + i * (1.0 - jnp.cos(p))
                - jnp.sin(p))

    summary, x = _solve(r, np.full(n, 1.0 / n), n, max_iterations=400)
    # F* = 0; measured: from the standard 1/n start LM lands in the
    # documented small local minimum F = 2.79506e-5 (the paper notes the
    # trigonometric function's local minima; published MINPACK results
    # reach the same value)
    assert (summary.final_cost < 1e-12
            or abs(2.0 * summary.final_cost - 2.79506e-5) < 1e-9), (
        summary.final_cost)


def test_mgh27_brown_almost_linear():
    n = 10

    def r(p):
        main = p[:-1] + jnp.sum(p) - (n + 1.0)
        last = jnp.prod(p) - 1.0
        return jnp.concatenate([main, jnp.stack([last])])

    summary, x = _solve(r, np.full(n, 0.5), n, max_iterations=400)
    # F = 0 on the curve (a,...,a, a^{1-n}); F = 1 documented local min
    assert (summary.final_cost < 1e-12
            or abs(2.0 * summary.final_cost - 1.0) < 1e-6), (
        summary.final_cost)


def test_mgh28_discrete_boundary_value():
    n = 10
    h = 1.0 / (n + 1.0)
    t = h * jnp.arange(1.0, n + 1.0)

    def r(p):
        pm = jnp.concatenate([jnp.zeros(1), p, jnp.zeros(1)])
        return (2.0 * pm[1:-1] - pm[:-2] - pm[2:]
                + h ** 2 * (pm[1:-1] + t + 1.0) ** 3 / 2.0)

    x0 = np.asarray(t * (t - 1.0))
    summary, x = _solve(r, x0, n)
    assert summary.final_cost < 1e-18


def test_mgh29_discrete_integral():
    n = 10
    h = 1.0 / (n + 1.0)
    t = h * jnp.arange(1.0, n + 1.0)

    def r(p):
        cube = (p + t + 1.0) ** 3
        lower = jnp.tril(jnp.ones((n, n))) @ (t * cube)
        total = jnp.sum(t * cube)
        upper = jnp.tril(jnp.ones((n, n))) @ ((1.0 - t) * cube)
        total_u = jnp.sum((1.0 - t) * cube)
        return p + h * ((1.0 - t) * lower + t * (total_u - upper)) / 2.0

    x0 = np.asarray(t * (t - 1.0))
    summary, x = _solve(r, x0, n)
    assert summary.final_cost < 1e-20


def test_mgh30_broyden_tridiagonal():
    n = 10

    def r(p):
        pm = jnp.concatenate([jnp.zeros(1), p, jnp.zeros(1)])
        return ((3.0 - 2.0 * pm[1:-1]) * pm[1:-1] - pm[:-2]
                - 2.0 * pm[2:] + 1.0)

    summary, x = _solve(r, np.full(n, -1.0), n)
    assert summary.final_cost < 1e-20


def test_mgh31_broyden_banded():
    n = 10

    def r(p):
        out = []
        for i in range(n):
            lo = max(0, i - 5)
            s = sum(p[j] * (1.0 + p[j]) for j in range(lo, min(n, i + 2))
                    if j != i)
            out.append(p[i] * (2.0 + 5.0 * p[i] ** 2) + 1.0 - s)
        return jnp.stack(out)

    summary, x = _solve(r, np.full(n, -1.0), n)
    assert summary.final_cost < 1e-20


def test_mgh32_linear_full_rank():
    n, m = 10, 20

    def r(p):
        s = jnp.sum(p)
        head = p - 2.0 * s / m - 1.0
        tail = jnp.full(m - n, -2.0 * s / m - 1.0)
        return jnp.concatenate([head, tail])

    summary, x = _solve(r, np.ones(n), m)
    np.testing.assert_allclose(2.0 * summary.final_cost, float(m - n),
                               rtol=1e-10)
    np.testing.assert_allclose(x, -np.ones(n), atol=1e-8)


def test_mgh33_linear_rank1():
    n, m = 10, 20
    i = jnp.arange(1.0, m + 1.0)
    j = jnp.arange(1.0, n + 1.0)

    def r(p):
        return i * jnp.sum(j * p) - 1.0

    summary, x = _solve(r, np.ones(n), m)
    fstar = m * (m - 1.0) / (2.0 * (2.0 * m + 1.0))
    np.testing.assert_allclose(2.0 * summary.final_cost, fstar, rtol=1e-10)


def test_mgh34_linear_rank1_zero_cols_rows():
    n, m = 10, 20
    i = jnp.arange(2.0, m)  # rows 2..m-1
    j = jnp.arange(2.0, n)  # cols 2..n-1

    def r(p):
        mid = (i - 1.0) * jnp.sum(j * p[1:-1]) - 1.0
        return jnp.concatenate([jnp.full((1,), -1.0), mid,
                                jnp.full((1,), -1.0)])

    summary, x = _solve(r, np.ones(n), m)
    fstar = (m ** 2 + 3.0 * m - 6.0) / (2.0 * (2.0 * m - 3.0))
    np.testing.assert_allclose(2.0 * summary.final_cost, fstar, rtol=1e-10)


@pytest.mark.parametrize("n,fstar", [(7, 0.0), (8, 3.51687e-3),
                                     (9, 0.0), (10, 6.50395e-3)])
def test_mgh35_chebyquad(n, fstar):
    def r(p):
        # shifted Chebyshev polynomials T*_i on [0,1] by recurrence
        z = 2.0 * p - 1.0  # map to [-1,1]
        tprev = jnp.ones_like(z)
        tcur = z
        rows = []
        for k in range(1, n + 1):
            rows.append(jnp.mean(tcur))
            tnext = 2.0 * z * tcur - tprev
            tprev, tcur = tcur, tnext
        terms = jnp.stack(rows)  # (n,) mean of T*_k over the points
        k = np.arange(1, n + 1)
        integral = np.where(k % 2 == 1, 0.0,
                            -1.0 / np.where(k == 1, 1.0, k ** 2 - 1.0))
        return terms - jnp.asarray(integral)

    x0 = np.arange(1.0, n + 1.0) / (n + 1.0)
    summary, x = _solve(r, x0, n, max_iterations=400)
    if fstar == 0.0:
        assert summary.final_cost < 1e-16
    else:
        np.testing.assert_allclose(2.0 * summary.final_cost, fstar,
                                   rtol=1e-4)
