"""Tests for the TPU kernel layer: Pallas Cholesky (interpret mode on
CPU), segment-reduce plans, and closed-form small SPD inverses."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from skeres_tpu.ops.pallas.cholesky import (
    blocked_chol_solve,
    blocked_cholesky_factor,
    chol_solve,
    cholesky_inverse_factor,
)
from skeres_tpu.ops.segment_reduce import apply_reduce_plan, build_reduce_plan
from skeres_tpu.ops.small_inverse import batched_spd_inverse


@pytest.mark.parametrize("n", [5, 37, 128, 300])
def test_pallas_cholesky_inverse_factor(n):
    rng = np.random.default_rng(n)
    m = rng.standard_normal((n, n))
    a = m @ m.T + n * np.eye(n)
    linv = np.asarray(cholesky_inverse_factor(jnp.asarray(a, jnp.float32)))
    l = np.linalg.cholesky(a)
    np.testing.assert_allclose(linv, np.linalg.inv(l), rtol=0, atol=2e-4)

    b = rng.standard_normal(n)
    x = np.asarray(
        chol_solve(jnp.asarray(linv), jnp.asarray(b, jnp.float32))
    )
    np.testing.assert_allclose(x, np.linalg.solve(a, b), rtol=0, atol=5e-4)


@pytest.mark.parametrize("n,panel", [(300, 128), (515, 128), (384, 384)])
def test_blocked_cholesky_factor_solve(n, panel):
    """Blocked HBM-scale path (small panels so interpret mode stays fast;
    on TPU the default 1024 panel covers venice's ~16k S)."""
    rng = np.random.default_rng(n)
    m = rng.standard_normal((n, n))
    a = m @ m.T + n * np.eye(n)
    fac = blocked_cholesky_factor(jnp.asarray(a, jnp.float32), panel=panel)
    l = np.asarray(fac.l)[:n, :n]
    np.testing.assert_allclose(l, np.linalg.cholesky(a), rtol=0, atol=3e-3)
    b = rng.standard_normal(n)
    x = np.asarray(blocked_chol_solve(fac, jnp.asarray(b, jnp.float32)))
    np.testing.assert_allclose(x, np.linalg.solve(a, b), rtol=0, atol=5e-4)


@pytest.mark.parametrize("kind_cfg", [
    # (n_dest, force) combos that exercise each plan kind
    dict(n_dest=7, force=False),        # onehot
    dict(n_dest=5000, force=False),     # gather (bounded fan-in)
    dict(n_dest=7, force=True),         # scatter
])
def test_reduce_plans_match_scatter(kind_cfg):
    rng = np.random.default_rng(0)
    b, d = 2000, 6
    idx = rng.integers(0, kind_cfg["n_dest"], size=b)
    vals = rng.standard_normal((b, d))
    plan = build_reduce_plan(
        idx, kind_cfg["n_dest"], force_scatter=kind_cfg["force"]
    )
    got = np.asarray(apply_reduce_plan(plan, jnp.asarray(vals)))
    want = np.zeros((kind_cfg["n_dest"], d))
    np.add.at(want, idx, vals)
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-10)


def test_gather_plan_selected_for_bounded_fanin():
    # many destinations, each hit at most a few times, NOT grouped
    # contiguously (the grouped shape now takes the 'contig' plan —
    # tests/test_segment_reduce.py) -> 'gather'
    rng = np.random.default_rng(0)
    idx = np.repeat(np.arange(4096), 3)
    rng.shuffle(idx)
    plan = build_reduce_plan(idx, 4096)
    assert plan.kind == "gather"
    vals = rng.standard_normal((len(idx), 2))
    got = np.asarray(apply_reduce_plan(plan, jnp.asarray(vals)))
    want = np.zeros((4096, 2))
    np.add.at(want, idx, vals)
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("e", [1, 2, 3, 5])
def test_batched_spd_inverse(e):
    rng = np.random.default_rng(e)
    m = rng.standard_normal((64, e, e))
    a = m @ np.swapaxes(m, 1, 2) + 2 * e * np.eye(e)
    inv = np.asarray(batched_spd_inverse(jnp.asarray(a)))
    np.testing.assert_allclose(inv, np.linalg.inv(a), rtol=1e-6, atol=1e-8)


@pytest.mark.parametrize("spec,sa,sb", [
    ("bme,bmf->bef", (100, 2, 3), (100, 2, 3)),
    ("bmi,bm->bi", (100, 2, 12), (100, 2)),
    ("bmi,bi->bm", (100, 2, 12), (100, 12)),
    ("bme,be->bm", (100, 2, 3), (100, 3)),
    ("pef,pf->pe", (50, 3, 3), (50, 3)),
    ("bfe,beg->bfg", (40, 9, 3), (40, 3, 9)),
    ("bfe,bge->bfg", (40, 9, 3), (40, 9, 3)),
    ("bmf,bmg->bfg", (40, 2, 9), (40, 2, 9)),
    ("pcfe,peg->pcfg", (7, 5, 9, 3), (7, 3, 9)),
])
def test_vpu_einsum_matches_einsum(spec, sa, sb):
    from skeres_tpu.ops.small_einsum import vpu_einsum

    rng = np.random.default_rng(3)
    a = jnp.asarray(rng.standard_normal(sa))
    b = jnp.asarray(rng.standard_normal(sb))
    np.testing.assert_allclose(
        np.asarray(vpu_einsum(spec, a, b)),
        np.asarray(jnp.einsum(spec, a, b)),
        rtol=1e-12, atol=1e-12,
    )
