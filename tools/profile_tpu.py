#!/usr/bin/env python
"""Per-component TPU timing for the BAL hot path.

Times each jitted piece in isolation (post-warmup, block_until_ready):
residual+J evaluation, g/diag assembly, Schur C/ete accumulation, dense-S
assembly (the pair scatter), Cholesky of S, back-substitution, implicit-S
matvec, full solve_and_try. Prints a table — run on the real chip to decide
where Pallas/assembly-rework effort goes.
"""

import os
import sys
import time

# `python tools/profile_tpu.py` puts tools/ (not the repo root) on sys.path;
# prepend the repo root so `skeres_tpu` imports without touching PYTHONPATH
# (which would clobber the axon TPU plugin's site dir).
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / n


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--num_cameras", type=int, default=49)
    ap.add_argument("--num_points", type=int, default=7776)
    ap.add_argument("--obs", type=int, default=4)
    args = ap.parse_args()

    from skeres_tpu.core.evaluator import Evaluator
    from skeres_tpu.core.linear_solvers import lm_diagonal
    from skeres_tpu.core.schur import SchurSolver
    from skeres_tpu.io.bal import build_bal_problem, synthetic_bal

    print("backend:", jax.default_backend())
    bal = synthetic_bal(
        num_cameras=args.num_cameras,
        num_points=args.num_points,
        observations_per_point=args.obs,
    )
    print(
        f"cams={bal.num_cameras} pts={bal.num_points} obs={bal.num_observations}"
    )
    problem, _, _ = build_bal_problem(bal)
    program = problem.compile()
    ev = Evaluator(program)
    state = program.initial_state(ev.dtype)

    blocks_fn = jax.jit(ev.blocks)
    t_blocks = timeit(blocks_fn, state)
    cost, blocks = blocks_fn(state)

    gd_fn = jax.jit(ev.gradient_and_diag)
    t_gd = timeit(gd_fn, blocks)
    g, diag = gd_fn(blocks)

    cost_fn = jax.jit(ev.cost)
    t_cost = timeit(cost_fn, state)

    schur = SchurSolver(ev, iterative=False)
    data = schur.solver_data(blocks)
    d = lm_diagonal(diag, 1e-4, 1e-6, 1e32)

    asm_fn = jax.jit(lambda dd: schur._assemble(data, g, dd))
    t_asm = timeit(asm_fn, d)
    asm = asm_fn(d)

    dense_s_fn = jax.jit(schur._dense_s)
    t_dense_s = timeit(dense_s_fn, asm)
    s_mat = dense_s_fn(asm)

    chol_fn = jax.jit(jax.lax.linalg.cholesky)
    t_chol = timeit(chol_fn, s_mat)

    rhs_fn = jax.jit(schur._schur_rhs)
    t_rhs = timeit(rhs_fn, asm)
    rhs = rhs_fn(asm)

    back_fn = jax.jit(schur._back_substitute)
    t_back = timeit(back_fn, asm, rhs)

    # implicit matvec (ITERATIVE_SCHUR inner op)
    def s_matvec(v):
        w_apply, wt_apply = schur._w_ct_we_ops(asm)
        wc = jnp.einsum("pef,pf->pe", asm["cinv"], wt_apply(v))
        return schur._ftf_apply(asm, v) - w_apply(wc)

    mv_fn = jax.jit(s_matvec)
    t_mv = timeit(mv_fn, rhs)

    solve_fn = jax.jit(
        lambda dd: schur.solve_damped(data, g, diag, 1e-4, 1e-6, 1e32)
    )
    t_solve = timeit(solve_fn, d)

    rows = [
        ("residual+J eval (blocks)", t_blocks),
        ("g + diag assembly", t_gd),
        ("residual-only cost", t_cost),
        ("schur assemble (ete/cinv)", t_asm),
        ("dense S assembly (pair scatter)", t_dense_s),
        ("cholesky(S)", t_chol),
        ("schur rhs", t_rhs),
        ("back substitute", t_back),
        ("implicit S matvec", t_mv),
        ("full damped schur solve", t_solve),
    ]
    print(f"{'component':<34}{'ms':>10}")
    for name, t in rows:
        print(f"{name:<34}{t * 1e3:>10.2f}")


if __name__ == "__main__":
    main()
