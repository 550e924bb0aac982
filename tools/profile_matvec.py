#!/usr/bin/env python
"""Venice-scale implicit-S matvec breakdown: times each piece of
``S v = (F^T F + D_f) v - W C^{-1} W^T v`` on the real chip (the PCG inner
op that dominates venice solves). Forced-readback timing (memory:
axon-timing-quirk)."""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=10):
    out = fn(*args)
    for leaf in jax.tree_util.tree_leaves(out):
        jax.device_get(leaf.ravel()[0])
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
        for leaf in jax.tree_util.tree_leaves(out):
            jax.device_get(leaf.ravel()[0])
    return (time.time() - t0) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num_cameras", type=int, default=1778)
    ap.add_argument("--num_points", type=int, default=1_000_000)
    ap.add_argument("--obs", type=int, default=5)
    args = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from skeres_tpu.core.evaluator import Evaluator
    from skeres_tpu.core.linear_solvers import lm_diagonal
    from skeres_tpu.core.schur import SchurSolver
    from skeres_tpu.io.bal import build_bal_problem, synthetic_bal

    print("backend:", jax.default_backend(), flush=True)
    t0 = time.time()
    bal = synthetic_bal(
        num_cameras=args.num_cameras,
        num_points=args.num_points,
        observations_per_point=args.obs,
    )
    problem, _, _ = build_bal_problem(bal)
    program = problem.compile()
    ev = Evaluator(program)
    state = program.initial_state(ev.dtype)
    print(f"built in {time.time()-t0:.1f}s", flush=True)

    schur = SchurSolver(ev, iterative=True)
    cost, blocks = jax.jit(ev.blocks)(state)
    g, diag = jax.jit(ev.gradient_and_diag)(blocks)
    data = schur.solver_data(blocks)
    d = lm_diagonal(diag, 1e-4, 1e-6, 1e32)
    asm = jax.jit(lambda dd: schur._assemble(data, g, dd))(d)
    v = jax.jit(schur._schur_rhs)(asm)
    print("assembled", flush=True)

    rows = []

    def add(name, fn, *fargs, n=10):
        jf = jax.jit(fn)
        t = timeit(jf, *fargs, n=n)
        rows.append((name, t))
        return jf(*fargs)

    add("assemble (ete+cinv)", lambda dd: schur._assemble(data, g, dd), d, n=3)
    wt = add("wt_apply (cams->pts)", lambda vv: schur._wt_apply(asm, vv), v)
    wc = add("cinv apply", lambda w: jnp.einsum("pef,pf->pe", asm["cinv"], w), wt)
    add("w_apply (pts->cams)", lambda w: schur._w_apply(asm, w), wc)
    add("ftf_apply", lambda vv: schur._ftf_apply(asm, vv), v)
    add("full s_matvec", lambda vv: schur._s_matvec(asm, vv), v)
    blocks_sj = add("schur_jacobi blocks", lambda: schur._schur_jacobi_blocks(asm), n=3)
    add("linearize (blocks)", ev.blocks, state, n=3)
    add("gradient_and_diag", ev.gradient_and_diag, blocks, n=3)

    print(f"{'component':<28}{'ms':>10}")
    for name, t in rows:
        print(f"{name:<28}{t*1e3:>10.1f}")


if __name__ == "__main__":
    main()
