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
    from _tunnel import ensure_tpu_alive

    ensure_tpu_alive()
    ap = argparse.ArgumentParser()
    ap.add_argument("--num_cameras", type=int, default=1778)
    ap.add_argument("--num_points", type=int, default=1_000_000)
    ap.add_argument("--obs", type=int, default=5)
    ap.add_argument("--no_sort", action="store_true")
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

    schur = SchurSolver(
        ev, iterative=True,
        sort_threshold=(10**12 if args.no_sort else 100_000),
    )

    # all evaluator/schur device constants must flow as jit ARGUMENTS:
    # closure constants get embedded as HLO literals, which at venice scale
    # overflows the axon remote-compile request (HTTP 413)
    def with_consts(fn):
        def wrapped(consts, *args):
            with ev.bind(consts):
                return fn(*args)

        return jax.jit(wrapped)

    consts = ev.device_consts
    cost, blocks = with_consts(ev.blocks)(consts, state)
    g, diag = with_consts(ev.gradient_and_diag)(consts, blocks)
    data = schur.solver_data(blocks)
    d = lm_diagonal(diag, 1e-4, 1e-6, 1e32)
    asm = with_consts(lambda data, g, dd: schur._assemble(data, g, dd))(
        consts, data, g, d
    )
    v = with_consts(schur._schur_rhs)(consts, asm)
    print("assembled", flush=True)

    rows = []

    def add(name, fn, *fargs, n=10):
        jf = with_consts(fn)
        t = timeit(jf, consts, *fargs, n=n)
        rows.append((name, t))
        return jf(consts, *fargs)

    add("assemble (ete+cinv)", schur._assemble, data, g, d, n=3)
    wt = add("wt_apply (cams->pts)", schur._wt_apply, asm, v)
    wc = add(
        "cinv apply",
        lambda asm_, w: jnp.einsum("pef,pf->pe", asm_["cinv"], w),
        asm,
        wt,
    )
    add("w_apply (pts->cams)", schur._w_apply, asm, wc)
    add("ftf_apply", schur._ftf_apply, asm, v)
    add("full s_matvec", schur._s_matvec, asm, v)
    add("schur_jacobi blocks", schur._schur_jacobi_blocks, asm, n=3)
    add("linearize (blocks)", ev.blocks, state, n=3)
    add("gradient_and_diag", ev.gradient_and_diag, blocks, n=3)

    print(f"{'component':<28}{'ms':>10}")
    for name, t in rows:
        print(f"{name:<28}{t*1e3:>10.1f}")

    # -- per-solve (mu-dependent) pieces, single-shot -------------------
    scale = 1.0 / (1.0 + jnp.sqrt(jnp.maximum(diag, 0.0)))
    add("scale_data (per solve)", schur.scale_data, data, scale, n=3)
    add("schur_rhs", schur._schur_rhs, asm, n=3)
    add("back_substitute", schur._back_substitute, asm, v, n=3)
    add(
        "jtj_dx full-space matvec",
        lambda d, vv: schur.jtj_matvec(d, vv),
        data,
        jnp.zeros((ev.num_tangent,), v.dtype),
        n=3,
    )

    def full_solve(data_, g_, diag_):
        return schur.solve_damped(data_, g_, diag_, 1e-4, 1e-6, 1e32)

    add("solve_damped (full, one mu)", full_solve, data, g, diag, n=3)
    if schur.explicit_plan is not None:
        add("dense_s explicit assembly", schur._dense_s_explicit, asm, n=3)
    print(f"{'component':<36}{'ms':>10}")
    for name, t in rows[len(rows) - (6 if schur.explicit_plan else 5):]:
        print(f"{name:<36}{t*1e3:>10.1f}")

    # -- amortized chained timing (authoritative: cancels the ~28 ms
    # axon relay dispatch+readback floor that contaminates the
    # single-dispatch numbers above). The chained operand (asm) MUST be a
    # jit ARGUMENT — closure constants embed in the HLO and overflow the
    # axon remote-compile request (HTTP 413) at scale. ------------------
    def chain(body, k):
        def run(consts, asm_, v0):
            with ev.bind(consts):
                return jax.lax.fori_loop(
                    0, k, lambda i, vv: body(asm_, vv), v0
                )

        return jax.jit(run)

    def amortized(name, body, operand, v0, k_lo=2, k_hi=12, n=5):
        f_lo, f_hi = chain(body, k_lo), chain(body, k_hi)
        t_lo = timeit(f_lo, consts, operand, v0, n=n)
        t_hi = timeit(f_hi, consts, operand, v0, n=n)
        per = (t_hi - t_lo) / (k_hi - k_lo)
        print(f"{name:<36}{per*1e3:>10.2f} ms/apply", flush=True)
        return per

    def mv_body(asm_, vv):
        out = schur._s_matvec(asm_, vv)
        return out / (1.0 + jnp.max(jnp.abs(out)))

    per_mv = amortized("s_matvec amortized", mv_body, asm, v)

    blocks_sj = with_consts(schur._schur_jacobi_blocks)(consts, asm)

    def pre_body(blocks_, vv):
        out = schur._block_inverse_apply(blocks_)(vv)
        return out / (1.0 + jnp.max(jnp.abs(out)))

    amortized("schur_jacobi apply amortized", pre_body, blocks_sj, v)

    # effective bandwidth of the fused 2-pass matvec: it streams the
    # camera-padded Jacobian once and the point-sorted Jacobian once
    jac_bytes = sum(
        int(np.prod(j.shape)) * j.dtype.itemsize for _, j in data
    )
    pad_bytes = sum(
        int(np.prod(c.shape)) * c.dtype.itemsize
        for c in (with_consts(lambda a: a["cam"])(consts, asm)).values()
    )
    cinv_bytes = (
        int(np.prod(asm["cinv"].shape)) * asm["cinv"].dtype.itemsize
    )
    traffic = jac_bytes + pad_bytes + 2 * cinv_bytes
    print(
        f"{'matvec traffic':<36}{traffic/1e9:>10.2f} GB "
        f"-> {traffic/per_mv/1e9:.0f} GB/s effective",
        flush=True,
    )


if __name__ == "__main__":
    main()
