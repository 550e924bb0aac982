#!/usr/bin/env python
"""Per-component TPU timing + FLOP/MFU accounting for the BAL hot path.

Times each jitted piece in isolation (post-warmup, block_until_ready):
residual+J evaluation, g/diag assembly, Schur C/ete accumulation, dense-S
assembly, Cholesky of S, back-substitution, implicit-S matvec, full damped
solve. For each component it also pulls XLA's own FLOP estimate
(``compiled.cost_analysis()``) and prints achieved TFLOP/s and an MFU
estimate against the chip's peak — run on the real chip to decide where
Pallas/assembly-rework effort goes (SURVEY.md §6 tracing plan).
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

# peak dense-matmul throughput per chip (FLOP/s). MXU f32 runs at roughly
# 1/4 the bf16 rate on recent TPUs; entries are (bf16_peak, f32_peak).
_PEAKS = {
    "v4": (275e12, 275e12 / 4),
    "v5 lite": (197e12, 197e12 / 4),
    "v5e": (197e12, 197e12 / 4),
    "v5p": (459e12, 459e12 / 4),
    "v6 lite": (918e12, 918e12 / 4),
    "v6e": (918e12, 918e12 / 4),
}


def peak_flops():
    kind = jax.devices()[0].device_kind.lower()
    for key, (bf16, f32) in _PEAKS.items():
        if key in kind:
            return f32, kind
    return None, kind


def _force(out):
    """Force completion: through the axon relay block_until_ready can
    return before the computation finishes (memory: axon-timing-quirk), so
    fetch one element of every output leaf instead."""
    for leaf in jax.tree_util.tree_leaves(out):
        if hasattr(leaf, "ravel") and leaf.size:
            jax.device_get(leaf.ravel()[0])


def bench_compiled(fn, *args, n=30):
    """Returns (seconds_per_call, xla_flops_estimate, compiled)."""
    jitted = jax.jit(fn)
    compiled = jitted.lower(*args).compile()
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", float("nan")))
    except Exception:
        flops = float("nan")
    out = compiled(*args)
    _force(out)
    t0 = time.time()
    for _ in range(n):
        out = compiled(*args)
        _force(out)
    return (time.time() - t0) / n, flops, compiled


def main():
    import argparse

    from _tunnel import ensure_tpu_alive

    ensure_tpu_alive()
    ap = argparse.ArgumentParser()
    ap.add_argument("--num_cameras", type=int, default=49)
    ap.add_argument("--num_points", type=int, default=7776)
    ap.add_argument("--obs", type=int, default=4)
    ap.add_argument("--chunk", type=int, default=None,
                    help="evaluation_chunk_size for the evaluator")
    args = ap.parse_args()

    from skeres_tpu.core.evaluator import Evaluator
    from skeres_tpu.core.linear_solvers import lm_diagonal
    from skeres_tpu.core.schur import SchurSolver
    from skeres_tpu.io.bal import build_bal_problem, synthetic_bal

    print("backend:", jax.default_backend())
    peak, kind = peak_flops()
    print(f"device: {kind}  f32 peak: "
          f"{'n/a' if peak is None else f'{peak/1e12:.0f} TFLOP/s'}")
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
    ev = Evaluator(program, chunk_size=args.chunk)
    state = program.initial_state(ev.dtype)

    rows = []

    def add(name, fn, *fargs, n=30):
        t, flops, compiled = bench_compiled(fn, *fargs, n=n)
        rows.append((name, t, flops))
        return compiled(*fargs)

    # every timed program takes the evaluator's device constants as an
    # ARGUMENT and rebinds during tracing — closed-over venice-scale
    # constants get embedded in the HLO and overflow the axon remote
    # compile request (HTTP 413); this is the minimizer's own pattern
    consts = ev.device_consts

    def b(fn):
        def wrapped(c, *a):
            with ev.bind(c):
                return fn(*a)

        return wrapped

    cost, blocks = add("residual+J eval (blocks)", b(ev.blocks), consts, state)
    g, diag = add(
        "g + diag assembly", b(ev.gradient_and_diag), consts, blocks
    )
    add("residual-only cost", b(ev.cost), consts, state)

    schur = SchurSolver(ev, iterative=False)
    data = tuple((bb.r, bb.jac) for bb in blocks)
    d = lm_diagonal(diag, 1e-4, 1e-6, 1e32)
    scale = add(
        "jacobi scale", b(lambda dg: 1.0 / (1.0 + jnp.sqrt(jnp.maximum(dg, 0.0)))),
        consts, diag,
    )
    sdata = add("scale_data", b(schur.scale_data), consts, data, scale)
    prep = add("prepare (ete0+cam+grid)", b(schur.prepare), consts, sdata)
    gs = g * scale

    asm = add(
        "schur assemble (damped cinv)",
        b(lambda p, gg, dd: schur._assemble(p, gg, dd)),
        consts, prep, gs, d,
    )
    s_mat = add("dense S assembly", b(schur._dense_s), consts, asm)
    add("cholesky(S) [xla]", jax.lax.linalg.cholesky, s_mat)
    if jax.default_backend() == "tpu" and s_mat.dtype == jnp.float32:
        from skeres_tpu.ops.pallas.cholesky import (
            MAX_PALLAS_CHOLESKY_N,
            cholesky_inverse_factor,
        )
        from skeres_tpu.ops.pallas.cholesky import (
            blocked_cholesky_factor,
        )

        if s_mat.shape[0] <= MAX_PALLAS_CHOLESKY_N:
            add("cholesky(S) [pallas L^-1]", cholesky_inverse_factor, s_mat)
        else:
            add("cholesky(S) [pallas blocked]", blocked_cholesky_factor, s_mat)
    rhs = add("schur rhs", b(schur._schur_rhs), consts, asm)
    dx_f = add("back substitute", b(schur._back_substitute), consts, asm, rhs)

    # implicit matvec (ITERATIVE_SCHUR inner op)
    def s_matvec(c, asm_, v):
        with ev.bind(c):
            wc = jnp.einsum("pef,pf->pe", asm_["cinv"], schur._wt_apply(asm_, v))
            return schur._ftf_apply(asm_, v) - schur._w_apply(asm_, wc)

    add("implicit S matvec", s_matvec, consts, asm, rhs)
    add(
        "jtj quadratic (model cost)",
        b(lambda p, v: schur.jtj_quadratic(p, v)),
        consts, prep, dx_f,
    )
    add(
        "full damped schur solve",
        b(lambda p, gg, dgs: schur.solve_damped(p, gg, dgs, 1e-4, 1e-6, 1e32)),
        consts, prep, gs, diag * scale * scale,
        n=10,
    )

    print(f"{'component':<34}{'ms':>10}{'GFLOP':>10}{'TFLOP/s':>10}{'MFU%':>7}")
    for name, t, flops in rows:
        tf = flops / t / 1e12 if np.isfinite(flops) else float("nan")
        mfu = 100.0 * tf * 1e12 / peak if (peak and np.isfinite(tf)) else float("nan")
        print(
            f"{name:<34}{t * 1e3:>10.2f}{flops / 1e9:>10.2f}{tf:>10.2f}{mfu:>7.1f}"
        )


if __name__ == "__main__":
    main()
