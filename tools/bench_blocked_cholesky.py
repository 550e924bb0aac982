#!/usr/bin/env python
"""Timing + correctness harness for the blocked HBM-scale Pallas Cholesky
vs XLA's ``lax.linalg.cholesky`` on the real chip (VERDICT r1 item #3:
venice's reduced camera system is ~16k x 16k).

Builds a well-conditioned SPD matrix, factors+solves with both paths,
checks the solve against a float64 CPU reference, and prints ms/op.
"""

import argparse
import os
import sys
import time

# `python tools/bench_blocked_cholesky.py` puts tools/ on sys.path; do NOT
# use PYTHONPATH instead — it breaks the axon TPU plugin registration.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _force(out):
    """Through the axon relay block_until_ready can return before the
    computation finishes (memory: axon-timing-quirk); fetch one element of
    every output leaf to force completion."""
    for leaf in jax.tree_util.tree_leaves(out):
        if hasattr(leaf, "ravel") and leaf.size:
            jax.device_get(leaf.ravel()[0])


def timeit(fn, *args, n=5):
    out = fn(*args)
    _force(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
        _force(out)
    return (time.time() - t0) / n, out


def main():
    from _tunnel import ensure_tpu_alive

    ensure_tpu_alive()
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=16384)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()
    n = args.n

    from skeres_tpu.ops.pallas.cholesky import (
        blocked_chol_solve,
        blocked_cholesky_factor,
    )

    print("backend:", jax.default_backend(), jax.devices()[0].device_kind)
    rng = np.random.default_rng(0)
    # SPD with unit-ish scale and condition ~n (BA Schur complements are
    # far better conditioned after Jacobi scaling)
    m = rng.standard_normal((n, 256)).astype(np.float64) / 16.0
    a64 = m @ m.T + np.eye(n)
    b64 = rng.standard_normal(n)
    x64 = np.linalg.solve(a64, b64)

    a = jnp.asarray(a64, jnp.float32)
    b = jnp.asarray(b64, jnp.float32)

    # --- blocked pallas path ---
    fac_fn = jax.jit(blocked_cholesky_factor)
    t_fac, fac = timeit(fac_fn, a, n=args.reps)
    solve_fn = jax.jit(blocked_chol_solve)
    t_sol, x = timeit(solve_fn, fac, b, n=args.reps)
    err = np.max(np.abs(np.asarray(x, np.float64) - x64)) / max(
        1.0, np.max(np.abs(x64))
    )
    print(f"blocked pallas  factor {t_fac*1e3:9.2f} ms  solve {t_sol*1e3:7.2f} ms"
          f"  rel err vs f64 {err:.2e}")

    # --- XLA path ---
    xla_fac = jax.jit(jax.lax.linalg.cholesky)
    t_xf, l = timeit(xla_fac, a, n=args.reps)
    xla_sol = jax.jit(lambda l, b: jax.scipy.linalg.cho_solve((l, True), b))
    t_xs, xx = timeit(xla_sol, l, b, n=args.reps)
    errx = np.max(np.abs(np.asarray(xx, np.float64) - x64)) / max(
        1.0, np.max(np.abs(x64))
    )
    print(f"xla cholesky    factor {t_xf*1e3:9.2f} ms  solve {t_xs*1e3:7.2f} ms"
          f"  rel err vs f64 {errx:.2e}")
    flops = n**3 / 3
    print(f"factor flops {flops/1e12:.2f} TFLOP -> pallas {flops/t_fac/1e12:.1f}"
          f" TFLOP/s, xla {flops/t_xf/1e12:.1f} TFLOP/s")


if __name__ == "__main__":
    main()
