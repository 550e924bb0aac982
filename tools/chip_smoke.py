#!/usr/bin/env python
"""Per-round TPU hazard-ledger smoke (VERDICT r4 weak #3): exercise each
recorded silent-wrong-results hazard on the real chip and verify against
trusted values. Run once per round; each case prints PASS/FAIL.

Ledger cases:
  1. batched triangular solves feeding a PCG ``lax.while_loop``
     (CLUSTER_JACOBI/TRIDIAGONAL factor applies) — fixed by hoisting the
     inverses out of the loop; verified here by solving with the cluster
     preconditioners at a few hundred cameras and checking the damped
     solve against the DENSE_SCHUR factorization answer.
  2. camera-padded-layout consumers inside a device ``lax.while_loop``
     (device loop mitigation: layout disabled) — smoked by the BAL-49
     device-loop trajectory reaching its known converged cost.
  3. tiny-trailing-dims tile padding — a (B, 2, 3) materialization is
     checked for silent value corruption against its flat (B, 6) twin.

    python tools/chip_smoke.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from _tunnel import ensure_tpu_alive

    ensure_tpu_alive()
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".jax_cache",
        ),
    )
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import skeres_tpu as st
    from skeres_tpu.core.evaluator import Evaluator
    from skeres_tpu.core.options import SolverOptions
    from skeres_tpu.core.schur import SchurSolver
    from skeres_tpu.core.types import LinearSolverType, PreconditionerType
    from skeres_tpu.io.bal import build_bal_problem, synthetic_bal

    failures = []

    def check(name, ok, detail=""):
        print(f"[{'PASS' if ok else 'FAIL'}] {name} {detail}", flush=True)
        if not ok:
            failures.append(name)

    # -- case 1: cluster preconditioners (tri-solve-in-loop hazard) -------
    bal = synthetic_bal(num_cameras=240, num_points=20_000,
                        observations_per_point=4)
    problem, _, _ = build_bal_problem(bal)
    program = problem.compile()
    ev = Evaluator(program)
    state = program.initial_state(ev.dtype)
    consts = ev.device_consts

    def lin(c, state):
        with ev.bind(c):
            cost, blocks = ev.blocks(state)
            g, diag = ev.gradient_and_diag(blocks)
            return blocks, g, diag

    blocks, g, diag = jax.jit(lin)(consts, state)
    dense = SchurSolver(ev, iterative=False)
    data = dense.solver_data(blocks)

    def solve_with(solver):
        def run(c, g, diag):
            with ev.bind(c):
                dx, iters, _ = solver.solve_damped(
                    data, g, diag, 1e-4, 1e-6, 1e32
                )
                return dx, iters

        dx, iters = jax.jit(run)(consts, g, diag)
        return np.asarray(jax.device_get(dx)), int(iters)

    dx_ref, _ = solve_with(dense)
    for precond in (PreconditionerType.CLUSTER_JACOBI,
                    PreconditionerType.CLUSTER_TRIDIAGONAL):
        it_solver = SchurSolver(
            ev, iterative=True, preconditioner=precond, cluster_size=48,
            max_cg_iterations=200, eta=1e-7,
        )
        dx, iters = solve_with(it_solver)
        rel = np.linalg.norm(dx - dx_ref) / max(np.linalg.norm(dx_ref), 1e-30)
        # threshold calibration: the hazard signature is GARBAGE (steps
        # ~400x off, effective inverse norms ~1e15), while healthy f32
        # PCG with the Nash-Sofer Q-test truncates at ~1e-1 relative
        # (CPU f32 control: even SCHUR_JACOBI lands at ~0.56 with 30
        # iters). 0.3 separates the classes with margin.
        check(
            f"cluster precond {precond.value} PCG solve",
            np.isfinite(rel) and rel < 0.3,
            f"rel err vs dense factor {rel:.2e}, cg iters {iters}",
        )

    # -- case 2: device-loop trajectory (padded-consumer hazard) ----------
    bal2 = synthetic_bal(num_cameras=49, num_points=7776,
                         observations_per_point=4)
    problem2, _, _ = build_bal_problem(bal2)
    s = st.solve(
        SolverOptions(
            linear_solver_type=LinearSolverType.DENSE_SCHUR,
            max_num_iterations=10,
            use_device_loop=True,
            device_loop_chunk_iterations=10,
        ),
        problem2,
    )
    check(
        "device-loop BAL-49 trajectory",
        s.final_cost < 5000.0 and s.num_successful_steps >= 5,
        f"final {s.final_cost:.1f} after {s.num_successful_steps} accepted",
    )

    # -- case 3: tiny-trailing-dims materialization -----------------------
    rng = np.random.default_rng(0)
    flat_np = rng.normal(size=(1_000_000, 6)).astype(np.float32)
    flat = jnp.asarray(flat_np)

    @jax.jit
    def as_rank3(x):
        return (x * 2.0).reshape(-1, 2, 3)

    r3 = np.asarray(jax.device_get(as_rank3(flat)))
    check(
        "tiny-trailing-dims (B,2,3) materialization",
        np.array_equal(r3.reshape(-1, 6), flat_np * 2.0),
        "",
    )

    print()
    if failures:
        print("HAZARD SMOKE FAILURES:", failures)
        sys.exit(1)
    print("hazard ledger smoke: all cases PASS")


if __name__ == "__main__":
    main()
