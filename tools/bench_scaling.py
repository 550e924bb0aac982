#!/usr/bin/env python
"""Weak-scaling harness: LM-step time at 1/2/4/8 shards, equal per-shard
load (SURVEY.md §5.6 / VERDICT r1 item #8).

Runs on the virtual CPU mesh by default (the box has one real chip), so
absolute numbers are weak — what it validates is that the sharded step
with the shard_map windowed reductions stays within ~1.5x of the
single-device step at equal per-shard load (i.e. the reductions/psum do
not blow up the step), and that the path executes end-to-end at every
mesh size.

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python tools/bench_scaling.py --per_shard_points 4000
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# this container's sitecustomize imports jax and pins the axon TPU backend
# at interpreter startup; env vars are too late — update the live config
# (backends are not initialized yet), same pattern as tests/conftest.py
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--per_shard_points", type=int, default=4000)
    ap.add_argument("--cameras_per_shard", type=int, default=16)
    ap.add_argument("--obs_per_point", type=int, default=4)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--shards", type=int, nargs="+", default=[1, 2, 4, 8])
    args = ap.parse_args()

    import jax

    if jax.default_backend() == "cpu" and len(jax.devices()) < max(args.shards):
        print(
            "ERROR: need a virtual mesh; run with "
            "XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu",
            file=sys.stderr,
        )
        sys.exit(1)

    import numpy as np
    from jax.sharding import Mesh

    import skeres_tpu as st
    from skeres_tpu.core.options import SolverOptions
    from skeres_tpu.core.types import LinearSolverType
    from skeres_tpu.io.bal import build_bal_problem, synthetic_bal

    results = []
    for n in args.shards:
        bal = synthetic_bal(
            num_cameras=args.cameras_per_shard * n,
            num_points=args.per_shard_points * n,
            observations_per_point=args.obs_per_point,
        )
        mesh = (
            None
            if n == 1
            else Mesh(np.array(jax.devices()[:n]), axis_names=("obs",))
        )

        def run():
            problem, _, _ = build_bal_problem(bal)
            options = SolverOptions(
                linear_solver_type=LinearSolverType.ITERATIVE_SCHUR,
                max_num_iterations=args.iters,
                mesh=mesh,
                function_tolerance=0.0,
                gradient_tolerance=0.0,
                parameter_tolerance=0.0,
            )
            return st.solve(options, problem)

        run()  # warm the jit cache for this shape
        summary = run()
        steps = summary.num_successful_steps + summary.num_unsuccessful_steps
        secs = summary.minimizer_time_in_seconds
        results.append(
            {
                "shards": n,
                "obs": bal.num_observations,
                "steps": int(steps),
                "sec_per_step": round(secs / max(steps, 1), 4),
                "final_cost": float(summary.final_cost),
            }
        )
        print(json.dumps(results[-1]), flush=True)

    base = results[0]["sec_per_step"]
    out = {
        "metric": "weak_scaling_step_time_ratio",
        "value": round(results[-1]["sec_per_step"] / base, 3),
        "unit": "x (last/first, equal per-shard load; 1.0 = perfect)",
        "extra": {"rows": results, "backend": jax.default_backend()},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
