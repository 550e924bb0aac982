#!/usr/bin/env python
"""Minimal(izing) repro for TPU hazard-ledger entry #2: camera-padded
layout consumers return finite GARBAGE inside ``lax.while_loop`` at
>= 600-camera scale (r4 finding; mitigated by disabling the layout in the
device loop). Strategy per the r4 negative result: START from the failing
program's shape (the real SchurSolver damped solve on a 1/3-venice-sized
synthetic problem) and STRIP — the op-level repro was bit-exact, so the
mis-execution needs surrounding-program context.

Configs (``--config``):
  solve     K damped solves (varying mu) — the full solve body
  rhs       K Schur-rhs computations (the padded _w_apply consumer)
  sjb       K SCHUR_JACOBI block builds (padded K-reduce consumer)
  matvec    K implicit S matvecs (padded _ftf_apply/_w_apply/_wt_apply)

Each config runs the SAME K-step recurrence twice:
  while:     inside lax.while_loop, results stacked into the carry
  unrolled:  as a plain unrolled chain in one jit
and prints the per-step max |rel diff|. A mismatch >> f32 eps reproduces
the hazard; agreement after a consumer rewrite identifies the fix.

    python tools/repro_while_hazard.py --config rhs --num_cameras 600
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from _tunnel import ensure_tpu_alive

    if os.environ.get("JAX_PLATFORMS", "") != "cpu":
        ensure_tpu_alive()
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="solve",
                    choices=["solve", "rhs", "sjb", "matvec", "carry",
                             "carrycond", "carryfull",
                             "carryfull_barrier", "carryfull_inbarrier",
                             "carryfull_nocond", "carryfull_norebuild"])
    ap.add_argument("--num_cameras", type=int, default=600)
    ap.add_argument("--num_points", type=int, default=333_334)
    ap.add_argument("--obs", type=int, default=5)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--chunk", type=int, default=262_144)
    ap.add_argument("--iterative", action="store_true")
    ap.add_argument("--no_sorted", action="store_true",
                    help="disable the camera-padded layout (control)")
    ap.add_argument("--sort_threshold", type=int, default=100_000)
    ap.add_argument("--order", default="while_first",
                    choices=["while_first", "unrolled_first",
                             "unrolled_only", "while_only"],
                    help="execution order probe: if a twin corrupts the "
                         "shared prep buffers, whichever runs SECOND "
                         "reads garbage")
    args = ap.parse_args()

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

    from skeres_tpu.core.evaluator import Evaluator
    from skeres_tpu.core.linear_solvers import lm_diagonal
    from skeres_tpu.core.schur import SchurSolver
    from skeres_tpu.io.bal import build_bal_problem, synthetic_bal

    print("backend:", jax.default_backend(), flush=True)
    bal = synthetic_bal(
        num_cameras=args.num_cameras,
        num_points=args.num_points,
        observations_per_point=args.obs,
    )
    problem, _, _ = build_bal_problem(bal)
    program = problem.compile()
    ev = Evaluator(program, chunk_size=args.chunk)
    state = program.initial_state(ev.dtype)
    schur = SchurSolver(
        ev,
        iterative=args.iterative,
        sort_threshold=(10**12 if args.no_sorted else args.sort_threshold),
    )
    print("sorted_info on:", bool(schur.sorted_info), flush=True)
    consts = ev.device_consts
    K = args.iters

    def build_inputs(c, state):
        with ev.bind(c):
            cost, blocks = ev.blocks(state)
            g, diag = ev.gradient_and_diag(blocks)
            scale = 1.0 / (1.0 + jnp.sqrt(jnp.maximum(diag, 0.0)))
            data = tuple((b.r, b.jac) for b in blocks)
            prep = schur.prepare(schur.scale_data(data, scale))
            return g * scale, diag * scale * scale, prep

    gs, diag_s, prep = jax.jit(build_inputs)(consts, state)
    nf = schur.num_f

    # the per-step computation under test; mu varies per step and the
    # carry feeds back (acc) so the loop body cannot be hoisted
    def step(c, prep, gs, diag_s, k, acc):
        with ev.bind(c):
            mu = 1e-4 * (1.0 + 0.37 * k.astype(gs.dtype))
            gs_k = gs * (1.0 + 1e-6 * acc[..., :1] * 0)  # keep shape dep
            if args.config == "solve":
                dx, _, _ = schur.solve_damped(
                    prep, gs_k, diag_s, mu, 1e-6, 1e32
                )
                return dx[: nf]
            d = lm_diagonal(diag_s, mu, 1e-6, 1e32)
            asm = schur._assemble(prep, gs_k, d)
            if args.config == "rhs":
                return schur._schur_rhs(asm)
            if args.config == "sjb":
                blocks = schur._schur_jacobi_blocks(asm)
                return blocks[0].reshape(-1)[: nf]
            # matvec: one implicit S apply to a mu-dependent vector
            v = jnp.sin(
                jnp.arange(nf, dtype=gs.dtype) * (1.0 + mu)
            )
            wc = jnp.einsum(
                "pef,pf->pe", asm["cinv"], schur._wt_apply(asm, v)
            )
            return schur._ftf_apply(asm, v) - schur._w_apply(asm, wc)

    out_dim = nf

    def run_while(c, prep, gs, diag_s):
        outs0 = jnp.zeros((K, out_dim), gs.dtype)

        def body(carry):
            k, outs = carry
            val = step(c, prep, gs, diag_s, k, outs[0])
            return k + 1, outs.at[k].set(val)

        def cond(carry):
            return carry[0] < K

        _, outs = jax.lax.while_loop(
            cond, body, (jnp.zeros((), jnp.int32), outs0)
        )
        return outs

    def run_unrolled(c, prep, gs, diag_s):
        outs = jnp.zeros((K, out_dim), gs.dtype)
        for k in range(K):
            val = step(
                c, prep, gs, diag_s, jnp.asarray(k, jnp.int32), outs[0]
            )
            outs = outs.at[k].set(val)
        return outs

    # -- carry configs: the padded copy flows through the while_loop
    # CARRY (the device loop's structure — rebuilt under lax.cond on
    # accepted steps), instead of a loop-invariant operand --------------
    bi0 = next(iter(schur.sorted_info), None)

    def sjb_with_cam(c, prep, gs, diag_s, k, cam):
        with ev.bind(c):
            mu = 1e-4 * (1.0 + 0.37 * k.astype(gs.dtype))
            d = lm_diagonal(diag_s, mu, 1e-6, 1e32)
            prep2 = dict(prep, cam={bi0: cam})
            asm = schur._assemble(prep2, gs, d)
            return schur._schur_jacobi_blocks(asm)[0].reshape(-1)[: nf]

    def rebuild_cam(c, blocks_jac_r):
        with ev.bind(c):
            jac_flat, r = blocks_jac_r
            return schur._place_rows(
                bi0, jnp.concatenate([jac_flat, r], axis=1)
            )[..., : jac_flat.shape[-1]]

    def run_carry(c, prep, gs, diag_s, jac_r, use_while, with_cond):
        cam0 = prep["cam"][bi0]

        def one(k, cam, outs):
            val = sjb_with_cam(c, prep, gs, diag_s, k, cam)
            if with_cond:
                cam = jax.lax.cond(
                    (k % 2) == 0,
                    lambda _: rebuild_cam(c, jac_r),
                    lambda _: cam,
                    operand=None,
                )
            return cam, outs.at[k].set(val)

        outs0 = jnp.zeros((K, nf), gs.dtype)
        if use_while:
            def body(carry):
                k, cam, outs = carry
                cam, outs = one(k, cam, outs)
                return k + 1, cam, outs

            _, _, outs = jax.lax.while_loop(
                lambda cr: cr[0] < K, body,
                (jnp.zeros((), jnp.int32), cam0, outs0),
            )
            return outs
        cam = cam0
        for k in range(K):
            cam, outs0 = one(jnp.asarray(k, jnp.int32), cam, outs0)
        return outs0

    def run_carryfull(c, gs, diag_s, prep, use_while):
        """The device loop's actual structure: the ENTIRE prep dict rides
        the while_loop carry; accepted-step relinearize is mimicked by a
        lax.cond that rebuilds the padded copy inside the loop."""

        def one(k, prep_c, outs):
            with ev.bind(c):
                mu = 1e-4 * (1.0 + 0.37 * k.astype(gs.dtype))
                d = lm_diagonal(diag_s, mu, 1e-6, 1e32)
                if (
                    args.config.startswith("carryfull")
                    and not args.iterative
                ):
                    dx, _, _ = schur.solve_damped(
                        prep_c, gs, diag_s, mu, 1e-6, 1e32
                    )
                    val = dx[:nf]
                else:
                    asm = schur._assemble(prep_c, gs, d)
                    val = schur._schur_jacobi_blocks(asm)[0].reshape(-1)[
                        :nf
                    ]

                def rebuild(_):
                    r, jac, E = prep_c["per_batch"][bi0]
                    if args.config == "carryfull_inbarrier":
                        # input-side ordering probe: the placement gather
                        # cannot START until this step's consumers of the
                        # old copy produced their value
                        (jac, r), _bar = jax.lax.optimization_barrier(
                            ((jac, r), val)
                        )
                    bsz, m, T = jac.shape
                    cam2 = schur._place_rows(
                        bi0,
                        jnp.concatenate(
                            [jac.reshape(bsz, m * T), r], axis=1
                        ),
                    )[..., : m * T]
                    return dict(prep_c, cam={bi0: cam2})

                if args.config == "carryfull_norebuild":
                    prep2 = prep_c
                elif args.config == "carryfull_nocond":
                    prep2 = rebuild(None)
                else:
                    prep2 = jax.lax.cond(
                        (k % 2) == 0, rebuild, lambda _: prep_c,
                        operand=None,
                    )
                if args.config == "carryfull_barrier":
                    # HYPOTHESIS probe: if the mis-execution is a
                    # write-after-read race (the rebuild's placement
                    # gather writing a buffer an earlier consumer still
                    # reads), forcing the rebuilt copy to depend on this
                    # step's output must fix it
                    cam_b, _ = jax.lax.optimization_barrier(
                        (prep2["cam"][bi0], val)
                    )
                    prep2 = dict(prep2, cam={bi0: cam_b})
                return prep2, outs.at[k].set(val)

        outs0 = jnp.zeros((K, nf), gs.dtype)
        if use_while:
            def body(carry):
                k, prep_c, outs = carry
                prep_c, outs = one(k, prep_c, outs)
                return k + 1, prep_c, outs

            _, _, outs = jax.lax.while_loop(
                lambda cr: cr[0] < K, body,
                (jnp.zeros((), jnp.int32), prep, outs0),
            )
            return outs
        prep_c = prep
        for k in range(K):
            prep_c, outs0 = one(jnp.asarray(k, jnp.int32), prep_c, outs0)
        return outs0

    print(f"config={args.config} iterative={args.iterative} "
          f"K={K} nf={nf}", flush=True)
    if args.config.startswith("carryfull"):
        run_w = jax.jit(
            lambda c, g_, d_, p: run_carryfull(c, g_, d_, p, True)
        )
        run_u = jax.jit(
            lambda c, g_, d_, p: run_carryfull(c, g_, d_, p, False)
        )

        def go_w():
            r = np.asarray(run_w(consts, gs, diag_s, prep))
            print("while done", flush=True)
            return r

        def go_u():
            r = np.asarray(run_u(consts, gs, diag_s, prep))
            print("unrolled done", flush=True)
            return r

        if args.order == "while_first":
            o_w, o_u = go_w(), go_u()
        elif args.order == "unrolled_first":
            o_u, o_w = go_u(), go_w()
        elif args.order == "unrolled_only":
            o_u = go_u()
            o_w = go_u()  # second unrolled run in place of the while twin
        else:  # while_only
            o_w = go_w()
            o_u = go_w()
    elif args.config in ("carry", "carrycond"):
        b0 = None
        def get_jac_r(c, state):
            with ev.bind(c):
                cost, blocks = ev.blocks(state)
                g, diag = ev.gradient_and_diag(blocks)
                scale = 1.0 / (1.0 + jnp.sqrt(jnp.maximum(diag, 0.0)))
                data = tuple((b.r, b.jac) for b in blocks)
                r, jac = schur.scale_data(data, scale)[bi0]
                bsz, m, T = jac.shape
                return jac.reshape(bsz, m * T), r
        jac_r = jax.jit(get_jac_r)(consts, state)
        wc = args.config == "carrycond"
        o_w = np.asarray(jax.jit(
            lambda c, p, g_, d_, jr: run_carry(c, p, g_, d_, jr, True, wc)
        )(consts, prep, gs, diag_s, jac_r))
        print("while done", flush=True)
        o_u = np.asarray(jax.jit(
            lambda c, p, g_, d_, jr: run_carry(c, p, g_, d_, jr, False, wc)
        )(consts, prep, gs, diag_s, jac_r))
        print("unrolled done", flush=True)
    else:
        o_w = np.asarray(jax.jit(run_while)(consts, prep, gs, diag_s))
        print("while done", flush=True)
        o_u = np.asarray(jax.jit(run_unrolled)(consts, prep, gs, diag_s))
        print("unrolled done", flush=True)
    ok = True
    for k in range(K):
        denom = np.maximum(np.abs(o_u[k]).max(), 1e-30)
        rel = np.abs(o_w[k] - o_u[k]).max() / denom
        print(f"step {k}: max|while-unrolled|/max|unrolled| = {rel:.3e}  "
              f"|unrolled|={np.abs(o_u[k]).max():.3e} "
              f"|while|={np.abs(o_w[k]).max():.3e}")
        ok &= rel < 1e-4
    print("VERDICT:", "MATCH (no repro)" if ok else "MISMATCH (repro!)")


if __name__ == "__main__":
    main()
