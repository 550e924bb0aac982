"""Schur-complement elimination for bundle-adjustment structure.

TPU-native re-design of the reference lineage's Schur pipeline
(``internal/ceres/schur_eliminator_impl.h``, ``schur_complement_solver.cc``,
``implicit_schur_complement.cc``, ``iterative_schur_complement_solver.cc``,
``schur_jacobi_preconditioner.cc``). Where the reference runs a threaded
row-chunk loop with template-specialized small GEMMs and lock-guarded
scatter into a block-random-access S, here everything is batched over the
observation axis:

  - per-point ``C = E^T E + D_e`` by ``segment_sum`` of batched ``e x e``
    outer products, inverted as a batch (3x3 for BAL),
  - per-observation ``A_i = F_i^T E_i`` and ``Y_i = A_i C^{-1}``,
  - S assembled by gathering precomputed *observation pairs* (i, j) that
    share a point and scattering ``Y_i A_j^T`` blocks into a dense S with
    ``.at[].add`` (the lock-free counterpart of the reference's cell locks),
  - back-substitution ``dx_e = C^{-1}(b_e - W^T dx_f)`` batched per point.

ITERATIVE_SCHUR never forms S: the matvec
``S v = (F^T F + D_f) v - W C^{-1} W^T v`` is three gather/einsum/segment-sum
passes over observations, run inside a ``lax.while_loop`` PCG with the
SCHUR_JACOBI (block-diagonal-of-S) preconditioner.

Structure is declared, not discovered: parameter groups tagged with
``set_schur_elimination_group(0)`` are eliminated (points), everything else
is retained (cameras) — the counterpart of the reference's
ParameterBlockOrdering groups.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from skeres_tpu.core.evaluator import BatchBlocks, Evaluator
from skeres_tpu.core.linear_solvers import (
    lm_diagonal,
    preconditioned_conjugate_gradients,
)
from skeres_tpu.core.types import PreconditionerType

__all__ = ["SchurSolver"]


class SchurSolver:
    """Damped-normal-equation solver eliminating the group-0 parameters."""

    def __init__(
        self,
        evaluator: Evaluator,
        iterative: bool = False,
        preconditioner: PreconditionerType = PreconditionerType.SCHUR_JACOBI,
        max_cg_iterations: int = 500,
        eta: float = 1e-1,
        pair_chunk: Optional[int] = None,
        refinement_iterations: int = 0,
    ):
        self.ev = evaluator
        self.iterative = iterative
        self.preconditioner = preconditioner
        self.max_cg_iterations = max_cg_iterations
        self.eta = eta
        self.pair_chunk = pair_chunk
        self.refinement_iterations = refinement_iterations
        program = evaluator.program

        elim = [i for i, g in enumerate(program.groups) if g.schur_group == 0]
        if len(elim) != 1:
            raise NotImplementedError(
                "SchurSolver v1 requires exactly one eliminated parameter "
                f"group (got {len(elim)}); tag points with "
                "set_schur_elimination_group(arr, 0)"
            )
        self.elim_group = elim[0]
        ge = program.groups[self.elim_group]
        self.e_size = ge.tangent_size
        self.num_points = ge.num_blocks
        self.elim_offset = program.tangent_offset[self.elim_group]
        self.elim_span = self.num_points * self.e_size

        # retained (global tangent) index list, and global -> retained map
        n = program.num_tangent
        mask = np.ones(n, dtype=bool)
        mask[self.elim_offset : self.elim_offset + self.elim_span] = False
        self.ret_index = np.nonzero(mask)[0].astype(np.int32)  # (N_f,)
        self.num_f = len(self.ret_index)
        glob2ret = np.full(n, -1, dtype=np.int32)
        glob2ret[self.ret_index] = np.arange(self.num_f, dtype=np.int32)

        # per-batch column split: E columns (eliminated slot) vs F columns.
        # Row-indexed arrays (pidx, fidx, tangent_index) come from the
        # evaluator's padded device constants so sharding padding stays
        # consistent (padded rows are weight-zeroed -> contribute nothing).
        self.batch_info = []
        e_batches = []  # indices of batches with an eliminated slot
        for bi, b in enumerate(program.batches):
            _, idx_pad, tidx_pad, _, _ = evaluator._batch_const[bi]
            cols = np.arange(b.block_tangent_size)
            col_group = np.concatenate(
                [
                    np.full(t, gi)
                    for gi, t in zip(b.slot_groups, b.tangent_sizes)
                ]
            ).astype(np.int64)
            e_cols = cols[col_group == self.elim_group]
            f_cols = cols[col_group != self.elim_group]
            e_slots = [
                s for s, gi in enumerate(b.slot_groups) if gi == self.elim_group
            ]
            if len(e_slots) > 1:
                raise NotImplementedError(
                    "residual blocks touching >1 eliminated block are not "
                    "supported (mirror of the reference's one-E-block-per-row "
                    "requirement)"
                )
            pidx = (
                np.asarray(idx_pad[e_slots[0]]).astype(np.int32)
                if e_slots
                else None
            )
            # retained-local indices of the F columns, per block (B, Tf)
            fidx = glob2ret[np.asarray(tidx_pad)[:, f_cols]]
            assert (fidx >= 0).all()
            info = dict(
                e_cols=jnp.asarray(e_cols, dtype=jnp.int32),
                f_cols=jnp.asarray(f_cols, dtype=jnp.int32),
                fidx=jnp.asarray(fidx),
                pidx=None if pidx is None else jnp.asarray(pidx),
                tf=len(f_cols),
            )
            self.batch_info.append(info)
            if e_slots and len(f_cols) > 0:
                e_batches.append(bi)

        if len(e_batches) > 1:
            raise NotImplementedError(
                "multiple camera-point batch signatures not yet supported"
            )
        self.e_batch = e_batches[0] if e_batches else None

        # retained block structure for the SCHUR_JACOBI preconditioner and
        # the dense-W gate: contiguous (n_blocks, t) spans per retained group
        self.ret_blocks = []  # (start_in_retained, n_blocks, t)
        pos = 0
        for gi, g in enumerate(program.groups):
            if gi == self.elim_group:
                continue
            self.ret_blocks.append((pos, g.num_blocks, g.tangent_size))
            pos += g.num_blocks * g.tangent_size

        # Dense-W fast path for DENSE_SCHUR (no scatter): viable when the
        # E-batch couples one point block to ONE retained block per row
        # (the BA case) and the dense per-point W = (n_pts, n_cams, f, e)
        # fits memory. The pair-scatter path below is the general fallback
        # — profiled 101ms vs <10ms for everything else on v5e (the XLA
        # scatter-add is the entire bottleneck; see tools/profile_tpu.py).
        self.dense_w = None
        if self.e_batch is not None and not iterative:
            b = program.batches[self.e_batch]
            info = self.batch_info[self.e_batch]
            ret_groups = [
                gi for gi in b.slot_groups if gi != self.elim_group
            ]
            if len(b.slot_groups) == 2 and len(ret_groups) == 1:
                gr = program.groups[ret_groups[0]]
                f_size = gr.tangent_size
                n_cams = gr.num_blocks
                w_bytes = self.num_points * n_cams * f_size * self.e_size * 4
                if (
                    len(self.ret_blocks) == 1
                    and f_size == len(np.asarray(info["f_cols"]))
                    and w_bytes <= 2 << 30
                ):
                    cam_slot = [
                        s
                        for s, gi in enumerate(b.slot_groups)
                        if gi != self.elim_group
                    ][0]
                    _, idx_pad, _, _, _ = evaluator._batch_const[self.e_batch]
                    cam_idx = jnp.asarray(idx_pad[cam_slot])
                    pidx = info["pidx"]
                    onehot = (
                        cam_idx[:, None]
                        == jnp.arange(n_cams, dtype=cam_idx.dtype)[None, :]
                    ).astype(evaluator.dtype)
                    self.dense_w = dict(
                        n_cams=n_cams,
                        f_size=f_size,
                        cam_idx=cam_idx,
                        # linear (point, camera) cell index; scatter-ADD (the
                        # sharding-padded duplicate rows carry zero blocks)
                        lin_idx=pidx * n_cams + cam_idx,
                        # one-hot for the block-diagonal F^T F reduction:
                        # a (B, n_cams) matmul instead of a segment scatter
                        onehot=onehot,
                    )

        # host-side pair enumeration for the S scatter (DENSE_SCHUR):
        # ordered pairs (i, j) of observations of the same point, i != j
        # (the i == j diagonal term is handled separately without gathers).
        if self.e_batch is not None and not iterative and self.dense_w is None:
            pidx_np = np.asarray(self.batch_info[self.e_batch]["pidx"]).astype(
                np.int64
            )
            order = np.argsort(pidx_np, kind="stable")
            sorted_p = pidx_np[order]
            starts = np.searchsorted(sorted_p, np.arange(self.num_points), "left")
            ends = np.searchsorted(sorted_p, np.arange(self.num_points), "right")
            pi, pj = [], []
            for p in range(self.num_points):
                obs = order[starts[p] : ends[p]]
                k = len(obs)
                if k < 2:
                    continue
                ii, jj = np.meshgrid(obs, obs, indexing="ij")
                off = ~np.eye(k, dtype=bool)
                pi.append(ii[off])
                pj.append(jj[off])
            if pi:
                self.pair_i = jnp.asarray(np.concatenate(pi), dtype=jnp.int32)
                self.pair_j = jnp.asarray(np.concatenate(pj), dtype=jnp.int32)
            else:
                self.pair_i = jnp.zeros((0,), dtype=jnp.int32)
                self.pair_j = jnp.zeros((0,), dtype=jnp.int32)

        self._ret_index_dev = jnp.asarray(self.ret_index)

    # -- solver_data / scaling ---------------------------------------------------

    def solver_data(self, blocks: Sequence[BatchBlocks]):
        """Keep corrected per-batch (r, jac) resident; splitting into E/F
        happens inside the solve (pure index ops, fused by XLA)."""
        return tuple((b.r, b.jac) for b in blocks)

    def scale_data(self, data, scale):
        out = []
        for (r, jac), const in zip(data, self.ev._batch_const):
            tidx = const[2]
            out.append((r, jac * scale[tidx][:, None, :]))
        return tuple(out)

    # -- shared assembly pieces ---------------------------------------------------

    def _split(self, bi, r, jac):
        info = self.batch_info[bi]
        F = jac[:, :, info["f_cols"]] if info["tf"] else None
        E = jac[:, :, info["e_cols"]] if info["pidx"] is not None else None
        return F, E, info["fidx"], info["pidx"]

    def _gather_ge(self, g):
        return g[self.elim_offset : self.elim_offset + self.elim_span].reshape(
            self.num_points, self.e_size
        )

    def _assemble(self, data, g, d):
        """Common elimination state: per-obs A, damped C^-1, rhs pieces.

        d: (N,) clamped damping diagonal (already includes mu).
        Returns dict of device arrays.
        """
        e = self.e_size
        g_f = g[self._ret_index_dev]
        d_f = d[self._ret_index_dev]
        g_e = self._gather_ge(g)
        d_e = self._gather_ge(d)

        ete = jnp.zeros((self.num_points, e, e), dtype=g.dtype)
        per_batch = []
        for bi, (r, jac) in enumerate(data):
            F, E, fidx, pidx = self._split(bi, r, jac)
            if E is not None:
                ete = ete.at[pidx].add(jnp.einsum("bme,bmf->bef", E, E))
            per_batch.append((r, F, E, fidx, pidx))

        ete = ete + jax.vmap(jnp.diag)(d_e)
        # batched small PSD inverse (e = 3 for BAL): Cholesky-based
        chol = jax.vmap(jnp.linalg.cholesky)(ete)
        eye = jnp.broadcast_to(jnp.eye(e, dtype=g.dtype), ete.shape)
        cinv = jax.vmap(
            lambda l, i: jax.scipy.linalg.cho_solve((l, True), i)
        )(chol, eye)
        return dict(
            per_batch=per_batch, cinv=cinv, g_f=g_f, d_f=d_f, g_e=g_e
        )

    def _w_ct_we_ops(self, asm):
        """Build W v_e (points->cameras) and W^T v_f (cameras->points)."""
        per_batch = asm["per_batch"]

        def w_apply(v_e):  # (n_pt, e) -> (N_f,)
            out = jnp.zeros((self.num_f,), dtype=v_e.dtype)
            for r, F, E, fidx, pidx in per_batch:
                if E is None or F is None:
                    continue
                fe_v = jnp.einsum("bmf,bme,be->bf", F, E, v_e[pidx])
                out = out.at[fidx].add(fe_v)
            return out

        def wt_apply(v_f):  # (N_f,) -> (n_pt, e)
            out = jnp.zeros((self.num_points, self.e_size), dtype=v_f.dtype)
            for r, F, E, fidx, pidx in per_batch:
                if E is None or F is None:
                    continue
                ef_v = jnp.einsum(
                    "bme,bmf,bf->be", E, F, v_f[fidx]
                )
                out = out.at[pidx].add(ef_v)
            return out

        return w_apply, wt_apply

    def _ftf_apply(self, asm, v_f):
        """(F^T F + D_f) v."""
        out = asm["d_f"] * v_f
        for r, F, E, fidx, pidx in asm["per_batch"]:
            if F is None:
                continue
            fv = jnp.einsum("bmf,bf->bm", F, v_f[fidx])
            out = out.at[fidx].add(jnp.einsum("bmf,bm->bf", F, fv))
        return out

    def _schur_rhs(self, asm):
        """b_f - W C^{-1} b_e with b = -g."""
        w_apply, _ = self._w_ct_we_ops(asm)
        cinv_be = jnp.einsum("pef,pf->pe", asm["cinv"], -asm["g_e"])
        return -asm["g_f"] - w_apply(cinv_be)

    def _back_substitute(self, asm, dx_f):
        _, wt_apply = self._w_ct_we_ops(asm)
        b_e = -asm["g_e"] - wt_apply(dx_f)
        return jnp.einsum("pef,pf->pe", asm["cinv"], b_e)

    def _schur_jacobi_blocks(self, asm):
        """Block diagonal of S per retained block (for the preconditioner
        and for DENSE_SCHUR's diagonal assembly path)."""
        outs = []
        for start, nb, t in self.ret_blocks:
            outs.append(jnp.zeros((nb, t, t), dtype=asm["g_f"].dtype))

        def scatter_block(outs, fidx, contrib):
            # fidx (B, Tf) retained indices; contrib (B, Tf, Tf).
            # Each residual block's F columns may span several retained
            # blocks; route each (Tf, Tf) sub-square to its retained block.
            for k, (start, nb, t) in enumerate(self.ret_blocks):
                in_blk = (fidx >= start) & (fidx < start + nb * t)
                # local block id and coordinate per column
                blk = jnp.where(in_blk, (fidx - start) // t, 0)
                coord = jnp.where(in_blk, (fidx - start) % t, 0)
                # only add (col_a, col_b) pairs within the same block
                same = (
                    in_blk[:, :, None]
                    & in_blk[:, None, :]
                    & (blk[:, :, None] == blk[:, None, :])
                )
                c = jnp.where(same, contrib, 0.0)
                outs[k] = outs[k].at[
                    blk[:, :, None], coord[:, :, None], coord[:, None, :]
                ].add(jnp.where(same, c, 0.0))
            return outs

        for r, F, E, fidx, pidx in asm["per_batch"]:
            if F is None:
                continue
            ftf = jnp.einsum("bmf,bmg->bfg", F, F)
            if E is not None:
                A = jnp.einsum("bmf,bme->bfe", F, E)  # (B, Tf, e)
                Y = jnp.einsum("bfe,beg->bfg", A, asm["cinv"][pidx])
                ftf = ftf - jnp.einsum("bfe,bge->bfg", Y, A)
            outs = scatter_block(outs, fidx, ftf)

        # add damping to the diagonal of each block
        d_f = asm["d_f"]
        for k, (start, nb, t) in enumerate(self.ret_blocks):
            dd = d_f[start : start + nb * t].reshape(nb, t)
            outs[k] = outs[k] + jax.vmap(jnp.diag)(dd)
        return outs

    # -- DENSE_SCHUR -----------------------------------------------------------------

    def _dense_s_dense_w(self, asm):
        """Scatter-free S assembly (BA fast path): everything is one-hot
        matmuls and batched einsums on the MXU.

          S = blockdiag(F^T F) - sum_p W_p C_p^{-1} W_p^T + diag(d_f)

        with W (n_pts, n_cams, f, e) materialized densely (bounded size,
        checked at construction). Replaces the observation-pair scatter
        that dominated the profile (tools/profile_tpu.py: 101ms -> ~2ms).
        """
        dw = self.dense_w
        nc, f, e = dw["n_cams"], dw["f_size"], self.e_size
        dtype = asm["g_f"].dtype
        r, F, E, fidx, pidx = asm["per_batch"][self.e_batch]

        # block-diagonal F^T F via one-hot reduction
        ftf = jnp.einsum("bmf,bmg->bfg", F, F)  # (B, f, f)
        diag_blocks = jnp.einsum("bc,bfg->cfg", dw["onehot"], ftf)

        # dense W and the correction term
        a = jnp.einsum("bmf,bme->bfe", F, E)  # (B, f, e)
        w = jnp.zeros((self.num_points * nc, f, e), dtype=dtype)
        w = w.at[dw["lin_idx"]].add(a)
        w = w.reshape(self.num_points, nc, f, e)
        y = jnp.einsum("pcfe,peg->pcfg", w, asm["cinv"])
        corr = jnp.einsum("pcfe,pdge->cfdg", y, w)  # (nc, f, nc, f)

        s = -corr.reshape(nc * f, nc * f)
        rows = jnp.arange(nc * f).reshape(nc, f)
        s = s.at[rows[:, :, None], rows[:, None, :]].add(diag_blocks)
        s = s + jnp.diag(asm["d_f"])

        # any other batches (e.g. camera priors) take the generic path;
        # they are tiny compared to the observation batch
        for bi, (rb, Fb, Eb, fidxb, pidxb) in enumerate(asm["per_batch"]):
            if bi == self.e_batch or Fb is None:
                continue
            ftfb = jnp.einsum("bmf,bmg->bfg", Fb, Fb)
            s = s.at[fidxb[:, :, None], fidxb[:, None, :]].add(ftfb)
        return s

    def _dense_s(self, asm):
        """Materialize S (N_f, N_f)."""
        if self.dense_w is not None:
            return self._dense_s_dense_w(asm)
        nf = self.num_f
        dtype = asm["g_f"].dtype
        s = jnp.diag(asm["d_f"])
        A_all = None
        for r, F, E, fidx, pidx in asm["per_batch"]:
            if F is None:
                continue
            ftf = jnp.einsum("bmf,bmg->bfg", F, F)
            if E is not None:
                A = jnp.einsum("bmf,bme->bfe", F, E)
                Y = jnp.einsum("bfe,beg->bfg", A, asm["cinv"][pidx])
                ftf = ftf - jnp.einsum("bfe,bge->bfg", Y, A)  # i == j pair
                A_all, Y_all, fidx_all = A, Y, fidx
            s = s.at[fidx[:, :, None], fidx[:, None, :]].add(ftf)

        # off-diagonal camera pairs sharing a point: -Y_i A_j^T
        if self.e_batch is not None and self.pair_i.shape[0] > 0:
            Yi = Y_all[self.pair_i]
            Aj = A_all[self.pair_j]
            contrib = -jnp.einsum("bfe,bge->bfg", Yi, Aj)
            fi = fidx_all[self.pair_i]
            fj = fidx_all[self.pair_j]
            s = s.at[fi[:, :, None], fj[:, None, :]].add(contrib)
        return s

    # -- public interface used by the minimizer -----------------------------------

    def solve_damped(self, data, g, diag, mu, min_diagonal, max_diagonal):
        d = lm_diagonal(diag, mu, min_diagonal, max_diagonal)
        asm = self._assemble(data, g, d)
        rhs = self._schur_rhs(asm)

        if not self.iterative:
            s = self._dense_s(asm)
            l = jax.lax.linalg.cholesky(s)
            dx_f = jax.scipy.linalg.cho_solve((l, True), rhs)
            # mixed-precision iterative refinement on the reduced camera
            # system (reference: use_mixed_precision_solves)
            for _ in range(self.refinement_iterations):
                r64 = rhs.astype(jnp.float64) - s.astype(jnp.float64) @ (
                    dx_f.astype(jnp.float64)
                )
                dx_f = dx_f + jax.scipy.linalg.cho_solve(
                    (l, True), r64.astype(s.dtype)
                )
            iters = jnp.ones((), dtype=jnp.int32)
        else:
            w_apply, wt_apply = self._w_ct_we_ops(asm)

            def s_matvec(v):
                wc = jnp.einsum(
                    "pef,pf->pe", asm["cinv"], wt_apply(v)
                )
                return self._ftf_apply(asm, v) - w_apply(wc)

            if self.preconditioner == PreconditionerType.SCHUR_JACOBI:
                blocks = self._schur_jacobi_blocks(asm)
                chols = [
                    jax.vmap(jnp.linalg.cholesky)(blk) for blk in blocks
                ]

                def precond(v):
                    parts = []
                    for (start, nb, t), l in zip(self.ret_blocks, chols):
                        vb = v[start : start + nb * t].reshape(nb, t)
                        xb = jax.vmap(
                            lambda li, bi: jax.scipy.linalg.cho_solve(
                                (li, True), bi
                            )
                        )(l, vb)
                        parts.append(xb.reshape(-1))
                    return jnp.concatenate(parts)

            else:  # JACOBI / IDENTITY fall back to diagonal scaling
                d_f = asm["d_f"] + self._ftf_diag(asm)

                def precond(v):
                    return v / jnp.maximum(d_f, jnp.finfo(v.dtype).tiny)

            dx_f, iters = preconditioned_conjugate_gradients(
                s_matvec,
                rhs,
                precond,
                self.max_cg_iterations,
                jnp.asarray(self.eta, dtype=g.dtype),
            )

        dx_e = self._back_substitute(asm, dx_f)
        dx = jnp.zeros_like(g)
        dx = dx.at[self._ret_index_dev].set(dx_f)
        dx = dx.at[
            self.elim_offset + jnp.arange(self.elim_span)
        ].set(dx_e.reshape(-1))
        return dx, iters

    def _ftf_diag(self, asm):
        out = jnp.zeros((self.num_f,), dtype=asm["g_f"].dtype)
        for r, F, E, fidx, pidx in asm["per_batch"]:
            if F is None:
                continue
            out = out.at[fidx].add(jnp.sum(F * F, axis=1))
        return out

    def jtj_matvec(self, data, v):
        """Full-space (J^T J) v from the resident blocks (model cost)."""
        out = jnp.zeros_like(v)
        for (r, jac), const in zip(data, self.ev._batch_const):
            tidx = const[2]
            jv = jnp.einsum("bmi,bi->bm", jac, v[tidx])
            out = out.at[tidx].add(jnp.einsum("bmi,bm->bi", jac, jv))
        return out
