"""Explicit Schur-complement assembly (TPU-native).

Counterpart of the reference lineage's explicit-S machinery
(``schur_complement_solver.cc`` assembling S into a block random-access
matrix, and ``use_explicit_schur_complement`` for ITERATIVE_SCHUR —
``implicit_schur_complement.cc``'s documented alternative). The reference
scatters small GEMM results into S under locks; XLA scatter-add on TPU
runs at ~8M rows/s (measured, BENCH_EXTRA round 3) so this module builds S
with ZERO data-dependent scatters:

  S = blockdiag(F^T F + D_f) - W C^{-1} W^T

- per-row ``A_r = F_r^T E_r`` and ``Y_r = A_r C_p^{-1}`` are batched
  einsums (bandwidth-bound, measured at the HBM roofline);
- the DIAGONAL correction blocks ``sum_r Y_r A_r^T`` per camera ride the
  camera-padded K-reduce (gather-free);
- the OFF-diagonal blocks come from strict pair products per point:
  rows are laid on a point-padded grid (P, Kp) (pure reshape when
  observation counts are uniform), pair products ``Y_{pk} A_{pl}^T`` for
  k < l are one broadcast einsum, and the reduction onto unique camera
  pairs uses a host-planned HIERARCHICAL PADDED SUM: destinations are
  split so no grid level exceeds a fan-in cap, each level is one static
  gather + reshape + sum (gathers are the fastest transport on this
  hardware: ~190M rows/s vs ~8M rows/s scatter);
- dense S is then GATHER-built: every (ci, cj) block position reads its
  unique-pair sum (or zero) through a static index map.

All index arrays are static (problem structure), built once on the host.
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from skeres_tpu.ops.small_einsum import vpu_einsum

__all__ = ["ExplicitSchurPlan"]


class _SumLevel(NamedTuple):
    src: jnp.ndarray  # (n_dest * cap,) int32 into previous level's rows
    n_dest: int
    cap: int


def _hierarchical_sum_plan(
    ids: np.ndarray, raw_rows: np.ndarray, n_rows: int, cap: int = 32
) -> Tuple[List[_SumLevel], np.ndarray, int]:
    """Plan ``out[u] = sum(values[raw_rows][ids == uniq[u]])`` as static
    gather+reshape+sum levels with fan-in <= cap per level (all numpy,
    vectorized — venice has ~10M pair rows).

    Returns (levels, uniq_ids (n_uniq,), n_uniq). Level k's gather indexes
    the output rows of level k-1 (level 0 indexes the raw value rows); the
    sentinel index == n_rows_of_previous_level selects a zero row appended
    by the runtime.
    """
    order = np.argsort(ids, kind="stable")
    sorted_ids = ids[order]
    uniq, start = np.unique(sorted_ids, return_index=True)
    counts = np.diff(np.append(start, len(ids)))

    levels: List[_SumLevel] = []
    n_prev = n_rows
    cur_counts = counts.astype(np.int64)
    cur_rows = raw_rows[order].astype(np.int64)  # grouped by id
    while True:
        n_dest = len(cur_counts)
        n_d = (cur_counts + cap - 1) // cap  # sub-rows per destination
        sub_start = np.concatenate([[0], np.cumsum(n_d)[:-1]])
        n_sub = int(n_d.sum())
        # position of the j-th row of destination d: sub_start[d]*cap + j
        dest_of_row = np.repeat(np.arange(n_dest), cur_counts)
        starts = np.concatenate([[0], np.cumsum(cur_counts)[:-1]])
        j_within = np.arange(len(cur_rows)) - starts[dest_of_row]
        positions = sub_start[dest_of_row] * cap + j_within
        src = np.full(n_sub * cap, n_prev, dtype=np.int64)  # sentinel
        src[positions] = cur_rows
        levels.append(
            _SumLevel(jnp.asarray(src.astype(np.int32)), n_sub, cap)
        )
        if (n_d == 1).all():
            break
        # next level reduces each destination's sub-rows
        cur_rows = np.arange(n_sub, dtype=np.int64)
        cur_counts = n_d
        n_prev = n_sub
    return levels, uniq, len(uniq)


def _apply_hierarchical_sum(levels: List[_SumLevel], values: jnp.ndarray):
    """values: (n_rows, D) -> (n_uniq, D) via the planned levels."""
    cur = values
    for lvl in levels:
        zero = jnp.zeros((1,) + cur.shape[1:], cur.dtype)
        g = jnp.concatenate([cur, zero])[lvl.src]
        cur = g.reshape(lvl.n_dest, lvl.cap, -1).sum(axis=1)
    return cur


class ExplicitSchurPlan:
    """Static plan for explicit-S assembly of ONE observation batch with a
    single retained slot (the BA case the camera-padded layout covers)."""

    def __init__(
        self,
        cam_idx: np.ndarray,  # (B,) camera block id per row (incl. padding)
        pt_idx: np.ndarray,  # (B,) point block id per row (incl. padding)
        num_cameras: int,
        num_points: int,
        f_size: int,
        e_size: int,
        n_valid: Optional[int] = None,  # real rows; tail rows are evaluator
        # padding (repeated row-0 indices, zero-weight) and get no slots
        pair_cap: int = 32,
        pad_waste: float = 1.5,
    ):
        B = len(cam_idx)
        if n_valid is None:
            n_valid = B
        self.nc = num_cameras
        self.np_ = num_points
        self.f = f_size
        self.e = e_size

        # -- point grid: rows of each point in a (P, Kp) padded layout ----
        pt_v = pt_idx[:n_valid]
        counts = np.bincount(pt_v, minlength=num_points)
        kp = int(counts.max()) if num_points else 0
        self.kp = kp
        if num_points * kp > pad_waste * n_valid * 2.0:
            raise ValueError("point-degree skew too high for explicit S")
        order = np.argsort(pt_v, kind="stable")
        sorted_pt = pt_v[order]
        starts = np.searchsorted(sorted_pt, np.arange(num_points))
        pos = np.arange(n_valid) - starts[sorted_pt]
        grid_src = np.full(num_points * kp, B, dtype=np.int64)  # sentinel
        grid_src[sorted_pt * kp + pos] = order
        # uniform point-sorted case: the grid is the identity reshape
        self.grid_is_reshape = bool(
            n_valid == B
            and (counts == kp).all()
            and (grid_src == np.arange(B)).all()
        )
        self.grid_src = (
            None if self.grid_is_reshape
            else jnp.asarray(grid_src.astype(np.int32))
        )
        grid_cam = np.full(num_points * kp, -1, dtype=np.int64)
        valid = grid_src < B
        grid_cam[valid] = cam_idx[grid_src[valid]]
        grid_cam = grid_cam.reshape(num_points, kp)

        # -- strict upper pairs (k < l) per point -------------------------
        iu, ju = np.triu_indices(kp, k=1)
        self.pair_k = jnp.asarray(iu.astype(np.int32))
        self.pair_l = jnp.asarray(ju.astype(np.int32))
        npairs_per_pt = len(iu)
        ca = grid_cam[:, iu].reshape(-1)  # (P * npairs,)
        cb = grid_cam[:, ju].reshape(-1)
        pair_valid = (ca >= 0) & (cb >= 0)
        swap = ca > cb
        lo = np.where(swap, cb, ca)
        hi = np.where(swap, ca, cb)
        pair_id = np.where(pair_valid, lo * num_cameras + hi, -1)
        self.swap_mask = jnp.asarray(
            swap.reshape(num_points, npairs_per_pt).astype(np.bool_)
        )
        self.pair_valid = jnp.asarray(
            pair_valid.reshape(num_points, npairs_per_pt).astype(np.bool_)
        )

        # -- hierarchical reduction of pair values onto unique (lo, hi) ---
        rows = np.nonzero(pair_id >= 0)[0]
        self.n_pair_rows = len(pair_id)
        self.levels, uniq, self.n_uniq = _hierarchical_sum_plan(
            pair_id[rows], rows, self.n_pair_rows, cap=pair_cap
        )
        n_uniq = self.n_uniq

        # -- dense-S gather map: block position (ci, cj) -> unique pair ---
        pos2u = np.full(num_cameras * num_cameras, n_uniq, dtype=np.int64)
        pos2u[uniq] = np.arange(n_uniq)
        lo_all = uniq // num_cameras
        hi_all = uniq % num_cameras
        # transpose side: position (hi, lo) reads the same block transposed
        self.pos2u_upper = jnp.asarray(pos2u.astype(np.int32))
        pos2u_t = np.full(num_cameras * num_cameras, n_uniq, dtype=np.int64)
        pos2u_t[hi_all * num_cameras + lo_all] = np.arange(n_uniq)
        # NOTE: a diagonal unique pair (a == b, the same camera observing a
        # point through two rows) correctly receives BOTH reads: the true
        # contribution to S[a,a] is sum_{k<l}(T + T^T)
        self.pos2u_lower = jnp.asarray(pos2u_t.astype(np.int32))
        # static column permutation transposing a flat (f, f) block —
        # TPU tiling pads any trailing (f, f)=(9,9) dims to (16, 128)
        # (14x memory blow-up at nc^2 rows), so EVERY pair-block array
        # stays in flat-81 2D form (pads only 81->128)
        ij = np.arange(f_size * f_size).reshape(f_size, f_size)
        self.perm_t = jnp.asarray(ij.T.reshape(-1).astype(np.int32))

    # -- runtime -----------------------------------------------------------

    def point_grid_flat(self, arr_flat):
        """(B, D) flat row array -> (P, Kp*D) padded point grid. Flat 2D
        end to end: any materialized array with trailing dims like (9, 3)
        tile-pads up to ~25x on TPU (the venice OOM), so every boundary
        shape here keeps a wide last dimension."""
        d = arr_flat.shape[1]
        if self.grid_is_reshape:
            return arr_flat.reshape(self.np_, self.kp * d)
        zero = jnp.zeros((1, d), arr_flat.dtype)
        return jnp.concatenate([arr_flat, zero])[self.grid_src].reshape(
            self.np_, self.kp * d
        )

    def correction_offdiag(self, a_flat, cinv_flat, chunk_points: int = 8192):
        """sum over points of Y_pk A_pl^T for k < l, reduced to the unique
        camera-pair blocks: returns flat (n_uniq, f*f) rows.

        a_flat:    (B, f*e) per-row A = F^T E (scaled space), flat;
        cinv_flat: (P, e*e) flat.
        """
        f, e = self.f, self.e
        kp = self.kp
        grid = self.point_grid_flat(a_flat)  # (P, Kp*f*e)

        def chunk_vals(args):
            g_c, cinv_c, swap_c, valid_c = args
            c = g_c.shape[0]
            a_c = g_c.reshape(c, kp, f, e)
            y_c = vpu_einsum("pkfe,peg->pkfg", a_c,
                             cinv_c.reshape(c, e, e))
            ya = y_c[:, self.pair_k]  # (p, npair, f, e)
            ab = a_c[:, self.pair_l]
            t = vpu_einsum("pnfe,pnge->pnfg", ya, ab)
            # canonical (lo, hi) storage: transpose where cam_k > cam_l
            t = jnp.where(swap_c[:, :, None, None],
                          jnp.swapaxes(t, 2, 3), t)
            t = jnp.where(valid_c[:, :, None, None], t, 0.0)
            return t.reshape(-1, f * f)

        P = self.np_
        if P > chunk_points:
            nch = -(-P // chunk_points)
            pad = nch * chunk_points - P
            grid = jnp.pad(grid, ((0, pad), (0, 0)))
            cinv_p = jnp.pad(cinv_flat, ((0, pad), (0, 0)))
            sw = jnp.pad(self.swap_mask, ((0, pad), (0, 0)))
            va = jnp.pad(self.pair_valid, ((0, pad), (0, 0)))
            vals = jax.lax.map(
                chunk_vals,
                (
                    grid.reshape(nch, chunk_points, -1),
                    cinv_p.reshape(nch, chunk_points, -1),
                    sw.reshape(nch, chunk_points, -1),
                    va.reshape(nch, chunk_points, -1),
                ),
            ).reshape(-1, f * f)[: self.n_pair_rows]
        else:
            vals = chunk_vals(
                (grid, cinv_flat, self.swap_mask, self.pair_valid)
            )
        # flat-81 rows throughout (see perm_t note)
        return _apply_hierarchical_sum(self.levels, vals)

    def dense_s_offdiag(self, uniq_flat, chunk_cams: int = 127):
        """Gather-build the (nc*f, nc*f) off-diagonal correction from the
        unique pair blocks (``uniq_flat``: (n_uniq, f*f) flat rows; upper
        read + statically-permuted transposed lower read), then rearrange
        block rows to the dense matrix in camera chunks — the full
        (nc, nc, f, f) intermediate would tile-pad 14x (25 GB at venice),
        per-chunk it is bounded."""
        nc, f = self.nc, self.f
        zero = jnp.zeros((1, f * f), uniq_flat.dtype)
        padded = jnp.concatenate([uniq_flat, zero])
        blocks81 = padded[self.pos2u_upper] + padded[self.pos2u_lower][
            :, self.perm_t
        ]  # (nc*nc, f*f), 2D throughout

        cch = min(chunk_cams, nc)
        nch = -(-nc // cch)
        pad = nch * cch - nc
        b = blocks81.reshape(nc, nc * f * f)
        if pad:
            b = jnp.pad(b, ((0, pad), (0, 0)))

        def rearr(g):  # (cch, nc*f*f) -> (cch*f, nc*f)
            return (
                g.reshape(cch, nc, f, f)
                .swapaxes(1, 2)
                .reshape(cch * f, nc * f)
            )

        s = jax.lax.map(rearr, b.reshape(nch, cch, nc * f * f))
        return s.reshape(nch * cch * f, nc * f)[: nc * f]
