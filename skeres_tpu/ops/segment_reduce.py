"""Scatter-free segment reduction plans.

All normal-equation assembly in this framework is "sum per-row block
contributions by destination block id" (the reference does it with
lock-guarded scatter into a BlockSparseMatrix /
BlockRandomAccessDenseMatrix; see ``internal/ceres/block_jacobian_writer.cc``,
``schur_eliminator_impl.h``). On TPU, XLA lowers ``.at[idx].add`` to a
serialized scatter that dominates the profile (tools/profile_tpu.py). The
destination index arrays are **static** (they come from the problem
structure, frozen at compile), so the reduction strategy can be planned on
the host once:

  'onehot'  — few destination blocks: one-hot matmul, runs on the MXU.
  'gather'  — many destinations with bounded fan-in: precompute the
              CSR-by-destination layout ``slots (n_dest, K)`` and reduce by
              gather + masked sum (gathers vectorize on TPU; scatters do
              not).
  'scatter' — fallback (also used under SPMD sharding, where a gather
              from a sharded operand would allgather).

Values rows must already be zero for padded/invalid rows; every plan then
produces identical results to the scatter.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

__all__ = ["ReducePlan", "build_reduce_plan", "apply_reduce_plan"]

# one-hot transient is (B, n_dest): cap its element count
ONEHOT_LIMIT = 1 << 24
# padded gather layout is (n_dest, K): cap the padding blow-up vs B rows
GATHER_WASTE = 4.0


class ReducePlan(NamedTuple):
    kind: str  # 'onehot' | 'gather' | 'scatter'
    n_dest: int
    idx: Optional[jnp.ndarray]  # (B,) destination ids ('onehot'/'scatter')
    slots: Optional[jnp.ndarray]  # (n_dest, K) row ids ('gather')
    mask: Optional[jnp.ndarray]  # (n_dest, K) 1/0 ('gather')


def build_reduce_plan(
    idx_np: np.ndarray,
    n_dest: int,
    force_scatter: bool = False,
    onehot_limit: int = ONEHOT_LIMIT,
    gather_waste: float = GATHER_WASTE,
) -> ReducePlan:
    idx_np = np.asarray(idx_np, dtype=np.int64)
    b = len(idx_np)
    if force_scatter or b == 0:
        return ReducePlan("scatter", n_dest, jnp.asarray(idx_np, jnp.int32), None, None)
    counts = np.bincount(idx_np, minlength=n_dest)
    k = int(counts.max()) if n_dest else 0
    if b * n_dest <= onehot_limit:
        return ReducePlan("onehot", n_dest, jnp.asarray(idx_np, jnp.int32), None, None)
    if n_dest * max(k, 1) <= gather_waste * b:
        order = np.argsort(idx_np, kind="stable")
        sorted_idx = idx_np[order]
        starts = np.searchsorted(sorted_idx, np.arange(n_dest))
        pos = np.arange(b) - starts[sorted_idx]
        slots = np.zeros((n_dest, k), np.int32)
        mask = np.zeros((n_dest, k), np.float32)
        slots[sorted_idx, pos] = order
        mask[sorted_idx, pos] = 1.0
        return ReducePlan(
            "gather", n_dest, None, jnp.asarray(slots), jnp.asarray(mask)
        )
    return ReducePlan("scatter", n_dest, jnp.asarray(idx_np, jnp.int32), None, None)


def apply_reduce_plan(plan: ReducePlan, values) -> jnp.ndarray:
    """``values (B, D)`` summed by destination -> ``(n_dest, D)``."""
    if plan.kind == "onehot":
        oh = (
            plan.idx[:, None] == jnp.arange(plan.n_dest, dtype=plan.idx.dtype)
        ).astype(values.dtype)
        return jnp.einsum("bg,bd->gd", oh, values)
    if plan.kind == "gather":
        gathered = values[plan.slots] * plan.mask[..., None].astype(values.dtype)
        return jnp.sum(gathered, axis=1)
    return jnp.zeros((plan.n_dest, values.shape[1]), values.dtype).at[plan.idx].add(
        values
    )
