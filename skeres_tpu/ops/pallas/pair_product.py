"""Pallas TPU kernel: explicit-Schur pair products, points on lanes.

The explicit-S assembly's hot op (core/explicit_schur.py; reference
counterpart: the small GEMMs of ``schur_eliminator_impl.h``'s chunk loop)
computes, for every point p and every observation pair (k, l) with k < l,

    T = Y_pk A_pl^T          (f x f),   Y_pk = A_pk C_p^{-1}

stored canonically ((lo, hi) camera order; transposed where cam_k >
cam_l) as flat f*f rows. The XLA broadcast-einsum form keeps the tiny
(f, e) minors on the vector lanes — measured ~200 ms at 1/3-venice scale,
~100x off the VPU roofline — because every (9, 3) slab occupies a whole
(8, 128) vreg row.

This kernel TRANSPOSES the problem: the huge point axis rides the 128
lanes, the tiny feature axes ride the sublanes. Every operation is then a
full-width (f, C) fused multiply-add over C points at once:

  - inputs  aT (kp*e*f, P)  per-point grid of A rows, e-major slabs
            cT (e*e, P)     per-point C^{-1}, row g*e + e
            swapT/validT (npairs, P)
  - scratch yT (kp*e*f, P)  Y = A C^{-1}, same layout
  - output  outT (npairs*f*f, P), row n*f*f + g*f + f_i holding the
            CANONICAL block entry C[f_i, g] (g-major storage; the caller
            converts the tiny reduced unique-pair table back to f-major
            with one static column permutation).

All loop bounds (kp, npairs, f, e) are static problem structure; the grid
streams 512-point column blocks through VMEM (~3 MB live per block).
Non-TPU backends run the XLA einsum path instead (interpret mode exists
for tests only).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["pair_products_lanes", "PAIR_KERNEL_BLOCK"]

PAIR_KERNEL_BLOCK = 512  # points per grid step (lanes), multiple of 128


def _pair_kernel(
    a_ref, c_ref, swap_ref, valid_ref, out_ref, y_ref, *,
    kp, f, e, pair_k, pair_l, nff_pad
):
    ef = e * f
    npairs = len(pair_k)
    # -- Y = A C^{-1}: y[k, e_i, :f] = sum_g a[k, g, :f] * c[g, e_i] ------
    for k in range(kp):
        for e_i in range(e):
            acc = None
            for g in range(e):
                term = (
                    a_ref[k * ef + g * f : k * ef + (g + 1) * f, :]
                    * c_ref[g * e + e_i : g * e + e_i + 1, :]
                )
                acc = term if acc is None else acc + term
            y_ref[k * ef + e_i * f : k * ef + (e_i + 1) * f, :] = acc

    # -- pair products, canonical orientation ----------------------------
    for n in range(npairs):
        k = pair_k[n]
        ll = pair_l[n]
        sw = swap_ref[n : n + 1, :]
        va = valid_ref[n : n + 1, :]
        for g in range(f):
            un = None  # T[f_i, g] = sum_e Y_k[f_i, e] A_l[g, e]
            swp = None  # T[g, f_i] = sum_e Y_k[g, e] A_l[f_i, e]
            for e_i in range(e):
                y_slab = y_ref[k * ef + e_i * f : k * ef + (e_i + 1) * f, :]
                a_slab = a_ref[
                    ll * ef + e_i * f : ll * ef + (e_i + 1) * f, :
                ]
                a_row = a_ref[
                    ll * ef + e_i * f + g : ll * ef + e_i * f + g + 1, :
                ]
                y_row = y_ref[
                    k * ef + e_i * f + g : k * ef + e_i * f + g + 1, :
                ]
                t_un = y_slab * a_row
                t_sw = a_slab * y_row
                un = t_un if un is None else un + t_un
                swp = t_sw if swp is None else swp + t_sw
            base = n * f * f + g * f
            out_ref[base : base + f, :] = va * jnp.where(
                sw > 0.0, swp, un
            )
    # zero the row padding so downstream slices stay clean even if reshaped
    nff = npairs * f * f
    if nff_pad > nff:
        out_ref[nff:nff_pad, :] = jnp.zeros(
            (nff_pad - nff, out_ref.shape[1]), out_ref.dtype
        )


def _use_interpret():
    return jax.default_backend() != "tpu"


@functools.partial(
    jax.jit, static_argnames=("kp", "f", "e", "pair_k", "pair_l", "block")
)
def pair_products_lanes(
    grid_fmaj,  # (P, kp*f*e) point grid of A rows, f-major cols
    cinv_flat,  # (P, e*e)
    swap,  # (P, npairs) bool
    valid,  # (P, npairs) bool
    *,
    kp: int,
    f: int,
    e: int,
    pair_k,  # tuple of ints, len npairs
    pair_l,
    block: int = PAIR_KERNEL_BLOCK,
):
    """Returns (P*npairs, f*f) canonical pair-product rows in G-MAJOR
    flat layout (caller permutes the reduced table back to f-major)."""
    p = grid_fmaj.shape[0]
    npairs = len(pair_k)
    ef = e * f
    kef = kp * ef
    dtype = grid_fmaj.dtype

    # e-major slab layout: row k*ef + e_i*f + f_i <- col k*ef + f_i*e + e_i
    perm = np.empty(kef, dtype=np.int32)
    for k in range(kp):
        for e_i in range(e):
            for f_i in range(f):
                perm[k * ef + e_i * f + f_i] = k * ef + f_i * e + e_i
    a_t = grid_fmaj.T[jnp.asarray(perm)]  # (kef, P)
    c_t = cinv_flat.T  # (e*e, P)
    swap_t = swap.T.astype(dtype)
    valid_t = valid.T.astype(dtype)

    p_pad = -(-p // block) * block
    if p_pad != p:
        padc = ((0, 0), (0, p_pad - p))
        a_t = jnp.pad(a_t, padc)
        c_t = jnp.pad(c_t, padc)
        swap_t = jnp.pad(swap_t, padc)
        valid_t = jnp.pad(valid_t, padc)

    nff = npairs * f * f
    nff_pad = -(-nff // 8) * 8
    kef_pad = -(-kef // 8) * 8
    if kef_pad != kef:
        a_t = jnp.pad(a_t, ((0, kef_pad - kef), (0, 0)))

    kernel = functools.partial(
        _pair_kernel,
        kp=kp,
        f=f,
        e=e,
        pair_k=tuple(pair_k),
        pair_l=tuple(pair_l),
        nff_pad=nff_pad,
    )
    out_t = pl.pallas_call(
        kernel,
        grid=(p_pad // block,),
        in_specs=[
            pl.BlockSpec((kef_pad, block), lambda i: (0, i)),
            pl.BlockSpec((e * e, block), lambda i: (0, i)),
            pl.BlockSpec((npairs, block), lambda i: (0, i)),
            pl.BlockSpec((npairs, block), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((nff_pad, block), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((nff_pad, p_pad), dtype),
        scratch_shapes=[pltpu.VMEM((kef_pad, block), dtype)],
        interpret=_use_interpret(),
    )(a_t, c_t, swap_t, valid_t)

    # back to row-per-(point, pair) form: (P*npairs, f*f), g-major
    return out_t[:nff, :p].T.reshape(p * npairs, f * f)
