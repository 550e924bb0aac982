#!/usr/bin/env python
"""Transport-mechanism probe (round 3): probe_layout2 showed streaming and
small-block einsums already run at the HBM roofline (550-650 GB/s) while
GATHERS run at 2.3 GB/s — and the venice PCG matvec is ~95% gathers (the
(B,9) camera-vector gather in the cams->pts pass + the (nc*K,3) wc gather
in the padded pass). This probe times every candidate replacement for
those gathers, amortized (relay-latency-free):

  1. gather bandwidth vs payload row width (8B .. 512B rows)
  2. gather bandwidth vs table size (small 64KB table vs 12MB table)
  3. sort-based permutation (sort_key_val) as a gather replacement
  4. segment_sum with sorted ids (point-side reduction without padding)
  5. scatter-add (.at[].add) baseline
  6. K-reduce layouts at the real venice camera-padded shape
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from _tunnel import ensure_tpu_alive

ensure_tpu_alive()

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

K_LO, K_HI = 2, 10


def timeit(fn, *args, n=5):
    out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
        jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    return (time.time() - t0) / n


def chain(body, k):
    def run(*args):
        return jax.lax.fori_loop(0, k, lambda i, c: body(c, i), args)

    return jax.jit(run)


def amortized(name, body, args, traffic_bytes):
    t_lo = timeit(chain(body, K_LO), *args)
    t_hi = timeit(chain(body, K_HI), *args)
    per = (t_hi - t_lo) / (K_HI - K_LO)
    print(
        f"{name:<52}{per*1e3:>9.2f} ms {traffic_bytes/max(per,1e-9)/1e9:>8.1f} GB/s",
        flush=True,
    )
    return per


key = jax.random.PRNGKey(0)
OUT_MB = 60  # keep gathered output ~60MB across widths

# -- 1. gather bandwidth vs payload width ---------------------------------
for width in (2, 8, 24, 128):
    n_rows = OUT_MB * 1_000_000 // (width * 4)
    tbl = jax.random.normal(key, (1_000_000, width), jnp.float32)
    idx = jax.random.randint(key, (n_rows,), 0, 999_998, jnp.int32)

    def g_body(c, i, tbl=tbl, idx=idx):
        t, acc = c
        return (t, acc + t[idx + (i % 2)])

    acc0 = jnp.zeros((n_rows, width), jnp.float32)
    amortized(f"gather width={width} f32 ({n_rows} rows)", g_body,
              (tbl, acc0), n_rows * width * 4)

# -- 2. small table (the wt_apply shape: (1778, 9)[cam_idx] for 5M rows) --
B = 5_000_000
tbl_s = jax.random.normal(key, (1778, 9), jnp.float32)
idx_s = jax.random.randint(key, (B,), 0, 1776, jnp.int32)


def g_small(c, i):
    t, acc = c
    return (t, acc + t[idx_s + (i % 2)])


amortized("gather small-table (1778,9)[5M]", g_small,
          (tbl_s, jnp.zeros((B, 9), jnp.float32)), B * 9 * 4)

# -- 3. sort-based permutation vs gather, 7.5M x 2 f32 --------------------
N = 7_500_000
perm = np.random.default_rng(0).permutation(N).astype(np.int32)
perm_d = jnp.asarray(perm)
vals = jax.random.normal(key, (N, 2), jnp.float32)


def permute_gather(c, i):
    v, acc = c
    out = v[perm_d]
    return (out, acc + 1.0)


amortized("permute 7.5Mx2 via gather", permute_gather,
          (vals, jnp.zeros((), jnp.float32)), N * 2 * 4)


def permute_sort(c, i):
    v, acc = c
    # route v to destination slots: sort (dest_idx, payload) by dest_idx
    _, v0, v1 = jax.lax.sort((perm_d, v[:, 0], v[:, 1]), num_keys=1)
    out = jnp.stack([v0, v1], axis=1)
    return (out, acc + 1.0)


amortized("permute 7.5Mx2 via sort_key_val", permute_sort,
          (vals, jnp.zeros((), jnp.float32)), N * 2 * 4)

# -- 4. point-side reduction: segment_sum sorted vs reshape ---------------
P = 1_000_000
obs = 5
datap = jax.random.normal(key, (P * obs, 3), jnp.float32)
seg_sorted = jnp.repeat(jnp.arange(P, dtype=jnp.int32), obs)


def seg_body(c, i):
    d, acc = c
    s = jax.ops.segment_sum(d, seg_sorted, num_segments=P,
                            indices_are_sorted=True)
    return (d * (1.0 + 1e-12 * s[0, 0]), acc)


amortized("segment_sum sorted (5M,3)->(1M,3)", seg_body,
          (datap, jnp.zeros((), jnp.float32)), P * obs * 3 * 4)


def resh_body(c, i):
    d, acc = c
    s = d.reshape(P, obs, 3).sum(axis=1)
    return (d * (1.0 + 1e-12 * s[0, 0]), acc)


amortized("reshape-sum (1M,5,3)->(1M,3)", resh_body,
          (datap, jnp.zeros((), jnp.float32)), P * obs * 3 * 4)

# -- 5. scatter-add baseline ----------------------------------------------
idx_sc = jax.random.randint(key, (B,), 0, P, jnp.int32)
src = jax.random.normal(key, (B, 3), jnp.float32)


def scat_body(c, i):
    s, acc = c
    out = jnp.zeros((P, 3), jnp.float32).at[idx_sc].add(s)
    return (s * (1.0 + 1e-12 * out[0, 0]), acc)


amortized("scatter-add (5M,3)->(1M,3) unsorted", scat_body,
          (src, jnp.zeros((), jnp.float32)), B * 3 * 4)

# -- 6. K-reduce at the real camera-padded shape, both layouts -------------
nc, K = 1778, 4219  # 1.5x pad waste at 5M rows
a_aos = jax.random.normal(key, (nc * K, 9), jnp.float32)


def kr_aos(c, i):
    x, acc = c
    r = x.reshape(nc, K, 9).sum(axis=1)
    return (x * (1.0 + 1e-12 * r[0, 0]), acc)


amortized("K-reduce AoS (nc*K,9)", kr_aos,
          (a_aos, jnp.zeros((), jnp.float32)), a_aos.size * 4)

a_soa = jax.random.normal(key, (9, K, nc), jnp.float32)


def kr_soa(c, i):
    x, acc = c
    r = x.sum(axis=1)
    return (x * (1.0 + 1e-12 * r[0, 0]), acc)


amortized("K-reduce SoA (9,K,nc)", kr_soa,
          (a_soa, jnp.zeros((), jnp.float32)), a_soa.size * 4)
