#!/usr/bin/env python
"""Second transport probe: the rows probe_transport.py could not finish
inside a tunnel window — scatter-add rate, K-reduce layouts at the real
camera-padded shape, the dense 16k GEMV (the explicit-S PCG matvec), and
the 16k Cholesky factor (the explicit-S DENSE_SCHUR solve)."""

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

K_LO, K_HI = 2, 8


def timeit(fn, *args, n=4):
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
        f"{name:<46}{per*1e3:>9.2f} ms {traffic_bytes/max(per,1e-9)/1e9:>8.1f} GB/s",
        flush=True,
    )
    return per


key = jax.random.PRNGKey(0)

# -- scatter-add baseline (2M rows to keep it quick) -----------------------
B, P = 2_000_000, 500_000
idx_sc = jax.random.randint(key, (B,), 0, P, jnp.int32)
src = jax.random.normal(key, (B, 3), jnp.float32)


def scat_body(c, i):
    s, acc = c
    out = jnp.zeros((P, 3), jnp.float32).at[idx_sc + (i % 2)].add(s)
    return (s, acc + out[0, 0])


amortized("scatter-add (2M,3)->(500k,3)", scat_body,
          (src, jnp.zeros((), jnp.float32)), B * 3 * 4)

# -- K-reduce at the real camera-padded shape ------------------------------
nc, K = 1778, 2816
a_aos = jax.random.normal(key, (nc * K, 9), jnp.float32)


def kr_aos(c, i):
    x, acc = c
    r = x.reshape(nc, K, 9).sum(axis=1)
    return (x, acc + r[0, 0])


amortized("K-reduce AoS (nc*K,9) read", kr_aos,
          (a_aos, jnp.zeros((), jnp.float32)), a_aos.size * 4)

a_km = jax.random.normal(key, (K, nc * 9), jnp.float32)


def kr_slotmajor(c, i):
    x, acc = c
    r = x.sum(axis=0)
    return (x, acc + r[0])


amortized("K-reduce slot-major (K,nc*9) read", kr_slotmajor,
          (a_km, jnp.zeros((), jnp.float32)), a_km.size * 4)

# -- dense 16k GEMV (the explicit-S PCG matvec) ----------------------------
n = 16002
s_mat = jax.random.normal(key, (n, n), jnp.float32) * 0.01
v0 = jax.random.normal(key, (n,), jnp.float32)


def gemv_body(c, i):
    v, acc = c
    w = s_mat @ v
    return (w / (1.0 + jnp.max(jnp.abs(w))), acc)


amortized("dense GEMV 16k (explicit-S matvec)", gemv_body,
          (v0, jnp.zeros((), jnp.float32)), n * n * 4)

# -- 16k Cholesky factor (single-shot; ~100ms expected) --------------------
spd = s_mat @ s_mat.T + n * jnp.eye(n, dtype=jnp.float32)
from skeres_tpu.ops.pallas.cholesky import blocked_cholesky_factor

t = timeit(jax.jit(lambda a: blocked_cholesky_factor(a).l), spd, n=2)
print(f"{'blocked Cholesky 16k factor':<46}{t*1e3:>9.2f} ms", flush=True)
t2 = timeit(jax.jit(jnp.linalg.cholesky), spd, n=2)
print(f"{'XLA Cholesky 16k factor':<46}{t2*1e3:>9.2f} ms", flush=True)
