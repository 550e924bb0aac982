#!/usr/bin/env python
"""Layout micro-probe: AoS (batch-major, tiny minor dims) vs SoA
(batch-minor lanes) for the venice hot-loop block algebra, on the real
chip. Establishes the achieved HBM GB/s of each form (VERDICT r2 next #1/2:
per-component bandwidth accounting for the PCG matvec)."""

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

from skeres_tpu.ops.small_einsum import vpu_einsum


def timeit(fn, *args, n=20):
    out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
        jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    return (time.time() - t0) / n


def report(name, t, traffic_bytes):
    print(f"{name:<44}{t*1e3:>9.2f} ms {traffic_bytes/t/1e9:>8.1f} GB/s", flush=True)


P = 1_000_000
B = 5_000_000

key = jax.random.PRNGKey(0)

# -- 1. cinv apply: (P,3,3) x (P,3) -> (P,3) ------------------------------
cinv = jax.random.normal(key, (P, 3, 3), jnp.float32)
w = jax.random.normal(key, (P, 3), jnp.float32)
traffic = (9 + 3 + 3) * P * 4

f_aos = jax.jit(lambda c, x: vpu_einsum("pef,pf->pe", c, x))
report("cinv AoS vpu_einsum (P,3,3)", timeit(f_aos, cinv, w), traffic)

cinv_t = jnp.transpose(cinv, (1, 2, 0))  # (3,3,P)
w_t = jnp.transpose(w, (1, 0))  # (3,P)


def soa_cinv(c, x):
    return jnp.stack([
        sum(c[e, f] * x[f] for f in range(3)) for e in range(3)
    ])


f_soa = jax.jit(soa_cinv)
report("cinv SoA unrolled (3,3,P)", timeit(f_soa, cinv_t, w_t), traffic)

# -- 2. jac pass: (B,2,12) x (B,12) -> (B,2) ------------------------------
jac = jax.random.normal(key, (B, 2, 12), jnp.float32)
v = jax.random.normal(key, (B, 12), jnp.float32)
traffic2 = (24 + 12 + 2) * B * 4

g_aos = jax.jit(lambda j, x: vpu_einsum("bmf,bf->bm", j, x))
report("jac AoS vpu_einsum (B,2,12)", timeit(g_aos, jac, v), traffic2)

jac_t = jnp.transpose(jac, (1, 2, 0))  # (2,12,B)
v_t = jnp.transpose(v, (1, 0))  # (12,B)


def soa_jac(j, x):
    return jnp.stack([
        sum(j[m, f] * x[f] for f in range(12)) for m in range(2)
    ])


g_soa = jax.jit(soa_jac)
report("jac SoA unrolled (2,12,B)", timeit(g_soa, jac_t, v_t), traffic2)

# -- 3. fused matvec shape: two passes over jac + K-reduction -------------
# camera-padded reduction analog: (T, K, nc) sum over K
nc, K = 1792, 2816  # ~venice (padded)
a3 = jax.random.normal(key, (12, K, nc), jnp.float32)
h = jax.jit(lambda x: x.sum(axis=1))
report("K-reduce (12,K,nc)->(12,nc)", timeit(h, a3), a3.size * 4)

a4 = jax.random.normal(key, (nc * K, 12), jnp.float32)
h2 = jax.jit(lambda x: x.reshape(nc, K, 12).sum(axis=1))
report("K-reduce AoS (nc*K,12)->(nc,12)", timeit(h2, a4), a4.size * 4)

# -- 4. small-table gather in both layouts --------------------------------
idx = jax.random.randint(key, (B,), 0, P, jnp.int32)
tbl = jax.random.normal(key, (P, 3), jnp.float32)
g1 = jax.jit(lambda t, i: t[i])
report("gather rows (P,3)[B]", timeit(g1, tbl, idx), B * 3 * 4)

tbl_t = jnp.transpose(tbl, (1, 0))
g2 = jax.jit(lambda t, i: t[:, i])
report("gather lanes (3,P)[:,B]", timeit(g2, tbl_t, idx), B * 3 * 4)

# -- 5. pure stream baseline ----------------------------------------------
big = jax.random.normal(key, (B * 24,), jnp.float32)
s = jax.jit(lambda x: x.sum())
report("stream sum 480MB", timeit(s, big), big.size * 4)
