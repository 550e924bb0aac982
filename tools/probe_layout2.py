#!/usr/bin/env python
"""Amortized layout probe: probe_layout.py v1 found a ~28 ms floor on
EVERY op — the axon relay's per-dispatch+readback latency swamps single-op
timing. Here each candidate op is CHAINED k times inside one jit
(data-dependent, so XLA cannot hoist or CSE the passes) and the true
per-op time is (T(k_hi) - T(k_lo)) / (k_hi - k_lo), which cancels the
relay latency exactly. This establishes (a) the chip's achievable
elementwise-stream bandwidth and (b) AoS (batch-major) vs SoA
(batch-minor) for the venice hot-loop block algebra."""

import os
import sys
import time
from functools import partial

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

K_LO, K_HI = 2, 12


def timeit(fn, *args, n=5):
    out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
        jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    return (time.time() - t0) / n


def chain(body, k):
    """fori_loop over body(carry) - data-dependent chain of k applications."""

    def run(*args):
        return jax.lax.fori_loop(
            0, k, lambda i, c: body(c, i), args
        )

    return jax.jit(run)


def amortized(name, body, args, traffic_bytes):
    t_lo = timeit(chain(body, K_LO), *args)
    t_hi = timeit(chain(body, K_HI), *args)
    per = (t_hi - t_lo) / (K_HI - K_LO)
    print(
        f"{name:<46}{per*1e3:>9.2f} ms {traffic_bytes/max(per,1e-9)/1e9:>8.1f} GB/s",
        flush=True,
    )


P = 1_000_000
B = 5_000_000
key = jax.random.PRNGKey(0)

# -- 0. pure elementwise stream (read+write 480MB) ------------------------
big = jax.random.normal(key, (B * 24,), jnp.float32)


def stream_body(c, i):
    (y,) = c
    return (y * 1.0000001 + 1e-9,)


amortized("stream y=y*c+d 480MB (r+w)", stream_body, (big,), big.size * 4 * 2)

# -- 1. cinv apply AoS vs SoA --------------------------------------------
cinv = jax.random.normal(key, (P, 3, 3), jnp.float32)
w0 = jax.random.normal(key, (P, 3), jnp.float32)
traffic = (9 + 3 + 3) * P * 4


def cinv_aos(c, i):
    cv, w = c
    w2 = vpu_einsum("pef,pf->pe", cv, w)
    return (cv, w2 / (1.0 + jnp.max(jnp.abs(w2))))


amortized("cinv apply AoS (P,3,3)", cinv_aos, (cinv, w0), traffic)

cinv_t = jnp.transpose(cinv, (1, 2, 0))
w0_t = jnp.transpose(w0, (1, 0))


def cinv_soa(c, i):
    cv, w = c
    w2 = jnp.stack([
        sum(cv[e, f] * w[f] for f in range(3)) for e in range(3)
    ])
    return (cv, w2 / (1.0 + jnp.max(jnp.abs(w2))))


amortized("cinv apply SoA (3,3,P)", cinv_soa, (cinv_t, w0_t), traffic)

# -- 2. fused F^T(F v) pass AoS vs SoA ------------------------------------
jac = jax.random.normal(key, (B, 2, 12), jnp.float32)
v0 = jax.random.normal(key, (B, 12), jnp.float32)
traffic2 = (24 + 12 + 12) * B * 4


def jac_aos(c, i):
    j, v = c
    m = vpu_einsum("bmf,bf->bm", j, v)
    v2 = vpu_einsum("bmf,bm->bf", j, m)
    return (j, v2 / (1.0 + jnp.max(jnp.abs(v2))))


amortized("F^T(Fv) AoS (B,2,12) x2 pass", jac_aos, (jac, v0), 2 * traffic2)

jac_t = jnp.transpose(jac, (1, 2, 0))
v0_t = jnp.transpose(v0, (1, 0))


def jac_soa(c, i):
    j, v = c
    m = jnp.stack([sum(j[mm, f] * v[f] for f in range(12)) for mm in range(2)])
    v2 = jnp.stack([sum(j[mm, f] * m[mm] for mm in range(2)) for f in range(12)])
    return (j, v2 / (1.0 + jnp.max(jnp.abs(v2))))


amortized("F^T(Fv) SoA (2,12,B) x2 pass", jac_soa, (jac_t, v0_t), 2 * traffic2)

# -- 3. K-reduction (camera padding) --------------------------------------
nc, K = 1792, 2816
a3 = jax.random.normal(key, (12, K, nc), jnp.float32)


def kred_soa(c, i):
    (x,) = c
    r = x.sum(axis=1)  # (12, nc)
    return (x * (1.0 + 1e-9 * r[:, None, :]),)


amortized("K-reduce SoA (12,K,nc) r+w", kred_soa, (a3,), a3.size * 4 * 2)

a4 = jax.random.normal(key, (nc * K, 12), jnp.float32)


def kred_aos(c, i):
    (x,) = c
    r = x.reshape(nc, K, 12).sum(axis=1)  # (nc, 12)
    return (x * (1.0 + 1e-9 * jnp.repeat(r, K, axis=0)),)


amortized("K-reduce AoS (nc*K,12) r+w", kred_aos, (a4,), a4.size * 4 * 2)

# -- 4. small-table gather ------------------------------------------------
idx = jax.random.randint(key, (B,), 0, P - 2, jnp.int32)
tbl = jax.random.normal(key, (P, 3), jnp.float32)


def gath_aos(c, i):
    t, acc = c
    g = t[idx + (i % 2)]
    return (t, acc + g)


acc0 = jnp.zeros((B, 3), jnp.float32)
amortized("gather rows (P,3)[B]", gath_aos, (tbl, acc0), B * 3 * 4)

tbl_t = jnp.transpose(tbl, (1, 0))
acc0_t = jnp.zeros((3, B), jnp.float32)


def gath_soa(c, i):
    t, acc = c
    g = t[:, idx + (i % 2)]
    return (t, acc + g)


amortized("gather lanes (3,P)[:,B]", gath_soa, (tbl_t, acc0_t), B * 3 * 4)

# -- 5. MXU sanity: big matmul chained ------------------------------------
m1 = jax.random.normal(key, (4096, 4096), jnp.bfloat16)


def mm_body(c, i):
    (x,) = c
    y = x @ m1
    return (y / (1.0 + jnp.max(jnp.abs(y)).astype(jnp.bfloat16)),)


x0 = jax.random.normal(key, (4096, 4096), jnp.bfloat16)
t_lo = timeit(chain(mm_body, K_LO), x0)
t_hi = timeit(chain(mm_body, K_HI), x0)
per = (t_hi - t_lo) / (K_HI - K_LO)
tflops = 2 * 4096**3 / max(per, 1e-9) / 1e12
print(f"{'bf16 4096^3 matmul':<46}{per*1e3:>9.2f} ms {tflops:>8.1f} TFLOP/s",
      flush=True)
