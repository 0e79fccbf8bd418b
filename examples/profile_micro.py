"""Micro-profile of splat/fuse primitive costs on the active platform (dev tool).

Each op is measured inside a lax.scan chain (output feeds next iteration's
dependency) so async dispatch / remote-tunnel latency cannot hide device time.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

H, W = 480, 640
HW = H * W
REPS = 30


def timeit(name, op, *args):
    """op(carry_scalar, *args) -> array; scanned REPS times with a data dep."""

    def body(c, _):
        out = op(c, *args)
        return jnp.sum(out[..., -1]) * 1e-30, None

    f = jax.jit(lambda a: jax.lax.scan(body, jnp.float32(0), None, length=REPS)[0])
    r = f(jnp.float32(0))
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    r = f(jnp.float32(0))
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / REPS * 1000
    print(f"{name:46s} {dt:8.3f} ms")


key = jax.random.PRNGKey(0)
for N in (1 << 18, 1 << 20):
    print(f"--- N = {N}")
    z = jax.random.uniform(key, (N,), jnp.float32, 0.1, 8.0)
    tid = jax.random.randint(key, (N,), 0, HW + 1)
    idx = jnp.arange(N)
    data = jax.random.normal(key, (N + 1, 16), jnp.float32)
    payload = jax.random.normal(key, (HW, 16), jnp.float32)
    qN = jax.random.randint(key, (N,), 0, HW)
    qHW = jax.random.randint(key, (HW,), 0, N)

    timeit("scatter-min z [N->HW]", lambda c, tid, z: jnp.full((HW + 1,), 1e9, jnp.float32).at[tid].min(z + c)[:, None], tid, z)
    timeit("2x scatter-min [N->HW]", lambda c, tid, z, idx: (jnp.full((HW + 1,), 1e9, jnp.float32).at[tid].min(z + c) + jnp.full((HW + 1,), 2**30, jnp.int32).at[tid].min(idx).astype(jnp.float32))[:, None], tid, z, idx)
    timeit("row gather [HW<-N,16]", lambda c, data, q: data[q] + c, data, qHW)
    timeit("row gather x9 [N<-HW,16]", lambda c, payload, q: sum(payload[jnp.clip(q + i, 0, HW - 1)] for i in range(9)) + c, payload, qN)
    timeit("row gather x1 [N<-HW,16]", lambda c, payload, q: payload[q] + c, payload, qN)
    timeit("scatter-add rows [HW->N,16]", lambda c, payload, q: jnp.zeros((N + 1, 16), jnp.float32).at[q].add(payload + c), payload, qHW)
    timeit("transform [N,3] slice-of-16", lambda c, data: (data[:-1, 0:3] @ jnp.eye(3) + c), data)
    timeit("elementwise [N,16]", lambda c, data: data * (2.0 + c), data)

print("--- dense / image")
img16 = jax.random.normal(key, (H, W, 16), jnp.float32)
def stencil9(c, img):
    out = jnp.zeros_like(img)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            out = out + jnp.roll(img, (dy, dx), (0, 1))
    return out + c
timeit("9-tap stencil [H,W,16]", stencil9, img16)
timeit("argsort bool [HW]", lambda c, v: jnp.argsort((v + c) > 4.0, stable=True)[:, None].astype(jnp.float32), jax.random.uniform(key, (HW,), jnp.float32, 0, 8))
