"""Round 2 of bisection: exact render replica vs real render; loop primitives.

Determines (a) whether the real `splat.render`'s 6 ms is in its tail ops or
in how it is invoked, and (b) the fixed per-call cost of while_loop vs
fori_loop vs unrolled iteration — which decides how the GN tracking loops
should be expressed on this platform.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from densemonoslam_tpu.config import CameraIntrinsics
from densemonoslam_tpu.mapping import surfel_map as sm
from densemonoslam_tpu.ops import splat

H, W = 480, 640
WIN = 1 << 19
CAP = 1 << 20


def timeit(fn, *args, iters=40, warmup=4):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1000.0


def main():
    rng = np.random.default_rng(0)
    intr = CameraIntrinsics(528.0, 528.0, W / 2 - 0.5, H / 2 - 0.5)
    pts = rng.uniform([-2, -2, 0.5], [2, 2, 5.0], (CAP, 3)).astype(np.float32)
    data = np.zeros((CAP + 1, 16), np.float32)
    data[:-1, 0:3] = pts
    data[:-1, sm.CONF] = 11.0
    data[:-1, sm.RADIUS] = 0.01
    data[:-1, 6:9] = np.array([0, 0, -1], np.float32)
    data[:-1, 12] = 100.0
    data = jnp.asarray(data)
    count = jnp.asarray(900000, jnp.int32)
    pose = jnp.eye(4, dtype=jnp.float32)
    tv = jnp.asarray(110.0, jnp.float32)

    # 1) real render, called directly (its own jit)
    def direct(d, c, p, t):
        return splat.render(d, c, p, intr, W, H, t, time_delta=200,
                            mode=splat.MODE_ACTIVE, window=WIN)

    print(f"render direct-call        {timeit(direct, data, count, pose, tv):7.3f} ms",
          flush=True)

    # 2) real render, returning ONLY depth (DCE probe: if cheap, the cost is
    # in materialising the full Prediction, not the compute)
    @jax.jit
    def depth_only(d, c, p, t):
        return splat.render(d, c, p, intr, W, H, t, time_delta=200,
                            mode=splat.MODE_ACTIVE, window=WIN).depth

    print(f"render depth-only         {timeit(depth_only, data, count, pose, tv):7.3f} ms",
          flush=True)

    # 3) index-only (kills the attribute table + resolve except index)
    @jax.jit
    def cell_only(d, c, p, t):
        return splat.render(d, c, p, intr, W, H, t, time_delta=200,
                            mode=splat.MODE_ACTIVE, window=WIN).cell

    print(f"render cell-only          {timeit(cell_only, data, count, pose, tv):7.3f} ms",
          flush=True)

    # ---- loop primitives ----
    x = jnp.asarray(rng.normal(size=(1200, 8)), jnp.float32)

    def body_op(v):
        G = jax.lax.dot_general(v, v, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return v + 1e-9 * jnp.sum(G)

    @jax.jit
    def no_loop(x):
        return body_op(x)

    @jax.jit
    def unrolled10(x):
        for _ in range(10):
            x = body_op(x)
        return x

    @jax.jit
    def fori10(x):
        return jax.lax.fori_loop(0, 10, lambda i, v: body_op(v), x)

    @jax.jit
    def while10(x):
        def cond(c):
            return c[0] < 10

        def body(c):
            return c[0] + 1, body_op(c[1])

        return jax.lax.while_loop(cond, body, (jnp.int32(0), x))

    @jax.jit
    def while_dyn10(x):
        # data-dependent early exit (what the GN loop does)
        def cond(c):
            i, v, done = c
            return (i < 10) & ~done

        def body(c):
            i, v, _ = c
            v = body_op(v)
            return i + 1, v, jnp.sum(v) > 1e30

        return jax.lax.while_loop(cond, body, (jnp.int32(0), x, jnp.asarray(False)))

    print(f"loop none                 {timeit(no_loop, x):7.3f} ms")
    print(f"loop unrolled x10         {timeit(unrolled10, x):7.3f} ms")
    print(f"loop fori x10             {timeit(fori10, x):7.3f} ms")
    print(f"loop while x10            {timeit(while10, x):7.3f} ms")
    print(f"loop while dyn-exit x10   {timeit(while_dyn10, x):7.3f} ms")

    # two while loops in one jit: is the fixed cost per loop?
    @jax.jit
    def two_while(x):
        def mk(n):
            def cond(c):
                return c[0] < n

            def body(c):
                return c[0] + 1, body_op(c[1])

            return cond, body

        c1, b1 = mk(5)
        _, x = jax.lax.while_loop(c1, b1, (jnp.int32(0), x))
        c2, b2 = mk(5)
        _, x = jax.lax.while_loop(c2, b2, (jnp.int32(0), x))
        return x

    print(f"loop 2x while x5          {timeit(two_while, x):7.3f} ms")


if __name__ == "__main__":
    main()
