"""Bisect the splat render + GN tracking to find the milliseconds.

Micro-ops were all <0.1 ms yet the stages cost 4-7 ms: either control-flow
overhead (while_loop iterations) or a specific lowering in the composed
function dominates.  This script times progressively larger prefixes of
`splat.render` and measures raw `lax.while_loop` per-iteration overhead.
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
from densemonoslam_tpu.ops import splat, warp
from densemonoslam_tpu.utils import se3

H, W = 480, 640
HW = H * W
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


def make_render_prefix(upto: int, intr):
    """Rebuild splat.render as a prefix ending at checkpoint `upto`."""

    def fn(data, count, pose, time_v):
        N = data.shape[0] - 1
        start = splat.active_window_start(count, N, WIN)
        rows = jax.lax.dynamic_slice(data, (start, 0), (WIN, sm.COLS))
        n_rows = WIN
        idx = jnp.arange(n_rows)
        conf = rows[:, sm.CONF]
        seen = jnp.max(rows[:, sm.LAST_SEEN], axis=-1)
        Tinv = se3.se3_inverse(pose)
        p_c = se3.transform_points(Tinv, rows[:, sm.POS])
        z = p_c[:, 2]
        zsafe = jnp.maximum(z, 1e-6)
        u = p_c[:, 0] / zsafe * intr.fx + intr.cx
        v = p_c[:, 1] / zsafe * intr.fy + intr.cy
        alive = (conf > 0) & (idx < count - start)
        t_now = jnp.asarray(time_v, jnp.float32)
        alive = alive & (t_now - seen < 200)
        visible = alive & (z > 0.05) & (z < 100.0)
        ui = jnp.round(u).astype(jnp.int32)
        vi = jnp.round(v).astype(jnp.int32)
        inb = (ui >= 0) & (ui < W) & (vi >= 0) & (vi < H)
        ok = visible & inb
        tid = jnp.where(ok, vi * W + ui, HW)
        if upto == 0:
            return tid, z
        idx_bits = 19
        z_bits = 31 - idx_bits
        n_buckets = (1 << z_bits) - 1
        inv = 1.0 / jnp.maximum(z, 1e-3)
        inv_max = 1.0 / 0.05
        q = jnp.clip((inv * (n_buckets / inv_max)).astype(jnp.int32), 1, n_buckets)
        key = (n_buckets - q) * (1 << idx_bits) + idx
        i32_max = jnp.iinfo(jnp.int32).max
        kbuf = jnp.full((HW + 1,), i32_max, jnp.int32).at[tid].min(
            jnp.where(ok, key, i32_max)
        )
        win = kbuf[:HW] & ((1 << idx_bits) - 1)
        has_win = kbuf[:HW] < i32_max
        if upto == 1:
            return win, has_win
        win_safe = jnp.where(has_win, win, n_rows - 1)
        n_cam = se3.rotate_vectors(Tinv, rows[:, sm.NORMAL])
        r_px_all = jnp.clip(
            rows[:, sm.RADIUS] * intr.fx / jnp.maximum(z, 1e-6), 0.5, 3 * 0.75
        )
        tbl = jnp.concatenate(
            [
                u[:, None], v[:, None], z[:, None], p_c, n_cam,
                r_px_all[:, None],
                (start + idx).astype(jnp.float32)[:, None],
                rows[:, sm.COLOR],
                jnp.max(rows[:, sm.LAST_SEEN], axis=-1)[:, None],
                rows[:, sm.CONF][:, None],
            ],
            axis=-1,
        )
        if upto == 2:
            return tbl
        g = tbl[win_safe]
        if upto == 3:
            return g
        invalid_row = jnp.concatenate(
            [
                jnp.array([-1e9, -1e9], jnp.float32),
                jnp.array([1e9], jnp.float32),
                jnp.zeros((13,), jnp.float32),
            ]
        )
        cand = jnp.where(has_win[:, None], g, invalid_row).reshape(H, W, 16)
        x_pix, y_pix = warp.pixel_grid(H, W)
        best_z = jnp.full((H, W), 1e9, jnp.float32)
        best = jnp.zeros((H, W, 16), jnp.float32)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                c = warp.shift(cand, dy, dx)
                du = c[..., 0] - x_pix
                dv = c[..., 1] - y_pix
                r_px = c[..., 9]
                covers = (du * du + dv * dv) <= r_px * r_px
                valid = (c[..., 2] > 0.05) & (c[..., 2] < 100.0) & covers
                better = valid & (c[..., 2] < best_z)
                best_z = jnp.where(better, c[..., 2], best_z)
                best = jnp.where(better[..., None], c, best)
        if upto == 4:
            return best_z, best
        return best_z, best

    return jax.jit(fn)


def main():
    rng = np.random.default_rng(0)
    intr = CameraIntrinsics(528.0, 528.0, W / 2 - 0.5, H / 2 - 0.5)
    # realistic-ish map: points in front of the camera
    pts = rng.uniform([-2, -2, 0.5], [2, 2, 5.0], (CAP, 3)).astype(np.float32)
    data = np.zeros((CAP + 1, 16), np.float32)
    data[:-1, 0:3] = pts
    data[:-1, sm.CONF] = 11.0
    data[:-1, sm.RADIUS] = 0.01
    data[:-1, 6:9] = np.array([0, 0, -1], np.float32)
    data[:-1, 12] = 100.0  # last seen
    data = jnp.asarray(data)
    count = jnp.asarray(900000, jnp.int32)
    pose = jnp.eye(4, dtype=jnp.float32)
    tv = jnp.asarray(110.0, jnp.float32)

    names = ["0:project+mask", "1:+scatter_min", "2:+table", "3:+gather",
             "4:+disk_resolve"]
    for i, nm in enumerate(names):
        fn = make_render_prefix(i, intr)
        print(f"render prefix {nm:<18} {timeit(fn, data, count, pose, tv):7.3f} ms",
              flush=True)

    full = jax.jit(lambda d, c, p, t: splat.render(
        d, c, p, intr, W, H, t, time_delta=200, mode=splat.MODE_ACTIVE,
        window=WIN))
    print(f"render FULL               {timeit(full, data, count, pose, tv):7.3f} ms",
          flush=True)

    # ---- while_loop overhead ----
    x = jnp.asarray(rng.normal(size=(1200, 8)), jnp.float32)

    def make_loop(n_iter):
        def body(carry):
            i, v = carry
            G = jax.lax.dot_general(v, v, (((0,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            v = v + 1e-9 * jnp.sum(G)
            return i + 1, v

        def cond(carry):
            return carry[0] < n_iter

        @jax.jit
        def run(x):
            return jax.lax.while_loop(cond, body, (jnp.int32(0), x))

        return run

    t10 = timeit(make_loop(10), x)
    t40 = timeit(make_loop(40), x)
    print(f"while_loop 10 iters       {t10:7.3f} ms")
    print(f"while_loop 40 iters       {t40:7.3f} ms")
    print(f"=> per-iteration overhead {(t40 - t10) / 30:7.4f} ms")


if __name__ == "__main__":
    main()
