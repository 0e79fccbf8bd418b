"""Micro-benchmarks of the render/track/fuse internals on the real chip.

Decomposes the three expensive stages found by profile_stages.py into their
candidate bottleneck ops (scatter-min z-buffer, attribute gather, disk
resolve, GN-iteration gather+Gram, packing argsort) so kernel work targets
the op that actually dominates.
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
from densemonoslam_tpu.ops import reductions, warp

H, W = 480, 640
HW = H * W
N_WIN = 1 << 19  # active window rows in the render


def timeit(fn, *args, iters=50, warmup=5):
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
    out = {}

    # ---- render internals -------------------------------------------------
    key = jnp.asarray(rng.integers(0, 2**30, N_WIN), jnp.int32)
    tid = jnp.asarray(rng.integers(0, HW, N_WIN), jnp.int32)

    @jax.jit
    def scatter_min(key, tid):
        return jnp.full((HW + 1,), jnp.iinfo(jnp.int32).max, jnp.int32).at[
            tid
        ].min(key)

    out["render/scatter_min_512k"] = timeit(scatter_min, key, tid)

    rows = jnp.asarray(rng.normal(size=(N_WIN, 16)), jnp.float32)

    @jax.jit
    def row_transform(rows):
        # the per-surfel projection work before the scatter
        T = jnp.eye(4, dtype=jnp.float32)
        p = rows[:, 0:3] @ T[:3, :3].T + T[:3, 3]
        z = jnp.maximum(p[:, 2], 1e-6)
        u = p[:, 0] / z * 500.0 + 320.0
        v = p[:, 1] / z * 500.0 + 240.0
        return u, v, z

    out["render/project_512k"] = timeit(row_transform, rows)

    win = jnp.asarray(rng.integers(0, N_WIN, HW), jnp.int32)

    @jax.jit
    def attr_gather(rows, win):
        return rows[win]

    out["render/row_gather_307k_of_512k"] = timeit(attr_gather, rows, win)

    cand = jnp.asarray(rng.normal(size=(H, W, 16)), jnp.float32)

    @jax.jit
    def disk_resolve(cand):
        x_pix, y_pix = warp.pixel_grid(H, W)
        best_z = jnp.full((H, W), 1e9, jnp.float32)
        best = jnp.zeros((H, W, 16), jnp.float32)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                c = warp.shift(cand, dy, dx)
                du = c[..., 0] - x_pix
                dv = c[..., 1] - y_pix
                covers = (du * du + dv * dv) <= c[..., 9] * c[..., 9]
                better = (c[..., 2] > 0.05) & covers & (c[..., 2] < best_z)
                best_z = jnp.where(better, c[..., 2], best_z)
                best = jnp.where(better[..., None], c, best)
        return best_z, best

    out["render/disk_resolve_3x3"] = timeit(disk_resolve, cand)

    # ---- track internals --------------------------------------------------
    intr = CameraIntrinsics(528.0, 528.0, W / 2 - 0.5, H / 2 - 0.5)
    pack = jnp.asarray(rng.normal(size=(H, W, 12)), jnp.float32)
    P = HW // 4  # stride-2 rows at level 0
    u = jnp.asarray(rng.uniform(0, W - 2, P), jnp.float32)
    v = jnp.asarray(rng.uniform(0, H - 2, P), jnp.float32)

    @jax.jit
    def sample_near(pack, u, v):
        return reductions.sample_model(pack, u, v, bilinear=False)

    @jax.jit
    def sample_bilin(pack, u, v):
        return reductions.sample_model(pack, u, v, bilinear=True)

    out["track/sample_nearest_77k"] = timeit(sample_near, pack, u, v)
    out["track/sample_bilinear_77k"] = timeit(sample_bilin, pack, u, v)

    M = jnp.asarray(rng.normal(size=(P, 16)), jnp.float32)

    @jax.jit
    def gram16(M):
        return reductions.gram(M)

    out["track/gram_77k_x16"] = timeit(gram16, M)

    vmap_c = jnp.asarray(rng.normal(size=(H // 2, W // 2, 3)), jnp.float32)
    nmap_c = jnp.asarray(rng.normal(size=(H // 2, W // 2, 3)), jnp.float32)
    int_c = jnp.asarray(rng.normal(size=(H // 2, W // 2)), jnp.float32)
    A = jnp.eye(4, dtype=jnp.float32)

    @jax.jit
    def one_gn_iter(vmap_c, nmap_c, int_c, pack, A):
        M_icp, M_rgb = reductions.joint_rows_packed(
            vmap_c, nmap_c, int_c, pack, A, intr, bilinear=False
        )
        return reductions.combined_system(M_icp, M_rgb, icp_weight=10.0)

    out["track/one_gn_iter_L0s2"] = timeit(
        one_gn_iter, vmap_c, nmap_c, int_c, pack, A
    )

    # ---- fuse internals ---------------------------------------------------
    is_new = jnp.asarray(rng.uniform(size=HW) < 0.05)

    @jax.jit
    def pack_sort(is_new, rows_hw):
        order = jnp.argsort(~is_new, stable=True)
        return rows_hw[order]

    rows_hw = jnp.asarray(rng.normal(size=(HW, 16)), jnp.float32)
    out["fuse/argsort_pack_307k"] = timeit(pack_sort, is_new, rows_hw)

    @jax.jit
    def cumsum_pack(is_new, rows_hw):
        # scatter-based compaction: destination = prefix-sum rank
        dest = jnp.cumsum(is_new.astype(jnp.int32)) - 1
        dest = jnp.where(is_new, dest, HW)
        outp = jnp.zeros((HW + 1, 16), jnp.float32)
        return outp.at[dest].set(rows_hw)[:HW]

    out["fuse/cumsum_scatter_pack_307k"] = timeit(cumsum_pack, is_new, rows_hw)

    payload = jnp.asarray(rng.normal(size=(H, W, 12)), jnp.float32)
    win_f = jnp.asarray(rng.integers(-1, N_WIN, (H, W)), jnp.float32)

    @jax.jit
    def pull_accum(payload, win_f):
        acc = jnp.zeros((H, W, 12), jnp.float32)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                t = warp.shift(payload, dy, dx)
                hit = (t[..., 0] == win_f) & (win_f >= 0)
                acc = acc + jnp.where(hit[..., None], t, 0.0)
        return acc

    out["fuse/pull_accum_3x3"] = timeit(pull_accum, payload, win_f)

    big = jnp.zeros((1 << 20, 16), jnp.float32)
    blk = jnp.asarray(rng.normal(size=(N_WIN, 16)), jnp.float32)

    @jax.jit
    def dyn_update(big, blk):
        return jax.lax.dynamic_update_slice(big, blk, (jnp.int32(7), 0))

    out["fuse/dyn_update_512k_into_1M"] = timeit(dyn_update, big, blk)

    for k, v in out.items():
        print(f"{k:<34} {v:7.3f} ms")


if __name__ == "__main__":
    main()
