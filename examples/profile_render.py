"""Bisect splat.render internals on device (dev tool)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from densemonoslam_tpu.config import (
    CameraConfig, CameraIntrinsics, EngineConfig, FrameResolution,
)
from densemonoslam_tpu.engine import Engine
from densemonoslam_tpu.io.synthetic import SyntheticSequence
from densemonoslam_tpu.mapping import surfel_map as sm
from densemonoslam_tpu.ops import warp
from densemonoslam_tpu.utils import se3

W, H = 640, 480
HW = H * W
camera = CameraConfig(
    FrameResolution(W, H), CameraIntrinsics(528.0, 528.0, W / 2 - 0.5, H / 2 - 0.5), "p",
)
cfg = EngineConfig(
    max_surfels=1 << 20, depth_cutoff=8.0, depth_factor=1.0,
    nid_keyframing=True, pyramid_levels=4, track_row_stride=2, open_loop=True,
)
intr = camera.intrinsics
REPS = 10

seq = SyntheticSequence(camera=camera, num_frames=12, radius=0.12, max_angle=0.12)
eng = Engine(camera, cfg)
eng.frontend("cam0")
for i in range(10):
    r, d = seq.frame(i)
    eng.process_frame("cam0", r, d, float(i), sync=False)
state = eng.frontends["cam0"].state
jax.block_until_ready(state.map_count)
data, count, pose = state.map_data, state.map_count, state.pose
N = data.shape[0] - 1
t_now = jnp.asarray(state.tick, jnp.float32)
time_delta = cfg.time_delta
splat_k = 3
depth_max = 100.0
_BIG = jnp.int32(2**30)
_FAR = jnp.float32(1e9)


def timeit(name, op):
    def body(c, _):
        out = op(c)
        leaf = jax.tree_util.tree_leaves(out)[0]
        return jnp.sum(leaf.astype(jnp.float32).ravel()[:8]) * 1e-30, None

    f = jax.jit(lambda: jax.lax.scan(body, jnp.float32(0), None, length=REPS)[0])
    r = f(); jax.block_until_ready(r)
    t0 = time.perf_counter()
    r = f(); jax.block_until_ready(r)
    print(f"{name:34s} {(time.perf_counter() - t0) / REPS * 1000:8.2f} ms")


def phase0(c):
    rows = data[:-1] + c
    idx = jnp.arange(N)
    conf = rows[:, sm.CONF]
    seen = jnp.max(rows[:, sm.LAST_SEEN], axis=-1)
    Tinv = se3.se3_inverse(pose)
    p_c = se3.transform_points(Tinv, rows[:, sm.POS])
    z = p_c[:, 2]
    zs = jnp.maximum(z, 1e-6)
    u = p_c[:, 0] / zs * intr.fx + intr.cx
    v = p_c[:, 1] / zs * intr.fy + intr.cy
    alive = (conf > 0) & (idx < count) & (t_now - seen < time_delta)
    visible = alive & (z > 0.05) & (z < depth_max)
    ui = jnp.round(u).astype(jnp.int32)
    vi = jnp.round(v).astype(jnp.int32)
    inb = (ui >= 0) & (ui < W) & (vi >= 0) & (vi < H)
    ok = visible & inb
    tid = jnp.where(ok, vi * W + ui, HW)
    return tid, z, ok, u, v, p_c


tid, z, ok, u, v, p_c = jax.jit(phase0)(0.0)
jax.block_until_ready(tid)
timeit("phase0 transform+project [N]", phase0)

def phase1(c):
    zb = jnp.full((HW + 1,), _FAR, jnp.float32).at[tid].min(jnp.where(ok, z + c, _FAR))
    return zb

zbuf = jax.jit(phase1)(0.0); jax.block_until_ready(zbuf)
timeit("phase1 scatter-min z", phase1)

def phase2(c):
    is_win = ok & (z + c <= zbuf[tid])
    ib = jnp.full((HW + 1,), _BIG, jnp.int32).at[tid].min(
        jnp.where(is_win, jnp.arange(N), _BIG))
    return ib

ibuf = jax.jit(phase2)(0.0); jax.block_until_ready(ibuf)
timeit("phase2 is_win + scatter-min idx", phase2)

win = ibuf[:HW]
has_win = win < _BIG
win_safe = jnp.where(has_win, win, N)

def phase3(c):
    w_rows = data[win_safe] + c
    w_u = jnp.where(has_win, u[win_safe], -1e9)
    w_v = jnp.where(has_win, v[win_safe], -1e9)
    w_z = jnp.where(has_win, z[win_safe], _FAR)
    w_p = p_c[win_safe]
    Tinv = se3.se3_inverse(pose)
    w_n = se3.rotate_vectors(Tinv, w_rows[:, sm.NORMAL])
    cand = jnp.concatenate(
        [
            w_u[:, None], w_v[:, None], w_z[:, None], w_p, w_n,
            jnp.clip(w_rows[:, sm.RADIUS] * intr.fx / jnp.maximum(w_z, 1e-6), 0.5, 2.25)[:, None],
            jnp.where(has_win, win, -1)[:, None].astype(jnp.float32),
            w_rows[:, sm.COLOR],
            jnp.max(w_rows[:, sm.LAST_SEEN], axis=-1)[:, None],
            w_rows[:, sm.CONF][:, None],
        ],
        axis=-1,
    ).reshape(H, W, 16)
    return cand

cand = jax.jit(phase3)(0.0); jax.block_until_ready(cand)
timeit("phase3 winner gathers+cand", phase3)

def phase4(c):
    x_pix, y_pix = warp.pixel_grid(H, W)
    best_z = jnp.full((H, W), _FAR, jnp.float32)
    best = jnp.zeros((H, W, 16), jnp.float32)
    cd = cand + c
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            cc = warp.shift(cd, dy, dx)
            du = cc[..., 0] - x_pix
            dv = cc[..., 1] - y_pix
            r_px = cc[..., 9]
            covers = (du * du + dv * dv) <= r_px * r_px
            valid = (cc[..., 2] > 0.05) & (cc[..., 2] < depth_max) & covers
            better = valid & (cc[..., 2] < best_z)
            best_z = jnp.where(better, cc[..., 2], best_z)
            best = jnp.where(better[..., None], cc, best)
    return best_z, best

timeit("phase4 dense 3x3 resolve", phase4)
