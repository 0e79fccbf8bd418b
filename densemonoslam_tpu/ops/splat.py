"""Surfel splat rasterisation via scatter-min z-buffering.

TPU-native replacement for the reference's `IndexMap` render passes
(`Core/src/IndexMap.cpp`: `predictIndices` renders surfel IDs + attributes for
data association; `combinedPredict` splat-renders predicted image/vertex/
normal/time maps in ACTIVE/INACTIVE time-window modes; splat geometry in
`Shaders/splat.vert` / `combo_splat.frag`).

Without a rasterisation pipeline, z-buffering is emulated in three scatter
phases, all deterministic:
1. scatter-min of depth per target pixel (the z-test);
2. scatter-min of surfel index among surfels whose depth equals the pixel's
   winning depth (deterministic tie-break);
3. gather of the winning surfel's attributes into the output maps.

Disk splatting (a surfel covers several pixels) is a static KxK offset loop
around the projected centre, gated by the perspective screen-space radius —
each offset adds one scatter, keeping peak memory at O(N), not O(N*K^2).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from densemonoslam_tpu.config import CameraIntrinsics
from densemonoslam_tpu.mapping import surfel_map as sm
from densemonoslam_tpu.utils import se3

MODE_ACTIVE = 0  # surfels seen within the time window (tracking/fusion view)
MODE_INACTIVE = 1  # surfels older than the window (loop-closure view)
MODE_ALL = 2

_BIG_INDEX = jnp.int32(2**30)
_FAR = jnp.float32(1e9)


class Prediction(NamedTuple):
    """Predicted view of the map from a pose (camera-frame maps).  Equivalent
    of the reference's `IndexMap` texture set."""

    index: jnp.ndarray  # [H,W] i32 surfel id, -1 where empty
    vmap: jnp.ndarray  # [H,W,3] camera-frame vertices (z=0 invalid)
    nmap: jnp.ndarray  # [H,W,3] camera-frame normals
    color: jnp.ndarray  # [H,W,3] 0..255
    intensity: jnp.ndarray  # [H,W] luminance
    depth: jnp.ndarray  # [H,W] z (0 invalid)
    time: jnp.ndarray  # [H,W] last-seen tick of the winning surfel
    conf: jnp.ndarray  # [H,W] confidence of the winning surfel


@functools.partial(
    jax.jit,
    static_argnames=("intr", "width", "height", "splat_k", "mode"),
)
def render(
    data: jnp.ndarray,  # [N+1, 16] surfel rows (sm layout)
    count: jnp.ndarray,  # [] i32
    pose: jnp.ndarray,  # [4,4] camera-to-world of the view to render
    intr: CameraIntrinsics,
    width: int,
    height: int,
    time: jnp.ndarray | int,
    time_delta: int = 200,
    conf_threshold: float = 0.0,
    mode: int = MODE_ALL,
    splat_k: int = 3,
    depth_max: float = 100.0,
) -> Prediction:
    """Render the surfel map from `pose`.

    Time-window gating follows the reference (`splat.vert:60-66`,
    `IndexMap.cpp` ACTIVE/INACTIVE): ACTIVE keeps surfels whose last-seen tick
    is within `time_delta` of `time`; INACTIVE keeps the complement.
    `conf_threshold` > 0 restricts to stable surfels (`combinedPredict` with
    confidence gate)."""
    N = data.shape[0] - 1
    HW = height * width
    rows = data[:-1]
    idx = jnp.arange(N)
    pos_w = rows[:, sm.POS]
    conf = rows[:, sm.CONF]
    seen = jnp.max(rows[:, sm.LAST_SEEN], axis=-1)

    Tinv = se3.se3_inverse(pose)
    p_c = se3.transform_points(Tinv, pos_w)
    n_c = se3.rotate_vectors(Tinv, rows[:, sm.NORMAL])
    z = p_c[:, 2]
    zsafe = jnp.maximum(z, 1e-6)
    u = p_c[:, 0] / zsafe * intr.fx + intr.cx
    v = p_c[:, 1] / zsafe * intr.fy + intr.cy

    alive = (conf > 0) & (idx < count)
    if conf_threshold > 0:
        alive = alive & (conf >= conf_threshold)
    t_now = jnp.asarray(time, jnp.float32)
    if mode == MODE_ACTIVE:
        alive = alive & (t_now - seen < time_delta)
    elif mode == MODE_INACTIVE:
        alive = alive & (t_now - seen >= time_delta)
    visible = alive & (z > 0.05) & (z < depth_max)

    ui = jnp.round(u).astype(jnp.int32)
    vi = jnp.round(v).astype(jnp.int32)
    # screen-space splat radius in pixels, clamped to the static stencil
    r_px = jnp.clip(rows[:, sm.RADIUS] * intr.fx / zsafe, 0.0, splat_k * 0.5)

    half = splat_k // 2
    offsets = [(dy, dx) for dy in range(-half, half + 1) for dx in range(-half, half + 1)]

    def target_ids(dy: int, dx: int):
        uu, vv = ui + dx, vi + dy
        inb = (uu >= 0) & (uu < width) & (vv >= 0) & (vv < height)
        in_disk = (dx * dx + dy * dy) <= jnp.maximum(r_px * r_px, 0.26)  # centre always
        ok = visible & inb & in_disk
        return jnp.where(ok, vv * width + uu, HW), ok

    # phase 1: z-buffer
    zbuf = jnp.full((HW + 1,), _FAR, jnp.float32)
    for dy, dx in offsets:
        tid, ok = target_ids(dy, dx)
        zbuf = zbuf.at[tid].min(jnp.where(ok, z, _FAR))
    # phase 2: winning surfel index among depth-equal candidates
    ibuf = jnp.full((HW + 1,), _BIG_INDEX, jnp.int32)
    for dy, dx in offsets:
        tid, ok = target_ids(dy, dx)
        is_win = ok & (z <= zbuf[tid])
        ibuf = ibuf.at[tid].min(jnp.where(is_win, idx, _BIG_INDEX))

    win = ibuf[:HW]
    valid_px = win < _BIG_INDEX
    win_safe = jnp.where(valid_px, win, 0)

    # phase 3: gather attributes of winners.  Depth is refined by intersecting
    # the pixel's central ray with the winning surfel's tangent plane — the
    # ray-disk intersection of the reference `combo_splat.frag:18-80`; without
    # it the half-pixel splat quantisation biases ICP by several millimetres.
    p_win = p_c[win_safe]
    n_win = n_c[win_safe]
    upix = jax.lax.broadcasted_iota(jnp.float32, (height, width), 1).reshape(HW)
    vpix = jax.lax.broadcasted_iota(jnp.float32, (height, width), 0).reshape(HW)
    ray = jnp.stack(
        [(upix - intr.cx) / intr.fx, (vpix - intr.cy) / intr.fy, jnp.ones_like(upix)],
        axis=-1,
    )
    denom = jnp.sum(ray * n_win, axis=-1)
    z_plane = jnp.sum(p_win * n_win, axis=-1) / jnp.where(
        jnp.abs(denom) > 0.05, denom, jnp.inf
    )
    z_c = p_win[:, 2]
    r_win = rows[win_safe][:, sm.RADIUS]
    z_ref = jnp.where(
        jnp.abs(z_plane - z_c) < 2.0 * r_win + 1e-3, z_plane, z_c
    )
    p_ref = ray * z_ref[:, None]

    vmap = jnp.where(valid_px[:, None], p_ref, 0.0).reshape(height, width, 3)
    nmap = jnp.where(valid_px[:, None], n_win, 0.0).reshape(height, width, 3)
    color = jnp.where(
        valid_px[:, None], rows[win_safe][:, sm.COLOR], 0.0
    ).reshape(height, width, 3)
    depth = jnp.where(valid_px, z_ref, 0.0).reshape(height, width)
    tmap = jnp.where(valid_px, seen[win_safe], -1.0).reshape(height, width)
    cmap = jnp.where(valid_px, conf[win_safe], 0.0).reshape(height, width)
    index = jnp.where(valid_px, win, -1).reshape(height, width)
    intensity = (
        0.299 * color[..., 0] + 0.587 * color[..., 1] + 0.114 * color[..., 2]
    )
    return Prediction(
        index=index,
        vmap=vmap,
        nmap=nmap,
        color=color,
        intensity=intensity,
        depth=depth,
        time=tmap,
        conf=cmap,
    )
