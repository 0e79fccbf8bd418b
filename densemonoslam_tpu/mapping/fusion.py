"""Surfel fusion: data association, weighted-average update, new-surfel
insertion, and map cleaning.

TPU-native replacement for the reference's transform-feedback fusion passes
(`Core/src/GlobalModel.cpp`): `fuse` = the data-association render
(`Shaders/data.vert:18-190`: window search around the projected pixel with
depth/normal gates) followed by the update pass (`Shaders/update.vert:18-120`:
confidence-weighted running averages); `clean` = the copy_unstable pass
(`Shaders/copy_unstable.vert:18-320`: free-space violation and stale-unstable
culling).  Here both are scatter/gather programs over the packed surfel
tensor; duplicate-target scatters use `.at[].add`, which XLA executes
deterministically.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from densemonoslam_tpu.config import CameraIntrinsics
from densemonoslam_tpu.mapping import surfel_map as sm
from densemonoslam_tpu.ops import splat
from densemonoslam_tpu.utils import se3

# association gates (reference `data.vert`: depth window +-0.05 at scale 1,
# normal agreement; the window search spans the surfel's screen footprint)
DEPTH_GATE = 0.05
NORMAL_DOT_GATE = 0.5
SEARCH_RADIUS = 1  # 3x3 window in the index map
# new-surfel radius = sqrt(2) * z / fx, inflated for oblique views but clamped
# (reference `Shaders/surfels.glsl` radius equation)
RADIUS_OBLIQUE_CLAMP = 0.5
# radius gate: don't fuse geometry from a sample much coarser than the surfel
# (reference update.vert fuses only when the new radius < (1+.5) * old)
RADIUS_FUSE_FACTOR = 1.5
# unstable surfels older than this many ticks get culled
UNSTABLE_TTL = 20
FREE_SPACE_MARGIN = 0.1


class FuseStats(NamedTuple):
    matched: jnp.ndarray  # pixels fused into existing surfels
    added: jnp.ndarray  # new surfels created
    culled: jnp.ndarray  # surfels removed by clean()


def sample_confidence(
    u: jnp.ndarray, v: jnp.ndarray, intr: CameraIntrinsics, weight_mult: jnp.ndarray | float
) -> jnp.ndarray:
    """Per-pixel fusion weight: Gaussian in radial distance from the principal
    point (reference `Shaders/surfels.glsl` confidence())."""
    sigma = 0.6 * jnp.maximum(intr.cx, intr.cy) * 2.0
    r2 = (u - intr.cx) ** 2 + (v - intr.cy) ** 2
    return jnp.exp(-r2 / (2.0 * sigma * sigma)) * weight_mult


def _new_radius(z: jnp.ndarray, nz: jnp.ndarray, fx: float) -> jnp.ndarray:
    r = 1.41421356 * z / fx
    return r / jnp.maximum(jnp.abs(nz), RADIUS_OBLIQUE_CLAMP)


@functools.partial(
    jax.jit,
    static_argnames=("intr", "time_delta", "splat_k"),
    donate_argnames=("m",),
)
def fuse(
    m: sm.SurfelMap,
    vmap_c: jnp.ndarray,  # [H,W,3] current frame camera-space vertices
    nmap_c: jnp.ndarray,  # [H,W,3]
    rgb_c: jnp.ndarray,  # [H,W,3] 0..255
    pose: jnp.ndarray,  # [4,4] camera-to-world
    intr: CameraIntrinsics,
    time: jnp.ndarray | int,
    sensor: int = 0,
    weight_mult: jnp.ndarray | float = 1.0,
    time_delta: int = 200,
    splat_k: int = 3,
) -> Tuple[sm.SurfelMap, FuseStats]:
    """Fuse one RGB-D frame into the map at `pose`."""
    H, W, _ = vmap_c.shape
    P = H * W
    t_now = jnp.asarray(time, jnp.float32)

    # --- association render (reference predictIndices) --------------------
    pred = splat.render(
        m.data, m.count, pose, intr, W, H, t_now,
        time_delta=time_delta, mode=splat.MODE_ACTIVE, splat_k=splat_k,
    )

    v_f = vmap_c.reshape(P, 3)
    n_f = nmap_c.reshape(P, 3)
    c_f = rgb_c.reshape(P, 3).astype(jnp.float32)
    z_f = v_f[:, 2]
    valid_f = (z_f > 0) & (jnp.linalg.norm(n_f, axis=-1) > 0.5)

    uu = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1).reshape(P)
    vv = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0).reshape(P)

    # --- window search over the index map (reference data.vert) -----------
    ray = v_f / jnp.maximum(z_f, 1e-6)[:, None]
    best_cost = jnp.full((P,), jnp.inf, jnp.float32)
    best_idx = jnp.full((P,), -1, jnp.int32)
    idx_flat = pred.index.reshape(P)
    vmap_pred = pred.vmap.reshape(P, 3)
    nmap_pred = pred.nmap.reshape(P, 3)
    for dy in range(-SEARCH_RADIUS, SEARCH_RADIUS + 1):
        for dx in range(-SEARCH_RADIUS, SEARCH_RADIUS + 1):
            nu = jnp.clip(uu + dx, 0, W - 1)
            nv = jnp.clip(vv + dy, 0, H - 1)
            q = nv * W + nu
            cand = idx_flat[q]
            has = cand >= 0
            p_s = vmap_pred[q]  # candidate surfel point (camera frame)
            n_s = nmap_pred[q]
            depth_ok = jnp.abs(p_s[:, 2] - z_f) < DEPTH_GATE
            norm_ok = jnp.sum(n_s * n_f, axis=-1) > NORMAL_DOT_GATE
            # point-to-ray distance of the candidate surfel from this pixel ray
            cost = jnp.linalg.norm(jnp.cross(ray, p_s), axis=-1)
            ok = valid_f & has & depth_ok & norm_ok
            better = ok & (cost < best_cost)
            best_cost = jnp.where(better, cost, best_cost)
            best_idx = jnp.where(better, cand, best_idx)

    matched = best_idx >= 0
    target = jnp.where(matched, best_idx, m.capacity)  # dump slot when unmatched

    # --- update pass (reference update.vert) -------------------------------
    u_px = uu.astype(jnp.float32)
    v_px = vv.astype(jnp.float32)
    a = sample_confidence(u_px, v_px, intr, weight_mult) * valid_f
    p_w = se3.transform_points(pose, v_f)
    n_w = se3.rotate_vectors(pose, n_f)
    r_new = _new_radius(z_f, n_f[:, 2], intr.fx)
    r_old = m.data[target, sm.RADIUS]
    geo_ok = matched & (r_new < RADIUS_FUSE_FACTOR * r_old)
    a_all = a * matched
    a_geo = a * geo_ok

    sum_w_all = jnp.zeros((m.capacity + 1,), jnp.float32).at[target].add(a_all)
    sum_w_geo = jnp.zeros((m.capacity + 1,), jnp.float32).at[target].add(a_geo)
    sum_pos = jnp.zeros((m.capacity + 1, 3), jnp.float32).at[target].add(a_geo[:, None] * p_w)
    sum_nrm = jnp.zeros((m.capacity + 1, 3), jnp.float32).at[target].add(a_geo[:, None] * n_w)
    sum_col = jnp.zeros((m.capacity + 1, 3), jnp.float32).at[target].add(a_geo[:, None] * c_f)
    sum_rad = jnp.zeros((m.capacity + 1,), jnp.float32).at[target].add(a_geo * r_new)

    data = m.data
    conf_old = data[:, sm.CONF]
    wg = sum_w_geo
    denom = conf_old + wg
    blend = jnp.where(denom > 0, wg / jnp.maximum(denom, 1e-12), 0.0)
    mean_pos = sum_pos / jnp.maximum(wg, 1e-12)[:, None]
    mean_nrm = sum_nrm / jnp.maximum(wg, 1e-12)[:, None]
    mean_col = sum_col / jnp.maximum(wg, 1e-12)[:, None]
    mean_rad = sum_rad / jnp.maximum(wg, 1e-12)

    new_pos = data[:, sm.POS] * (1 - blend[:, None]) + mean_pos * blend[:, None]
    new_col = data[:, sm.COLOR] * (1 - blend[:, None]) + mean_col * blend[:, None]
    nrm_mix = data[:, sm.NORMAL] * (1 - blend[:, None]) + mean_nrm * blend[:, None]
    nrm_mix = nrm_mix / jnp.maximum(jnp.linalg.norm(nrm_mix, axis=-1, keepdims=True), 1e-9)
    new_rad = data[:, sm.RADIUS] * (1 - blend) + mean_rad * blend

    touched = sum_w_all > 0
    data = data.at[:, sm.POS].set(jnp.where((wg > 0)[:, None], new_pos, data[:, sm.POS]))
    data = data.at[:, sm.COLOR].set(jnp.where((wg > 0)[:, None], new_col, data[:, sm.COLOR]))
    data = data.at[:, sm.NORMAL].set(jnp.where((wg > 0)[:, None], nrm_mix, data[:, sm.NORMAL]))
    data = data.at[:, sm.RADIUS].set(jnp.where(wg > 0, new_rad, data[:, sm.RADIUS]))
    data = data.at[:, sm.CONF].set(
        jnp.where(touched, conf_old + sum_w_all, conf_old)
    )
    seen_col = 12 + sensor
    data = data.at[:, seen_col].set(
        jnp.where(touched, t_now, data[:, seen_col])
    )
    # dump slot must stay zero
    data = data.at[m.capacity].set(0.0)
    m = sm.SurfelMap(data=data, count=m.count)

    # --- insertion of unmatched pixels (reference clean-pass merge of the
    # per-frame unstable feedback buffer) -----------------------------------
    is_new = valid_f & ~matched
    rows = jnp.zeros((P, sm.COLS), jnp.float32)
    rows = rows.at[:, sm.POS].set(p_w)
    rows = rows.at[:, sm.CONF].set(jnp.maximum(a, 1e-3))
    rows = rows.at[:, sm.COLOR].set(c_f)
    rows = rows.at[:, sm.RADIUS].set(r_new)
    rows = rows.at[:, sm.NORMAL].set(n_w)
    rows = rows.at[:, sm.INIT_TIME].set(t_now)
    rows = rows.at[:, seen_col].set(t_now)
    count_before = m.count
    m = sm.append_surfels(m, rows, is_new)

    stats = FuseStats(
        matched=jnp.sum(matched.astype(jnp.int32)),
        added=(m.count - count_before).astype(jnp.int32),
        culled=jnp.array(0, jnp.int32),
    )
    return m, stats


@functools.partial(
    jax.jit,
    static_argnames=("intr", "conf_threshold"),
    donate_argnames=("m",),
)
def clean(
    m: sm.SurfelMap,
    depth_frame: jnp.ndarray,  # [H,W] metric depth of the current frame
    pose: jnp.ndarray,
    intr: CameraIntrinsics,
    time: jnp.ndarray | int,
    conf_threshold: float = 10.0,
    unstable_ttl: int = UNSTABLE_TTL,
) -> Tuple[sm.SurfelMap, jnp.ndarray]:
    """Cull bad surfels (reference `copy_unstable.vert` outlier logic):

    - unstable surfels (conf < threshold) not refreshed within `unstable_ttl`
      ticks of their creation;
    - free-space violators: surfels projecting well in front of the currently
      observed depth (the sensor saw through them).

    Returns (map, culled_count).  Culled = conf set to 0; slots are reclaimed
    by `surfel_map.compact`.
    """
    H, W = depth_frame.shape
    t_now = jnp.asarray(time, jnp.float32)
    rows = m.data[:-1]
    idx = jnp.arange(m.capacity)
    alive = (rows[:, sm.CONF] > 0) & (idx < m.count)

    Tinv = se3.se3_inverse(pose)
    p_c = se3.transform_points(Tinv, rows[:, sm.POS])
    z = p_c[:, 2]
    zsafe = jnp.maximum(z, 1e-6)
    u = p_c[:, 0] / zsafe * intr.fx + intr.cx
    v = p_c[:, 1] / zsafe * intr.fy + intr.cy
    ui = jnp.clip(jnp.round(u).astype(jnp.int32), 0, W - 1)
    vi = jnp.clip(jnp.round(v).astype(jnp.int32), 0, H - 1)
    inb = (u >= 0) & (u <= W - 1) & (v >= 0) & (v <= H - 1) & (z > 0.05)
    d_obs = depth_frame[vi, ui]
    free_space = inb & (d_obs > 0) & (z < d_obs - FREE_SPACE_MARGIN)

    unstable = rows[:, sm.CONF] < conf_threshold
    last = jnp.max(rows[:, sm.LAST_SEEN], axis=-1)
    stale = unstable & (t_now - last > unstable_ttl)

    kill = alive & (stale | free_space)
    conf = jnp.where(kill, 0.0, rows[:, sm.CONF])
    data = m.data.at[:-1, sm.CONF].set(conf)
    return sm.SurfelMap(data=data, count=m.count), jnp.sum(kill.astype(jnp.int32))
