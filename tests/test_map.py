"""Surfel map, splat rendering, fusion, and cleaning tests on the synthetic
oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from densemonoslam_tpu.io.synthetic import SyntheticSequence
from densemonoslam_tpu.mapping import fusion
from densemonoslam_tpu.mapping import surfel_map as sm
from densemonoslam_tpu.ops import geometry, splat
from densemonoslam_tpu.utils import se3

CAPACITY = 1 << 16


@pytest.fixture(scope="module")
def seq():
    return SyntheticSequence(num_frames=40, radius=0.35, max_angle=0.3)


def _frame_maps(seq, i):
    rgb, depth = seq.frame(i)
    intr = seq.camera.intrinsics
    vmap = geometry.backproject(jnp.asarray(depth), intr)
    nmap = geometry.normal_map(vmap)
    return jnp.asarray(rgb), jnp.asarray(depth), vmap, nmap


def _bootstrap(seq, i, capacity=CAPACITY):
    rgb, depth, vmap, nmap = _frame_maps(seq, i)
    m = sm.empty_map(capacity)
    pose = jnp.asarray(seq.gt_pose(i).astype(np.float32))
    m, st = fusion.fuse(m, vmap, nmap, rgb, pose, seq.camera.intrinsics, time=i)
    return m, st


def test_fuse_into_empty_creates_surfels(seq):
    m, st = _bootstrap(seq, 0)
    res = seq.camera.resolution
    n = int(m.count)
    # nearly every valid pixel becomes a surfel (normals invalid at borders)
    assert n > 0.85 * res.num_pixels
    assert int(st.matched) == 0
    snap = sm.snapshot(m)
    assert np.all(np.isfinite(snap.positions))
    # all surfels lie on the scene surfaces: check against analytic depth
    assert snap.positions.shape[0] == n


def test_render_roundtrip(seq):
    """Render the bootstrapped map from the same pose: depth must match the
    sensor depth almost everywhere."""
    m, _ = _bootstrap(seq, 0)
    _, depth, _, _ = _frame_maps(seq, 0)
    intr = seq.camera.intrinsics
    res = seq.camera.resolution
    pose = jnp.asarray(seq.gt_pose(0).astype(np.float32))
    pred = splat.render(
        m.data, m.count, pose, intr, res.width, res.height, time=0,
        mode=splat.MODE_ALL,
    )
    d_pred = np.asarray(pred.depth)
    d_true = np.asarray(depth)
    valid = d_pred > 0
    assert valid.mean() > 0.9  # dense prediction
    err = np.abs(d_pred[valid] - d_true[valid])
    assert np.median(err) < 5e-3
    # colors should match too
    rgb, _ = seq.frame(0)
    c_err = np.abs(np.asarray(pred.color)[valid] - rgb[valid]).mean()
    assert c_err < 15.0  # block-edge texture blurs slightly through splatting


def test_render_from_different_pose(seq):
    """Render the map from a different view and compare against the
    analytically rendered depth of that view (modulo disocclusions)."""
    m, _ = _bootstrap(seq, 0)
    intr = seq.camera.intrinsics
    res = seq.camera.resolution
    pose1 = jnp.asarray(seq.gt_pose(2).astype(np.float32))
    pred = splat.render(
        m.data, m.count, pose1, intr, res.width, res.height, time=0,
        mode=splat.MODE_ALL,
    )
    _, depth1 = seq.frame(2)
    d_pred = np.asarray(pred.depth)
    valid = d_pred > 0
    assert valid.mean() > 0.5
    err = np.abs(d_pred[valid] - depth1[valid])
    # most pixels agree; disoccluded regions may not
    assert np.percentile(err, 50) < 0.02


def test_refuse_same_frame_matches(seq):
    """Fusing the same frame again must match (not duplicate) surfels and
    raise confidence."""
    m, _ = _bootstrap(seq, 0)
    n0 = int(m.count)
    conf0 = float(jnp.sum(m.confidences))
    rgb, depth, vmap, nmap = _frame_maps(seq, 0)
    pose = jnp.asarray(seq.gt_pose(0).astype(np.float32))
    m, st = fusion.fuse(m, vmap, nmap, rgb, pose, seq.camera.intrinsics, time=1)
    res = seq.camera.resolution
    assert int(st.matched) > 0.9 * res.num_pixels
    assert int(m.count) - n0 < 0.1 * res.num_pixels
    assert float(jnp.sum(m.confidences)) > conf0


def test_fuse_two_views_extends_map(seq):
    m, _ = _bootstrap(seq, 0)
    n0 = int(m.count)
    rgb, depth, vmap, nmap = _frame_maps(seq, 4)
    pose = jnp.asarray(seq.gt_pose(4).astype(np.float32))
    m, st = fusion.fuse(m, vmap, nmap, rgb, pose, seq.camera.intrinsics, time=4)
    # overlap matched, new territory appended
    assert int(st.matched) > 1000
    assert int(st.added) > 1000
    assert int(m.count) == n0 + int(st.added)


def test_positions_on_scene_surface(seq):
    """Fused world positions must lie on the analytic scene geometry."""
    m, _ = _bootstrap(seq, 0)
    snap = sm.snapshot(m)
    p = snap.positions
    lo, hi = seq.scene.lo, seq.scene.hi
    on_wall = np.min(np.minimum(np.abs(p - lo), np.abs(p - hi)), axis=1)
    on_sphere = np.min(
        np.abs(
            np.linalg.norm(p[:, None, :] - seq.scene.sphere_c[None], axis=-1)
            - seq.scene.sphere_r[None]
        ),
        axis=1,
    )
    d = np.minimum(on_wall, on_sphere)
    assert np.percentile(d, 95) < 2e-3


def test_clean_culls_free_space_violator(seq):
    m, _ = _bootstrap(seq, 0)
    # plant a surfel floating mid-air halfway to the far wall, dead centre
    intr = seq.camera.intrinsics
    pose = seq.gt_pose(0)
    p_cam = np.array([0.0, 0.0, 1.0])  # 1 m out; true depth there is ~2.4 m
    p_world = (pose[:3, :3] @ p_cam) + pose[:3, 3]
    row = np.zeros(sm.COLS, np.float32)
    row[0:3] = p_world
    row[sm.CONF] = 5.0
    row[sm.RADIUS] = 0.01
    row[8:11] = -(pose[:3, :3] @ np.array([0, 0, 1.0]))
    row[sm.INIT_TIME] = 0
    row[12] = 0
    planted = int(m.count)
    data = m.data.at[planted].set(jnp.asarray(row))
    m = sm.SurfelMap(data=data, count=m.count + 1)

    _, depth, _, _ = _frame_maps(seq, 0)
    pose_j = jnp.asarray(pose.astype(np.float32))
    n_before = int(m.count)
    m2, culled = fusion.clean(m, depth, pose_j, intr, time=1)
    assert int(culled) >= 1
    assert float(m2.data[planted, sm.CONF]) == 0.0
    # true-surface surfels survive
    assert int(m2.num_alive()) > 0.9 * n_before


def test_clean_culls_stale_unstable(seq):
    m, _ = _bootstrap(seq, 0)
    _, depth, _, _ = _frame_maps(seq, 0)
    pose = jnp.asarray(seq.gt_pose(0).astype(np.float32))
    n_before = int(m.count)
    # at t=100, all surfels (conf ~1, unstable, last seen t=0) are stale
    m2, culled = fusion.clean(m, jnp.zeros_like(depth), pose, seq.camera.intrinsics, time=100)
    assert int(culled) == n_before


def test_compact_reclaims_slots(seq):
    m, _ = _bootstrap(seq, 0)
    n0 = int(m.count)
    # kill every other surfel
    idx = jnp.arange(m.capacity)
    conf = jnp.where((idx % 2 == 0) & (idx < m.count), 0.0, m.data[:-1, sm.CONF])
    m = sm.SurfelMap(data=m.data.at[:-1, sm.CONF].set(conf), count=m.count)
    alive_before = int(m.num_alive())
    pos_alive = np.asarray(m.positions)[np.asarray(m.alive)]
    m2 = sm.compact(m)
    assert int(m2.count) == alive_before
    assert int(m2.num_alive()) == alive_before
    np.testing.assert_allclose(
        np.asarray(m2.positions)[:alive_before], pos_alive, atol=0
    )


def test_time_window_modes(seq):
    """ACTIVE vs INACTIVE rendering splits surfels by last-seen tick
    (reference time-windowed map, SURVEY §5.7)."""
    m, _ = _bootstrap(seq, 0)  # all last_seen = 0
    rgb, depth, vmap, nmap = _frame_maps(seq, 4)
    pose4 = jnp.asarray(seq.gt_pose(4).astype(np.float32))
    m, _ = fusion.fuse(m, vmap, nmap, rgb, pose4, seq.camera.intrinsics, time=300)
    intr = seq.camera.intrinsics
    res = seq.camera.resolution
    pred_act = splat.render(
        m.data, m.count, pose4, intr, res.width, res.height, time=300,
        time_delta=200, mode=splat.MODE_ACTIVE,
    )
    pred_inact = splat.render(
        m.data, m.count, pose4, intr, res.width, res.height, time=300,
        time_delta=200, mode=splat.MODE_INACTIVE,
    )
    act_px = int(jnp.sum(pred_act.depth > 0))
    inact_px = int(jnp.sum(pred_inact.depth > 0))
    assert act_px > 1000  # the just-fused view is active
    assert inact_px > 100  # frame-0-only surfels are inactive now
    # the two sets of winning surfels are disjoint
    ia = np.asarray(pred_act.index).ravel()
    ii = np.asarray(pred_inact.index).ravel()
    common = set(ia[ia >= 0]).intersection(set(ii[ii >= 0]))
    assert not common


def test_active_window_tail_block(seq):
    """ACTIVE-mode render/fuse restricted to the active tail block must agree
    with the full-map pass once compaction has partitioned the layout
    [inactive..., active...] (splat.active_window_start)."""
    m, _ = _bootstrap(seq, 0)  # all last_seen = 0 -> inactive at t=300
    rgb, depth, vmap, nmap = _frame_maps(seq, 4)
    pose4 = jnp.asarray(seq.gt_pose(4).astype(np.float32))
    m, _ = fusion.fuse(m, vmap, nmap, rgb, pose4, seq.camera.intrinsics, time=300)
    m = sm.compact(m, time=300.0, time_delta=200)
    intr = seq.camera.intrinsics
    res = seq.camera.resolution
    window = 1 << 15  # < capacity, > active count
    kw = dict(time=301, time_delta=200, mode=splat.MODE_ACTIVE)
    # window-INVARIANCE is asserted in the exact mode on both sides
    # (packed-vs-exact agreement has its own test below)
    full = splat.render(
        m.data, m.count, pose4, intr, res.width, res.height,
        packed_zbuffer=False, **kw
    )
    blk = splat.render(
        m.data, m.count, pose4, intr, res.width, res.height, window=window,
        packed_zbuffer=False, **kw
    )
    np.testing.assert_array_equal(np.asarray(full.index), np.asarray(blk.index))
    np.testing.assert_allclose(
        np.asarray(full.depth), np.asarray(blk.depth), rtol=0, atol=1e-6
    )
    # active set really fits the window (test precondition)
    t_seen = np.asarray(sm.last_seen_any(m))
    n_active = int(((301 - t_seen) < 200).sum())
    assert 0 < n_active <= window

    # fusing through the window matches full-map fusion
    rgb5, depth5, vmap5, nmap5 = _frame_maps(seq, 5)
    pose5 = jnp.asarray(seq.gt_pose(5).astype(np.float32))
    m_full, st_full = fusion.fuse(
        sm.SurfelMap(data=m.data + 0.0, count=m.count + 0), vmap5, nmap5, rgb5,
        pose5, intr, time=301, packed_zbuffer=False,
    )
    m_blk, st_blk = fusion.fuse(
        sm.SurfelMap(data=m.data + 0.0, count=m.count + 0), vmap5, nmap5, rgb5,
        pose5, intr, time=301, window=window, packed_zbuffer=False,
    )
    assert int(st_full.matched) == int(st_blk.matched)
    assert int(st_full.added) == int(st_blk.added)
    np.testing.assert_allclose(
        np.asarray(m_full.data), np.asarray(m_blk.data), rtol=0, atol=1e-5
    )

    # windowed clean kills exactly the full-map kills that fall in the tail
    # block (out-of-window stale surfels are reclaimed by the compaction
    # sweep instead, see sm.compact stale_conf_threshold)
    c_full, k_full = fusion.clean(
        sm.SurfelMap(data=m_full.data + 0.0, count=m_full.count + 0),
        depth5, pose5, intr, time=301, conf_threshold=10.0,
    )
    c_blk, k_blk = fusion.clean(
        sm.SurfelMap(data=m_full.data + 0.0, count=m_full.count + 0),
        depth5, pose5, intr, time=301, conf_threshold=10.0, window=window,
    )
    start = max(0, int(m_full.count) - window)
    kills_full = np.asarray(c_full.data[:-1, sm.CONF]) == 0
    kills_blk = np.asarray(c_blk.data[:-1, sm.CONF]) == 0
    np.testing.assert_array_equal(kills_blk[start:], kills_full[start:])
    assert not kills_blk[:start].any() or (
        np.asarray(m_full.data[:start, sm.CONF]) == 0
    ).any()
    # the compaction sweep reclaims the stale-in-epoch surfels the windowed
    # clean missed (free-space culls outside the window are NOT swept — the
    # sweep has no frame to test against, matching the reference where
    # free-space culling only happens during a fused frame)
    d = np.asarray(c_blk.data[:-1])
    alive_blk = (d[:, sm.CONF] > 0) & (np.arange(d.shape[0]) < int(c_blk.count))
    age = 301.0 - d[:, 12:15].max(axis=1)
    stale = alive_blk & (d[:, sm.CONF] < 10.0) & (age > 20) & (age <= 200)
    swept = sm.compact(
        sm.SurfelMap(data=c_blk.data + 0.0, count=c_blk.count + 0),
        time=301.0, time_delta=200, stale_conf_threshold=10.0,
    )
    assert int(swept.count) == int(alive_blk.sum()) - int(stale.sum())


def test_packed_zbuffer_close_to_exact(seq):
    """The packed single-scatter z-buffer (windowed ACTIVE renders) must agree
    with the exact two-phase z-buffer up to inverse-depth bucket ties: same
    coverage, winner depth within one bucket of the true minimum."""
    m, _ = _bootstrap(seq, 0)
    m = sm.compact(m, time=0.0, time_delta=200)
    intr = seq.camera.intrinsics
    res = seq.camera.resolution
    pose = jnp.asarray(seq.gt_pose(1).astype(np.float32))
    window = 1 << 15
    kw = dict(time=1, time_delta=200, mode=splat.MODE_ACTIVE, window=window)
    exact = splat.render(
        m.data, m.count, pose, intr, res.width, res.height,
        packed_zbuffer=False, **kw
    )
    packed = splat.render(
        m.data, m.count, pose, intr, res.width, res.height,
        packed_zbuffer=True, **kw
    )
    cov_e = np.asarray(exact.depth) > 0
    cov_p = np.asarray(packed.depth) > 0
    # coverage identical (bucketing never changes WHICH pixels are hit)
    assert (cov_e == cov_p).mean() > 0.999
    both = cov_e & cov_p
    de = np.asarray(exact.depth)[both]
    dp = np.asarray(packed.depth)[both]
    # winner depth within one float-bit depth bucket (+ splat refinement
    # slack); the packed key's tie-break error is RELATIVE: z * 2^(shift-23)
    # (see splat.packed_key_params)
    _, shift = splat.packed_key_params(window, 100.0, windowed=True)
    tol = np.maximum(de * 2.0 ** (shift - 23) + 5e-3, 5e-3)
    assert (np.abs(de - dp) <= tol).mean() > 0.995


def test_fusion_capacity_invariance(seq):
    """Per-frame results must not depend on map capacity while count fits:
    the window core + placement split (fuse_window/place_updates) keeps the
    full-capacity tensor out of the conditionals, so fusing the same frames
    into a small and a large map must produce identical live rows."""
    from densemonoslam_tpu.ops import geometry

    intr = seq.camera.intrinsics
    outs = []
    for cap in (1 << 20, 1 << 21):
        m = sm.empty_map(cap)
        for i in range(3):
            rgb, depth = seq.frame(i)
            d = jnp.asarray(depth, jnp.float32)
            vmap = geometry.backproject(d, intr)
            nmap = geometry.normal_map(vmap)
            pose = jnp.asarray(seq.gt_pose(i).astype(np.float32))
            m, st = fusion.fuse(
                m, vmap, nmap, jnp.asarray(rgb, jnp.float32), pose, intr,
                time=i,
            )
        outs.append((int(m.count), np.asarray(m.data[: int(m.count)])))
    (c_small, rows_small), (c_big, rows_big) = outs
    assert c_small == c_big
    np.testing.assert_array_equal(rows_small, rows_big)
