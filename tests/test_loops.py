"""Loop-closure integration tests: simulated odometry drift corrected by the
local (active-vs-inactive) deformation pipeline — the rebuild's equivalent of
BASELINE config 2 (ICL living-room with local loops)."""

import jax.numpy as jnp
import numpy as np
import pytest

from densemonoslam_tpu import loops, step as stepmod
from densemonoslam_tpu.config import EngineConfig
from densemonoslam_tpu.engine import Engine
from densemonoslam_tpu.io.synthetic import SyntheticSequence
from densemonoslam_tpu.mapping import surfel_map as sm


@pytest.fixture(scope="module")
def seq():
    return SyntheticSequence(num_frames=40, radius=0.35, max_angle=0.3)


def _surface_dist(seq, positions):
    lo, hi = seq.scene.lo, seq.scene.hi
    on_wall = np.min(np.minimum(np.abs(positions - lo), np.abs(positions - hi)), axis=1)
    on_sphere = np.min(
        np.abs(
            np.linalg.norm(positions[:, None, :] - seq.scene.sphere_c[None], axis=-1)
            - seq.scene.sphere_r[None]
        ),
        axis=1,
    )
    return np.minimum(on_wall, on_sphere)


def _run_drift_session(seq, cfg, n=40, drift_mag=0.05, drift_start=20):
    """Feed GT poses for the first half, then poses with linearly growing
    translation drift — the map's recent half ends up offset from the old
    half, exactly the state a loop closure must repair."""
    eng = Engine(seq.camera, cfg)
    eng.frontend("cam0")
    eng.frontends["cam0"].pose = seq.gt_pose(0).astype(np.float32)
    for i in range(n):
        rgb, depth = seq.frame(i)
        pose = seq.gt_pose(i).astype(np.float32).copy()
        if i >= drift_start:
            s = (i - drift_start + 1) / (n - drift_start)
            pose[:3, 3] += np.array([drift_mag * s, 0, 0], np.float32)
        eng.process_frame("cam0", rgb, depth, float(i), in_pose=pose)
    return eng


def test_local_loop_corrects_drift(seq):
    """Two-epoch revisit: the same views fused twice — correct at ticks 0-9,
    then with a constant 8 cm odometric offset at ticks 100+ (the drifted
    return of a loop).  `try_local_loop` must align the active (drifted)
    prediction onto the inactive (correct) one and deform the recent epoch
    back.  This is the reference's local-loop scenario
    (`ElasticFusion.cpp:399-495`) in its pure form: the drift exceeds the
    fusion depth gate, so the epochs never mixed."""
    cfg = EngineConfig(
        max_surfels=1 << 18,
        depth_cutoff=8.0,
        depth_factor=1.0,
        nid_keyframing=False,
        open_loop=True,  # close manually below
        time_delta=50,
        deform_graph_sample_rate=600,
        max_deform_nodes=128,
        loop_min_inactive_frac=0.05,
        loop_cons_err_thresh=0.02,
        confidence_threshold=1.0,  # short session: surfels stabilise quickly
    )
    drift = np.array([0.08, 0.0, 0.0], np.float32)
    eng = Engine(seq.camera, cfg)
    eng.frontend("cam0")
    fe = eng.frontends["cam0"]
    fe.pose = seq.gt_pose(0).astype(np.float32)
    for i in range(10):
        rgb, depth = seq.frame(i)
        eng.process_frame("cam0", rgb, depth, float(i), in_pose=seq.gt_pose(i).astype(np.float32))
    # jump the clock: epoch 1 becomes inactive
    eng.global_tick = 100  # epoch 1 becomes inactive
    for i in range(10):
        rgb, depth = seq.frame(i)
        pose = seq.gt_pose(i).astype(np.float32).copy()
        pose[:3, 3] += drift
        eng.process_frame("cam0", rgb, depth, float(100 + i), in_pose=pose)

    pre_data = np.asarray(fe.state.map_data).copy()
    pre_count = int(fe.state.map_count)
    init_times = pre_data[:pre_count, sm.INIT_TIME]
    recent = init_times >= 100
    assert recent.sum() > 3000  # the drifted epoch created its own surfels

    state2, info, _, _ = loops.try_local_loop(fe.state, fe.camera, cfg)
    assert info.attempted
    assert info.inactive_frac > 0.05, info
    assert info.closed, info

    # the deformation must have moved the drifted epoch by ~ -drift (rows are
    # stable across the call, so positions compare element-wise)
    post_data = np.asarray(state2.map_data)
    moved = post_data[:pre_count, 0:3] - pre_data[:pre_count, 0:3]
    mean_corr = moved[recent].mean(axis=0)
    np.testing.assert_allclose(mean_corr, -drift, atol=0.35 * np.linalg.norm(drift))
    # ... while the anchored old epoch stayed put
    old = init_times < 50
    assert np.abs(moved[old]).max() < 0.03
    # the pose was pulled back toward ground truth
    gt_t = seq.gt_pose(9)[:3, 3]
    pre_err = np.linalg.norm(np.asarray(fe.state.pose)[:3, 3] - gt_t)
    post_err = np.linalg.norm(np.asarray(state2.pose)[:3, 3] - gt_t)
    assert post_err < pre_err


def test_loop_closure_corrects_whole_trajectory(seq):
    """An accepted closure must rewrite the pose HISTORY, not just the
    current pose (reference `Deformation.cpp:106-124,167` applyGraphToPoses
    over the full per-context pose graph, exported via
    `Context::saveTrajectory`, `Context.h:117-156`): full-trajectory ATE must
    improve >=2x and `save_trajectory` must reflect the corrected poses."""
    cfg = EngineConfig(
        max_surfels=1 << 18,
        depth_cutoff=8.0,
        depth_factor=1.0,
        nid_keyframing=False,
        open_loop=False,
        loop_check_interval=5,
        time_delta=50,
        deform_graph_sample_rate=600,
        max_deform_nodes=128,
        loop_min_inactive_frac=0.05,
        loop_cons_err_thresh=0.02,
        confidence_threshold=1.0,
    )
    drift = np.array([0.08, 0.0, 0.0], np.float32)
    eng = Engine(seq.camera, cfg)
    eng.frontend("cam0")
    fe = eng.frontends["cam0"]
    fe.pose = seq.gt_pose(0).astype(np.float32)
    fed, gts = [], []
    for i in range(10):
        rgb, depth = seq.frame(i)
        gt = seq.gt_pose(i).astype(np.float32)
        eng.process_frame("cam0", rgb, depth, float(i), in_pose=gt)
        fed.append(gt)
        gts.append(gt)
    eng.global_tick = 100  # epoch 1 becomes inactive
    for i in range(10):
        rgb, depth = seq.frame(i)
        gt = seq.gt_pose(i).astype(np.float32)
        pose = gt.copy()
        pose[:3, 3] += drift
        eng.process_frame("cam0", rgb, depth, float(100 + i), in_pose=pose)
        fed.append(pose)
        gts.append(gt)
        if fe.loops_closed:
            break
    assert fe.loops_closed >= 1, fe.last_loop_info

    def traj_err(poses):
        t = np.stack([p[:3, 3] for p in poses])
        g = np.stack([p[:3, 3] for p in gts[: len(poses)]])
        return np.sqrt(np.mean(np.sum((t - g) ** 2, axis=1)))

    raw_ate = traj_err(fed)
    corrected = [p for _, p in fe.trajectory]
    corr_ate = traj_err(corrected)
    assert corr_ate < 0.5 * raw_ate, (corr_ate, raw_ate)
    # the anchored first epoch stayed put
    for i in range(10):
        np.testing.assert_allclose(
            corrected[i][:3, 3], gts[i][:3, 3], atol=0.02
        )
    # exports read the corrected history
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "traj.freiburg")
        eng.save_trajectory("cam0", path)
        rows = np.loadtxt(path)
        np.testing.assert_allclose(
            rows[-1, 1:4], corrected[-1][:3, 3], atol=1e-5
        )


def test_local_loop_no_false_positive_without_overlap(seq):
    """With everything still active (big time window) there is no inactive
    model to close against — the attempt must bail out cleanly."""
    cfg = EngineConfig(
        max_surfels=1 << 18,
        depth_cutoff=8.0,
        depth_factor=1.0,
        nid_keyframing=False,
        open_loop=True,
        time_delta=200,
    )
    eng = _run_drift_session(seq, cfg, n=20, drift_mag=0.0)
    fe = eng.frontends["cam0"]
    _, info, _, _ = loops.try_local_loop(fe.state, fe.camera, cfg)
    assert info.attempted and not info.closed
    assert info.inactive_frac < 0.05


def test_engine_runs_loop_machinery_inline(seq):
    """End-to-end: the engine attempts loops at its cadence without breaking
    tracking, and maintains the fern DB."""
    cfg = EngineConfig(
        max_surfels=1 << 18,
        depth_cutoff=8.0,
        depth_factor=1.0,
        nid_keyframing=False,
        time_delta=15,
        deform_graph_sample_rate=600,
        max_deform_nodes=128,
        loop_check_interval=6,
        loop_min_inactive_frac=0.05,
    )
    eng = Engine(seq.camera, cfg)
    eng.frontend("cam0")
    eng.frontends["cam0"].pose = seq.gt_pose(0).astype(np.float32)
    for i in range(30):
        rgb, depth = seq.frame(i)
        info = eng.process_frame(
            "cam0", rgb, depth, float(i), in_pose=seq.gt_pose(i).astype(np.float32)
        )
        assert info["tracking_ok"] == 1.0
    fe = eng.frontends["cam0"]
    assert fe.fern_state is not None
    assert int(fe.fern_state.db.count) >= 1
    assert fe.last_loop_info is not None  # attempts happened


def test_relocalisation_recovers_pose(seq):
    """Feed some frames, teleport the frontend to a wrong pose, then
    relocalise with a frame near a stored fern keyframe."""
    cfg = EngineConfig(
        max_surfels=1 << 18,
        depth_cutoff=8.0,
        depth_factor=1.0,
        nid_keyframing=False,
        loop_check_interval=4,
        time_delta=200,
    )
    eng = Engine(seq.camera, cfg)
    eng.frontend("cam0")
    eng.frontends["cam0"].pose = seq.gt_pose(0).astype(np.float32)
    for i in range(20):
        rgb, depth = seq.frame(i)
        eng.process_frame(
            "cam0", rgb, depth, float(i), in_pose=seq.gt_pose(i).astype(np.float32)
        )
    fe = eng.frontends["cam0"]
    assert int(fe.fern_state.db.count) >= 1
    # teleport far away (lost)
    bad = np.eye(4, dtype=np.float32)
    bad[:3, 3] = [5, 5, 5]
    fe.pose = bad
    rgb, depth = seq.frame(5)
    ok = eng.relocalise("cam0", rgb, depth)
    assert ok
    rec = np.asarray(fe.state.pose)
    terr = np.linalg.norm(rec[:3, 3] - seq.gt_pose(5)[:3, 3])
    assert terr < 0.3  # within dense-tracking convergence range


def test_relocalisation_rejects_wrong_fern_match(seq):
    """A fern candidate with matching appearance but a WRONG pose must be
    rejected by the geometric verification (reference `Ferns::findFrame` ICP
    refine + ICPerr/inlier/covariance gates, `Ferns.cpp:277-423` — a
    photometric check alone would accept it)."""
    cfg = EngineConfig(
        max_surfels=1 << 18,
        depth_cutoff=8.0,
        depth_factor=1.0,
        nid_keyframing=False,
        loop_check_interval=4,
        time_delta=200,
    )
    eng = Engine(seq.camera, cfg)
    eng.frontend("cam0")
    fe = eng.frontends["cam0"]
    fe.pose = seq.gt_pose(0).astype(np.float32)
    for i in range(20):
        rgb, depth = seq.frame(i)
        eng.process_frame(
            "cam0", rgb, depth, float(i), in_pose=seq.gt_pose(i).astype(np.float32)
        )
    assert int(fe.fern_state.db.count) >= 1
    # tamper: keep the stored appearance but point every stored pose at a
    # different place in the map (similar appearance, wrong place)
    wrong = seq.gt_pose(19).astype(np.float32)
    wrong[:3, 3] += np.array([0.8, 0.8, 0.0], np.float32)
    db = fe.fern_state.db
    fe.fern_state = loops.FernLoopState(
        coder=fe.fern_state.coder,
        db=db._replace(
            poses=jnp.broadcast_to(jnp.asarray(wrong), db.poses.shape)
        ),
    )
    rgb, depth = seq.frame(5)
    assert not eng.relocalise("cam0", rgb, depth)
