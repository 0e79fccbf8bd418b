"""Hybrid (sparse-tracker-driven) mode tests: ORB pose injection + hybrid
global loop closures — BASELINE config-3-style operation."""

import jax.numpy as jnp
import numpy as np
import pytest

from densemonoslam_tpu import loops
from densemonoslam_tpu.config import EngineConfig
from densemonoslam_tpu.engine import Engine
from densemonoslam_tpu.eval import ate_rmse
from densemonoslam_tpu.io.synthetic import SyntheticSequence
from densemonoslam_tpu.mapping import surfel_map as sm


@pytest.fixture(scope="module")
def seq():
    return SyntheticSequence(num_frames=40, radius=0.35, max_angle=0.3)


def test_engine_orb_tracking_mode(seq):
    """`orb_tracking=True`: the engine's pose comes from the internal sparse
    tracker; dense fusion still builds a sane map."""
    cfg = EngineConfig(
        max_surfels=1 << 17,
        depth_cutoff=8.0,
        depth_factor=1.0,
        nid_keyframing=False,
        open_loop=True,
        orb_tracking=True,
    )
    eng = Engine(seq.camera, cfg)
    eng.frontend("cam0")
    eng.frontends["cam0"].pose = seq.gt_pose(0).astype(np.float32)
    n = 15
    for i in range(n):
        rgb, depth = seq.frame(i)
        info = eng.process_frame("cam0", rgb, depth, float(i))
        assert info["tracking_ok"] == 1.0
    fe = eng.frontends["cam0"]
    assert fe.sparse_tracker is not None
    assert len(fe.sparse_tracker.keyframes) >= 2
    est = [p for _, p in fe.trajectory]
    gt = [seq.gt_pose(i) for i in range(n)]
    err = ate_rmse(est, gt)
    assert err < 0.05, err
    assert eng.surfel_count("cam0") > 5000


def test_apply_hybrid_loop_folds_map(seq):
    """Feed a known world correction through the hybrid-loop path on a
    two-epoch drifted map (same scenario as the local-loop test, but the
    correction comes from 'ORB' instead of dense ICP)."""
    cfg = EngineConfig(
        max_surfels=1 << 18,
        depth_cutoff=8.0,
        depth_factor=1.0,
        nid_keyframing=False,
        open_loop=True,
        time_delta=50,
        deform_graph_sample_rate=600,
        max_deform_nodes=128,
        loop_cons_err_thresh=0.02,
        confidence_threshold=1.0,
    )
    drift = np.array([0.08, 0.0, 0.0], np.float32)
    eng = Engine(seq.camera, cfg)
    eng.frontend("cam0")
    fe = eng.frontends["cam0"]
    fe.pose = seq.gt_pose(0).astype(np.float32)
    for i in range(10):
        rgb, depth = seq.frame(i)
        eng.process_frame("cam0", rgb, depth, float(i), in_pose=seq.gt_pose(i).astype(np.float32))
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

    # the 'ORB' correction: undo the drift
    C = np.eye(4, dtype=np.float32)
    C[:3, 3] = -drift
    state2, info, _ = loops.apply_hybrid_loop(fe.state, C, fe.camera, cfg)
    assert info.closed, info

    post_data = np.asarray(state2.map_data)
    moved = post_data[:pre_count, 0:3] - pre_data[:pre_count, 0:3]
    mean_corr = moved[recent].mean(axis=0)
    np.testing.assert_allclose(mean_corr, -drift, atol=0.35 * np.linalg.norm(drift))
    old = init_times < 50
    assert np.abs(moved[old]).max() < 0.03
    # pose rigidly corrected
    np.testing.assert_allclose(
        np.asarray(state2.pose)[:3, 3],
        (C @ np.asarray(fe.state.pose))[:3, 3],
        atol=1e-5,
    )


def test_sparse_long_run_pgo_flat_cost(seq):
    """300-frame hybrid run (7.5 laps): the sparse tracker's pose graph
    (odometry + loop edges, `parallel.ba.optimise_pose_graph`) keeps the
    trajectory bounded across laps, loop closures fire on revisits, and the
    per-frame sparse cost stays flat as the keyframe count grows (summary
    retrieval is one matvec, not an O(K) scan)."""
    import time

    import jax

    from densemonoslam_tpu.ops import preprocess
    from densemonoslam_tpu.tracking import sparse

    tr = sparse.SparseTracker(
        seq.camera.intrinsics, loop_min_gap=30, loop_min_votes=40
    )
    tr.pose = seq.gt_pose(0).astype(np.float32)
    n = 300
    frames = []
    for i in range(len(seq)):
        rgb, depth = seq.frame(i)
        frames.append(
            (preprocess.rgb_to_intensity(jnp.asarray(rgb)), jnp.asarray(depth))
        )
    poses = []
    batch_t = []
    t0 = time.perf_counter()
    for i in range(n):
        inten, depth = frames[i % len(seq)]
        pose, _ok = tr.track(inten, depth)
        poses.append(pose)
        if (i + 1) % 50 == 0:
            jax.block_until_ready(pose)
            t1 = time.perf_counter()
            batch_t.append(t1 - t0)
            t0 = t1
    tr.flush()
    assert tr.loops_closed >= 1, "no sparse loop closed across 7 revisits"
    assert len(tr.keyframes) >= 10
    # flat per-frame cost in K: late batches within 2x of early ones
    assert np.mean(batch_t[-2:]) < 2.0 * np.mean(batch_t[1:3]), batch_t
    # bounded trajectory across laps (sparse-only, PGO-corrected live pose)
    est = [np.asarray(p) for p in poses]
    gt = [seq.gt_pose(i % len(seq)) for i in range(n)]
    err = ate_rmse(est, gt)
    assert err < 0.25, f"sparse 300-frame ATE {err:.3f} m"
