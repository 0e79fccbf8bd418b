"""Sparse ORB-style tracker tests on the synthetic oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from densemonoslam_tpu.io.synthetic import SyntheticSequence
from densemonoslam_tpu.ops import preprocess
from densemonoslam_tpu.tracking import sparse


@pytest.fixture(scope="module")
def seq():
    return SyntheticSequence(num_frames=40, radius=0.35, max_angle=0.3)


def _frame(seq, i):
    rgb, depth = seq.frame(i)
    inten = preprocess.rgb_to_intensity(jnp.asarray(rgb))
    return inten, jnp.asarray(depth)


def test_detect_finds_repeatable_corners(seq):
    inten, depth = _frame(seq, 0)
    kp1 = sparse.detect_and_describe(inten, depth, threshold=5.0)
    kp2 = sparse.detect_and_describe(inten, depth, threshold=5.0)
    n = int(jnp.sum(kp1.valid))
    assert n > 100, n
    np.testing.assert_array_equal(np.asarray(kp1.uv), np.asarray(kp2.uv))
    np.testing.assert_array_equal(np.asarray(kp1.desc), np.asarray(kp2.desc))
    # corners carry depth
    assert float(jnp.sum(kp1.depth > 0)) > 0.9 * n


def test_nms_spacing(seq):
    inten, depth = _frame(seq, 0)
    kp = sparse.detect_and_describe(inten, depth, threshold=5.0)
    uv = np.asarray(kp.uv)[np.asarray(kp.valid)]
    # no two corners on adjacent pixels (3x3 NMS)
    d = np.abs(uv[:, None, :] - uv[None, :, :]).max(-1)
    np.fill_diagonal(d, 99)
    assert d.min() >= 1.0


def test_match_same_frame_identity(seq):
    inten, depth = _frame(seq, 0)
    kp = sparse.detect_and_describe(inten, depth, threshold=5.0)
    m, dist = sparse.match(kp, kp)
    valid = np.asarray(kp.valid)
    mm = np.asarray(m)[valid]
    assert (mm == np.where(valid)[0][: len(mm)]).mean() > 0.95
    assert float(jnp.max(jnp.where(kp.valid, dist, 0))) == 0


def test_match_across_frames(seq):
    a = sparse.detect_and_describe(*_frame(seq, 0), threshold=5.0)
    b = sparse.detect_and_describe(*_frame(seq, 1), threshold=5.0)
    m, _ = sparse.match(a, b)
    n_match = int(jnp.sum(m >= 0))
    assert n_match > 60, n_match
    # matched pixels should have moved only modestly between adjacent frames
    ia = np.asarray(m) >= 0
    duv = np.asarray(a.uv)[ia] - np.asarray(b.uv)[np.asarray(m)[ia]]
    med = np.median(np.linalg.norm(duv, axis=1))
    assert med < 25.0


def test_motion_only_pose_recovers_gt(seq):
    a = sparse.detect_and_describe(*_frame(seq, 0), threshold=5.0)
    b = sparse.detect_and_describe(*_frame(seq, 1), threshold=5.0)
    m, _ = sparse.match(a, b)
    A, inl, err = sparse.motion_only_pose(
        a, b, m, seq.camera.intrinsics, jnp.eye(4, dtype=jnp.float32)
    )
    assert int(inl) > 30
    A_gt = np.linalg.inv(seq.gt_pose(0)) @ seq.gt_pose(1)
    d = np.linalg.inv(np.asarray(A)) @ A_gt
    terr = np.linalg.norm(d[:3, 3])
    rerr = np.arccos(np.clip((np.trace(d[:3, :3]) - 1) / 2, -1, 1))
    assert terr < 0.02, terr
    assert rerr < 0.02, rerr


def test_sparse_tracker_sequence(seq):
    """Full sparse tracking over 20 frames: ATE within a few cm (sparse is
    coarser than dense but must stay sane) and keyframes accumulate."""
    from densemonoslam_tpu.eval import ate_rmse

    tr = sparse.SparseTracker(seq.camera.intrinsics)
    tr.pose = seq.gt_pose(0).astype(np.float32)
    poses = []
    for i in range(20):
        inten, depth = _frame(seq, i)
        pose, ok = tr.track(inten, depth)
        assert ok, f"sparse tracking failed at {i}"
        poses.append(pose.copy())
    gt = [seq.gt_pose(i) for i in range(20)]
    err = ate_rmse(poses, gt)
    assert err < 0.05, err
    assert len(tr.keyframes) >= 3


def test_loop_candidate_on_revisit(seq):
    """Orbit returns to the start: the tracker must emit a loop pair whose
    corrected pose is near the start keyframe."""
    tr = sparse.SparseTracker(
        seq.camera.intrinsics, loop_min_gap=12, loop_min_votes=40
    )
    tr.pose = seq.gt_pose(0).astype(np.float32)
    loop = None
    for i in range(len(seq)):
        inten, depth = _frame(seq, i)
        tr.track(inten, depth)
        got = tr.pop_loop()
        if got is not None and tr.last_loop_tick > 25:
            loop = (tr.last_loop_tick, got)
    tr.flush()  # drain the lagged verification pipeline
    got = tr.pop_loop()
    if got is not None and tr.last_loop_tick > 25:
        loop = (tr.last_loop_tick, got)
    assert loop is not None, "no loop detected on revisit"
    k_tick, (pose_old, pose_corr) = loop
    # corrected pose should be consistent with GT at the loop KEYFRAME's
    # frame (the async verification pipeline reports pairs a few frames
    # after the revisit; the pair itself is stamped with the keyframe tick)
    terr = np.linalg.norm(pose_corr[:3, 3] - seq.gt_pose(k_tick)[:3, 3])
    assert terr < 0.15, terr


def test_global_registration_wide_baseline(seq):
    """FGR-role test: align two frames ~0.3 m / ~15 deg apart with NO initial
    guess (far outside projective-ICP convergence)."""
    from densemonoslam_tpu.tracking import registration

    ia, da = _frame(seq, 0)
    ib, db = _frame(seq, 5)
    T, n_inl, rms = registration.global_registration(
        ia, da, ib, db, seq.camera.intrinsics
    )
    assert n_inl > 30, n_inl
    assert rms < 0.05, rms
    T_gt = np.linalg.inv(seq.gt_pose(5)) @ seq.gt_pose(0)  # a-cam -> b-cam
    d = np.linalg.inv(np.asarray(T)) @ T_gt
    terr = np.linalg.norm(d[:3, 3])
    rerr = np.arccos(np.clip((np.trace(d[:3, :3]) - 1) / 2, -1, 1))
    assert terr < 0.03, terr
    assert rerr < 0.03, rerr


def test_gnc_rejects_outliers(rng):
    """Half the correspondences are garbage; GNC must still find the rigid
    transform from the inlier set."""
    from densemonoslam_tpu.tracking import registration
    from densemonoslam_tpu.utils import se3

    n = 200
    P = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    T_gt = np.asarray(
        se3.se3_exp(jnp.asarray([0.3, -0.2, 0.4, 0.5, -0.3, 0.2], jnp.float32))
    )
    Q = (T_gt[:3, :3] @ P.T).T + T_gt[:3, 3]
    Q[: n // 2] = rng.uniform(-2, 2, (n // 2, 3))  # 50% outliers
    T, n_inl, rms = registration.gnc_rigid_align(
        jnp.asarray(P), jnp.asarray(Q.astype(np.float32)), jnp.ones(n, bool)
    )
    assert n_inl >= n // 2 - 5
    np.testing.assert_allclose(np.asarray(T), T_gt, atol=5e-3)
