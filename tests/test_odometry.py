"""End-to-end dense odometry tests on the synthetic oracle: track between
rendered frames with known ground-truth relative poses."""

import jax.numpy as jnp
import numpy as np
import pytest

from densemonoslam_tpu.io.synthetic import SyntheticSequence
from densemonoslam_tpu.tracking import odometry
from densemonoslam_tpu.utils import se3


@pytest.fixture(scope="module")
def seq():
    # ~0.055 m + ~3 deg between frames: an aggressive but realistic camera
    # motion (a 30 Hz sensor moves ~10x slower than this)
    return SyntheticSequence(num_frames=40, radius=0.35, max_angle=0.3)


def _pyr(seq, i):
    rgb, depth = seq.frame(i)
    return odometry.build_frame_pyramid(
        jnp.asarray(rgb), jnp.asarray(depth), seq.camera.intrinsics, 3
    )


def _model(seq, i):
    return odometry.model_pyramid_from_frame(_pyr(seq, i))


def _gt_rel(seq, i, j):
    """A_gt: frame j camera -> frame i camera."""
    return np.linalg.inv(seq.gt_pose(i)) @ seq.gt_pose(j)


def _pose_err(A, A_gt):
    d = np.linalg.inv(np.asarray(A)) @ A_gt
    rot = np.arccos(np.clip((np.trace(d[:3, :3]) - 1) / 2, -1, 1))
    return rot, np.linalg.norm(d[:3, 3])


def test_track_identity(seq):
    """Tracking a frame against itself must stay at identity."""
    pyr = _pyr(seq, 0)
    res = odometry.track(
        odometry.model_pyramid_from_frame(pyr), pyr, jnp.eye(4, dtype=jnp.float32), seq.camera.intrinsics
    )
    rot, trans = _pose_err(res.A, np.eye(4))
    assert trans < 1e-4 and rot < 1e-4
    assert not bool(res.failed)
    assert float(res.icp_inliers) > 0.5 * seq.camera.resolution.num_pixels


def test_track_adjacent_frames(seq):
    """Adjacent synthetic frames (~2 cm / ~4 deg apart) must track to
    millimetre / millidegree accuracy."""
    model = _model(seq, 0)
    frame = _pyr(seq, 1)
    A_gt = _gt_rel(seq, 0, 1)
    res = odometry.track(model, frame, jnp.eye(4, dtype=jnp.float32), seq.camera.intrinsics)
    rot, trans = _pose_err(res.A, A_gt)
    gt_trans = np.linalg.norm(A_gt[:3, 3])
    assert trans < max(0.05 * gt_trans, 2e-3), (trans, gt_trans)
    assert rot < 0.005
    assert not bool(res.failed)


def test_track_sequence_accumulated_drift(seq):
    """Frame-to-frame over the whole sequence: accumulated ATE must stay small
    on clean synthetic data."""
    from densemonoslam_tpu.eval import ate_rmse

    poses_est = [seq.gt_pose(0)]
    prev = _pyr(seq, 0)
    for i in range(1, 20):
        cur = _pyr(seq, i)
        res = odometry.track(
            odometry.model_pyramid_from_frame(prev), cur, jnp.eye(4, dtype=jnp.float32), seq.camera.intrinsics
        )
        assert not bool(res.failed), f"tracking failed at frame {i}"
        poses_est.append(poses_est[-1] @ np.asarray(res.A))
        prev = cur
    gt = [seq.gt_pose(i) for i in range(20)]
    err = ate_rmse(poses_est, gt)
    assert err < 0.01, f"ATE {err:.4f} m"


def test_track_larger_baseline_with_so3(seq):
    """Frames 3 apart (~6 cm, ~12 deg): the pyramid + SO3 pre-alignment must
    still converge."""
    model = _model(seq, 0)
    frame = _pyr(seq, 3)
    A_gt = _gt_rel(seq, 0, 3)
    res = odometry.track(model, frame, jnp.eye(4, dtype=jnp.float32), seq.camera.intrinsics)
    rot, trans = _pose_err(res.A, A_gt)
    assert trans < 0.01 and rot < 0.01


def test_track_rgb_only(seq):
    """Photometric-only mode (reference `--rgb`) should still converge for a
    small baseline."""
    model = _model(seq, 0)
    frame = _pyr(seq, 1)
    A_gt = _gt_rel(seq, 0, 1)
    res = odometry.track(
        model, frame, jnp.eye(4, dtype=jnp.float32), seq.camera.intrinsics, rgb_only=True
    )
    rot, trans = _pose_err(res.A, A_gt)
    assert trans < 0.01 and rot < 0.01


def test_track_fast_odom(seq):
    """Fast mode: finest level only, 3 iterations (reference `--fo`)."""
    model = _model(seq, 0)
    frame = _pyr(seq, 1)
    A_gt = _gt_rel(seq, 0, 1)
    res = odometry.track(
        model,
        frame,
        jnp.eye(4, dtype=jnp.float32),
        seq.camera.intrinsics,
        iterations=odometry.ITERATIONS_FAST,
        use_so3=False,
    )
    rot, trans = _pose_err(res.A, A_gt)
    assert trans < 0.02 and rot < 0.02  # 3-iteration fast mode, coarse tolerance


def test_track_failure_guard(seq):
    """A giant injected translation must trip the ||dt|| > 0.3 guard rather
    than emit a wild pose."""
    model = _model(seq, 0)
    frame = _pyr(seq, 1)
    A_init = jnp.eye(4, dtype=jnp.float32).at[:3, 3].set(jnp.array([5.0, 5.0, 5.0]))
    res = odometry.track(model, frame, A_init, seq.camera.intrinsics)
    # either it failed (guard) or it returned something close to the init
    assert bool(res.failed) or float(jnp.linalg.norm(res.A[:3, 3] - A_init[:3, 3])) < 0.5


def test_covariance_shape_and_positivity(seq):
    model = _model(seq, 0)
    frame = _pyr(seq, 1)
    res = odometry.track(model, frame, jnp.eye(4, dtype=jnp.float32), seq.camera.intrinsics)
    cov = np.asarray(odometry.covariance(res))
    assert cov.shape == (6, 6)
    assert np.all(np.diag(cov) > 0)
    # well-constrained synthetic scene: tight covariance (our units differ
    # from the reference's covThresh=1e-5 gate; calibrate engine gates to
    # these magnitudes, ~1e-6..2e-5 on this fixture)
    assert np.all(np.diag(cov) < 1e-4)
