import os

import numpy as np

from densemonoslam_tpu.eval.ate import ate_rmse, rpe
from densemonoslam_tpu.io.datasets import load_freiburg_trajectory
from densemonoslam_tpu.io.synthetic import SyntheticSequence
from densemonoslam_tpu.io.writers import load_ply, save_freiburg, save_ply


def test_synthetic_sequence_shapes(synthetic_seq):
    rgb, depth, ts = synthetic_seq.get_next()
    synthetic_seq.rewind()
    res = synthetic_seq.camera.resolution
    assert rgb.shape == (res.height, res.width, 3) and rgb.dtype == np.uint8
    assert depth.shape == (res.height, res.width) and depth.dtype == np.float32
    assert np.all(depth > 0.1) and np.all(depth < 10.0)


def test_synthetic_depth_consistent_with_pose(synthetic_seq):
    """Back-projecting depth through the GT pose must land on the box walls."""
    seq = synthetic_seq
    rgb, depth = seq.frame(3)
    T = seq.gt_pose(3)
    intr = seq.camera.intrinsics
    H, W = depth.shape
    uu, vv = np.meshgrid(np.arange(W), np.arange(H))
    x = (uu - intr.cx) / intr.fx * depth
    y = (vv - intr.cy) / intr.fy * depth
    pts_cam = np.stack([x, y, depth], axis=-1).reshape(-1, 3)
    pts_world = (T[:3, :3] @ pts_cam.T).T + T[:3, 3]
    lo, hi = seq.scene.lo, seq.scene.hi
    # every point should lie on a wall or on one of the spheres
    on_wall = np.min(
        np.minimum(np.abs(pts_world - lo), np.abs(pts_world - hi)), axis=1
    )
    on_sphere = np.min(
        np.abs(
            np.linalg.norm(pts_world[:, None, :] - seq.scene.sphere_c[None], axis=-1)
            - seq.scene.sphere_r[None]
        ),
        axis=1,
    )
    assert np.percentile(np.minimum(on_wall, on_sphere), 99) < 1e-3


def test_synthetic_depth_has_structure(synthetic_seq):
    """Every frame must contain real depth variation (spheres in view), so
    that point-to-plane ICP is constrained in all 6 DoF."""
    for i in range(0, len(synthetic_seq), 3):
        _, depth = synthetic_seq.frame(i)
        assert depth.std() > 0.05, f"frame {i} depth nearly constant"


def test_freiburg_roundtrip(tmp_path, rng):
    from densemonoslam_tpu.utils import se3
    import jax.numpy as jnp

    poses = [
        np.asarray(se3.se3_exp(jnp.asarray(rng.normal(0, 0.3, 6).astype(np.float32))))
        for _ in range(5)
    ]
    ts = [float(i) for i in range(5)]
    path = os.path.join(tmp_path, "traj.freiburg")
    save_freiburg(path, ts, poses)
    ts2, poses2 = load_freiburg_trajectory(path)
    np.testing.assert_allclose(ts2, ts)
    for a, b in zip(poses, poses2):
        np.testing.assert_allclose(a, b, atol=1e-4)


def test_ply_roundtrip(tmp_path, rng):
    n = 100
    pos = rng.normal(0, 1, (n, 3)).astype(np.float32)
    nrm = rng.normal(0, 1, (n, 3)).astype(np.float32)
    col = rng.integers(0, 255, (n, 3)).astype(np.uint8)
    rad = rng.uniform(0.001, 0.01, n).astype(np.float32)
    path = os.path.join(tmp_path, "map.ply")
    save_ply(path, pos, nrm, col, rad)
    p2, n2, c2, r2 = load_ply(path)
    np.testing.assert_allclose(p2, pos, atol=1e-6)
    np.testing.assert_allclose(n2, nrm, atol=1e-6)
    np.testing.assert_array_equal(c2, col)
    np.testing.assert_allclose(r2, rad, atol=1e-6)


def test_ate_zero_for_identical():
    seq = SyntheticSequence(num_frames=10)
    poses = [seq.gt_pose(i) for i in range(10)]
    assert ate_rmse(poses, poses) < 1e-9
    t, r = rpe(poses, poses)
    assert t < 1e-9 and r < 1e-6


def test_ate_alignment_invariance():
    """ATE must be invariant to a global rigid transform of the estimate."""
    seq = SyntheticSequence(num_frames=10)
    gt = [seq.gt_pose(i) for i in range(10)]
    offset = np.eye(4)
    offset[:3, 3] = [1.0, -2.0, 0.5]
    c, s = np.cos(0.7), np.sin(0.7)
    offset[:3, :3] = [[c, -s, 0], [s, c, 0], [0, 0, 1]]
    est = [offset @ T for T in gt]
    assert ate_rmse(est, gt) < 1e-6


def test_ate_detects_error():
    seq = SyntheticSequence(num_frames=10)
    gt = [seq.gt_pose(i) for i in range(10)]
    est = [T.copy() for T in gt]
    est[5] = est[5].copy()
    est[5][:3, 3] += [0.3, 0, 0]
    assert ate_rmse(est, gt) > 0.05


def test_ground_truth_clusters(tmp_path):
    """GT cluster CSV parsing + HSV colors (reference GroundTruthClusters)."""
    import numpy as np

    from densemonoslam_tpu.io.datasets import GroundTruthClusters

    p = tmp_path / "clusters.csv"
    p.write_text("100,0\n200,1\n300,2\n")
    gtc = GroundTruthClusters(str(p))
    assert gtc.cluster_at(100) == 0
    assert gtc.cluster_at(250) == 1
    assert gtc.cluster_at(999) == 2
    assert gtc.cluster_at(50) == 0  # before first entry
    assert set(gtc.cluster_colors) == {0, 1, 2}
    for rgb in gtc.cluster_colors.values():
        assert all(0.0 <= v <= 1.0 for v in rgb)


def test_cluster_tagged_fusion_and_ply(tmp_path):
    """Surfels carry the per-frame cluster id; PLY export filters by it
    (reference per-cluster VBOs, GlobalModel.h:100-101)."""
    import jax.numpy as jnp
    import numpy as np

    from densemonoslam_tpu.config import EngineConfig
    from densemonoslam_tpu.engine import Engine
    from densemonoslam_tpu.io.synthetic import SyntheticSequence
    from densemonoslam_tpu.mapping import surfel_map as sm

    seq = SyntheticSequence(num_frames=24)
    cfg = EngineConfig(
        max_surfels=1 << 16, depth_cutoff=8.0, depth_factor=1.0,
        open_loop=True, nid_keyframing=False,
    )
    eng = Engine(seq.camera, cfg)
    eng.frontend("cam0")
    eng.frontends["cam0"].pose = seq.gt_pose(0).astype(np.float32)
    for i in range(6):
        rgb, depth = seq.frame(i)
        info = eng.process_frame("cam0", rgb, depth, float(i), cluster=i // 3)
        assert info["tracking_ok"] == 1.0
    snap = sm.snapshot(eng.map_of("cam0"))
    ids = set(np.unique(np.asarray(snap.clusters)).tolist())
    assert ids == {0, 1}
    n0 = eng.save_ply("cam0", str(tmp_path / "c0.ply"), stable_only=False, cluster=0)
    n1 = eng.save_ply("cam0", str(tmp_path / "c1.ply"), stable_only=False, cluster=1)
    nall = eng.save_ply("cam0", str(tmp_path / "all.ply"), stable_only=False)
    assert n0 > 0 and n1 > 0 and n0 + n1 == nall
