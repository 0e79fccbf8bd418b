"""Distributed pose-graph optimisation + Schur-complement BA tests on the
virtual 8-device CPU mesh (BASELINE config 4 semantics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from densemonoslam_tpu.config import CameraIntrinsics
from densemonoslam_tpu.parallel import ba, mesh as meshmod
from densemonoslam_tpu.utils import se3

INTR = CameraIntrinsics(100.0, 100.0, 63.5, 47.5)


def _ring_poses(K, radius=1.0):
    """Ground-truth keyframe ring."""
    poses = []
    for k in range(K):
        a = 2 * np.pi * k / K
        T = np.eye(4, dtype=np.float32)
        c, s = np.cos(a), np.sin(a)
        T[:3, :3] = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
        T[:3, 3] = [radius * np.sin(a), 0.1 * np.sin(2 * a), radius * (np.cos(a) - 1)]
        poses.append(T)
    return np.stack(poses)


def _noisy_graph(K=16, noise=0.03, seed=0):
    """Odometry chain with accumulated noise + exact loop edge 0<->K-1."""
    rng = np.random.default_rng(seed)
    gt = _ring_poses(K)
    Z, ei, ej, w = [], [], [], []
    # odometry edges measured exactly from GT
    for k in range(K - 1):
        Z.append(np.linalg.inv(gt[k]) @ gt[k + 1])
        ei.append(k)
        ej.append(k + 1)
        w.append(1.0)
    # loop edge closing the ring
    Z.append(np.linalg.inv(gt[K - 1]) @ gt[0])
    ei.append(K - 1)
    ej.append(0)
    w.append(1.0)
    # initial estimate: integrate odometry with injected noise (drift)
    est = [gt[0]]
    for k in range(K - 1):
        xi = rng.normal(0, noise, 6).astype(np.float32)
        est.append(est[-1] @ Z[k] @ np.asarray(se3.se3_exp(jnp.asarray(xi))))
    est = np.stack(est).astype(np.float32)
    edges = ba.PoseGraphEdges(
        i=jnp.asarray(ei, jnp.int32),
        j=jnp.asarray(ej, jnp.int32),
        Z=jnp.asarray(np.stack(Z), jnp.float32),
        weight=jnp.asarray(w, jnp.float32),
    )
    return gt, est, edges


def _pose_err(est, gt):
    return np.mean(np.linalg.norm(est[:, :3, 3] - gt[:, :3, 3], axis=1))


def test_pose_graph_single_device():
    gt, est, edges = _noisy_graph()
    e_before = _pose_err(est, gt)
    out, err = ba.optimise_pose_graph(jnp.asarray(est), edges)
    e_after = _pose_err(np.asarray(out), gt)
    assert e_after < 0.3 * e_before, (e_before, e_after)


def test_pose_graph_distributed_matches_single():
    gt, est, edges = _noisy_graph()
    single, _ = ba.optimise_pose_graph(jnp.asarray(est), edges)
    mesh = meshmod.make_mesh(n_cams=8)
    run = ba.make_distributed_pgo(mesh)
    # pad edges to a multiple of 8 with zero-weight self-edges
    E = edges.i.shape[0]
    pad = (-E) % 8
    edges_p = ba.PoseGraphEdges(
        i=jnp.concatenate([edges.i, jnp.zeros(pad, jnp.int32)]),
        j=jnp.concatenate([edges.j, jnp.zeros(pad, jnp.int32)]),
        Z=jnp.concatenate([edges.Z, jnp.broadcast_to(jnp.eye(4), (pad, 4, 4))]),
        weight=jnp.concatenate([edges.weight, jnp.zeros(pad)]),
    )
    dist, err = run(jnp.asarray(est), edges_p)
    e_single = _pose_err(np.asarray(single), gt)
    e_dist = _pose_err(np.asarray(dist), gt)
    assert abs(e_single - e_dist) < 5e-3, (e_single, e_dist)


def _ba_problem(K=6, Pn=64, noise_pose=0.02, noise_pt=0.02, px_noise=0.0, seed=0):
    rng = np.random.default_rng(seed)
    gt_poses = _ring_poses(K, radius=0.4)
    gt_pts = rng.uniform(-1.0, 1.0, (Pn, 3)).astype(np.float32)
    gt_pts[:, 2] += 3.0  # in front of the ring
    cam_idx, pnt_idx, uv, valid = [], [], [], []
    for c in range(K):
        Tinv = np.linalg.inv(gt_poses[c])
        for p in range(Pn):
            X = Tinv[:3, :3] @ gt_pts[p] + Tinv[:3, 3]
            if X[2] < 0.2:
                continue
            u = X[0] / X[2] * INTR.fx + INTR.cx
            v = X[1] / X[2] * INTR.fy + INTR.cy
            if not (0 <= u < 128 and 0 <= v < 96):
                continue
            cam_idx.append(c)
            pnt_idx.append(p)
            uv.append([u + rng.normal(0, px_noise), v + rng.normal(0, px_noise)])
            valid.append(True)
    # noisy initial estimates
    est_poses = []
    for c in range(K):
        xi = rng.normal(0, noise_pose, 6).astype(np.float32)
        if c <= 1:
            xi *= 0  # gauge anchors (pose + scale) stay at GT
        est_poses.append(gt_poses[c] @ np.asarray(se3.se3_exp(jnp.asarray(xi))))
    est_pts = gt_pts + rng.normal(0, noise_pt, gt_pts.shape).astype(np.float32)
    prob = ba.BAProblem(
        poses=jnp.asarray(np.stack(est_poses), jnp.float32),
        points=jnp.asarray(est_pts),
        cam_idx=jnp.asarray(cam_idx, jnp.int32),
        pnt_idx=jnp.asarray(pnt_idx, jnp.int32),
        uv=jnp.asarray(np.array(uv), jnp.float32),
        valid=jnp.asarray(valid),
    )
    return gt_poses, gt_pts, prob


def test_bundle_adjust_converges():
    gt_poses, gt_pts, prob = _ba_problem()
    out, err = ba.bundle_adjust(prob, INTR, iters=6, fix_cameras=2)
    assert float(err) < 0.1, float(err)  # sub-0.1px reprojection on noise-free obs
    e_pose = _pose_err(np.asarray(out.poses), gt_poses)
    assert e_pose < 5e-3, e_pose


def test_distributed_ba_matches_single():
    """Landmarks sharded over 8 devices: identical camera solution (the psum
    of partial Schur systems equals the full system)."""
    gt_poses, gt_pts, prob = _ba_problem(Pn=64)
    single, err_s = ba.bundle_adjust(prob, INTR, iters=4, fix_cameras=2)

    # shard points over 8 devices: sort observations by point, re-index
    # points locally per shard
    mesh = meshmod.make_mesh(n_cams=8)
    Pn = prob.points.shape[0]
    per = Pn // 8
    order = np.argsort(np.asarray(prob.pnt_idx), kind="stable")
    cam_s = np.asarray(prob.cam_idx)[order]
    pnt_s = np.asarray(prob.pnt_idx)[order]
    uv_s = np.asarray(prob.uv)[order]
    val_s = np.asarray(prob.valid)[order]
    # observations must be padded so each shard has the same count AND only
    # references its own point block
    O_max = max(
        ((pnt_s >= s * per) & (pnt_s < (s + 1) * per)).sum() for s in range(8)
    )
    cam_pad = np.zeros((8, O_max), np.int32)
    pnt_pad = np.zeros((8, O_max), np.int32)
    uv_pad = np.zeros((8, O_max, 2), np.float32)
    val_pad = np.zeros((8, O_max), bool)
    for s in range(8):
        sel = (pnt_s >= s * per) & (pnt_s < (s + 1) * per)
        n = sel.sum()
        cam_pad[s, :n] = cam_s[sel]
        pnt_pad[s, :n] = pnt_s[sel] - s * per  # local point index
        uv_pad[s, :n] = uv_s[sel]
        val_pad[s, :n] = val_s[sel]
    run = ba.make_distributed_ba(mesh, INTR, iters=4, fix_cameras=2)
    poses_d, pts_d, err_d = run(
        prob.poses,
        prob.points,
        jnp.asarray(cam_pad.reshape(-1)),
        jnp.asarray(pnt_pad.reshape(-1)),
        jnp.asarray(uv_pad.reshape(-1, 2)),
        jnp.asarray(val_pad.reshape(-1)),
        jnp.zeros((8 * O_max,), jnp.float32),
    )
    np.testing.assert_allclose(
        np.asarray(poses_d), np.asarray(single.poses), atol=1e-3
    )
    assert abs(float(err_d) - float(err_s)) < 0.05


def test_sharded_apply_to_map_matches_single_device():
    """The `map` mesh axis carries a REAL pass: deformation application over
    row blocks on a 2x4 mesh is bit-identical to the single-device
    `deformation.apply_to_map` (SURVEY §5.7: surfel tensor sharded by block
    across chips)."""
    import numpy as np

    from densemonoslam_tpu.mapping import deformation as dg
    from densemonoslam_tpu.mapping import surfel_map as sm
    from densemonoslam_tpu.parallel.map_shard import make_sharded_apply_to_map
    from densemonoslam_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(3)
    N = 4096
    data = np.zeros((N + 1, sm.COLS), np.float32)
    n = 3000
    data[:n, 0:3] = rng.uniform(-2, 2, (n, 3))
    data[:n, sm.CONF] = rng.uniform(0.5, 20.0, n)
    data[:n, 8:11] = rng.normal(0, 1, (n, 3))
    data[:n, sm.INIT_TIME] = np.sort(rng.uniform(0, 31, n))
    count = jnp.asarray(n, jnp.int32)
    # a non-trivial graph: nodes along x, one half translated
    K = 32
    pos = np.zeros((K, 3), np.float32)
    pos[:, 0] = np.linspace(-2, 2, K)
    graph = dg.DeformGraph(
        pos=jnp.asarray(pos),
        time=jnp.asarray(np.linspace(0, 31, K).astype(np.float32)),
        valid=jnp.ones((K,), bool),
        A=jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (K, 3, 3)),
        t=jnp.asarray(
            np.where(np.arange(K)[:, None] >= K // 2, [0.1, 0.05, 0.0], 0.0)
        ).astype(jnp.float32),
    )
    ref = np.asarray(dg.apply_to_map(jnp.asarray(data.copy()), count, graph))
    mesh = make_mesh(n_cams=2, n_map=4)
    run = make_sharded_apply_to_map(mesh)
    out = np.asarray(run(jnp.asarray(data.copy()), count, graph))
    np.testing.assert_array_equal(out, ref)
