import jax.numpy as jnp
import numpy as np

from densemonoslam_tpu.config import CameraIntrinsics
from densemonoslam_tpu.ops import geometry, preprocess


def test_metricise_depth():
    raw = jnp.array([[0, 500, 1000], [3500, 2999, 65535]], jnp.float32)
    d = preprocess.metricise_depth(raw, 1000.0, 3.0)
    np.testing.assert_allclose(
        np.asarray(d), [[0, 0.5, 1.0], [0, 2.999, 0]], atol=1e-6
    )


def test_rgb_to_intensity_range(rng):
    rgb = rng.integers(0, 256, (24, 32, 3)).astype(np.uint8)
    i = preprocess.rgb_to_intensity(jnp.asarray(rgb))
    assert np.all(np.asarray(i) >= 0) and np.all(np.asarray(i) <= 255)
    grey = np.full((4, 4, 3), 100, np.uint8)
    np.testing.assert_allclose(
        np.asarray(preprocess.rgb_to_intensity(jnp.asarray(grey))), 100.0, atol=0.1
    )


def test_bilateral_preserves_edges():
    """A two-plateau depth image must keep its edge but smooth its noise."""
    rng = np.random.default_rng(0)
    d = np.full((32, 32), 1.0, np.float32)
    d[:, 16:] = 2.0
    noisy = d + rng.normal(0, 0.005, d.shape).astype(np.float32)
    out = np.asarray(preprocess.bilateral_filter_depth(jnp.asarray(noisy)))
    # noise reduced
    assert np.abs(out[:, :14] - 1.0).std() < np.abs(noisy[:, :14] - 1.0).std()
    # edge magnitude preserved (no blur across the discontinuity)
    assert np.abs(out[:, 14:18].mean(axis=0)[0] - 1.0) < 0.01
    assert np.abs(out[:, 14:18].mean(axis=0)[-1] - 2.0) < 0.01


def test_bilateral_keeps_invalid_invalid():
    d = np.ones((16, 16), np.float32)
    d[4:8, 4:8] = 0.0
    out = np.asarray(preprocess.bilateral_filter_depth(jnp.asarray(d)))
    assert np.all(out[4:8, 4:8] == 0.0)
    assert np.all(out[12:, 12:] > 0.9)


def test_pyr_down_gauss_shape_and_dc(rng):
    img = jnp.asarray(rng.uniform(0, 255, (64, 48)).astype(np.float32))
    out = preprocess.pyr_down_gauss(img)
    assert out.shape == (32, 24)
    assert abs(float(out.mean()) - float(img.mean())) < 2.0


def test_pyr_down_depth_no_edge_bleed():
    d = np.full((32, 32), 1.0, np.float32)
    d[:, 16:] = 3.0
    out = np.asarray(preprocess.pyr_down_depth(jnp.asarray(d)))
    assert out.shape == (16, 16)
    # no intermediate values were invented at the depth discontinuity
    assert np.all((np.abs(out - 1.0) < 0.05) | (np.abs(out - 3.0) < 0.05))


def test_sobel_gradients_linear_ramp():
    H, W = 16, 16
    img = jnp.asarray(
        np.tile(np.arange(W, dtype=np.float32) * 3.0, (H, 1))
    )
    gx, gy = preprocess.sobel_gradients(img)
    # interior gradient equals ramp slope; y-gradient zero
    np.testing.assert_allclose(np.asarray(gx)[2:-2, 2:-2], 3.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gy)[2:-2, 2:-2], 0.0, atol=1e-4)


def test_backproject_project_roundtrip(rng):
    intr = CameraIntrinsics(100.0, 110.0, 31.5, 23.5)
    depth = jnp.asarray(rng.uniform(0.5, 3.0, (48, 64)).astype(np.float32))
    vmap = geometry.backproject(depth, intr)
    u, v, z = geometry.project(vmap, intr)
    uu, vv = np.meshgrid(np.arange(64, dtype=np.float32), np.arange(48, dtype=np.float32))
    np.testing.assert_allclose(np.asarray(u), uu, atol=1e-3)
    np.testing.assert_allclose(np.asarray(v), vv, atol=1e-3)
    np.testing.assert_allclose(np.asarray(z), np.asarray(depth), atol=1e-6)


def test_normal_map_plane():
    """Normals of a fronto-parallel plane point towards the camera (-z)."""
    intr = CameraIntrinsics(100.0, 100.0, 31.5, 23.5)
    depth = jnp.full((48, 64), 2.0, jnp.float32)
    vmap = geometry.backproject(depth, intr)
    n = np.asarray(geometry.normal_map(vmap))
    inner = n[8:-8, 8:-8]
    norms = np.linalg.norm(inner, axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)
    assert np.all(np.abs(inner[..., 2]) > 0.999)


def test_normal_map_synthetic_wall(synthetic_seq):
    """Normals computed from rendered depth must match the analytic wall
    normals (rotated into camera frame)."""
    seq = synthetic_seq
    _, depth = seq.frame(0)
    T = seq.gt_pose(0)
    intr = seq.camera.intrinsics
    vmap = geometry.backproject(jnp.asarray(depth), intr)
    n_est = np.asarray(geometry.normal_map(vmap))
    # analytic: recompute hit normals in world space, rotate into camera
    H, W = depth.shape
    uu, vv = np.meshgrid(np.arange(W), np.arange(H))
    rays = np.stack(
        [(uu - intr.cx) / intr.fx, (vv - intr.cy) / intr.fy, np.ones_like(uu, np.float64)],
        axis=-1,
    )
    dirs = rays @ T[:3, :3].T
    origins = np.broadcast_to(T[:3, 3], dirs.shape)
    _, _, n_world = seq.scene.raycast(origins, dirs)
    n_cam = n_world @ T[:3, :3]  # R^T n
    valid = np.linalg.norm(n_est, axis=-1) > 0.5
    # ignore pixels near wall seams where the stencil straddles two walls
    interior = np.abs((n_cam * n_est).sum(-1))
    frac_good = (interior[valid] > 0.99).mean()
    assert frac_good > 0.9


def test_transform_maps(rng):
    from densemonoslam_tpu.utils import se3

    intr = CameraIntrinsics(100.0, 100.0, 31.5, 23.5)
    depth = jnp.asarray(rng.uniform(0.5, 3.0, (48, 64)).astype(np.float32))
    depth = depth.at[0:4].set(0.0)
    vmap = geometry.backproject(depth, intr)
    nmap = geometry.normal_map(vmap)
    T = se3.se3_exp(jnp.asarray([0.1, -0.2, 0.05, 0.3, 0.1, -0.2], jnp.float32))
    v2, n2 = geometry.transform_maps(vmap, nmap, T)
    assert np.all(np.asarray(v2)[0:4] == 0.0)
    p = np.asarray(vmap)[20, 20]
    expect = np.asarray(T[:3, :3]) @ p + np.asarray(T[:3, 3])
    np.testing.assert_allclose(np.asarray(v2)[20, 20], expect, atol=1e-5)


def test_bilinear_sample_exact_at_integers(rng):
    img = jnp.asarray(rng.uniform(0, 10, (16, 16)).astype(np.float32))
    u = jnp.array([3.0, 7.0], jnp.float32)
    v = jnp.array([2.0, 9.0], jnp.float32)
    out = geometry.bilinear_sample(img, u, v)
    np.testing.assert_allclose(
        np.asarray(out), [float(img[2, 3]), float(img[9, 7])], atol=1e-5
    )
    # midpoint interpolation
    out2 = geometry.bilinear_sample(img, jnp.array([3.5]), jnp.array([2.0]))
    np.testing.assert_allclose(
        np.asarray(out2)[0], (float(img[2, 3]) + float(img[2, 4])) / 2, atol=1e-5
    )
