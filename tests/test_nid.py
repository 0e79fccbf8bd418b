"""NID histogram + keyframing tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from densemonoslam_tpu.config import EngineConfig
from densemonoslam_tpu.engine import Engine
from densemonoslam_tpu.eval import ate_rmse
from densemonoslam_tpu.io.synthetic import SyntheticSequence
from densemonoslam_tpu.ops import histogram


@pytest.fixture(scope="module")
def seq():
    return SyntheticSequence(num_frames=40, radius=0.35, max_angle=0.3)


def test_nid_identical_is_zero(rng):
    img = jnp.asarray(rng.uniform(0, 255, (64, 64)).astype(np.float32))
    valid = jnp.ones((64, 64), bool)
    assert float(histogram.nid_image(img, img, valid)) < 1e-3


def test_nid_independent_is_high(rng):
    a = jnp.asarray(rng.uniform(0, 255, (64, 64)).astype(np.float32))
    b = jnp.asarray(rng.uniform(0, 255, (64, 64)).astype(np.float32))
    valid = jnp.ones((64, 64), bool)
    assert float(histogram.nid_image(a, b, valid)) > 0.9


def test_nid_monotone_in_noise(rng):
    a = jnp.asarray(rng.uniform(0, 255, (64, 64)).astype(np.float32))
    valid = jnp.ones((64, 64), bool)
    prev = -1.0
    for sigma in [0.0, 10.0, 40.0, 120.0]:
        b = a + jnp.asarray(rng.normal(0, sigma, (64, 64)).astype(np.float32))
        b = jnp.clip(b, 0, 255)
        n = float(histogram.nid_image(a, b, valid))
        assert n >= prev - 0.02, (sigma, n, prev)
        prev = n


def test_nid_depth_scatter_matches_numpy(rng):
    a = rng.uniform(0.1, 3.0, 2000).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.2, 2000).astype(np.float32), 0.01, 2.99)
    valid = rng.uniform(size=2000) > 0.3
    n = float(
        histogram.nid_depth(jnp.asarray(a), jnp.asarray(b), jnp.asarray(valid), 3.0)
    )
    # numpy oracle
    bins = 500
    ia = np.clip((a * bins / 3.0).astype(np.int64), 0, bins - 1)[valid]
    ib = np.clip((b * bins / 3.0).astype(np.int64), 0, bins - 1)[valid]
    joint = np.zeros((bins, bins))
    np.add.at(joint, (ia, ib), 1.0)
    p = joint / joint.sum()
    def H(x):
        x = x[x > 0]
        return -(x * np.log(x)).sum()
    h_ab = H(p.ravel())
    mi = H(p.sum(1)) + H(p.sum(0)) - h_ab
    nid_ref = (h_ab - mi) / h_ab
    np.testing.assert_allclose(n, nid_ref, atol=1e-3)


def test_nid_no_overlap_is_one():
    a = jnp.full((32, 32), 100.0)
    b = jnp.full((32, 32), 100.0)
    valid = jnp.zeros((32, 32), bool)
    assert float(histogram.nid_image(a, b, valid)) == 1.0


def test_engine_nid_keyframing_reduces_fusion(seq):
    """With NID keyframing on, only novel frames fuse: fewer fused frames and
    a smaller map than open-loop always-fuse, at comparable ATE."""
    n = 25
    def run(nid_on):
        cfg = EngineConfig(
            max_surfels=1 << 18,
            depth_cutoff=8.0,
            depth_factor=1.0,
            nid_keyframing=nid_on,
            nid_threshold=0.50,
        )
        eng = Engine(seq.camera, cfg)
        eng.frontend("cam0")
        eng.frontends["cam0"].pose = seq.gt_pose(0).astype(np.float32)
        for i in range(n):
            rgb, depth = seq.frame(i)
            info = eng.process_frame("cam0", rgb, depth, float(i))
            assert info["tracking_ok"] == 1.0
        est = [p for _, p in eng.frontends["cam0"].trajectory]
        gt = [seq.gt_pose(i) for i in range(n)]
        return eng, ate_rmse(est, gt)

    eng_nid, ate_nid = run(True)
    eng_all, ate_all = run(False)
    fe = eng_nid.frontends["cam0"]
    fe.finalize_stats()
    assert fe.stats.frames_fused < n - 2  # gate actually skipped frames
    assert fe.stats.frames_fused >= 2  # but novel views did fuse
    assert fe.num_keyframes == fe.stats.frames_fused
    assert eng_nid.surfel_count("cam0") <= eng_all.surfel_count("cam0")
    # skipping fusion must not blow up tracking accuracy
    assert ate_nid < max(3 * ate_all, 0.02), (ate_nid, ate_all)
    # nid scores were recorded
    scores = [s for s in fe.stats.nid_scores if s > 0]
    assert len(scores) >= n - 2
