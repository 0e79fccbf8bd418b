"""Inter-map (collaborative) merge tests: two cameras with independent world
frames discover shared territory via ferns and their maps merge — the
reference's `resolveRelativeTransformationFern` + `consumeReferenceFrame`
path (BASELINE config 5 semantics on one host)."""

import jax.numpy as jnp
import numpy as np
import pytest

from densemonoslam_tpu.config import EngineConfig
from densemonoslam_tpu.engine import Engine
from densemonoslam_tpu.io.synthetic import SyntheticSequence
from densemonoslam_tpu.mapping import surfel_map as sm


@pytest.fixture(scope="module")
def seq():
    return SyntheticSequence(num_frames=40, radius=0.35, max_angle=0.3)


def _offset():
    """camB's private world frame differs from camA's by this transform."""
    T = np.eye(4, dtype=np.float32)
    c, s = np.cos(0.4), np.sin(0.4)
    T[:3, :3] = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
    T[:3, 3] = [1.0, 0.3, -0.5]
    return T


def test_intermap_merge(seq):
    cfg = EngineConfig(
        max_surfels=1 << 17,
        depth_cutoff=8.0,
        depth_factor=1.0,
        nid_keyframing=False,
        open_loop=False,
        loop_check_interval=4,
        time_delta=500,  # no local loops; this test is about inter-map
        confidence_threshold=1.0,
    )
    eng = Engine(seq.camera, cfg)
    eng.frontend("camA")
    eng.frontend("camB")
    off = _offset()
    eng.frontends["camA"].pose = seq.gt_pose(0).astype(np.float32)
    eng.frontends["camB"].pose = (off @ seq.gt_pose(6)).astype(np.float32)

    merged_at = None
    for k in range(14):
        ia, ib = k, 6 + k
        rgb, depth = seq.frame(ia)
        eng.process_frame(
            "camA", rgb, depth, float(ia), in_pose=seq.gt_pose(ia).astype(np.float32)
        )
        if len(eng.maps) == 1:
            merged_at = merged_at or ("A", k)
            break
        rgb, depth = seq.frame(ib)
        eng.process_frame(
            "camB", rgb, depth, float(ib),
            in_pose=(off @ seq.gt_pose(ib)).astype(np.float32),
        )
        if len(eng.maps) == 1:
            merged_at = merged_at or ("B", k)
            break

    assert merged_at is not None, "maps never merged"
    assert len(eng.maps) == 1
    feA, feB = eng.frontends["camA"], eng.frontends["camB"]
    assert feA.map_name == feB.map_name

    # relative pose between the two cameras must be frame-independent correct
    # (both views of the same instant k): compare against GT relative pose
    ("A" if merged_at[0] == "A" else "B")
    poseA = np.asarray(feA.state.pose)
    poseB = np.asarray(feB.state.pose)
    # last processed frames: camA at ia, camB at ib (or ib-1 if A broke first)
    last_a = merged_at[1]
    last_b = 6 + merged_at[1] - (1 if merged_at[0] == "A" else 0)
    rel_est = np.linalg.inv(poseA) @ poseB
    rel_gt = np.linalg.inv(seq.gt_pose(last_a)) @ seq.gt_pose(last_b)
    d = np.linalg.inv(rel_est) @ rel_gt
    terr = np.linalg.norm(d[:3, 3])
    rerr = np.arccos(np.clip((np.trace(d[:3, :3]) - 1) / 2, -1, 1))
    assert terr < 0.05, terr
    assert rerr < 0.05, rerr

    # merged map geometry is consistent: surfels lie on the analytic scene
    # after mapping back into camA's GT world frame
    m = eng.map_of(feA.map_name)
    snap = sm.snapshot(m)
    p = snap.positions
    # determine the surviving frame: if camA kept its pose ~GT, map is in W
    if np.linalg.norm(poseA[:3, 3] - seq.gt_pose(last_a)[:3, 3]) < 0.1:
        p_w = p
    else:
        inv = np.linalg.inv(off)
        p_w = (inv[:3, :3] @ p.T).T + inv[:3, 3]
    lo, hi = seq.scene.lo, seq.scene.hi
    on_wall = np.min(np.minimum(np.abs(p_w - lo), np.abs(p_w - hi)), axis=1)
    on_sphere = np.min(
        np.abs(
            np.linalg.norm(p_w[:, None, :] - seq.scene.sphere_c[None], axis=-1)
            - seq.scene.sphere_r[None]
        ),
        axis=1,
    )
    d_surf = np.minimum(on_wall, on_sphere)
    assert np.median(d_surf) < 0.02, np.median(d_surf)


def test_merge_maps_transform_correct(seq):
    """Unit check of merge_maps: rows land transformed; the deformation
    graph's node sampling stays time-consistent WITHOUT a full-map re-sort
    (merge_maps no longer argsorts the whole capacity — hostile at 32M rows;
    `deformation.sample_graph` sorts its sampled nodes instead)."""
    from densemonoslam_tpu import loops

    rng = np.random.default_rng(0)
    capB, capA = 1 << 12, 1 << 10
    data_b = np.zeros((capB + 1, 16), np.float32)
    nb = 100
    data_b[:nb, 0:3] = rng.normal(0, 1, (nb, 3))
    data_b[:nb, sm.CONF] = 5.0
    data_b[:nb, sm.INIT_TIME] = np.arange(nb)

    data_a = np.zeros((capA + 1, 16), np.float32)
    na = 60
    data_a[:na, 0:3] = rng.normal(0, 1, (na, 3))
    data_a[:na, 8] = 1.0  # normal +x
    data_a[:na, sm.CONF] = 3.0
    data_a[:na, sm.INIT_TIME] = np.arange(na) + 50  # interleaves with B's times

    T = _offset()
    data, count, _dropped = loops.merge_maps(
        jnp.asarray(data_b), jnp.asarray(nb, jnp.int32),
        jnp.asarray(data_a), jnp.asarray(na, jnp.int32),
        jnp.asarray(T),
    )
    assert int(count) == nb + na
    out = np.asarray(data)[: nb + na]
    # rows need NOT be time-sorted any more, but the deformation graph
    # sampled from the merged map must still have time-sorted nodes (that is
    # what `_blend_weights`' searchsorted relies on)
    from densemonoslam_tpu.mapping import deformation as dg

    g = dg.sample_graph(data, count, max_nodes=64, sample_rate=2)
    g_times = np.asarray(g.time)[np.asarray(g.valid)]
    assert np.all(np.diff(g_times) >= 0)
    # A's rows transformed: find rows with conf==3
    a_rows = out[out[:, sm.CONF] == 3.0]
    assert a_rows.shape[0] == na
    expect = (T[:3, :3] @ data_a[:na, 0:3].T).T + T[:3, 3]
    got = a_rows[np.argsort(a_rows[:, sm.INIT_TIME])][:, 0:3]
    np.testing.assert_allclose(
        np.sort(got, axis=0), np.sort(expect, axis=0), atol=1e-5
    )
    # normals rotated
    nrm = a_rows[0, 8:11]
    np.testing.assert_allclose(nrm, T[:3, 0], atol=1e-5)
