"""Collective (SPMD) inter-map closures on the virtual CPU mesh (VERDICT r3
missing #3, BASELINE config 5): two cameras start in SEPARATE maps on
separate devices, observe overlapping parts of the same scene, and the
collective inter-map round (`parallel.intermap`) must recognise the overlap
through the on-device fern DBs, verify it geometrically against a served
render, and rigidly fold one map into the other's frame — all decisions
replicated on-mesh, no host arbitration.

Reference: `ReferenceFrame::resolveRelativeTransformationFern` +
`consumeReferenceFrame` (`Core/src/ReferenceFrame.h:34-150`).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from densemonoslam_tpu.config import EngineConfig
from densemonoslam_tpu.io.synthetic import SyntheticSequence
from densemonoslam_tpu.parallel import collab, intermap
from densemonoslam_tpu.parallel.mesh import make_mesh


N_FRAMES = 16
OFFSET = 6  # camera 1 starts 6 orbit frames ahead: strong view overlap


@pytest.fixture(scope="module")
def session():
    # 40-frame orbit: inter-frame motion stays small enough for the dense
    # tracker to keep each camera's OWN map tight, so the merge-transform
    # assertion measures the inter-map resolution, not odometry drift
    seq = SyntheticSequence(num_frames=40, radius=0.3, max_angle=0.25)
    cfg = EngineConfig(
        max_surfels=1 << 16, depth_cutoff=8.0, depth_factor=1.0,
        nid_keyframing=False, open_loop=True, time_delta=200,
        max_depth=8.0,
    )
    H = seq.camera.resolution.height
    W = seq.camera.resolution.width
    mesh = make_mesh(n_cams=2, n_map=1, devices=jax.devices()[:2])
    step = collab.make_collab_step(mesh, seq.camera.intrinsics, H, W, cfg)
    state = collab.init_state(2, cfg.max_surfels, H, W)
    # each camera sees the scene from its own start; poses start identity in
    # each camera's OWN map frame (the collaborative cold start)
    for i in range(N_FRAMES):
        rgb = np.stack([seq.frame(i)[0], seq.frame(i + OFFSET)[0]])
        dep = np.stack([seq.frame(i)[1], seq.frame(i + OFFSET)[1]])
        state, stats, total = step(
            state, jnp.asarray(rgb), jnp.asarray(dep)
        )
    return seq, cfg, mesh, step, state


def test_collective_intermap_merges_maps(session):
    seq, cfg, mesh, step, state = session
    H = seq.camera.resolution.height
    W = seq.camera.resolution.width
    round_fn = intermap.make_intermap_round(
        mesh, seq.camera.intrinsics, H, W, cfg,
        verify_scale=2, fern_factor=4,
    )
    ist = intermap.init_state(2, num_ferns=cfg.num_ferns)
    assert list(np.asarray(ist.map_id)) == [0, 1]

    # the session keeps RUNNING while inter-map rounds fire at a cadence
    # (keyframe poses must match the frames they encode)
    merged = False
    info = None
    last_i = N_FRAMES - 1
    for i in range(N_FRAMES, N_FRAMES + 14):
        rgb = np.stack([seq.frame(i)[0], seq.frame(i + OFFSET)[0]])
        dep = np.stack([seq.frame(i)[1], seq.frame(i + OFFSET)[1]])
        state, stats, total = step(
            state, jnp.asarray(rgb), jnp.asarray(dep)
        )
        state, ist, info = round_fn(
            state, ist, jnp.asarray(rgb), jnp.asarray(dep)
        )
        last_i = i
        if bool(info.merged):
            merged = True
            break
    assert merged, "inter-map round never merged the maps"

    # both cameras now live in ONE map
    ids = np.asarray(info.map_ids)
    assert ids[0] == ids[1]

    # geometric consistency: camera c's map frame is P_start(c)^-1 @ world,
    # so the true transform from map(src) to map(dst) is
    # P_start(dst)^-1 @ P_start(src).  The applied T must match it.
    req = int(info.requester)
    tgt = int(info.target)
    starts = {0: seq.gt_pose(0), 1: seq.gt_pose(OFFSET)}
    T_true = np.linalg.inv(starts[tgt]) @ starts[req]
    T_applied = np.asarray(info.T[req])
    terr = np.linalg.norm(T_applied[:3, 3] - T_true[:3, 3])
    Rerr = np.arccos(
        np.clip(
            (np.trace(T_applied[:3, :3] @ T_true[:3, :3].T) - 1) / 2, -1, 1
        )
    )
    # tolerance absorbs each map's own odometric drift (the transform is
    # estimated between the DRIFTED maps, which is the correct answer)
    assert terr < 0.12, (terr, T_applied, T_true)
    assert Rerr < 0.1, Rerr

    # the source camera's surfels moved into the destination frame: its pose
    # expressed in the merged frame matches ground truth relative geometry
    poses = np.asarray(
        jax.tree.map(lambda v: v, state.pose)
    )  # [2, 4, 4]
    # both poses now live in map(dst)'s frame = P_start(dst)^-1 world
    P_dst = starts[tgt]
    for c in (0, 1):
        gt_world = seq.gt_pose(last_i + (OFFSET if c == 1 else 0))
        expect = np.linalg.inv(P_dst) @ gt_world
        err = np.linalg.norm(poses[c][:3, 3] - expect[:3, 3])
        assert err < 0.2, (c, err)


def test_collective_intermap_consume(session):
    """`consume=True` physically moves the source camera's rows to the
    destination device (the reference's consumeReferenceFrame semantics)."""
    seq, cfg, mesh, step, state = session
    H = seq.camera.resolution.height
    W = seq.camera.resolution.width
    round_fn = intermap.make_intermap_round(
        mesh, seq.camera.intrinsics, H, W, cfg,
        verify_scale=2, fern_factor=4, consume=True,
    )
    ist = intermap.init_state(2, num_ferns=cfg.num_ferns)
    counts0 = np.asarray(
        jax.jit(lambda s: s.map_count)(state)
    )
    merged = False
    for i in range(N_FRAMES, N_FRAMES + 14):
        rgb = np.stack([seq.frame(i)[0], seq.frame(i + OFFSET)[0]])
        dep = np.stack([seq.frame(i)[1], seq.frame(i + OFFSET)[1]])
        state, stats, total = step(
            state, jnp.asarray(rgb), jnp.asarray(dep)
        )
        state, ist, info = round_fn(
            state, ist, jnp.asarray(rgb), jnp.asarray(dep)
        )
        if bool(info.merged):
            merged = True
            break
    assert merged
    req, tgt = int(info.requester), int(info.target)
    counts = np.asarray(state.map_count)
    assert counts[req] == 0  # source emptied
    assert counts[tgt] >= counts0[tgt]  # destination absorbed rows
