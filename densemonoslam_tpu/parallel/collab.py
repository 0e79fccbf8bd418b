"""Collaborative multi-camera SLAM step over a device mesh.

Replaces the reference's collaborative-session machinery — N `Context`s
round-robined through one GPU with LCM transporting frames
(`GUI/src/MainController.cpp:262-400`, `Tools/LcmHandler.h`) — with SPMD:
one camera per device on the mesh `cam` axis (the BASELINE "one camera
stream per host" layout), each device running the FULL fused per-frame step
(`step.make_step`: preprocess, predict, track, NID gate, fuse, clean) on its
own camera and map shard.  Because each shard processes exactly one camera,
the step's `lax.cond` fusion branch stays a real branch (vmapping it would
degrade to a both-sides select).

Cross-camera state rides ICI collectives: per-camera stats are all-gathered
so every host sees session health, and the global surfel total is a psum —
the SPMD analogue of the reference's shared stats/GUI state.  Inter-map loop
closures and merges use the host-side machinery in `densemonoslam_tpu.loops`.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from densemonoslam_tpu import step as stepmod
from densemonoslam_tpu.config import CameraIntrinsics, EngineConfig
from densemonoslam_tpu.mapping import surfel_map as sm


class CollabState(NamedTuple):
    """Per-camera SLAM state batched on a leading `cam` axis (the batched
    twin of `step.SlamState`)."""

    map_data: jnp.ndarray  # [B, N+1, 16]
    map_count: jnp.ndarray  # [B]
    pose: jnp.ndarray  # [B, 4, 4]
    tick: jnp.ndarray  # [B]
    kf_pose: jnp.ndarray  # [B, 4, 4]
    kf_intensity: jnp.ndarray  # [B, H, W]
    kf_depth: jnp.ndarray  # [B, H, W]
    kf_count: jnp.ndarray  # [B]


def init_state(n_cams: int, capacity: int, height: int, width: int) -> CollabState:
    one = stepmod.init_state(capacity, height, width)
    return CollabState(
        **{
            k: jnp.broadcast_to(v, (n_cams,) + v.shape)
            for k, v in one._asdict().items()
        }
    )


def make_collab_step(
    mesh: Mesh,
    intr: CameraIntrinsics,
    height: int,
    width: int,
    config: EngineConfig | None = None,
):
    """Build the jitted SPMD collaborative step (one camera per device)."""
    cfg = config or EngineConfig(
        max_surfels=1 << 14, depth_cutoff=100.0, depth_factor=1.0,
        nid_keyframing=False, open_loop=True,
    )
    step = stepmod.make_step(intr, height, width, cfg)

    def local(md, mc, pose, tick, kfp, kfi, kfd, kfc, rgb, depth):
        # each shard holds exactly one camera: drop the leading axis
        state = stepmod.SlamState(
            map_data=md[0], map_count=mc[0], pose=pose[0], tick=tick[0],
            kf_pose=kfp[0], kf_intensity=kfi[0], kf_depth=kfd[0],
            kf_count=kfc[0],
        )
        new_state, stats = step(
            state, rgb[0], depth[0],
            jnp.eye(4, dtype=jnp.float32), jnp.asarray(False),
            jnp.asarray(1.0, jnp.float32),
        )
        # session-wide views over ICI
        global_stats = jax.lax.all_gather(stats, "cam")
        total = jax.lax.psum(new_state.map_count, "cam")
        out = tuple(v[None] for v in new_state)
        return out + (global_stats, total)

    sharded = shard_map(
        local,
        mesh=mesh,
        in_specs=(P("cam"),) * 10,
        out_specs=(P("cam"),) * 8 + (P(), P()),
        check_rep=False,
    )

    @jax.jit
    def collab_step(state: CollabState, rgb_batch: jnp.ndarray, depth_batch: jnp.ndarray):
        out = sharded(*state, rgb_batch, depth_batch)
        new_state = CollabState(*out[:8])
        return new_state, out[8], out[9]

    return collab_step
