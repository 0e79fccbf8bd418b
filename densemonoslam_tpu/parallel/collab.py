"""Collaborative multi-camera SLAM step over a device mesh.

Replaces the reference's collaborative-session machinery — N `Context`s
round-robined through one GPU with LCM transporting frames
(`GUI/src/MainController.cpp:262-400`, `Tools/LcmHandler.h`) — with SPMD:
the camera batch is sharded over the mesh `cam` axis via `shard_map`, each
device tracking and fusing its own camera's stream into its own map shard,
with cross-camera state exchanged by XLA collectives over ICI (here: a
`psum`/`all_gather` of per-camera tracking statistics standing in for the
pose-graph exchange; inter-map loop closures land with the deformation/fern
modules).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from densemonoslam_tpu.config import CameraIntrinsics
from densemonoslam_tpu.mapping import fusion
from densemonoslam_tpu.mapping import surfel_map as sm
from densemonoslam_tpu.ops import geometry, preprocess, splat
from densemonoslam_tpu.tracking import odometry
from densemonoslam_tpu.utils import se3


class CollabState(NamedTuple):
    """Per-camera SLAM state, batched on a leading `cam` axis."""

    map_data: jnp.ndarray  # [B, N+1, 16]
    map_count: jnp.ndarray  # [B]
    poses: jnp.ndarray  # [B, 4, 4]
    tick: jnp.ndarray  # [B]


def init_state(n_cams: int, capacity: int) -> CollabState:
    return CollabState(
        map_data=jnp.zeros((n_cams, capacity + 1, sm.COLS), jnp.float32),
        map_count=jnp.zeros((n_cams,), jnp.int32),
        poses=jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (n_cams, 4, 4)),
        tick=jnp.zeros((n_cams,), jnp.int32),
    )


def _single_camera_step(
    map_data, map_count, pose, tick, rgb, depth, intr: CameraIntrinsics, time_delta: int
):
    """One camera's track+fuse step (unbatched)."""
    H, W, _ = rgb.shape
    depth_m = preprocess.metricise_depth(depth, 1.0, 100.0)
    vmap_f = geometry.backproject(depth_m, intr)
    nmap_f = geometry.normal_map(vmap_f)
    frame_pyr = odometry.build_frame_pyramid(rgb, depth_m, intr, 3)

    pred = splat.render(
        map_data, map_count, pose, intr, W, H, tick,
        time_delta=time_delta, mode=splat.MODE_ACTIVE,
    )
    hole = pred.depth <= 0
    model_int = jnp.where(hole, frame_pyr.intensity[0], pred.intensity)
    model_v = jnp.where(hole[..., None], frame_pyr.vmap[0], pred.vmap)
    model_n = jnp.where(hole[..., None], frame_pyr.nmap[0], pred.nmap)
    model_pyr = odometry.build_model_pyramid(model_int, model_v, model_n, 3)
    # bootstrap: skip tracking while the map is empty
    res = odometry.track(model_pyr, frame_pyr, jnp.eye(4, dtype=jnp.float32), intr)
    A = jnp.where(map_count > 0, res.A, jnp.eye(4, dtype=jnp.float32))
    new_pose = pose @ A

    m = sm.SurfelMap(data=map_data, count=map_count)
    m, fstats = fusion.fuse(
        m, vmap_f, nmap_f, rgb.astype(jnp.float32), new_pose, intr,
        time=tick, time_delta=time_delta,
    )
    stats = jnp.stack(
        [res.icp_error, res.icp_inliers, fstats.matched.astype(jnp.float32),
         fstats.added.astype(jnp.float32)]
    )
    return m.data, m.count, new_pose, tick + 1, stats


def make_collab_step(
    mesh: Mesh, intr: CameraIntrinsics, height: int, width: int, time_delta: int = 200
):
    """Build the jitted SPMD collaborative step for a given mesh.

    Cameras are sharded over the `cam` axis; inside each shard `vmap` handles
    multiple cameras per device.  After the local steps, per-camera stats are
    all-gathered (ICI collective) so every host sees session-wide health —
    the SPMD analogue of the reference's shared stats/GUI state.
    """

    def local(map_data, map_count, poses, tick, rgb, depth):
        step = functools.partial(
            _single_camera_step, intr=intr, time_delta=time_delta
        )
        data, count, new_poses, new_tick, stats = jax.vmap(step)(
            map_data, map_count, poses, tick, rgb, depth
        )
        # session-wide stats over ICI: every camera shard sees the global view
        global_stats = jax.lax.all_gather(stats, "cam", tiled=True)
        # global surfel total (psum over the camera axis)
        total = jax.lax.psum(jnp.sum(count), "cam")
        return data, count, new_poses, new_tick, global_stats, total

    sharded = shard_map(
        local,
        mesh=mesh,
        in_specs=(P("cam"), P("cam"), P("cam"), P("cam"), P("cam"), P("cam")),
        out_specs=(P("cam"), P("cam"), P("cam"), P("cam"), P(), P()),
        check_rep=False,
    )

    @jax.jit
    def step(state: CollabState, rgb_batch: jnp.ndarray, depth_batch: jnp.ndarray):
        data, count, poses, tick, stats, total = sharded(
            state.map_data, state.map_count, state.poses, state.tick,
            rgb_batch, depth_batch,
        )
        return (
            CollabState(map_data=data, map_count=count, poses=poses, tick=tick),
            stats,
            total,
        )

    return step
