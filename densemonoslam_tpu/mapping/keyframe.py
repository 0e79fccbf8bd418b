"""NID keyframes and the fusion gate.

Equivalent of the reference `KeyFrame` (`Core/src/KeyFrame.h:83-172`: snapshot
of the predicted active+inactive composite image/vertex/depth maps at the
keyframe pose) and the NID fuse gate
(`ElasticFusion::fuseFrame`, `ElasticFusion.cpp:639-677`): each frame's NID
against the active keyframe decides whether the frame is novel enough to fuse
into the map; crossing the threshold also promotes the frame to be the new
keyframe.  Score = ndw * NID_depth + (1 - ndw) * NID_img vs threshold 0.85
(`Options.h:71-76`).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from densemonoslam_tpu.config import CameraIntrinsics
from densemonoslam_tpu.ops import geometry, histogram, warp
from densemonoslam_tpu.utils import se3


class KeyFrame(NamedTuple):
    """Snapshot of the view at the keyframe pose."""

    pose: jnp.ndarray  # [4,4] camera-to-world
    intensity: jnp.ndarray  # [H,W] composite (active else inactive)
    depth: jnp.ndarray  # [H,W] composite z-depth


def make_keyframe(
    pose: jnp.ndarray,
    act_intensity: jnp.ndarray,
    act_depth: jnp.ndarray,
    inact_intensity: jnp.ndarray | None = None,
    inact_depth: jnp.ndarray | None = None,
) -> KeyFrame:
    """Composite active-else-inactive maps (reference KeyFrame ctor)."""
    if inact_intensity is None:
        return KeyFrame(pose=pose, intensity=act_intensity, depth=act_depth)
    hole = act_depth <= 0
    return KeyFrame(
        pose=pose,
        intensity=jnp.where(hole, inact_intensity, act_intensity),
        depth=jnp.where(hole, inact_depth, act_depth),
    )


@functools.partial(
    jax.jit, static_argnames=("intr", "bins_img", "bins_depth", "stride")
)
def nid_against_keyframe(
    kf: KeyFrame,
    cur_intensity: jnp.ndarray,
    cur_vmap: jnp.ndarray,  # [H,W,3] current camera-frame vertices
    cur_pose: jnp.ndarray,
    intr: CameraIntrinsics,
    depth_max: float,
    bins_img: int = 64,
    bins_depth: int = 500,
    stride: int = 2,
):
    """Warp the current frame into the keyframe view and compute
    (nid_img, nid_depth, overlap_fraction).

    The reference compares the current tracked frame against the keyframe
    composite via CUDA joint histograms (`MutualInformation.cpp:154-213`);
    geometric registration makes NID measure appearance/depth novelty rather
    than viewpoint offset alone.  Computed on 2x-decimated frames (the
    reference's optional pyramid-down) — the histogram statistics are
    insensitive to it and the warp gathers cost 4x less.
    """
    lv = max(stride.bit_length() - 1, 0)  # stride must be a power of two
    cur_intensity = warp.decimate(cur_intensity, stride)
    cur_vmap = warp.decimate(cur_vmap, stride)
    kf = KeyFrame(
        pose=kf.pose, intensity=warp.decimate(kf.intensity, stride),
        depth=warp.decimate(kf.depth, stride),
    )
    intr = intr.scaled(lv)
    H, W = cur_intensity.shape
    A = se3.se3_inverse(kf.pose) @ cur_pose  # current cam -> kf cam
    p_kf = se3.transform_points(A, cur_vmap.reshape(-1, 3))
    u, v, z = geometry.project(p_kf, intr)
    inb = geometry.in_bounds(u, v, W, H) & (z > 0) & (cur_vmap.reshape(-1, 3)[:, 2] > 0)
    # one packed gather for (intensity, depth): gather cost ~ rows fetched,
    # so two separate narrow samples would cost double
    kf_pack = jnp.stack([kf.intensity, kf.depth], axis=-1).reshape(-1, 2)
    ui = jnp.clip(jnp.round(u).astype(jnp.int32), 0, W - 1)
    vi = jnp.clip(jnp.round(v).astype(jnp.int32), 0, H - 1)
    smp = kf_pack[vi * W + ui]
    i_kf, d_kf = smp[:, 0], smp[:, 1]
    valid = inb & (d_kf > 0)
    n_img = histogram.nid_image(
        cur_intensity.reshape(-1), i_kf, valid, bins=bins_img
    )
    n_depth = histogram.nid_depth(z, d_kf, valid, depth_max, bins=bins_depth)
    overlap = jnp.mean(valid.astype(jnp.float32))
    return n_img, n_depth, overlap


def nid_score(
    n_img: jnp.ndarray, n_depth: jnp.ndarray, depth_weight: float
) -> jnp.ndarray:
    """Combined score (reference `ElasticFusion.cpp:657-673`)."""
    return depth_weight * n_depth + (1.0 - depth_weight) * n_img
