"""The fused per-frame SLAM step: one jitted device function per camera tick.

This is the TPU-native answer to the reference's `processFrame` state machine
(`Core/src/ElasticFusion.cpp:99-637`): where the reference interleaves GPU
kernels with host logic every frame (texture uploads, 29-float reduction
downloads, Eigen solves, GUI state), here the ENTIRE per-frame pipeline —
preprocess, model prediction, fill-in, SO3+ICP+RGB tracking, the NID fuse
gate, fusion, cleaning, keyframe promotion — is a single jitted function over
a device-resident `SlamState`.  The host feeds frames and receives a small
stats vector + pose without ever blocking mid-sequence (JAX async dispatch
pipelines the whole run; crucial when the chip sits behind a network tunnel).

Data-dependent decisions (fuse or not, tracking failed, bootstrap) are
`lax.cond`/`jnp.where` branches on device — the reference's host `if`s.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from densemonoslam_tpu.config import CameraIntrinsics, EngineConfig
from densemonoslam_tpu.mapping import fusion, keyframe as kfmod
from densemonoslam_tpu.mapping import surfel_map as sm
from densemonoslam_tpu.ops import geometry, preprocess, splat
from densemonoslam_tpu.tracking import odometry
from densemonoslam_tpu.utils import se3


class SlamState(NamedTuple):
    """Device-resident per-camera SLAM state."""

    map_data: jnp.ndarray  # [N+1, 16]
    map_count: jnp.ndarray  # [] i32
    pose: jnp.ndarray  # [4,4] camera-to-world
    tick: jnp.ndarray  # [] i32
    kf_pose: jnp.ndarray  # [4,4]
    kf_intensity: jnp.ndarray  # [H,W]
    kf_depth: jnp.ndarray  # [H,W]
    kf_count: jnp.ndarray  # [] i32 number of keyframes so far (0 = none yet)
    # stored map prediction (last ACTIVE-mode render, reference predict,
    # `ElasticFusion.cpp:586,688-746`).  Each frame composites it with its own
    # live data (FillIn) and tracks against the result WITHOUT re-rendering
    # the map; the render refreshes on fusion / large motion / age (see
    # `make_step`).  Camera-frame maps at `model_pose`.
    pred_intensity: jnp.ndarray  # [H,W]
    pred_vmap: jnp.ndarray  # [H,W,3]
    pred_nmap: jnp.ndarray  # [H,W,3]
    pred_depth: jnp.ndarray  # [H,W] (0 = hole)
    model_pose: jnp.ndarray  # [4,4] render pose of the stored prediction
    model_rel: jnp.ndarray  # [4,4] pose relative to model_pose (tracked
    # incrementally so the GN warm start is EXACTLY identity right after a
    # refresh — recomputing inv(model_pose) @ pose would inject float noise)
    model_age: jnp.ndarray  # [] i32 frames since refresh (big = invalid)


# stats vector layout (host-side decoding)
STAT_TRACK_OK = 0
STAT_ICP_ERR = 1
STAT_ICP_INL = 2
STAT_RGB_ERR = 3
STAT_NID = 4
STAT_FUSED = 5
STAT_MATCHED = 6
STAT_ADDED = 7
STAT_CULLED = 8
STAT_SURFELS = 9
STAT_KEYFRAMES = 10
N_STATS = 12


MODEL_INVALID_AGE = 1 << 20  # marks the stored model as unusable


def init_state(
    capacity: int, height: int, width: int, levels: int = 3
) -> SlamState:
    del levels  # kept for call-site compatibility
    return SlamState(
        map_data=jnp.zeros((capacity + 1, sm.COLS), jnp.float32),
        map_count=jnp.array(0, jnp.int32),
        pose=jnp.eye(4, dtype=jnp.float32),
        tick=jnp.array(0, jnp.int32),
        kf_pose=jnp.eye(4, dtype=jnp.float32),
        kf_intensity=jnp.zeros((height, width), jnp.float32),
        kf_depth=jnp.zeros((height, width), jnp.float32),
        kf_count=jnp.array(0, jnp.int32),
        pred_intensity=jnp.zeros((height, width), jnp.float32),
        pred_vmap=jnp.zeros((height, width, 3), jnp.float32),
        pred_nmap=jnp.zeros((height, width, 3), jnp.float32),
        pred_depth=jnp.zeros((height, width), jnp.float32),
        model_pose=jnp.eye(4, dtype=jnp.float32),
        model_rel=jnp.eye(4, dtype=jnp.float32),
        model_age=jnp.array(MODEL_INVALID_AGE, jnp.int32),
    )


def make_step(
    intr: CameraIntrinsics,
    height: int,
    width: int,
    config: EngineConfig,
    sensor: int = 0,
):
    """Build the jitted per-frame step for a camera geometry + config."""
    cfg = config
    levels = cfg.pyramid_levels
    iterations = cfg.iterations_for_levels()
    # hot ACTIVE-mode passes stream only the active tail block
    win = cfg.active_window if cfg.active_window < cfg.max_surfels else 0

    def step(
        state: SlamState,
        rgb: jnp.ndarray,  # [H,W,3] u8/f32
        depth_raw: jnp.ndarray,  # [H,W] raw units
        in_pose: jnp.ndarray,  # [4,4] external pose (GT/ORB), identity if unused
        use_in_pose: jnp.ndarray,  # [] bool
        weight_mult: jnp.ndarray,  # [] f32
        cluster_id: jnp.ndarray = jnp.float32(0.0),  # [] per-frame cluster
    ) -> Tuple[SlamState, jnp.ndarray]:
        t_now = state.tick
        # ---------------- preprocess ----------------------------------
        depth_m = preprocess.metricise_depth(
            depth_raw, cfg.depth_factor, cfg.depth_cutoff
        )
        depth_f = preprocess.bilateral_filter_depth(depth_m)
        vmap_f = geometry.backproject(depth_m, intr)
        nmap_f = geometry.normal_map(vmap_f)
        if cfg.icl_nuim:
            nmap_f = -nmap_f
        intensity = preprocess.rgb_to_intensity(rgb)
        frame_pyr = odometry.build_frame_pyramid(rgb, depth_f, intr, levels)

        first = state.map_count == 0

        # ---------------- track against the stored prediction ----------
        # FillIn composite (reference `FillIn::image/vertex/normal`): holes in
        # the stored prediction take the live frame's data, exactly as the
        # reference composites predicted model maps with the raw frame before
        # tracking.  A_init warm-starts GN at the previous frame's pose
        # relative to the prediction's render pose.
        hole = state.pred_depth <= 0
        # The stored prediction lives in `model_pose`'s camera frame, but the
        # live frame's vertices/normals live in the CURRENT camera frame.
        # Composite them through the warm-start `model_rel` (prev-frame cam ->
        # model cam) so hole pixels have ~zero residual at A = model_rel, not
        # at A = identity — otherwise hole-filled rows bias GN toward the
        # stale render pose (up to model_trans_delta over model_max_age
        # frames).  The residual bias left is one frame of motion, matching
        # the reference's per-frame re-render + composite.
        frame_ok = frame_pyr.vmap[0][..., 2] > 0
        v_in_model = (
            jnp.einsum("ij,hwj->hwi", state.model_rel[:3, :3], frame_pyr.vmap[0])
            + state.model_rel[:3, 3]
        )
        n_in_model = jnp.einsum(
            "ij,hwj->hwi", state.model_rel[:3, :3], frame_pyr.nmap[0]
        )
        take = (hole & frame_ok)[..., None]
        filled_int = jnp.where(hole, intensity, state.pred_intensity)
        filled_v = jnp.where(take, v_in_model, state.pred_vmap)
        filled_n = jnp.where(take, n_in_model, state.pred_nmap)
        model_pyr = odometry.build_model_pyramid(
            filled_int, filled_v, filled_n, levels
        )
        A_init = state.model_rel
        res = odometry.track(
            model_pyr, frame_pyr, A_init,
            intr,
            iterations=iterations,
            icp_weight=cfg.icp_weight,
            rgb_only=cfg.rgb_only,
            pyramid=cfg.pyramid,
            use_so3=cfg.so3,
            row_stride=cfg.track_row_stride,
        )
        tracked_pose = state.model_pose @ res.A
        tracking_ok = ~res.failed & (state.model_age < MODEL_INVALID_AGE)
        new_pose = jnp.where(first | ~tracking_ok, state.pose, tracked_pose)
        new_pose = jnp.where(use_in_pose, in_pose, new_pose)
        ok = first | tracking_ok | use_in_pose
        # velocity-based fusion weighting (reference ElasticFusion.cpp:252-268)
        vel = jnp.linalg.norm(new_pose[:3, 3] - state.pose[:3, 3])
        weight_mult = weight_mult * jnp.clip(1.0 - vel / 0.3, 0.25, 1.0)

        # ---------------- NID fuse gate -------------------------------
        if cfg.nid_keyframing:
            n_img, n_depth, overlap = kfmod.nid_against_keyframe(
                kfmod.KeyFrame(
                    pose=state.kf_pose,
                    intensity=state.kf_intensity,
                    depth=state.kf_depth,
                ),
                intensity, vmap_f, new_pose, intr,
                depth_max=cfg.depth_cutoff,
                bins_img=cfg.nid_bins_img,
                bins_depth=cfg.nid_bins_depth,
                stride=cfg.nid_stride,
            )
            nid = kfmod.nid_score(n_img, n_depth, cfg.nid_depth_weight)
            novel = (nid > cfg.nid_threshold) | (overlap < 0.1)
            do_fuse = ok & (first | (state.kf_count == 0) | novel)
        else:
            nid = jnp.array(0.0, jnp.float32)
            do_fuse = ok

        # ---------------- render + fuse + clean (conditional) ----------
        # One ACTIVE-mode render serves association AND refreshes the stored
        # tracking model (its fill-in composite); it only runs when fusing,
        # after large motion, or when the model ages out — most frames skip
        # the map pass entirely (the map did not change and the view barely
        # moved, so the stored model is still the correct tracking target).
        d_pose = jnp.where(
            use_in_pose,
            se3.se3_inverse(state.model_pose) @ new_pose,
            jnp.where(tracking_ok & ~first, res.A, state.model_rel),
        )
        trans_delta = jnp.linalg.norm(d_pose[:3, 3])
        rot_delta = jnp.arccos(
            jnp.clip((jnp.trace(d_pose[:3, :3]) - 1.0) * 0.5, -1.0, 1.0)
        )
        need_render = (
            first
            | do_fuse
            | (trans_delta > cfg.model_trans_delta)
            | (rot_delta > cfg.model_rot_delta)
            | (state.model_age + 1 >= cfg.model_max_age)
        )

        def render_branch(operand):
            data, count = operand
            pred = splat.render(
                data, count, new_pose, intr, width, height, t_now,
                time_delta=cfg.time_delta, mode=splat.MODE_ACTIVE, window=win,
            )

            def fuse_br(op2):
                d2, c2 = op2
                m = sm.SurfelMap(data=d2, count=c2)
                m, fstats = fusion.fuse_with_pred(
                    m, pred, vmap_f, nmap_f, rgb.astype(jnp.float32),
                    new_pose, intr, time=t_now, sensor=sensor,
                    weight_mult=weight_mult, window=win,
                    clean_depth=depth_m,  # inline copy_unstable cull
                    conf_threshold=cfg.confidence_threshold,
                    time_delta=cfg.time_delta,
                    cluster_id=cluster_id,
                )
                return m.data, m.count, fstats.matched, fstats.added, fstats.culled

            def skip_br(op2):
                d2, c2 = op2
                zero = jnp.array(0, jnp.int32)
                return d2, c2, zero, zero, zero

            data, count, matched, added, culled = jax.lax.cond(
                do_fuse, fuse_br, skip_br, (data, count)
            )
            # store the refreshed prediction.  When fused, compositing with
            # the live frame approximates the post-fuse map render: matched
            # pixels moved toward the frame measurement and unmatched valid
            # pixels became new surfels at exactly the frame vertices — so
            # prefer the frame where the pre-fuse prediction has holes.
            p_hole = pred.depth <= 0
            frame_valid = frame_pyr.vmap[0][..., 2] > 0
            take_frame = p_hole & frame_valid & do_fuse
            pi = jnp.where(take_frame, intensity, pred.intensity)
            pv = jnp.where(take_frame[..., None], frame_pyr.vmap[0], pred.vmap)
            pn = jnp.where(take_frame[..., None], frame_pyr.nmap[0], pred.nmap)
            pd = jnp.where(take_frame, frame_pyr.vmap[0][..., 2], pred.depth)
            return (
                data, count, matched, added, culled, pi, pv, pn, pd,
                new_pose, jnp.array(0, jnp.int32),
            )

        def keep_branch(operand):
            data, count = operand
            zero = jnp.array(0, jnp.int32)
            return (
                data, count, zero, zero, zero, state.pred_intensity,
                state.pred_vmap, state.pred_nmap, state.pred_depth,
                state.model_pose, state.model_age + 1,
            )

        (
            data, count, matched, added, culled, pred_int, pred_v, pred_n,
            pred_d, model_pose, model_age,
        ) = jax.lax.cond(
            need_render, render_branch, keep_branch,
            (state.map_data, state.map_count),
        )
        model_rel = jnp.where(
            need_render, jnp.eye(4, dtype=jnp.float32), d_pose
        )

        # keyframe promotion on fuse
        kf_pose = jnp.where(do_fuse, new_pose, state.kf_pose)
        kf_int = jnp.where(do_fuse, intensity, state.kf_intensity)
        kf_dep = jnp.where(do_fuse, depth_m, state.kf_depth)
        kf_count = state.kf_count + do_fuse.astype(jnp.int32)

        new_state = SlamState(
            map_data=data,
            map_count=count,
            pose=new_pose,
            tick=t_now + 1,
            kf_pose=kf_pose,
            kf_intensity=kf_int,
            kf_depth=kf_dep,
            kf_count=kf_count,
            pred_intensity=pred_int,
            pred_vmap=pred_v,
            pred_nmap=pred_n,
            pred_depth=pred_d,
            model_pose=model_pose,
            model_rel=model_rel,
            model_age=model_age,
        )
        stats = jnp.zeros((N_STATS,), jnp.float32)
        stats = stats.at[STAT_TRACK_OK].set(ok.astype(jnp.float32))
        stats = stats.at[STAT_ICP_ERR].set(res.icp_error)
        stats = stats.at[STAT_ICP_INL].set(res.icp_inliers)
        stats = stats.at[STAT_RGB_ERR].set(res.rgb_error)
        stats = stats.at[STAT_NID].set(nid)
        stats = stats.at[STAT_FUSED].set(do_fuse.astype(jnp.float32))
        stats = stats.at[STAT_MATCHED].set(matched.astype(jnp.float32))
        stats = stats.at[STAT_ADDED].set(added.astype(jnp.float32))
        stats = stats.at[STAT_CULLED].set(culled.astype(jnp.float32))
        stats = stats.at[STAT_SURFELS].set(count.astype(jnp.float32))
        stats = stats.at[STAT_KEYFRAMES].set(kf_count.astype(jnp.float32))
        return new_state, stats

    return jax.jit(step, donate_argnums=(0,))
