"""Sparse ORB-style feature tracker: FAST corners + oriented BRIEF +
Hamming matching + motion-only pose optimisation + keyframe loop detection.

The reference outsources sparse tracking to ORB-SLAM3 (git submodule; consumed
through `System::TrackRGBD`, `GetLastPose`, and
`loopClosing()->getLoopClosureCandidate()` — `GUI/src/MainController.cpp:
131-135,327-371`).  This module provides the equivalent capability surface the
hybrid pipeline needs — a pose per frame and loop-closure pose pairs — built
TPU-first:

- **FAST-9/16 detection** is fully dense: the 16 Bresenham-circle taps are
  static shifts, the >=9-contiguous test is 16-bit mask rotation arithmetic,
  non-max suppression is a shifted max — no data-dependent control flow;
- **orientation** (intensity centroid) comes from dense moment maps;
- **BRIEF-256** is steered by the corner orientation and sampled with one
  fused gather per frame;
- **matching** is a dense Hamming matrix via XOR + `population_count` with
  mutual-best + ratio gating;
- **pose** is motion-only Gauss-Newton on 3D->2D reprojection errors with a
  Huber weight, using the same Gram-matrix normal-equation trick as the dense
  tracker (`ops.reductions`).

Configuration mirrors the reference's ORB yaml (2000 features, 8 levels,
scale 1.2, FAST threshold 20/7 — `logs/kitti/KITTI_RGBD_template_params.yaml`);
we default to a single detection scale with per-octave redetection left to the
caller, which is sufficient for the hybrid path's video-rate baselines.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from densemonoslam_tpu.config import CameraIntrinsics
from densemonoslam_tpu.ops import warp
from densemonoslam_tpu.utils import se3

FAST_THRESHOLD = 20.0  # reference yaml iniThFAST
FAST_THRESHOLD_MIN = 7.0  # reference yaml minThFAST (fallback)
MIN_CORNERS = 80  # redetect at the low threshold below this
FAST_ARC = 9
MAX_KEYPOINTS = 512
DESC_WORDS = 8  # 256 bits as 8 x uint32
MATCH_MAX_DIST = 64  # Hamming acceptance
MATCH_RATIO = 0.9  # best/second-best gate

# Bresenham circle of radius 3 (the 16 FAST taps, standard order)
_CIRCLE = np.array(
    [
        (0, 3), (1, 3), (2, 2), (3, 1), (3, 0), (3, -1), (2, -2), (1, -3),
        (0, -3), (-1, -3), (-2, -2), (-3, -1), (-3, 0), (-3, 1), (-2, 2), (-1, 3),
    ],
    dtype=np.int32,
)  # (dy, dx)


def _brief_pattern(seed: int = 7, n: int = 256, radius: int = 13) -> np.ndarray:
    """Random BRIEF test pairs ~N(0, (radius/2)^2), clipped (the classic
    BRIEF-256 generator)."""
    rng = np.random.default_rng(seed)
    pts = np.clip(
        rng.normal(0.0, radius / 2.0, (n, 2, 2)), -radius, radius
    )
    return pts.astype(np.float32)  # [256, 2 (pair), 2 (y,x)]


_PATTERN = _brief_pattern()


class Keypoints(NamedTuple):
    uv: jnp.ndarray  # [K, 2] float pixel coords (x, y)
    score: jnp.ndarray  # [K] FAST score
    angle: jnp.ndarray  # [K] orientation (radians)
    desc: jnp.ndarray  # [K, 8] uint32 BRIEF-256
    depth: jnp.ndarray  # [K] metric depth at the corner (0 = unknown)
    valid: jnp.ndarray  # [K] bool


@functools.partial(jax.jit, static_argnames=("max_kp",))
def detect_and_describe(
    intensity: jnp.ndarray,  # [H, W] f32 0..255
    depth: jnp.ndarray,  # [H, W] metric (0 invalid)
    threshold: float = FAST_THRESHOLD,
    max_kp: int = MAX_KEYPOINTS,
) -> Keypoints:
    """Dense FAST-9 + orientation + steered BRIEF for one frame."""
    H, W = intensity.shape

    # --- FAST-9/16: dense circle comparisons + mask-rotation arc test ------
    center = intensity
    brighter = jnp.zeros((H, W), jnp.int32)
    darker = jnp.zeros((H, W), jnp.int32)
    score_acc = jnp.zeros((H, W), jnp.float32)
    for bit, (dy, dx) in enumerate(_CIRCLE):
        tap = warp.shift(intensity, int(dy), int(dx))
        diff = tap - center
        brighter = brighter | ((diff > threshold).astype(jnp.int32) << bit)
        darker = darker | ((diff < -threshold).astype(jnp.int32) << bit)
        score_acc = score_acc + jnp.abs(diff)

    def has_arc(mask16: jnp.ndarray) -> jnp.ndarray:
        """Any run of >= FAST_ARC consecutive set bits on the 16-bit ring."""
        m = mask16
        run = m
        for k in range(1, FAST_ARC):
            rot = ((mask16 << k) | (mask16 >> (16 - k))) & 0xFFFF
            run = run & rot
        return run != 0

    is_corner = has_arc(brighter) | has_arc(darker)
    score = jnp.where(is_corner, score_acc, 0.0)
    # border guard (circle + descriptor support)
    x_pix, y_pix = warp.pixel_grid(H, W)
    margin = 16.0
    inb = (
        (x_pix >= margin) & (x_pix < W - margin)
        & (y_pix >= margin) & (y_pix < H - margin)
    )
    score = jnp.where(inb, score, 0.0)
    # non-max suppression over 3x3 (dense shifted max)
    neigh_max = score
    for dy in range(-1, 2):
        for dx in range(-1, 2):
            if dy == 0 and dx == 0:
                continue
            neigh_max = jnp.maximum(neigh_max, warp.shift(score, dy, dx))
    score = jnp.where(score >= neigh_max, score, 0.0)

    # --- top-K corners ------------------------------------------------------
    flat = score.reshape(-1)
    top_score, top_idx = jax.lax.top_k(flat, max_kp)
    ky = (top_idx // W).astype(jnp.float32)
    kx = (top_idx % W).astype(jnp.float32)
    valid = top_score > 0

    # --- orientation: intensity centroid from dense moment maps ------------
    # m10/m01 over a 15x15 patch via shifted sums, then gathered per corner
    m10 = jnp.zeros((H, W), jnp.float32)
    m01 = jnp.zeros((H, W), jnp.float32)
    R = 7
    for dy in range(-R, R + 1):
        for dx in range(-R, R + 1):
            if dx * dx + dy * dy > R * R:
                continue
            tap = warp.shift(intensity, dy, dx)
            m10 = m10 + dx * tap
            m01 = m01 + dy * tap
    g10 = m10.reshape(-1)[top_idx]
    g01 = m01.reshape(-1)[top_idx]
    angle = jnp.arctan2(g01, g10)

    # --- steered BRIEF ------------------------------------------------------
    ca, sa = jnp.cos(angle), jnp.sin(angle)  # [K]
    pat = jnp.asarray(_PATTERN)  # [256, 2, 2] (y, x)
    py, px = pat[..., 0], pat[..., 1]  # [256, 2]
    rx = ca[:, None, None] * px[None] - sa[:, None, None] * py[None]
    ry = sa[:, None, None] * px[None] + ca[:, None, None] * py[None]
    sx = jnp.clip(jnp.round(kx[:, None, None] + rx), 0, W - 1).astype(jnp.int32)
    sy = jnp.clip(jnp.round(ky[:, None, None] + ry), 0, H - 1).astype(jnp.int32)
    samples = intensity.reshape(-1)[(sy * W + sx).reshape(-1)].reshape(
        max_kp, 256, 2
    )
    bits = (samples[:, :, 0] < samples[:, :, 1]).astype(jnp.uint32)  # [K, 256]
    words = bits.reshape(max_kp, DESC_WORDS, 32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    desc = jnp.sum(words << shifts[None, None, :], axis=-1, dtype=jnp.uint32)

    kd = depth.reshape(-1)[top_idx]
    return Keypoints(
        uv=jnp.stack([kx, ky], axis=-1),
        score=top_score,
        angle=angle,
        desc=desc,
        depth=jnp.where(valid, kd, 0.0),
        valid=valid,
    )


@jax.jit
def match(a: Keypoints, b: Keypoints) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Mutual-best Hamming matching with ratio test.

    Returns (idx_b [K] i32: match in b for each a, -1 none; dist [K])."""
    x = a.desc[:, None, :] ^ b.desc[None, :, :]  # [Ka, Kb, 8]
    dist = jnp.sum(jax.lax.population_count(x), axis=-1).astype(jnp.int32)
    big = jnp.int32(10**6)
    dist = jnp.where(a.valid[:, None] & b.valid[None, :], dist, big)
    best_b = jnp.argmin(dist, axis=1)
    d1 = jnp.min(dist, axis=1)
    # second best for the ratio test
    d_wo = dist.at[jnp.arange(dist.shape[0]), best_b].set(big)
    d2 = jnp.min(d_wo, axis=1)
    best_a_of_b = jnp.argmin(dist, axis=0)
    mutual = best_a_of_b[best_b] == jnp.arange(dist.shape[0])
    ok = (
        mutual
        & (d1 <= MATCH_MAX_DIST)
        & (d1.astype(jnp.float32) <= MATCH_RATIO * jnp.maximum(d2, 1).astype(jnp.float32))
    )
    return jnp.where(ok, best_b, -1), d1


@functools.partial(jax.jit, static_argnames=("intr", "iters"))
def motion_only_pose(
    kp_prev: Keypoints,
    kp_cur: Keypoints,
    matches: jnp.ndarray,  # [K] index into kp_cur (or -1)
    intr: CameraIntrinsics,
    A_init: jnp.ndarray,  # [4,4] cur-cam -> prev-cam initial guess
    iters: int = 10,
    huber_px: float = 3.0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Gauss-Newton on reprojection error of previous-frame 3D points into the
    current frame (ORB-SLAM's motion-only BA, depth from RGB-D).

    Solves for A (current camera -> previous camera); the previous 3D points
    are back-projected from kp_prev depth.  Returns (A, inliers, mean_err_px).
    """
    m_safe = jnp.maximum(matches, 0)
    u_p, v_p = kp_prev.uv[:, 0], kp_prev.uv[:, 1]
    z_p = kp_prev.depth
    X = jnp.stack(
        [(u_p - intr.cx) / intr.fx * z_p, (v_p - intr.cy) / intr.fy * z_p, z_p],
        axis=-1,
    )  # [K,3] previous-camera 3D
    uv_c = kp_cur.uv[m_safe]  # observed pixels in current frame
    base_ok = (matches >= 0) & (z_p > 0.05) & kp_prev.valid

    def body(_, carry):
        A, _stats = carry
        Ainv = se3.se3_inverse(A)
        p = se3.transform_points(Ainv, X)  # into current camera
        z = jnp.maximum(p[:, 2], 1e-6)
        u = p[:, 0] / z * intr.fx + intr.cx
        v = p[:, 1] / z * intr.fy + intr.cy
        ru = u - uv_c[:, 0]
        rv = v - uv_c[:, 1]
        err = jnp.sqrt(ru * ru + rv * rv)
        w_huber = jnp.where(err > huber_px, huber_px / jnp.maximum(err, 1e-9), 1.0)
        ok = base_ok & (p[:, 2] > 0.05) & (err < 30.0)
        wgt = jnp.sqrt(w_huber) * ok
        # d(residual)/d(xi) for left-update on A: p = Ainv exp(-xi) X
        # => dp = -Ainv_R (omega x X + v); chain through projection
        fu_z = intr.fx / z
        fv_z = intr.fy / z
        Ju = jnp.stack(
            [fu_z, jnp.zeros_like(z), -intr.fx * p[:, 0] / (z * z)], axis=-1
        )
        Jv = jnp.stack(
            [jnp.zeros_like(z), fv_z, -intr.fy * p[:, 1] / (z * z)], axis=-1
        )
        Rinv = Ainv[:3, :3]

        def rows(Jpix, r):
            g = -jnp.einsum("pi,ij->pj", Jpix, Rinv)  # dr/d(dp in prev frame)
            Jw = jnp.cross(X, g)
            M = jnp.concatenate(
                [Jw, g, r[:, None], jnp.ones_like(r)[:, None]], axis=-1
            )
            return M * wgt[:, None]

        M = jnp.concatenate([rows(Ju, ru), rows(Jv, rv)], axis=0)
        G = jax.lax.dot_general(
            M, M, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        JtJ, Jtr = G[:6, :6], G[:6, 6]
        xi = jnp.linalg.solve(JtJ + 1e-4 * jnp.eye(6), -Jtr)
        good = jnp.all(jnp.isfinite(xi)) & (jnp.sum(ok) > 6)
        A_new = jnp.where(good, se3.se3_exp(xi) @ A, A)
        stats = (jnp.sum(ok.astype(jnp.float32)), jnp.sum(err * ok) / jnp.maximum(jnp.sum(ok), 1.0))
        return A_new, stats

    A, (inl, err) = jax.lax.fori_loop(
        0, iters, body, (A_init, (jnp.array(0.0), jnp.array(0.0)))
    )
    return A, inl, err


class SparseTracker:
    """Host-side tracker state machine (the `ORB_SLAM3::System` role for the
    hybrid path): per-frame pose from motion-only GN against the last
    keyframe, keyframe insertion by baseline/visibility, loop candidates by
    brute-force descriptor voting against old keyframes."""

    def __init__(
        self,
        intr: CameraIntrinsics,
        keyframe_min_disp: float = 0.08,
        loop_min_gap: int = 30,
        loop_min_votes: int = 60,
    ):
        self.intr = intr
        self.pose = np.eye(4, dtype=np.float32)  # camera-to-world
        self.keyframes: list = []  # (Keypoints, pose, tick)
        self.tick = 0
        self.kf_min_disp = keyframe_min_disp
        self.loop_min_gap = loop_min_gap
        self.loop_min_votes = loop_min_votes
        self.last_loop: Optional[Tuple[np.ndarray, np.ndarray]] = None

    def detect(self, intensity: jnp.ndarray, depth: jnp.ndarray) -> Keypoints:
        """Two-threshold detection (the reference ORB yaml's iniThFAST=20
        with minThFAST=7 fallback on weakly textured frames)."""
        kp = detect_and_describe(intensity, depth, threshold=FAST_THRESHOLD)
        if int(jnp.sum(kp.valid)) < MIN_CORNERS:
            kp = detect_and_describe(
                intensity, depth, threshold=FAST_THRESHOLD_MIN
            )
        return kp

    def track(self, intensity: jnp.ndarray, depth: jnp.ndarray):
        """Process one frame; returns (pose_cam_to_world, tracked_ok)."""
        kp = self.detect(intensity, depth)
        if not self.keyframes:
            self.keyframes.append((kp, self.pose.copy(), self.tick))
            self.tick += 1
            return self.pose, True
        kf_kp, kf_pose, _ = self.keyframes[-1]
        matches, _ = match(kf_kp, kp)
        A, inl, err = motion_only_pose(
            kf_kp, kp, matches, self.intr, jnp.eye(4, dtype=jnp.float32)
        )
        ok = int(inl) >= 15 and float(err) < 5.0
        if ok:
            self.pose = (kf_pose @ np.asarray(A)).astype(np.float32)
            disp = np.linalg.norm(np.asarray(A)[:3, 3])
            if disp > self.kf_min_disp:
                self._maybe_close_loop(kp)
                self.keyframes.append((kp, self.pose.copy(), self.tick))
        self.tick += 1
        return self.pose, ok

    def _maybe_close_loop(self, kp: Keypoints) -> None:
        """Brute-force loop detection against old keyframes (the DBoW role):
        count good matches; on success store the (old pose, corrected pose)
        pair that the hybrid dense pipeline consumes
        (`MainController.cpp:360-369` orbTcwOld/orbTcwNew)."""
        best = None
        for kf_kp, kf_pose, kf_tick in self.keyframes[:-1]:
            if self.tick - kf_tick < self.loop_min_gap:
                continue
            matches, dist = match(kf_kp, kp)
            votes = int(jnp.sum(matches >= 0))
            if votes >= self.loop_min_votes and (best is None or votes > best[0]):
                best = (votes, kf_kp, kf_pose, matches)
        if best is None:
            return
        _, kf_kp, kf_pose, matches = best
        A, inl, err = motion_only_pose(
            kf_kp, kp, matches, self.intr, jnp.eye(4, dtype=jnp.float32)
        )
        if int(inl) >= 20 and float(err) < 4.0:
            corrected = (kf_pose @ np.asarray(A)).astype(np.float32)
            self.last_loop = (self.pose.copy(), corrected)

    def pop_loop(self) -> Optional[Tuple[np.ndarray, np.ndarray]]:
        """(pose_old_estimate, pose_corrected) pair, once (the reference's
        `getLoopClosureCandidate`)."""
        out = self.last_loop
        self.last_loop = None
        return out
