"""The SLAM engine: per-frame orchestration of preprocess → predict → track →
fuse → clean.

TPU-native equivalent of the reference orchestrator stack
(`Core/src/ElasticFusion.{h,cpp}` processFrame state machine,
`Core/src/Context.h` per-camera frontend, `Core/src/ReferenceFrame.h` per-map
backend).  The host side is a thin Python state machine; all per-frame compute
runs in a handful of jitted stages over device arrays:

    preprocess_frame  (metricise + bilateral + vmap/nmap, ops.preprocess)
    splat.render      (model prediction at the last pose, ops.splat)
    fill_in           (hole fill from the live frame, mapping.fillin)
    odometry.track    (SO3 + pyramidal ICP+RGB GN, tracking.odometry)
    fusion.fuse/clean (map update, mapping.fusion)

Multi-camera collaborative sessions mirror the reference: each camera is a
`Frontend` (Context), each map a `MapBackend` (ReferenceFrame); frontends are
created dynamically (`Engine.frontend(name)`, reference
`ElasticFusion::frontend`, `ElasticFusion.cpp:1069-1085`).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from densemonoslam_tpu.config import CameraConfig, EngineConfig
from densemonoslam_tpu.mapping import fillin, fusion, keyframe as kfmod
from densemonoslam_tpu.mapping import surfel_map as sm
from densemonoslam_tpu.ops import geometry, preprocess, splat
from densemonoslam_tpu.tracking import odometry
from densemonoslam_tpu.utils import se3
from densemonoslam_tpu.utils.stats import SessionStats
from densemonoslam_tpu.utils.timer import Stopwatch


@functools.partial(jax.jit, static_argnames=("intr", "depth_factor", "depth_cutoff", "flip_normals"))
def preprocess_frame(
    rgb: jnp.ndarray,
    depth_raw: jnp.ndarray,
    intr,
    depth_factor: float = 1.0,
    depth_cutoff: float = 3.0,
    flip_normals: bool = False,
):
    """Raw sensor frame -> (metric depth, filtered depth, fusion vmap/nmap,
    intensity).  Mirrors the reference preprocessing chain
    (`ElasticFusion::filterDepth`/`metriciseDepth`, `ElasticFusion.cpp:748-768`);
    tracking uses the bilateral-filtered depth, fusion the unfiltered metric
    depth.  `flip_normals` is the `--icl` convention flip."""
    depth_m = preprocess.metricise_depth(depth_raw, depth_factor, depth_cutoff)
    depth_f = preprocess.bilateral_filter_depth(depth_m)
    vmap = geometry.backproject(depth_m, intr)
    nmap = geometry.normal_map(vmap)
    if flip_normals:
        nmap = -nmap
    intensity = preprocess.rgb_to_intensity(rgb)
    return depth_m, depth_f, vmap, nmap, intensity


@functools.partial(jax.jit, static_argnames=("intr", "levels"))
def build_model_pyramid(intensity, vmap0, nmap0, intr, levels: int = 3):
    """Predicted (filled) model maps -> tracking pyramid (the reference's
    `initICPModel`/`initRGBModel` path).

    Unlike the live-frame pyramid, vertex/normal maps are *decimated* from the
    splat output rather than recomputed from depth — the splatted normals are
    the map's exact fused normals (reference `resizeVMap`/`resizeNMap`)."""
    ints = preprocess.build_pyramid(intensity, levels, depth=False)
    vmaps, nmaps, gxs, gys = [], [], [], []
    vm, nm = vmap0, nmap0
    for lv in range(levels):
        vmaps.append(vm)
        nmaps.append(nm)
        gx, gy = preprocess.sobel_gradients(ints[lv])
        gxs.append(gx)
        gys.append(gy)
        vm = vm[::2, ::2]
        nm = nm[::2, ::2]
    return odometry.FramePyramid(
        intensity=tuple(ints),
        vmap=tuple(vmaps),
        nmap=tuple(nmaps),
        grad_x=tuple(gxs),
        grad_y=tuple(gys),
    )


@dataclasses.dataclass
class Frontend:
    """Per-camera state (reference `Context`, `Core/src/Context.h`)."""

    name: str
    sensor_id: int
    camera: CameraConfig
    pose: np.ndarray  # camera-to-world, host copy
    tick: int = 0
    lost: bool = False
    consecutive_bad: int = 0
    trajectory: List[Tuple[float, np.ndarray]] = dataclasses.field(default_factory=list)
    stats: SessionStats = dataclasses.field(default_factory=SessionStats)
    last_pyramid: Optional[odometry.FramePyramid] = None
    map_name: str = ""
    keyframe: Optional[kfmod.KeyFrame] = None
    num_keyframes: int = 0

    def record_pose(self, ts: float) -> None:
        self.trajectory.append((ts, self.pose.copy()))


@dataclasses.dataclass
class MapBackend:
    """Per-map state (reference `ReferenceFrame`)."""

    name: str
    map: sm.SurfelMap
    contexts: List[str] = dataclasses.field(default_factory=list)
    deforms: int = 0


class Engine:
    """The SLAM engine (reference `ElasticFusion`)."""

    def __init__(self, camera: CameraConfig, config: Optional[EngineConfig] = None):
        self.camera = camera
        self.config = config or EngineConfig()
        self.frontends: Dict[str, Frontend] = {}
        self.maps: Dict[str, MapBackend] = {}
        self.timer = Stopwatch()
        self._compact_interval = 64

    # ------------------------------------------------------------------ API
    def frontend(self, name: str, sensor_id: Optional[int] = None) -> Frontend:
        """Create a camera frontend in its own new map (reference
        `ElasticFusion::frontend`)."""
        if name in self.frontends:
            return self.frontends[name]
        sensor_id = len(self.frontends) if sensor_id is None else sensor_id
        sensor_id = min(sensor_id, self.config.max_sensors - 1)
        fe = Frontend(
            name=name,
            sensor_id=sensor_id,
            camera=self.camera,
            pose=np.eye(4, dtype=np.float32),
            map_name=name,
        )
        self.frontends[name] = fe
        self.maps[name] = MapBackend(
            name=name,
            map=sm.empty_map(self.config.max_surfels),
            contexts=[name],
        )
        return fe

    def backend_of(self, name: str) -> MapBackend:
        return self.maps[self.frontends[name].map_name]

    def process_frame(
        self,
        name: str,
        rgb: np.ndarray,
        depth_raw: np.ndarray,
        timestamp: float,
        in_pose: Optional[np.ndarray] = None,
    ) -> Dict[str, float]:
        """Process one frame for camera `name` (reference
        `ElasticFusion::processFrame`, `ElasticFusion.cpp:99-637`).

        `in_pose` (camera-to-world) bypasses dense tracking — the reference's
        ground-truth/ORB pose injection path (`--poses` / `--orb_tracking`).
        Returns per-frame info (tracking errors, fusion stats).
        """
        fe = self.frontends[name]
        be = self.backend_of(name)
        cfg = self.config
        intr = fe.camera.intrinsics
        res = fe.camera.resolution
        info: Dict[str, float] = {}

        rgb_j = jnp.asarray(rgb)
        depth_j = jnp.asarray(depth_raw, dtype=jnp.float32)
        with self.timer.section("preprocess"):
            depth_m, depth_f, vmap_f, nmap_f, intensity = preprocess_frame(
                rgb_j,
                depth_j,
                intr,
                depth_factor=cfg.depth_factor,
                depth_cutoff=cfg.depth_cutoff,
                flip_normals=cfg.icl_nuim,
            )
        frame_pyr = odometry.build_frame_pyramid(rgb_j, depth_f, intr, 3)

        first = fe.tick == 0 and int(be.map.count) == 0
        tracking_ok = True
        if first:
            if in_pose is not None:
                fe.pose = np.asarray(in_pose, dtype=np.float32)
        elif in_pose is not None and not cfg.orb_tracking:
            # ground-truth injection path: trust the given pose outright
            fe.pose = np.asarray(in_pose, dtype=np.float32)
        else:
            with self.timer.section("predict"):
                pred = splat.render(
                    be.map.data,
                    be.map.count,
                    jnp.asarray(fe.pose),
                    intr,
                    res.width,
                    res.height,
                    time=fe.tick,
                    time_delta=cfg.time_delta,
                    mode=splat.MODE_ACTIVE,
                )
            filled = fillin.fill_in(
                pred.intensity,
                pred.depth,
                pred.vmap,
                pred.nmap,
                intensity,
                depth_f,
                frame_pyr.vmap[0],
                frame_pyr.nmap[0],
                passthrough=jnp.asarray(fe.lost),
            )
            model_pyr = build_model_pyramid(
                filled.intensity, filled.vmap, filled.nmap, intr, 3
            )
            with self.timer.section("track"):
                result = odometry.track(
                    model_pyr,
                    frame_pyr,
                    jnp.eye(4, dtype=jnp.float32),
                    intr,
                    iterations=(
                        odometry.ITERATIONS_FAST if cfg.fast_odom else odometry.ITERATIONS_DEFAULT
                    ),
                    icp_weight=cfg.icp_weight,
                    rgb_only=cfg.rgb_only,
                    pyramid=cfg.pyramid,
                    use_so3=cfg.so3,
                )
            tracking_ok = not bool(result.failed)
            info["icp_error"] = float(result.icp_error)
            info["icp_inliers"] = float(result.icp_inliers)
            if cfg.relocalisation:
                cov_diag = np.diag(np.asarray(odometry.covariance(result)))
                bad = (
                    result.failed
                    or info["icp_error"] > 1e-4 * 255  # scaled gate, see tests
                    or np.any(cov_diag > 1e-4)
                )
                fe.consecutive_bad = fe.consecutive_bad + 1 if bad else 0
                if fe.consecutive_bad > 10:
                    fe.lost = True
            if tracking_ok:
                fe.pose = fe.pose @ np.asarray(result.A)
            if cfg.orb_tracking and in_pose is not None:
                # hybrid mode: sparse tracker supplies the pose; dense tracker
                # is still run for covariance/stats parity
                fe.pose = np.asarray(in_pose, dtype=np.float32)

        # --------------------------------------------------- NID fuse gate
        # (reference fuseFrame, ElasticFusion.cpp:639-677): fuse only frames
        # novel enough w.r.t. the active keyframe; crossing the gate promotes
        # the frame to new keyframe.
        do_fuse = True
        nid = 0.0
        if cfg.nid_keyframing and fe.keyframe is not None and not first:
            with self.timer.section("nid"):
                n_img, n_depth, overlap = kfmod.nid_against_keyframe(
                    fe.keyframe,
                    intensity,
                    vmap_f,
                    jnp.asarray(fe.pose),
                    intr,
                    depth_max=cfg.depth_cutoff,
                    bins_img=cfg.nid_bins_img,
                    bins_depth=cfg.nid_bins_depth,
                )
            nid = float(kfmod.nid_score(n_img, n_depth, cfg.nid_depth_weight))
            info["nid"] = nid
            do_fuse = nid > cfg.nid_threshold or float(overlap) < 0.1

        # ------------------------------------------------------------ fusion
        fused = False
        if tracking_ok and not fe.lost and do_fuse:
            with self.timer.section("fuse"):
                be.map, fstats = fusion.fuse(
                    be.map,
                    vmap_f,
                    nmap_f,
                    rgb_j.astype(jnp.float32),
                    jnp.asarray(fe.pose),
                    intr,
                    time=fe.tick,
                    sensor=fe.sensor_id,
                    weight_mult=cfg.fusion_weight_multiplier,
                    time_delta=cfg.time_delta,
                )
            info["fuse_matched"] = float(fstats.matched)
            info["fuse_added"] = float(fstats.added)
            fused = True
            with self.timer.section("clean"):
                be.map, culled = fusion.clean(
                    be.map,
                    depth_m,
                    jnp.asarray(fe.pose),
                    intr,
                    time=fe.tick,
                    conf_threshold=cfg.confidence_threshold,
                )
            info["culled"] = float(culled)
            if fe.tick % self._compact_interval == self._compact_interval - 1:
                be.map = sm.compact(be.map)
            # promote this frame to keyframe (reference: new KeyFrame on fuse)
            fe.keyframe = kfmod.make_keyframe(
                jnp.asarray(fe.pose), intensity, depth_m
            )
            fe.num_keyframes += 1

        fe.last_pyramid = frame_pyr
        fe.record_pose(timestamp)
        fe.stats.record(
            nid_score=nid,
            surfel_count=int(be.map.count),
            fused=fused,
        )
        fe.tick += 1
        info["surfels"] = float(be.map.count)
        info["tracking_ok"] = float(tracking_ok)
        return info

    # ------------------------------------------------------------- exports
    def predict_view(self, name: str, mode: int = splat.MODE_ALL) -> splat.Prediction:
        fe = self.frontends[name]
        be = self.backend_of(name)
        res = fe.camera.resolution
        return splat.render(
            be.map.data,
            be.map.count,
            jnp.asarray(fe.pose),
            fe.camera.intrinsics,
            res.width,
            res.height,
            time=fe.tick,
            time_delta=self.config.time_delta,
            mode=mode,
        )

    def save_trajectory(self, name: str, path: str) -> None:
        from densemonoslam_tpu.io.writers import save_freiburg

        fe = self.frontends[name]
        ts = [t for t, _ in fe.trajectory]
        ps = [p for _, p in fe.trajectory]
        save_freiburg(path, ts, ps)

    def save_ply(self, map_name: str, path: str, stable_only: bool = True) -> int:
        from densemonoslam_tpu.io.writers import save_ply

        be = self.maps[map_name]
        thr = self.config.confidence_threshold if stable_only else 0.0
        snap = sm.snapshot(be.map, conf_threshold=thr)
        save_ply(path, snap.positions, snap.normals, snap.colors, snap.radii)
        return snap.positions.shape[0]

    def save_times(self, path: str) -> None:
        self.timer.write_csv(path)

    def save_stats(self, name: str, path: str) -> None:
        self.frontends[name].stats.write(path)

    def surfel_count(self, map_name: str) -> int:
        return int(self.maps[map_name].map.count)
