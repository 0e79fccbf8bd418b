"""Honest per-stage device timing via scan-chained execution (dev tool).

Wraps each real pipeline stage in a lax.scan whose carry perturbs the inputs,
so REPS executions are serialised on device and per-iteration time is exact.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from densemonoslam_tpu.config import (
    CameraConfig, CameraIntrinsics, EngineConfig, FrameResolution,
)
from densemonoslam_tpu.engine import Engine
from densemonoslam_tpu.io.synthetic import SyntheticSequence
from densemonoslam_tpu.mapping import fusion, keyframe as kfmod, surfel_map as sm
from densemonoslam_tpu.ops import geometry, preprocess, splat
from densemonoslam_tpu.tracking import odometry

W, H = 640, 480
camera = CameraConfig(
    FrameResolution(W, H), CameraIntrinsics(528.0, 528.0, W / 2 - 0.5, H / 2 - 0.5), "p",
)
cfg = EngineConfig(
    max_surfels=1 << 20, depth_cutoff=8.0, depth_factor=1.0,
    nid_keyframing=True, pyramid_levels=4, track_row_stride=2, open_loop=True,
)
intr = camera.intrinsics
REPS = 10

seq = SyntheticSequence(camera=camera, num_frames=12, radius=0.12, max_angle=0.12)
eng = Engine(camera, cfg)
eng.frontend("cam0")
for i in range(10):
    r, d = seq.frame(i)
    eng.process_frame("cam0", r, d, float(i), sync=False)
state = eng.frontends["cam0"].state
jax.block_until_ready(state.map_count)
print("surfels:", int(state.map_count))

rgb, depth_raw = seq.frame(10)
rgb = jnp.asarray(rgb, jnp.float32)
depth_raw = jnp.asarray(depth_raw)
t_now = state.tick
levels = cfg.pyramid_levels
iterations = cfg.iterations_for_levels()


def timeit(name, op):
    """op(eps_scalar) -> array(s); chained REPS times."""

    def body(c, _):
        out = op(c)
        leaf = jax.tree_util.tree_leaves(out)[0]
        return jnp.sum(leaf.astype(jnp.float32).ravel()[:8]) * 1e-30, None

    f = jax.jit(lambda: jax.lax.scan(body, jnp.float32(0), None, length=REPS)[0])
    r = f(); jax.block_until_ready(r)
    t0 = time.perf_counter()
    r = f(); jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / REPS * 1000
    print(f"{name:30s} {dt:8.2f} ms")


# stage inputs (fixed, perturbed by carry eps)
depth_m = preprocess.metricise_depth(depth_raw, cfg.depth_factor, cfg.depth_cutoff)
vmap_f = geometry.backproject(depth_m, intr)
nmap_f = geometry.normal_map(vmap_f)
intensity = preprocess.rgb_to_intensity(rgb)
frame_pyr = odometry.build_frame_pyramid(rgb, depth_m, intr, levels)
pred = splat.render(
    state.map_data, state.map_count, state.pose, intr, W, H, t_now,
    time_delta=cfg.time_delta, mode=splat.MODE_ACTIVE,
)
hole = pred.depth <= 0
fi = jnp.where(hole, intensity, pred.intensity)
fv = jnp.where(hole[..., None], frame_pyr.vmap[0], pred.vmap)
fn = jnp.where(hole[..., None], frame_pyr.nmap[0], pred.nmap)
model_pyr = odometry.build_model_pyramid(fi, fv, fn, levels)
jax.block_until_ready((frame_pyr, model_pyr, pred))

timeit("metricise+bilateral", lambda c: preprocess.bilateral_filter_depth(depth_m + c))
timeit("backproject+normals", lambda c: geometry.normal_map(geometry.backproject(depth_m + c, intr)))
timeit("frame_pyramid(full)", lambda c: odometry.build_frame_pyramid(rgb + c, depth_m, intr, levels))
timeit("splat.render ACTIVE", lambda c: splat.render(
    state.map_data + c, state.map_count, state.pose, intr, W, H, t_now,
    time_delta=cfg.time_delta, mode=splat.MODE_ACTIVE))
timeit("model_pyramid", lambda c: odometry.build_model_pyramid(fi + c, fv, fn, levels))
timeit("track", lambda c: odometry.track(
    model_pyr, frame_pyr._replace(intensity=tuple(i + c for i in frame_pyr.intensity)),
    jnp.eye(4, dtype=jnp.float32), intr, iterations=iterations,
    icp_weight=cfg.icp_weight, rgb_only=cfg.rgb_only, pyramid=cfg.pyramid,
    use_so3=cfg.so3, row_stride=cfg.track_row_stride))
timeit("nid_gate", lambda c: kfmod.nid_against_keyframe(
    kfmod.KeyFrame(pose=state.kf_pose, intensity=state.kf_intensity + c, depth=state.kf_depth),
    intensity, vmap_f, state.pose, intr, depth_max=cfg.depth_cutoff,
    bins_img=cfg.nid_bins_img, bins_depth=cfg.nid_bins_depth))


def fuse_op(c):
    m = sm.SurfelMap(data=state.map_data + c, count=state.map_count)
    m, fstats = fusion.fuse(
        m, vmap_f, nmap_f, rgb, state.pose, intr, time=t_now, sensor=0,
        weight_mult=jnp.array(1.0, jnp.float32), time_delta=cfg.time_delta,
    )
    return m.data


timeit("fusion.fuse(incl render)", fuse_op)


def clean_op(c):
    m = sm.SurfelMap(data=state.map_data + c, count=state.map_count)
    m, culled = fusion.clean(
        m, depth_m, state.pose, intr, time=t_now, conf_threshold=cfg.confidence_threshold
    )
    return m.data


timeit("fusion.clean", clean_op)
