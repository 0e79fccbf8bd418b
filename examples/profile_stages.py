"""Per-stage on-chip timing of the fused SLAM step (dev tool).

Times each pipeline stage as its own jitted function over realistic state so
we know where the 640x480 frame budget goes on the actual chip.  Not part of
the test suite; run manually: `python examples/profile_stages.py`.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from densemonoslam_tpu.config import (
    CameraConfig,
    CameraIntrinsics,
    EngineConfig,
    FrameResolution,
)
from densemonoslam_tpu.engine import Engine
from densemonoslam_tpu.io.synthetic import SyntheticSequence
from densemonoslam_tpu.mapping import fusion, keyframe as kfmod, surfel_map as sm
from densemonoslam_tpu.ops import geometry, preprocess, splat
from densemonoslam_tpu.tracking import odometry

W, H = 640, 480
camera = CameraConfig(
    FrameResolution(W, H),
    CameraIntrinsics(528.0, 528.0, W / 2 - 0.5, H / 2 - 0.5),
    "prof",
)
cfg = EngineConfig(
    max_surfels=1 << 20,
    depth_cutoff=8.0,
    depth_factor=1.0,
    nid_keyframing=True,
    pyramid_levels=4,
    track_row_stride=2,
    open_loop=True,
)
intr = camera.intrinsics

seq = SyntheticSequence(camera=camera, num_frames=12, radius=0.12, max_angle=0.12)
eng = Engine(camera, cfg)
eng.frontend("cam0")
for i in range(10):
    rgb, depth = seq.frame(i)
    eng.process_frame("cam0", rgb, depth, float(i), sync=False)
state = eng.frontends["cam0"].state
jax.block_until_ready(state.map_count)
print("surfels:", int(state.map_count))

rgb, depth_raw = seq.frame(10)
rgb = jax.device_put(jnp.asarray(rgb))
depth_raw = jax.device_put(jnp.asarray(depth_raw))
t_now = state.tick
levels = cfg.pyramid_levels
iterations = cfg.iterations_for_levels()


def timeit(name, fn, *args, n=20, **kw):
    f = jax.jit(fn) if not hasattr(fn, "lower") else fn
    out = f(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args, **kw)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"{name:28s} {dt:8.2f} ms")
    return out


# ---------------- stages -------------------------------------------------
def pre(depth_raw, rgb):
    depth_m = preprocess.metricise_depth(depth_raw, cfg.depth_factor, cfg.depth_cutoff)
    depth_f = preprocess.bilateral_filter_depth(depth_m)
    vmap_f = geometry.backproject(depth_m, intr)
    nmap_f = geometry.normal_map(vmap_f)
    intensity = preprocess.rgb_to_intensity(rgb)
    pyr = odometry.build_frame_pyramid(rgb, depth_f, intr, levels)
    return depth_m, depth_f, vmap_f, nmap_f, intensity, pyr


depth_m, depth_f, vmap_f, nmap_f, intensity, frame_pyr = timeit(
    "preprocess+frame_pyr", pre, depth_raw, rgb
)


def render(md, mc, pose):
    return splat.render(
        md, mc, pose, intr, W, H, t_now, time_delta=cfg.time_delta,
        mode=splat.MODE_ACTIVE,
    )


pred = timeit("splat.render", render, state.map_data, state.map_count, state.pose)


def fill_and_pyr(pred_depth, pred_int, pred_v, pred_n):
    hole = pred_depth <= 0
    fi = jnp.where(hole, intensity, pred_int)
    fv = jnp.where(hole[..., None], frame_pyr.vmap[0], pred_v)
    fn = jnp.where(hole[..., None], frame_pyr.nmap[0], pred_n)
    return odometry.build_model_pyramid(fi, fv, fn, levels)


model_pyr = timeit(
    "fillin+model_pyr", fill_and_pyr, pred.depth, pred.intensity, pred.vmap, pred.nmap
)


def track(mp, fp):
    return odometry.track(
        mp, fp, jnp.eye(4, dtype=jnp.float32), intr,
        iterations=iterations, icp_weight=cfg.icp_weight,
        rgb_only=cfg.rgb_only, pyramid=cfg.pyramid, use_so3=cfg.so3,
        row_stride=cfg.track_row_stride,
    )


timeit("odometry.track", track, model_pyr, frame_pyr)


def nid(kf_pose, kf_int, kf_dep, pose):
    ni, nd, ov = kfmod.nid_against_keyframe(
        kfmod.KeyFrame(pose=kf_pose, intensity=kf_int, depth=kf_dep),
        intensity, vmap_f, pose, intr,
        depth_max=cfg.depth_cutoff, bins_img=cfg.nid_bins_img,
        bins_depth=cfg.nid_bins_depth,
    )
    return kfmod.nid_score(ni, nd, cfg.nid_depth_weight)


timeit("nid_gate", nid, state.kf_pose, state.kf_intensity, state.kf_depth, state.pose)


def do_fuse(md, mc, pose):
    m = sm.SurfelMap(data=md, count=mc)
    m, fstats = fusion.fuse(
        m, vmap_f, nmap_f, rgb.astype(jnp.float32), pose, intr,
        time=t_now, sensor=0, weight_mult=jnp.array(1.0, jnp.float32),
        time_delta=cfg.time_delta,
    )
    return m.data, m.count


md2, mc2 = timeit("fusion.fuse", do_fuse, state.map_data, state.map_count, state.pose)


def do_clean(md, mc, pose):
    m = sm.SurfelMap(data=md, count=mc)
    m, culled = fusion.clean(
        m, depth_m, pose, intr, time=t_now, conf_threshold=cfg.confidence_threshold
    )
    return m.data, m.count


timeit("fusion.clean", do_clean, md2, mc2, state.pose)
