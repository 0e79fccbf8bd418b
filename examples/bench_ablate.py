"""End-to-end ablation sweep of the fused per-frame step (dev tool).

Measures real pipelined frames/s for config variants to attribute the frame
budget.  `python examples/bench_ablate.py [variant ...]` (default: all).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from densemonoslam_tpu.config import (
    CameraConfig,
    CameraIntrinsics,
    EngineConfig,
    FrameResolution,
)
from densemonoslam_tpu.engine import Engine
from densemonoslam_tpu.io.synthetic import SyntheticSequence

W, H = 640, 480
camera = CameraConfig(
    FrameResolution(W, H),
    CameraIntrinsics(528.0, 528.0, W / 2 - 0.5, H / 2 - 0.5),
    "bench",
)

BASE = dict(
    max_surfels=1 << 20,
    depth_cutoff=8.0,
    depth_factor=1.0,
    nid_keyframing=True,
    nid_threshold=0.85,
    pyramid_levels=4,
    track_row_stride=2,
    open_loop=True,
)

VARIANTS = {
    "base": {},
    "cap_256k": dict(max_surfels=1 << 18),
    "cap_512k": dict(max_surfels=1 << 19),
    "no_nid": dict(nid_keyframing=False),
    "levels3": dict(pyramid_levels=3),
    "stride4": dict(track_row_stride=4),
    "fast_odom": dict(fast_odom=True),
}


def run(name, overrides, n_frames=24, warmup=4):
    import jax
    import jax.numpy as jnp

    cfg = EngineConfig(**{**BASE, **overrides})
    seq = SyntheticSequence(
        camera=camera, num_frames=n_frames + warmup, radius=0.12, max_angle=0.12
    )
    frames = [
        (jax.device_put(jnp.asarray(r)), jax.device_put(jnp.asarray(d)))
        for r, d in (seq.frame(i) for i in range(n_frames + warmup))
    ]
    jax.block_until_ready(frames)
    eng = Engine(camera, cfg)
    eng.frontend("cam0")
    eng.frontends["cam0"].pose = seq.gt_pose(0).astype(np.float32)
    for i in range(warmup):
        rgb, depth = frames[i]
        eng.process_frame("cam0", rgb, depth, float(i), sync=False)
    jax.block_until_ready(eng.frontends["cam0"].state.map_count)
    t0 = time.perf_counter()
    for i in range(warmup, warmup + n_frames):
        rgb, depth = frames[i]
        eng.process_frame("cam0", rgb, depth, float(i), sync=False)
    jax.block_until_ready(eng.frontends["cam0"].state.map_count)
    dt = time.perf_counter() - t0
    print(f"{name:12s} {n_frames / dt:7.2f} fps   {dt / n_frames * 1000:7.2f} ms/frame")


if __name__ == "__main__":
    names = sys.argv[1:] or list(VARIANTS)
    for name in names:
        run(name, VARIANTS[name])
