"""Headline benchmark: dense SLAM frames/s on one chip.

Runs the full per-frame pipeline (preprocess + splat predict + fill-in +
SO3/ICP/RGB tracking + NID gate + fusion + clean) at 640x480 — the
reference's TUM/ICL operating point — on whatever platform is active
(the TPU chip under axon; CPU elsewhere), and prints ONE JSON line.

Baseline: the reference's real-time gate is 30 Hz at this resolution on a
">=3.5 TFLOPS nVidia GPU" (`GUI/src/MainController.cpp:389-395`,
`elasticfusion/README.md:46-60`); `vs_baseline` = our fps / 30.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_FPS = 30.0


def main() -> None:
    import numpy as np

    from densemonoslam_tpu.config import (
        CameraConfig,
        CameraIntrinsics,
        EngineConfig,
        FrameResolution,
    )
    from densemonoslam_tpu.engine import Engine
    from densemonoslam_tpu.eval import ate_rmse
    from densemonoslam_tpu.io.synthetic import SyntheticSequence

    W, H = 640, 480
    camera = CameraConfig(
        FrameResolution(W, H),
        CameraIntrinsics(528.0, 528.0, W / 2 - 0.5, H / 2 - 0.5),
        "bench",
    )
    n_frames = int(os.environ.get("BENCH_FRAMES", "30"))
    warmup = 4
    # ~0.02 m / ~1 deg per frame: a fast handheld camera at 30 Hz
    seq = SyntheticSequence(
        camera=camera, num_frames=n_frames + warmup, radius=0.12, max_angle=0.12
    )
    frames = [seq.frame(i) for i in range(n_frames + warmup)]  # pre-render (host)

    cfg = EngineConfig(
        max_surfels=1 << 20,
        depth_cutoff=8.0,
        depth_factor=1.0,
        nid_keyframing=True,
        nid_threshold=0.85,
        pyramid_levels=4,
        track_row_stride=2,
        # the cadenced loop-closure machinery is excluded from the headline
        # throughput number (it is rare per frame but its one-off executable
        # compiles would dominate a cold benchmark process)
        open_loop=True,
    )
    eng = Engine(camera, cfg)
    eng.frontend("cam0")
    eng.frontends["cam0"].pose = seq.gt_pose(0).astype(np.float32)

    import jax

    # pre-stage frames on device: a deployment feeds frames over local PCIe /
    # infeed; this remote-relay link is not the system under test
    import jax.numpy as jnp

    frames = [
        (jax.device_put(jnp.asarray(r)), jax.device_put(jnp.asarray(d)))
        for r, d in frames
    ]
    jax.block_until_ready(frames)

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
    fps = n_frames / dt

    est = [p for _, p in eng.frontends["cam0"].trajectory]
    gt = [seq.gt_pose(i) for i in range(len(est))]
    ate_mm = ate_rmse(est, gt) * 1000.0

    print(
        json.dumps(
            {
                "metric": "slam_fps_640x480_1chip",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / BASELINE_FPS, 3),
                "extra": {
                    "ate_mm": round(ate_mm, 2),
                    "surfels": eng.surfel_count("cam0"),
                    "frames": n_frames,
                    "stage_ms": {
                        k: round(v, 2) for k, v in eng.timer.summary().items()
                    },
                },
            }
        )
    )


if __name__ == "__main__":
    main()
