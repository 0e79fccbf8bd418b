"""Run the framework on the synthetic sequence and report ATE + frames/s.

Usage:
    python examples/run_synthetic.py [--frames N] [--platform cpu|tpu] [--odometry-only]

This is the equivalent of the reference's log-replay evaluation run
(`./ElasticFusion --l log --q`): process every frame, export a `.freiburg`
trajectory, and score it against ground truth.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=30)
    ap.add_argument("--platform", default="cpu", choices=["cpu", "tpu"])
    ap.add_argument("--odometry-only", action="store_true", help="frame-to-frame tracking, no map")
    ap.add_argument("--out", default=None, help="directory for .freiburg/.ply exports")
    args = ap.parse_args()

    if args.platform == "cpu":
        os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from densemonoslam_tpu.eval import ate_rmse
    from densemonoslam_tpu.io import SyntheticSequence, save_freiburg
    from densemonoslam_tpu.tracking import odometry
    from densemonoslam_tpu.utils import Stopwatch

    seq = SyntheticSequence(num_frames=args.frames, radius=0.35, max_angle=0.3)
    intr = seq.camera.intrinsics
    sw = Stopwatch()

    poses = [seq.gt_pose(0)]
    tss = [0.0]
    prev = None
    t_start = None
    for i in range(args.frames):
        rgb, depth = seq.frame(i)
        with sw.section("pyramid"):
            cur = odometry.build_frame_pyramid(jnp.asarray(rgb), jnp.asarray(depth), intr, 3)
            jax.block_until_ready(cur.vmap[0])
        if prev is not None:
            with sw.section("track"):
                res = odometry.track(prev, cur, jnp.eye(4, dtype=jnp.float32), intr)
                jax.block_until_ready(res.A)
            if bool(res.failed):
                print(f"frame {i}: TRACKING FAILED")
            poses.append(poses[-1] @ np.asarray(res.A))
            tss.append(float(i))
        prev = cur
        if i == 1:
            t_start = time.perf_counter()  # exclude compile time

    n_timed = args.frames - 2
    fps = n_timed / (time.perf_counter() - t_start) if t_start and n_timed > 0 else 0.0
    gt = [seq.gt_pose(i) for i in range(args.frames)]
    err = ate_rmse(poses, gt)
    print(f"frames: {args.frames}  ATE RMSE: {err*1000:.2f} mm  post-compile fps: {fps:.1f}")
    print("stage means (ms):", {k: round(v, 2) for k, v in sw.summary().items()})

    if args.out:
        os.makedirs(args.out, exist_ok=True)
        save_freiburg(os.path.join(args.out, "synthetic.freiburg"), tss, poses)
        print(f"wrote {args.out}/synthetic.freiburg")
    return 0 if err < 0.02 else 1


if __name__ == "__main__":
    sys.exit(main())
