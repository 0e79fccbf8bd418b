"""KITTI odometry -> .klg converter (the reference's data tooling role:
`logs/kitti/kitti_odom_to_lcm.py` rescales frames to the network feed size,
corrects intrinsics, optionally runs depth prediction, and writes gt
trajectories).

Usage:
    python examples/convert_kitti.py --seq /data/kitti/sequences/00 \
        --out kitti00.klg [--depth-dir DIR | --predict-depth WEIGHTS.npz] \
        [--gt poses.txt --gt-out kitti00.freiburg]

Depth comes from (a) a precomputed depth dir (uint16 mm PNGs), (b) the
in-tree depth network with given weights, or (c) zeros (track-only stream).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seq", required=True, help="KITTI sequence dir (contains image_2/)")
    ap.add_argument("--out", required=True, help="output .klg path")
    ap.add_argument("--depth-dir", default=None)
    ap.add_argument("--predict-depth", default=None, help="depth net weights npz")
    ap.add_argument("--frames", type=int, default=10**9)
    ap.add_argument("--feed-width", type=int, default=1024)
    ap.add_argument("--feed-height", type=int, default=320)
    ap.add_argument("--gt", default=None, help="KITTI poses .txt (r11..tz rows)")
    ap.add_argument("--gt-out", default=None, help="write .freiburg gt here")
    args = ap.parse_args()

    from densemonoslam_tpu.io.datasets import KittiOdometryReader
    from densemonoslam_tpu.io.klg import write_klg

    reader = KittiOdometryReader(
        args.seq, args.depth_dir, args.feed_width, args.feed_height
    )
    predictor = None
    if args.predict_depth:
        import jax.numpy as jnp

        from densemonoslam_tpu.models.depthnet import DepthPredictor

        predictor = DepthPredictor()
        predictor.load(args.predict_depth, args.feed_height, args.feed_width)

    def frames():
        n = 0
        while reader.has_more() and n < args.frames:
            rgb, depth, ts = reader.get_next()
            if predictor is not None:
                import jax.numpy as jnp

                depth = np.asarray(predictor.predict(jnp.asarray(rgb)))
            yield rgb, (depth * 1000.0).astype(np.uint16), int(ts)
            n += 1

    n = write_klg(args.out, frames())
    print(f"wrote {n} frames to {args.out}")

    if args.gt and args.gt_out:
        from densemonoslam_tpu.io.writers import save_freiburg

        poses = []
        with open(args.gt) as f:
            for line in f:
                vals = [float(x) for x in line.split()]
                T = np.eye(4)
                T[:3] = np.array(vals).reshape(3, 4)
                poses.append(T)
        save_freiburg(args.gt_out, list(range(len(poses))), poses)
        print(f"wrote gt to {args.gt_out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
