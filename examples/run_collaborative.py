"""Collaborative multi-camera session demo: two cameras stream frames over
UDP into one engine; their initially independent maps merge when the second
camera revisits territory the first has mapped (the reference's collaborative
sessions, README.md:136-139, driven by `--l log1 --l log2`).

Usage: python examples/run_collaborative.py [--frames 14]
"""

import argparse
import os
import sys
import threading

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=14)
    ap.add_argument("--platform", default="cpu")
    args = ap.parse_args()
    if args.platform == "cpu":
        os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from densemonoslam_tpu.config import EngineConfig
    from densemonoslam_tpu.engine import Engine
    from densemonoslam_tpu.io.stream import FrameReceiver, FrameSender, StreamCameraManager
    from densemonoslam_tpu.io.synthetic import SyntheticSequence

    seq = SyntheticSequence(num_frames=40, radius=0.35, max_angle=0.3)
    port = 17700
    rx = FrameReceiver(port=port)
    mgr = StreamCameraManager(rx, depth_factor=1000.0)

    # two "hosts" streaming with a frame offset so camB revisits camA ground
    def sender(name, start):
        tx = FrameSender(name, port=port)
        for k in range(args.frames):
            rgb, depth = seq.frame(start + k)
            tx.send(rgb, (depth * 1000).astype(np.uint16), timestamp=start + k)
        tx.close()

    threads = [
        threading.Thread(target=sender, args=("camA", 0)),
        threading.Thread(target=sender, args=("camB", 6)),
    ]
    for t in threads:
        t.start()

    cfg = EngineConfig(
        max_surfels=1 << 17, depth_cutoff=8.0, depth_factor=1000.0,
        nid_keyframing=False, loop_check_interval=4, time_delta=500,
        confidence_threshold=1.0,
    )
    eng = Engine(seq.camera, cfg)
    mgr.wait_for_cameras(2)
    # each camera starts in its own world frame (pose = identity) — the merge
    # must discover the relative transform via ferns + dense ICP
    eng.frontend("camA").pose = seq.gt_pose(0).astype(np.float32)
    eng.frontend("camB").pose = np.eye(4, dtype=np.float32)

    n = {"camA": 0, "camB": 0}
    merged = False
    while sum(n.values()) < 2 * args.frames:
        for cam in ["camA", "camB"]:
            got = mgr.get_next(cam, timeout=2.0)
            if got is None:
                continue
            rgb, depth_m, ts = got
            eng.process_frame(cam, rgb, depth_m * 1000.0, ts)
            n[cam] += 1
        if not merged and len(eng.maps) == 1:
            merged = True
            print(f"*** maps merged after {n} frames ***")
    for t in threads:
        t.join()
    rx.close()
    print(
        f"frames: {n}; maps: {len(eng.maps)}; "
        f"surfels: {eng.surfel_count(eng.frontends['camA'].map_name)}"
    )
    rel = np.linalg.inv(eng.frontends["camA"].pose) @ eng.frontends["camB"].pose
    print("relative pose camA->camB translation:", rel[:3, 3].round(3))
    return 0 if merged else 1


if __name__ == "__main__":
    sys.exit(main())
