"""Multi-host collaborative session launcher (SURVEY §5.8 demo).

Spawns N "hosts" as separate processes on this machine, each with its own
virtual devices, joined into ONE collaborative SLAM session by
`jax.distributed` (Gloo over localhost here; DCN on a real pod).  Every host
feeds its own synthetic camera stream; the SPMD step runs over the global
mesh, and each host prints the session-wide per-camera stats it sees (the
reference's LCM-shared session state, `Tools/networking/*`).

Usage: python examples/run_multihost.py [--hosts 2] [--frames 5]
On a real multi-host deployment, run ONE process per host instead with
DMS_COORDINATOR/DMS_NUM_HOSTS/DMS_HOST_ID set.
"""

import argparse
import os
import subprocess
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = textwrap.dedent(
    """
    import os, sys
    pid, n, frames = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    os.environ["JAX_PLATFORMS"] = "cpu"
    sys.path.insert(0, %(repo)r)
    import jax
    jax.config.update("jax_platforms", "cpu")
    from densemonoslam_tpu.parallel import multihost
    multihost.initialize("127.0.0.1:19931", n, pid)
    import numpy as np
    from densemonoslam_tpu.config import (
        CameraConfig, CameraIntrinsics, FrameResolution,
    )
    from densemonoslam_tpu.io.synthetic import SyntheticSequence
    from densemonoslam_tpu import step as stepmod

    W, H = 160, 120
    intr = CameraIntrinsics(132.0, 132.0, W / 2 - 0.5, H / 2 - 0.5)
    sess = multihost.MultiHostSession(intr, H, W)
    cam = CameraConfig(FrameResolution(W, H), intr)
    seqs = [
        SyntheticSequence(camera=cam, num_frames=frames + 4)
        for _ in sess.my_cam_slots
    ]
    for t in range(frames):
        rgb = np.stack([np.asarray(s.frame(t)[0]) for s in seqs])
        dep = np.stack(
            [np.asarray(s.frame(t)[1], np.float32) for s in seqs]
        )
        stats, total = sess.step(rgb, dep)
        if pid == 0:
            per_cam = stats[:, stepmod.STAT_SURFELS].astype(int).tolist()
            print(
                f"[host 0 view] t={t} session surfels/cam={per_cam} "
                f"global={total}", flush=True,
            )
    print(f"host {pid} done ({sess.n_cams}-camera session)", flush=True)
    """
)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--hosts", type=int, default=2)
    ap.add_argument("--frames", type=int, default=5)
    args = ap.parse_args()
    worker = WORKER % {"repo": REPO}
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", worker, str(p), str(args.hosts),
             str(args.frames)],
            env=env,
        )
        for p in range(args.hosts)
    ]
    rc = 0
    for p in procs:
        rc |= p.wait()
    return rc


if __name__ == "__main__":
    sys.exit(main())
