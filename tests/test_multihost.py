"""Multi-host session formation tests (SURVEY §5.8; BASELINE config 5).

Spawns REAL separate processes joined by `jax.distributed` (Gloo collectives
over localhost — the CPU stand-in for DCN), forms a collaborative session
with one camera per device across both hosts, runs steps, and checks that
every host sees the session-wide stats (the reference's LCM-shared state).
"""

import json
import os
import subprocess
import sys
import textwrap

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = textwrap.dedent(
    """
    import os, sys, json
    pid, n, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["DMS_COORDINATOR"] = f"127.0.0.1:{port}"
    os.environ["DMS_NUM_HOSTS"] = str(n)
    os.environ["DMS_HOST_ID"] = str(pid)
    sys.path.insert(0, %(repo)r)
    import jax
    jax.config.update("jax_platforms", "cpu")
    from densemonoslam_tpu.parallel import multihost
    from densemonoslam_tpu.config import CameraIntrinsics

    joined = multihost.initialize()
    assert joined, "env-driven initialize must join the group"
    assert jax.process_count() == n
    W, H = 96, 72
    intr = CameraIntrinsics(79.2, 79.2, W / 2 - 0.5, H / 2 - 0.5)
    sess = multihost.MultiHostSession(intr, H, W)
    assert sess.n_cams == 2 * n  # 2 local devices per host
    assert list(sess.my_cam_slots) == [2 * pid, 2 * pid + 1]
    rng = __import__("numpy").random.default_rng(pid)
    import numpy as np
    for t in range(3):
        rgb = rng.integers(0, 255, (2, H, W, 3)).astype(np.uint8)
        dep = rng.uniform(0.5, 5.0, (2, H, W)).astype(np.float32)
        stats, total = sess.step(rgb, dep)
    from densemonoslam_tpu import step as stepmod
    out = {
        "pid": pid,
        "stats_shape": list(stats.shape),
        "surfels": [float(s) for s in stats[:, stepmod.STAT_SURFELS]],
        "total": total,
    }
    print("RESULT " + json.dumps(out), flush=True)
    """
) % {"repo": REPO}


def test_two_host_session(tmp_path):
    n = 2
    port = 19911
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, str(pid), str(n), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env={k: v for k, v in os.environ.items()
                 if k not in ("XLA_FLAGS", "JAX_PLATFORMS")},
        )
        for pid in range(n)
    ]
    results = {}
    for p in procs:
        out, err = p.communicate(timeout=540)
        assert p.returncode == 0, f"worker failed:\n{err[-2000:]}"
        line = [l for l in out.splitlines() if l.startswith("RESULT ")][-1]
        r = json.loads(line[len("RESULT "):])
        results[r["pid"]] = r
    from densemonoslam_tpu import step as stepmod

    assert set(results) == {0, 1}
    for pid, r in results.items():
        # every host sees ALL 4 cameras' stats (session-wide all-gather)
        assert r["stats_shape"] == [4, stepmod.N_STATS_TOTAL]
        assert all(s > 0 for s in r["surfels"])
    # both hosts agree on the global surfel total (psum over DCN)
    assert results[0]["total"] == results[1]["total"]
    assert results[0]["surfels"] == results[1]["surfels"]


_WORKER_IM = textwrap.dedent(
    """
    import os, sys, json
    pid, n, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["DMS_COORDINATOR"] = f"127.0.0.1:{port}"
    os.environ["DMS_NUM_HOSTS"] = str(n)
    os.environ["DMS_HOST_ID"] = str(pid)
    sys.path.insert(0, %(repo)r)
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    from densemonoslam_tpu.parallel import multihost
    from densemonoslam_tpu.config import EngineConfig
    from densemonoslam_tpu.io.synthetic import SyntheticSequence

    joined = multihost.initialize()
    assert joined
    OFFSET = 6
    seq = SyntheticSequence(num_frames=40, radius=0.3, max_angle=0.25)
    H = seq.camera.resolution.height
    W = seq.camera.resolution.width
    cfg = EngineConfig(
        max_surfels=1 << 16, depth_cutoff=8.0, depth_factor=1.0,
        nid_keyframing=False, open_loop=True, time_delta=200, max_depth=8.0,
    )
    sess = multihost.MultiHostSession(
        seq.camera.intrinsics, H, W, cfg, cams_per_host=1
    )
    assert sess.n_cams == n
    my_off = pid * OFFSET
    # phase 1: each host SLAMs its own camera into its OWN map
    for i in range(16):
        rgb, dep = seq.frame(i + my_off)
        sess.step(rgb[None], dep[None])
    # phase 2: keep stepping + inter-map rounds at cadence
    sess.enable_intermap(verify_scale=2, fern_factor=4)
    merged = None
    for i in range(16, 30):
        rgb, dep = seq.frame(i + my_off)
        sess.step(rgb[None], dep[None])
        info = sess.intermap_round(rgb[None], dep[None])
        if bool(info.merged):
            merged = info
            break
    out = {
        "pid": pid,
        "merged": bool(merged is not None),
        "map_ids": [int(x) for x in (
            merged.map_ids if merged is not None else info.map_ids
        )],
        "req": int(merged.requester) if merged is not None else -1,
        "tgt": int(merged.target) if merged is not None else -1,
        "T": (np.asarray(merged.T).round(4).tolist()
              if merged is not None else None),
    }
    print("RESULT " + json.dumps(out), flush=True)
    """
) % {"repo": REPO}


def test_two_host_intermap_merge():
    """BASELINE config 5's distributed inter-map closure: two HOSTS (real
    processes over jax.distributed), one camera each, start in separate maps
    and end in ONE — the merge decision and transform are replicated
    collectives, so both hosts report the identical outcome."""
    n = 2
    port = 19917
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER_IM, str(pid), str(n), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env={k: v for k, v in os.environ.items()
                 if k not in ("XLA_FLAGS", "JAX_PLATFORMS")},
        )
        for pid in range(n)
    ]
    results = {}
    for p in procs:
        out, err = p.communicate(timeout=1000)
        assert p.returncode == 0, f"worker failed:\n{err[-2000:]}"
        line = [l for l in out.splitlines() if l.startswith("RESULT ")][-1]
        r = json.loads(line[len("RESULT "):])
        results[r["pid"]] = r
    assert set(results) == {0, 1}
    for r in results.values():
        assert r["merged"], r
        assert r["map_ids"][0] == r["map_ids"][1], r
    # both hosts agree on every detail of the merge (replicated decision)
    assert results[0]["req"] == results[1]["req"]
    assert results[0]["tgt"] == results[1]["tgt"]
    assert results[0]["map_ids"] == results[1]["map_ids"]
    assert results[0]["T"] == results[1]["T"]
