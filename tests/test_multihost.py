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


@pytest.mark.timeout(600)
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
