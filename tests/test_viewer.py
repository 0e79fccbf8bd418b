"""Live web viewer tests (reference Pangolin GUI parity, `GUI/src/Tools/GUI.h`
+ the MainController live-parameter sync, `MainController.cpp:768-781`).

Drives the real HTTP server end-to-end: status/images/trajectory/cloud GETs,
pause/step/save controls, and a live slider change that swaps the engine's
jitted step through the step cache.
"""

import json
import os
import struct
import threading
import time
import urllib.request

import numpy as np
import pytest

from densemonoslam_tpu.config import (
    CameraConfig, CameraIntrinsics, EngineConfig, FrameResolution,
)
from densemonoslam_tpu.engine import Engine
from densemonoslam_tpu.io.synthetic import SyntheticSequence
from densemonoslam_tpu.viewer import ViewerServer


def _get(url, binary=False):
    with urllib.request.urlopen(url, timeout=10) as r:
        body = r.read()
        return r.status, body if binary else body.decode()


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(), method="POST"
    )
    try:
        with urllib.request.urlopen(req, timeout=10) as r:
            return r.status, r.read().decode()
    except urllib.error.HTTPError as e:
        return e.code, e.read().decode()


@pytest.fixture(scope="module")
def served(tmp_path_factory):
    W, H = 80, 60
    camera = CameraConfig(
        FrameResolution(W, H),
        CameraIntrinsics(66.0, 66.0, W / 2 - 0.5, H / 2 - 0.5),
        "cam0",
    )
    seq = SyntheticSequence(camera=camera, num_frames=10)
    cfg = EngineConfig(
        max_surfels=1 << 14, depth_cutoff=10.0, depth_factor=1.0,
        open_loop=True, nid_keyframing=False,
    )
    eng = Engine(camera, cfg)
    eng.frontend("cam0")
    out = str(tmp_path_factory.mktemp("viewer_out"))
    srv = ViewerServer(eng, out_dir=out, cloud_max_points=5000)
    port = srv.start()
    for i in range(6):
        rgb, depth = seq.frame(i)
        eng.process_frame("cam0", rgb, depth, float(i), sync=False)
    srv.sync(["cam0"])  # services the initial cloud request
    srv.publish("cam0")
    yield eng, srv, f"http://127.0.0.1:{port}", out
    srv.stop()


def test_page_and_status(served):
    eng, srv, base, _ = served
    status, html = _get(base + "/")
    assert status == 200 and "densemonoslam_tpu" in html
    status, body = _get(base + "/api/status")
    st = json.loads(body)
    assert st["cams"]["cam0"]["tick"] == 6
    assert st["cams"]["cam0"]["surfels"] > 0
    assert len(st["cams"]["cam0"]["icp_err"]) == 6
    assert "confidence_threshold" in st["params"]


def test_view_images_and_traj(served):
    _, _, base, _ = served
    for kind in ("rgb", "depth", "normals"):
        status, blob = _get(base + f"/api/view/cam0/{kind}.png", binary=True)
        assert status == 200 and blob[:8] == b"\x89PNG\r\n\x1a\n"
    status, body = _get(base + "/api/traj/cam0")
    traj = json.loads(body)
    assert len(traj) == 6 and len(traj[0]) == 3


def test_cloud_blob(served):
    eng, _, base, _ = served
    status, blob = _get(base + "/api/cloud/cam0", binary=True)
    assert status == 200
    (n,) = struct.unpack_from("<I", blob, 0)
    assert n > 0
    assert len(blob) == 4 + n * 12 + n * 3
    pos = np.frombuffer(blob, np.float32, n * 3, 4).reshape(n, 3)
    assert np.isfinite(pos).all()


def test_live_param_sync(served):
    eng, srv, base, _ = served
    old_step = eng.frontends["cam0"].step_fn
    status, _ = _post(base + "/api/param", {"confidence_threshold": 5.0})
    assert status == 200
    srv.sync(["cam0"])
    assert eng.config.confidence_threshold == 5.0
    assert eng.frontends["cam0"].step_fn is not old_step
    # sliding back to the original value reuses the cached step (no rebuild)
    _post(base + "/api/param", {"confidence_threshold": 10.0})
    srv.sync(["cam0"])
    assert eng.frontends["cam0"].step_fn is old_step
    status, body = _post(base + "/api/param", {"max_surfels": 1})
    assert status == 400  # shape-changing fields are not tunable


def test_pause_step_resume(served):
    eng, srv, base, _ = served
    _post(base + "/api/control", {"action": "pause"})
    assert srv.paused
    done = threading.Event()

    def runner():
        srv.sync(["cam0"])  # blocks until step/resume
        done.set()

    t = threading.Thread(target=runner, daemon=True)
    t.start()
    time.sleep(0.15)
    assert not done.is_set()  # paused: sync is blocking
    _post(base + "/api/control", {"action": "step"})
    done.wait(5.0)
    assert done.is_set()  # single-step released exactly one frame
    _post(base + "/api/control", {"action": "resume"})
    assert not srv.paused
    srv.sync(["cam0"])  # non-blocking now


def test_save_requests(served):
    eng, srv, base, out = served
    _post(base + "/api/control", {"action": "save_ply"})
    _post(base + "/api/control", {"action": "save_traj"})
    srv.sync(["cam0"])
    assert os.path.exists(os.path.join(out, "cam0.ply"))
    assert os.path.exists(os.path.join(out, "cam0.freiburg"))
    status, _ = _post(base + "/api/control", {"action": "no_such"})
    assert status == 400
