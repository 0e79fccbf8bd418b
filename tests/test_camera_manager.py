"""Camera manager tests (reference `MultiCameraManagerFactory.h:13-45` +
`Tools/Multi*.h`): multi-log replay, mixed log+live sessions, factory
selection, and the round-robin engine session loop."""

import numpy as np
import pytest

from densemonoslam_tpu.config import (
    CameraConfig, CameraIntrinsics, EngineConfig, FrameResolution,
)
from densemonoslam_tpu.engine import Engine
from densemonoslam_tpu.io.camera_manager import (
    LogCamera, MultiLogCameraManager, MultiMixedCameraManager,
    make_camera_manager, run_session,
)
from densemonoslam_tpu.io.klg import KlgReader, write_klg
from densemonoslam_tpu.io.stream import FrameReceiver, FrameSender
from densemonoslam_tpu.io.synthetic import SyntheticSequence

W, H = 96, 72


def _camera(name="cam"):
    return CameraConfig(
        FrameResolution(W, H),
        CameraIntrinsics(79.2, 79.2, W / 2 - 0.5, H / 2 - 0.5),
        name,
    )


def _write_log(path, seq, start, n):
    frames = []
    for i in range(start, start + n):
        rgb, depth = seq.frame(i)
        frames.append(
            (np.asarray(rgb), (np.asarray(depth) * 1000).astype(np.uint16),
             i)
        )
    write_klg(str(path), frames)


@pytest.fixture(scope="module")
def two_logs(tmp_path_factory):
    d = tmp_path_factory.mktemp("logs")
    seq = SyntheticSequence(camera=_camera(), num_frames=16)
    a, b = d / "a.klg", d / "b.klg"
    _write_log(a, seq, 0, 6)
    _write_log(b, seq, 4, 6)  # overlapping territory
    return str(a), str(b)


def test_factory_selection(two_logs):
    a, b = two_logs
    mgr = make_camera_manager([a, b], W, H)
    assert isinstance(mgr, MultiLogCameraManager)
    assert mgr.cameras() == ["cam0", "cam1"]
    live = make_camera_manager([], W, H, live_port=0)
    assert hasattr(live, "receiver")  # StreamCameraManager
    live.receiver.close()
    mixed = make_camera_manager([a], W, H, n_sensors=2, live_port=0)
    assert isinstance(mixed, MultiMixedCameraManager)
    mixed.live.receiver.close()


def test_multilog_protocol(two_logs):
    a, _ = two_logs
    mgr = make_camera_manager([a], W, H)
    assert mgr.wait_for_cameras(1)
    rgb, depth, ts = mgr.get_next("cam0")
    assert rgb.shape == (H, W, 3) and depth.dtype == np.float32
    assert 0.1 < depth[depth > 0].mean() < 10.0  # metric, not millimetres
    n = 1
    while not mgr.finished("cam0"):
        assert mgr.get_next("cam0") is not None
        n += 1
    assert n == 6


def test_run_session_two_cameras(two_logs):
    a, b = two_logs
    mgr = make_camera_manager([a, b], W, H)
    cfg = EngineConfig(
        max_surfels=1 << 14, depth_cutoff=10.0, depth_factor=1.0,
        open_loop=True, nid_keyframing=False,
    )
    eng = Engine(_camera(), cfg)
    processed = run_session(eng, mgr, max_frames=6)
    assert processed == {"cam0": 6, "cam1": 6}
    assert set(eng.frontends) == {"cam0", "cam1"}
    assert eng.frontends["cam0"].tick == 6
    assert eng.surfel_count("cam0") > 0 and eng.surfel_count("cam1") > 0
    assert len(eng.frontends["cam0"].trajectory) == 6


def test_mixed_session_log_plus_live(two_logs):
    a, _ = two_logs
    recv = FrameReceiver(port=0)
    mgr = make_camera_manager(
        [a], W, H, n_sensors=2, live_port=recv.port
    )
    # replace the factory's receiver with ours (port 0 would race otherwise)
    mgr.live.receiver.close()
    from densemonoslam_tpu.io.stream import StreamCameraManager

    mgr.live = StreamCameraManager(recv, depth_factor=1000.0)
    seq = SyntheticSequence(camera=_camera(), num_frames=16)
    sender = FrameSender("live0", port=recv.port)
    for i in range(4, 8):
        rgb, depth = seq.frame(i)
        sender.send(
            np.asarray(rgb), (np.asarray(depth) * 1000).astype(np.uint16),
            timestamp=i, last=(i == 7),
        )
    assert mgr.wait_for_cameras(2, timeout=10.0)
    assert set(mgr.cameras()) == {"cam0", "live0"}
    cfg = EngineConfig(
        max_surfels=1 << 14, depth_cutoff=10.0, depth_factor=1.0,
        open_loop=True, nid_keyframing=False,
    )
    eng = Engine(_camera(), cfg)
    processed = run_session(eng, mgr, max_frames=4, wait_timeout=0.3)
    assert processed["cam0"] == 4
    assert processed["live0"] == 4
    assert eng.frontends["live0"].tick == 4
    sender.close()
    recv.close()


def test_cli_multi_camera_session(two_logs, tmp_path):
    """`--logs a.klg b.klg` runs a collaborative session end-to-end through
    the CLI (the reference `--l log1 --l log2` mode) and exports per-camera
    trajectories + per-map clouds."""
    import os
    import subprocess
    import sys

    a, b = two_logs
    out = tmp_path / "multi"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    proc = subprocess.run(
        [
            sys.executable, "-m", "densemonoslam_tpu.cli",
            "--platform", "cpu", "--logs", a, b,
            "--width", str(W), "--height", str(H),
            "--frames", "5", "--open-loop", "--no-nid",
            "--max-surfels", str(1 << 14), "--out", str(out),
        ],
        capture_output=True, text=True, timeout=500,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "over 2 cameras" in proc.stdout
    for f in ["cam0.freiburg", "cam1.freiburg", "cam0.ply", "cam1.ply"]:
        assert (out / f).exists(), f
