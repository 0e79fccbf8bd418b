"""Native codec, .klg round-trip, and UDP frame streaming tests."""

import os
import subprocess
import time

import numpy as np
import pytest

from densemonoslam_tpu.io import native
from densemonoslam_tpu.io.klg import KlgReader, write_klg
from densemonoslam_tpu.io.stream import (
    FrameReceiver,
    FrameSender,
    StreamCameraManager,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module", autouse=True)
def build_native():
    """Build the C++ codec library once (the framework's native runtime)."""
    subprocess.run(["make", "-C", os.path.join(REPO, "native")], check=True)
    import importlib

    importlib.reload(native)
    yield


def test_native_library_loads():
    assert native.HAVE_NATIVE, "libframecodec.so failed to build/load"


def test_zlib_roundtrip(rng):
    depth = rng.integers(0, 5000, (120, 160)).astype(np.uint16)
    comp = native.zlib_compress(depth)
    assert len(comp) < depth.nbytes
    back = native.zlib_decompress(comp, depth.nbytes).view(np.uint16).reshape(120, 160)
    np.testing.assert_array_equal(back, depth)


def test_jpeg_roundtrip(rng):
    from densemonoslam_tpu.io.synthetic import SyntheticSequence

    seq = SyntheticSequence(num_frames=2)
    rgb, _ = seq.frame(0)
    enc = native.jpeg_encode(rgb, quality=95)
    assert len(enc) < rgb.nbytes
    dec = native.jpeg_decode(enc)
    assert dec.shape == rgb.shape
    assert np.mean(np.abs(dec.astype(int) - rgb.astype(int))) < 4.0  # lossy


def test_native_matches_python_fallback(rng):
    """The native zlib path must produce byte-identical decompression and the
    jpeg path near-identical pixels vs the Python fallback."""
    depth = rng.integers(0, 5000, (64, 64)).astype(np.uint16)
    comp = native.zlib_compress(depth)
    import zlib as pyzlib

    np.testing.assert_array_equal(
        native.zlib_decompress(comp, depth.nbytes),
        np.frombuffer(pyzlib.decompress(comp), np.uint8),
    )


def test_klg_roundtrip(tmp_path):
    from densemonoslam_tpu.io.synthetic import SyntheticSequence

    seq = SyntheticSequence(num_frames=4)
    frames = []
    for i in range(4):
        rgb, depth = seq.frame(i)
        frames.append((rgb, (depth * 1000).astype(np.uint16), i))
    path = str(tmp_path / "seq.klg")
    n = write_klg(path, frames, compress=True)
    assert n == 4
    rd = KlgReader(path, 160, 120, depth_factor=1000.0)
    assert len(rd) == 4
    for i in range(4):
        rgb, depth_m, ts = rd.get_next()
        assert ts == float(i)
        ref_rgb, ref_depth = seq.frame(i)
        np.testing.assert_allclose(
            depth_m, (ref_depth * 1000).astype(np.uint16) / 1000.0, atol=1e-6
        )
        assert np.mean(np.abs(rgb.astype(int) - ref_rgb.astype(int))) < 5.0
    assert not rd.has_more()


def test_udp_stream_two_senders():
    """Two cameras stream over loopback UDP; the receiver demuxes by sender
    and creates their queues dynamically (LCM-loopback equivalent of the
    reference's multi-camera test strategy, SURVEY 4.4)."""
    from densemonoslam_tpu.io.synthetic import SyntheticSequence

    port = 17667
    rx = FrameReceiver(port=port)
    mgr = StreamCameraManager(rx, depth_factor=1000.0)
    seq = SyntheticSequence(num_frames=6)
    try:
        tx_a = FrameSender("camA", port=port)
        tx_b = FrameSender("camB", port=port)
        for i in range(3):
            rgb, depth = seq.frame(i)
            d16 = (depth * 1000).astype(np.uint16)
            tx_a.send(rgb, d16, timestamp=i)
            tx_b.send(rgb, d16, timestamp=10 + i, last=(i == 2))
        assert mgr.wait_for_cameras(2, timeout=5.0)
        assert sorted(mgr.cameras()) == ["camA", "camB"]
        got_a = mgr.get_next("camA", timeout=2.0)
        assert got_a is not None
        rgb_a, depth_a, ts_a = got_a
        assert ts_a == 0.0
        ref_rgb, ref_depth = seq.frame(0)
        assert np.mean(np.abs(rgb_a.astype(int) - ref_rgb.astype(int))) < 5.0
        np.testing.assert_allclose(depth_a, (ref_depth * 1000).astype(np.uint16) / 1000.0, atol=1e-6)
        # drain camB to the last frame
        for _ in range(3):
            got_b = mgr.get_next("camB", timeout=2.0)
        assert mgr.finished("camB")
        tx_a.close()
        tx_b.close()
    finally:
        rx.close()


def test_stream_into_engine():
    """Frames stream over UDP straight into the SLAM engine — the reference's
    live collaborative ingestion path end-to-end."""
    import jax

    from densemonoslam_tpu.config import EngineConfig
    from densemonoslam_tpu.engine import Engine
    from densemonoslam_tpu.io.synthetic import SyntheticSequence

    port = 17668
    rx = FrameReceiver(port=port)
    mgr = StreamCameraManager(rx, depth_factor=1000.0)
    seq = SyntheticSequence(num_frames=40, radius=0.35, max_angle=0.3)
    try:
        tx = FrameSender("live0", port=port)
        for i in range(4):
            rgb, depth = seq.frame(i)
            tx.send(rgb, (depth * 1000).astype(np.uint16), timestamp=i)
        assert mgr.wait_for_cameras(1)
        cfg = EngineConfig(
            max_surfels=1 << 16, depth_cutoff=8.0, depth_factor=1000.0,
            nid_keyframing=False, open_loop=True,
        )
        eng = Engine(seq.camera, cfg)
        eng.frontend("live0")
        eng.frontends["live0"].pose = seq.gt_pose(0).astype(np.float32)
        n = 0
        while n < 4:
            got = mgr.get_next("live0", timeout=2.0)
            if got is None:
                break
            rgb, depth_m, ts = got
            info = eng.process_frame("live0", rgb, depth_m * 1000.0, ts)
            assert info["tracking_ok"] == 1.0
            n += 1
        assert n == 4
        assert eng.surfel_count("live0") > 1000
        tx.close()
    finally:
        rx.close()


def test_klg_prefetcher_matches_direct(tmp_path, rng):
    """The async C++ prefetch executor must deliver the exact frames the
    direct (synchronous) decode path produces, strictly in order."""
    assert native.HAVE_PREFETCH
    H, W, N = 48, 64, 24
    frames = []
    for i in range(N):
        rgb = rng.integers(0, 255, (H, W, 3)).astype(np.uint8)
        depth = rng.integers(100, 4000, (H, W)).astype(np.uint16)
        frames.append((rgb, depth, i * 33000))
    path = str(tmp_path / "pf.klg")
    write_klg(path, frames, compress=True)

    direct = KlgReader(path, W, H, prefetch=False)
    pre = KlgReader(path, W, H, prefetch=True)
    assert len(direct) == N and len(pre) == N
    for i in range(N):
        r1, d1, t1 = direct.get_next()
        r2, d2, t2 = pre.get_next()
        np.testing.assert_array_equal(r1, r2)
        np.testing.assert_array_equal(d1, d2)
        assert t1 == t2
    pre.close()


def test_klg_prefetcher_rewind_fast_forward(tmp_path, rng):
    assert native.HAVE_PREFETCH
    H, W, N = 32, 40, 12
    frames = [
        (
            np.full((H, W, 3), i * 10, np.uint8),
            np.full((H, W), 100 + i, np.uint16),
            i,
        )
        for i in range(N)
    ]
    path = str(tmp_path / "ff.klg")
    write_klg(path, frames, compress=False)  # raw: byte-exact depth AND rgb
    r = KlgReader(path, W, H, prefetch=True)
    r.fast_forward(7)
    rgb, depth, ts = r.get_next()
    assert ts == 7 and depth[0, 0] * r.depth_factor == pytest.approx(107)
    r.rewind()
    rgb, depth, ts = r.get_next()
    assert ts == 0 and rgb[0, 0, 0] == 0
    # going backwards after reading ahead must re-sync, not deadlock
    r.fast_forward(3)
    _, _, ts = r.get_next()
    assert ts == 3
    r.rewind()
    _, _, ts = r.get_next()
    assert ts == 0
    r.close()


def test_klg_prefetcher_overlaps_decode(tmp_path, rng):
    """The prefetcher must decode ahead: with a slow consumer the per-frame
    wait should be far below the serial decode cost (smoke check: total wall
    time < serial decode wall time)."""
    H, W, N = 240, 320, 30
    frames = [
        (
            rng.integers(0, 255, (H, W, 3)).astype(np.uint8),
            rng.integers(100, 4000, (H, W)).astype(np.uint16),
            i,
        )
        for i in range(N)
    ]
    path = str(tmp_path / "big.klg")
    write_klg(path, frames, compress=True)

    t0 = time.perf_counter()
    direct = KlgReader(path, W, H, prefetch=False)
    while direct.has_more():
        direct.get_next()
    serial = time.perf_counter() - t0

    pre = KlgReader(path, W, H, prefetch=True)
    pre.get_next()  # warm: workers spin up and race ahead
    time.sleep(serial)  # let the pool finish the whole log
    t0 = time.perf_counter()
    while pre.has_more():
        pre.get_next()
    overlapped = time.perf_counter() - t0
    pre.close()
    # after the pool ran ahead, draining is pure memcpy: well under serial
    assert overlapped < serial, (overlapped, serial)
