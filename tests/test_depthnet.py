"""Depth network tests: shapes, training convergence on the synthetic scene,
weight round-trip, and the monocular engine path."""

import numpy as np
import optax
import pytest

import jax
import jax.numpy as jnp

from densemonoslam_tpu.config import CameraConfig, CameraIntrinsics, FrameResolution
from densemonoslam_tpu.io.synthetic import SyntheticSequence
from densemonoslam_tpu.models.depthnet import (
    DepthNet,
    DepthPredictor,
    make_train_step,
)

WIDTHS = (8, 16, 24)  # tiny net for CPU tests


@pytest.fixture(scope="module")
def seq():
    res = FrameResolution(64, 48)
    cam = CameraConfig(res, CameraIntrinsics(52.0, 52.0, 31.5, 23.5), "tiny")
    return SyntheticSequence(camera=cam, num_frames=12, radius=0.3, max_angle=0.25)


def test_predictor_shapes_and_range(seq):
    pred = DepthPredictor(widths=WIDTHS, min_depth=0.3, max_depth=10.0)
    rgb, _ = seq.frame(0)
    d = pred.predict(jnp.asarray(rgb))
    assert d.shape == (48, 64)
    d = np.asarray(d)
    assert np.all(d >= 0.3 - 1e-3) and np.all(d <= 10.0 + 1e-3)


def test_training_learns_synthetic_depth(seq):
    """A few hundred supervised steps on the box-room frames must cut the
    depth error far below the untrained baseline — verifies gradients flow
    through the whole decoder."""
    net = DepthNet(widths=WIDTHS, min_depth=0.3, max_depth=10.0)
    rgbs = []
    gts = []
    for i in range(8):
        rgb, depth = seq.frame(i)
        rgbs.append(rgb.astype(np.float32) / 255.0)
        gts.append(depth)
    rgb_b = jnp.asarray(np.stack(rgbs))
    gt_b = jnp.asarray(np.stack(gts))
    params = net.init(jax.random.PRNGKey(0), rgb_b[:1])["params"]
    opt = optax.adam(3e-3)
    opt_state = opt.init(params)
    step = make_train_step(net, opt)
    loss0 = None
    for it in range(400):
        params, opt_state, loss = step(params, opt_state, rgb_b, gt_b)
        if it == 0:
            loss0 = float(loss)
    assert float(loss) < 0.5 * loss0, (loss0, float(loss))
    # fitted-frame error clearly better than predicting the mean depth
    # (true held-out generalisation needs far more data than a unit test)
    rgb, depth = seq.frame(0)
    pred = net.apply({"params": params}, jnp.asarray(rgb[None], jnp.float32) / 255.0)[0]
    err = float(jnp.mean(jnp.abs(pred - depth)))
    base = float(np.mean(np.abs(depth.mean() - depth)))
    assert err < base, (err, base)


def test_weight_roundtrip(tmp_path, seq):
    p1 = DepthPredictor(widths=WIDTHS, seed=1)
    rgb, _ = seq.frame(0)
    d1 = np.asarray(p1.predict(jnp.asarray(rgb)))
    path = str(tmp_path / "w.npz")
    p1.save(path)
    p2 = DepthPredictor(widths=WIDTHS, seed=2)  # different init
    p2.load(path, 48, 64)
    d2 = np.asarray(p2.predict(jnp.asarray(rgb)))
    np.testing.assert_allclose(d1, d2, atol=1e-6)


def test_engine_monocular_mode(seq):
    """`predict_depth` mode: the engine consumes RGB only, depth comes from
    the network (reference `--predict_depth` KITTI path).  With an untrained
    net the geometry is wrong but the plumbing must hold together."""
    from densemonoslam_tpu.config import EngineConfig
    from densemonoslam_tpu.engine import Engine

    cfg = EngineConfig(
        max_surfels=1 << 15,
        depth_cutoff=10.0,
        depth_factor=1.0,
        nid_keyframing=False,
        open_loop=True,
        predict_depth=True,
    )
    eng = Engine(seq.camera, cfg)
    eng.frontend("cam0")
    eng.set_depth_predictor(DepthPredictor(widths=WIDTHS, min_depth=0.3, max_depth=10.0))
    for i in range(3):
        rgb, _ = seq.frame(i)
        info = eng.process_frame("cam0", rgb, None, float(i))
    assert eng.surfel_count("cam0") > 500


def _encode_varint(x):
    out = b""
    while True:
        b = x & 0x7F
        x >>= 7
        if x:
            out += bytes([b | 0x80])
        else:
            out += bytes([b])
            return out


def _field(num, wt, payload):
    key = _encode_varint((num << 3) | wt)
    if wt == 2:
        return key + _encode_varint(len(payload)) + payload
    return key + payload


def _tensor_proto(name, arr):
    body = b""
    for d in arr.shape:
        body += _field(1, 0, _encode_varint(d))
    body += _field(2, 0, _encode_varint(1))  # f32
    body += _field(8, 2, name.encode())
    body += _field(9, 2, arr.astype("<f4").tobytes())
    return body


def test_onnx_initializer_roundtrip(tmp_path):
    """The minimal ONNX reader recovers initializer tensors by name
    (the reference's normnet ONNX weight path, DepthPrediction.cpp)."""
    import numpy as np

    from densemonoslam_tpu.models import onnx_import

    w = np.random.default_rng(0).normal(size=(8, 3, 3, 3)).astype(np.float32)
    b = np.arange(8, dtype=np.float32)
    graph = _field(5, 2, _tensor_proto("conv1.weight", w)) + _field(
        5, 2, _tensor_proto("conv1.bias", b)
    )
    model = _field(7, 2, graph)
    p = tmp_path / "tiny.onnx"
    p.write_bytes(model)

    out = onnx_import.load_initializers(str(p))
    np.testing.assert_array_equal(out["conv1.weight"], w)
    np.testing.assert_array_equal(out["conv1.bias"], b)
    # OIHW -> HWIO conv relayout
    params = onnx_import.load_depthnet_params(
        str(p), {"conv1.weight": "enc0/Conv_0/kernel", "conv1.bias": "enc0/Conv_0/bias"}
    )
    assert params["enc0"]["Conv_0"]["kernel"].shape == (3, 3, 3, 8)
    np.testing.assert_array_equal(
        params["enc0"]["Conv_0"]["kernel"][1, 2, 0, 5], w[5, 0, 1, 2]
    )


def test_pretrained_monocular_tracks():
    """The PACKAGED weights (examples/train_depthnet.py) make monocular mode
    functional: <12% relative depth error on a scene view and bounded ATE
    when the engine runs RGB-only (reference `--predict_depth` headline
    capability, `DepthPrediction.cpp:3-169`)."""
    import numpy as np

    from densemonoslam_tpu.config import EngineConfig
    from densemonoslam_tpu.engine import Engine
    from densemonoslam_tpu.eval import ate_rmse

    # the packaged net operates at the scene's native 160x120 feed
    seq = SyntheticSequence(num_frames=40, radius=0.35, max_angle=0.3)
    pred = DepthPredictor.pretrained_synthetic()
    rgb, depth = seq.frame(0)
    d_hat = np.asarray(pred.predict(jnp.asarray(rgb)))
    m = depth > 0
    rel = np.mean(np.abs(d_hat[m] - depth[m]) / depth[m])
    assert rel < 0.12, rel

    cfg = EngineConfig(
        max_surfels=1 << 17,
        depth_cutoff=8.0,
        depth_factor=1.0,
        nid_keyframing=False,
        open_loop=True,
        predict_depth=True,
    )
    eng = Engine(seq.camera, cfg)
    eng.frontend("cam0")
    eng.set_depth_predictor(pred)
    eng.frontends["cam0"].pose = seq.gt_pose(0).astype(np.float32)
    n_ok = 0
    for i in range(10):
        rgb, _ = seq.frame(i)
        info = eng.process_frame("cam0", rgb, None, float(i))
        n_ok += info["tracking_ok"] == 1.0
    # CNN depth is ~7% biased: an early frame may fail its guard and
    # recover; the trajectory must still stay bounded
    assert n_ok >= 8, n_ok
    est = [p for _, p in eng.frontends["cam0"].trajectory]
    gt = [seq.gt_pose(i) for i in range(10)]
    assert ate_rmse(est, gt) < 0.15


def test_onnx_full_depthnet_import(tmp_path):
    """A full normnet-shaped ONNX file (every conv/groupnorm tensor of the
    packaged net, conv kernels in ONNX OIHW layout) imports into a working
    DepthNet whose predictions match the original bit-for-bit."""
    import numpy as np
    import jax

    from densemonoslam_tpu.models import onnx_import

    pred = DepthPredictor.pretrained_synthetic()
    flat = jax.tree_util.tree_flatten_with_path(pred.params)[0]
    graph = b""
    name_map = {}
    for ks, v in flat:
        path = "/".join(str(k.key) for k in ks)
        onnx_name = "normnet." + path.replace("/", ".")
        arr = np.asarray(v)
        if path.endswith("/kernel") and arr.ndim == 4:
            arr = np.transpose(arr, (3, 2, 0, 1))  # HWIO -> OIHW
        graph += _field(5, 2, _tensor_proto(onnx_name, arr))
        name_map[onnx_name] = path
    p = tmp_path / "normnet_like.onnx"
    p.write_bytes(_field(7, 2, graph))

    params = onnx_import.load_depthnet_params(str(p), name_map)
    pred2 = DepthPredictor(
        params=jax.tree.map(jnp.asarray, params),
        widths=pred.net.widths,
        min_depth=pred.net.min_depth,
        max_depth=pred.net.max_depth,
    )
    rgb = (np.random.default_rng(1).uniform(0, 255, (120, 160, 3))).astype(
        np.uint8
    )
    a = np.asarray(pred.predict(jnp.asarray(rgb)))
    b = np.asarray(pred2.predict(jnp.asarray(rgb)))
    np.testing.assert_allclose(a, b, atol=1e-5)
