"""Train the monocular DepthNet on the street-scale procedural scene.

The reference's monocular KITTI mode runs a pre-trained "normnet" ONNX depth
CNN (`GUI/src/Tools/DepthPrediction.cpp`); no checkpoint is retrievable here,
so the packaged street weights are trained on the analytic street loop
(`io/street.py`) — the same scene the long-trajectory monocular pipeline
(BASELINE config 3 stand-in) is evaluated on, with held-out views and
exposure jitter so the net learns appearance->depth, not frame identity.

Usage:  python examples/train_depthnet_street.py [--steps 800] [--cpu]
Writes: densemonoslam_tpu/models/weights/depthnet_street.{npz,json}
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=800)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--frames", type=int, default=260)
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from densemonoslam_tpu.io.street import StreetSequence
    from densemonoslam_tpu.models.depthnet import (
        DepthNet, DepthPredictor, make_train_step,
    )

    MIN_D, MAX_D = 2.0, 80.0
    WIDTHS = (16, 32, 64)

    from densemonoslam_tpu.config import CameraConfig

    # two laps at different radii + exposure jitter at the quarter-KITTI
    # test resolution, plus a lap at the FULL 1024x320 KITTI operating point:
    # conv receptive fields are fixed in pixels, so single-resolution
    # training does not transfer across a 4x scale change (measured 6% ->
    # 34% rel error)
    seqs = [
        StreetSequence(num_frames=args.frames, radius=50.0, exposure_jitter=0.05),
        StreetSequence(num_frames=args.frames // 2, radius=38.0, exposure_jitter=0.05),
    ]
    kitti_seq = StreetSequence(
        camera=CameraConfig.kitti_default(), num_frames=args.frames // 2,
        radius=44.0, exposure_jitter=0.05,
    )
    frames = []
    for seq in seqs:
        for i in range(len(seq)):
            rgb, depth = seq.frame(i)
            frames.append((np.asarray(rgb), np.asarray(depth)))
    frames_k = []
    for i in range(len(kitti_seq)):
        rgb, depth = kitti_seq.frame(i)
        frames_k.append((np.asarray(rgb), np.asarray(depth)))
    rng = np.random.default_rng(0)
    idx = rng.permutation(len(frames))
    held = idx[:16]
    train = idx[16:]
    idx_k = rng.permutation(len(frames_k))
    held_k = idx_k[:8]
    train_k = idx_k[8:]
    print(f"{len(train)}+{len(train_k)} train / {len(held)}+{len(held_k)} held")

    net = DepthNet(widths=WIDTHS, min_depth=MIN_D, max_depth=MAX_D)
    pred = DepthPredictor(widths=WIDTHS, min_depth=MIN_D, max_depth=MAX_D)
    H, W = frames[0][1].shape
    pred.init_for(H, W)
    params = pred.params
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    step = make_train_step(net, opt)

    t0 = time.time()
    for it in range(args.steps):
        # alternate resolutions (each shape jits once)
        if it % 3 == 2:
            take = rng.choice(train_k, max(args.batch // 2, 1), replace=False)
            pool = frames_k
        else:
            take = rng.choice(train, args.batch, replace=False)
            pool = frames
        rgb = jnp.asarray(
            np.stack([pool[i][0] for i in take]).astype(np.float32) / 255.0
        )
        dep = jnp.asarray(np.stack([pool[i][1] for i in take]))
        params, opt_state, loss = step(params, opt_state, rgb, dep)
        if it % 50 == 0 or it == args.steps - 1:
            print(f"step {it}: loss {float(loss):.4f}  ({time.time()-t0:.0f}s)")

    # held-out mean relative depth error, both resolutions
    apply = jax.jit(lambda p, x: net.apply({"params": p}, x))

    def rel_err(pool, ids):
        rels = []
        for i in ids:
            rgb, dep = pool[i]
            d_hat = np.asarray(
                apply(params, jnp.asarray(rgb[None].astype(np.float32) / 255.0))
            )[0]
            m = dep > 0
            rels.append(np.mean(np.abs(d_hat[m] - dep[m]) / dep[m]))
        return float(np.mean(rels))

    rel = rel_err(frames, held)
    rel_k = rel_err(frames_k, held_k)
    print(f"held-out rel depth err: {rel*100:.1f}% (256x80), "
          f"{rel_k*100:.1f}% (1024x320)")

    base = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "densemonoslam_tpu", "models", "weights",
    )
    os.makedirs(base, exist_ok=True)
    pred._params = params
    pred.save(os.path.join(base, "depthnet_street.npz"))
    with open(os.path.join(base, "depthnet_street.json"), "w") as f:
        json.dump(
            {
                "widths": list(WIDTHS), "min_depth": MIN_D, "max_depth": MAX_D,
                "held_out_rel_err": rel, "held_out_rel_err_kitti": rel_k,
                "train_res": [H, W],
            },
            f,
        )
    print("saved depthnet_street.npz")


if __name__ == "__main__":
    main()
