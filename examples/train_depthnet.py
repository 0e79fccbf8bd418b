"""Train the monocular DepthNet on the synthetic RGB-D scene.

The reference ships a pre-trained ONNX "normnet" for monocular KITTI
(`GUI/src/Tools/DepthPrediction.cpp`); no public checkpoint is available in
this environment, so the packaged weights are distilled from the analytic
synthetic scene instead: the net learns RGB -> metric depth to <10% mean
relative error on held-out views, which makes the monocular engine mode
(`predict_depth=True`) actually functional end-to-end.

Usage:  python examples/train_depthnet.py [--steps 600] [--cpu]
Writes: densemonoslam_tpu/models/weights/depthnet_synthetic.npz
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--batch", type=int, default=4)
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from densemonoslam_tpu.io.synthetic import SyntheticSequence
    from densemonoslam_tpu.models.depthnet import (
        DepthNet, DepthPredictor, make_train_step,
    )

    # diverse views of the scene: several orbits at different radii/angles
    seqs = [
        SyntheticSequence(num_frames=40, radius=r, max_angle=a)
        for (r, a) in (
            [(0.15, 0.15), (0.35, 0.3), (0.5, 0.45), (0.25, 0.6)]
        )
    ]
    frames = []
    for seq in seqs:
        for i in range(len(seq)):
            rgb, depth = seq.frame(i)
            frames.append((np.asarray(rgb), np.asarray(depth)))
    rng = np.random.default_rng(0)
    idx = rng.permutation(len(frames))
    held = idx[:12]
    train = idx[12:]
    print(f"{len(train)} train / {len(held)} held-out frames")

    net = DepthNet(widths=(16, 32, 64), min_depth=0.5, max_depth=10.0)
    pred = DepthPredictor(widths=(16, 32, 64), min_depth=0.5, max_depth=10.0)
    H, W = frames[0][1].shape
    pred.init_for(H, W)
    params = pred.params
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    step = make_train_step(net, opt)

    t0 = time.time()
    for it in range(args.steps):
        take = rng.choice(train, args.batch, replace=False)
        rgb = jnp.asarray(
            np.stack([frames[i][0] for i in take]).astype(np.float32) / 255.0
        )
        dep = jnp.asarray(np.stack([frames[i][1] for i in take]))
        params, opt_state, loss = step(params, opt_state, rgb, dep)
        if it % 50 == 0 or it == args.steps - 1:
            print(f"step {it}: loss {float(loss):.4f}  ({time.time()-t0:.0f}s)")

    # held-out mean relative depth error
    pred._params = params
    rels = []
    for i in held:
        rgb, dep = frames[i]
        d_hat = np.asarray(pred.predict(jnp.asarray(rgb)))
        m = dep > 0
        rels.append(np.mean(np.abs(d_hat[m] - dep[m]) / dep[m]))
    rel = float(np.mean(rels))
    print(f"held-out mean relative depth error: {rel*100:.2f}%")

    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "densemonoslam_tpu", "models", "weights", "depthnet_synthetic.npz",
    )
    os.makedirs(os.path.dirname(out), exist_ok=True)
    pred.save(out)
    # record the architecture + eval alongside the weights
    import json

    with open(out.replace(".npz", ".json"), "w") as f:
        json.dump(
            {
                "widths": [16, 32, 64],
                "min_depth": 0.5,
                "max_depth": 10.0,
                "holdout_rel_err": rel,
                "train_frames": len(train),
                "steps": args.steps,
            },
            f,
            indent=2,
        )
    print(f"saved {out}")
    assert rel < 0.10, "training did not reach <10% relative error"


if __name__ == "__main__":
    main()
