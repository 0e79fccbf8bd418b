"""Mid-session checkpoint / resume.

The reference has NO mid-session checkpointing (SURVEY §5.4) — only
end-of-session `.ply`/`.freiburg` exports — because its state lives in GL
VBOs, CUDA buffers and host structs.  Here the entire SLAM state is a pytree
of device arrays (`step.SlamState` + fern DB + pose/stats logs), so
checkpointing is a dictionary of ndarrays: save with `numpy.savez`, restore
with `device_put`.  A crashed or preempted session resumes bit-exactly.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from densemonoslam_tpu import loops as loopsmod
from densemonoslam_tpu import step as stepmod


def save_frontend(path: str, fe) -> None:
    """Serialise a frontend's full device state + host logs to one .npz."""
    payload = {}
    for k, v in fe.state._asdict().items():
        if isinstance(v, tuple):  # e.g. the model_pack pyramid
            for i, vi in enumerate(v):
                payload[f"state_{k}__{i}"] = np.asarray(vi)
        else:
            payload[f"state_{k}"] = np.asarray(v)
    if fe.fern_state is not None:
        payload.update(
            {f"ferndb_{k}": np.asarray(v) for k, v in fe.fern_state.db._asdict().items()}
        )
        payload.update(
            {f"coder_{k}": np.asarray(v) for k, v in fe.fern_state.coder._asdict().items()}
        )
    n = len(fe.ts_log)
    payload["pose_log"] = (
        np.asarray(fe.pose_hist[:n])
        if fe.pose_hist is not None
        else np.zeros((0, 4, 4), np.float32)
    )
    payload["hist_times"] = (
        np.asarray(fe.hist_times[:n])
        if fe.hist_times is not None
        else np.zeros((0,), np.float32)
    )
    payload["ts_log"] = np.asarray(fe.ts_log, np.float64)
    payload["stats_log"] = (
        np.stack([np.asarray(s) for s in fe.stats_log])
        if fe.stats_log
        else np.zeros((0, stepmod.N_STATS_TOTAL), np.float32)
    )
    payload["tick"] = np.asarray(fe.tick)
    np.savez_compressed(path, **payload)


def load_frontend(path: str, fe) -> None:
    """Restore a frontend saved by `save_frontend` (in place)."""
    z = np.load(path)
    fields = {}
    for k in stepmod.SlamState._fields:
        if f"state_{k}" in z:
            fields[k] = jnp.asarray(z[f"state_{k}"])
        elif f"state_{k}__0" in z:  # tuple field saved level-wise
            lv = 0
            vals = []
            while f"state_{k}__{lv}" in z:
                vals.append(jnp.asarray(z[f"state_{k}__{lv}"]))
                lv += 1
            fields[k] = tuple(vals)
        else:
            # field absent from the checkpoint (written by an older build):
            # fall back to the frontend's freshly-initialised default rather
            # than a malformed empty value.  init_state sets model_age to
            # MODEL_INVALID_AGE, so resumed old checkpoints re-render the
            # tracking model on the first step instead of crashing obscurely.
            fields[k] = getattr(fe.state, k)
    fe.state = stepmod.SlamState(**fields)
    if "ferndb_codes" in z:
        from densemonoslam_tpu.mapping import ferns as fernmod

        fe.fern_state = loopsmod.FernLoopState(
            coder=fernmod.FernCoder(
                **{k: jnp.asarray(z[f"coder_{k}"]) for k in fernmod.FernCoder._fields}
            ),
            db=fernmod.FernDB(
                **{k: jnp.asarray(z[f"ferndb_{k}"]) for k in fernmod.FernDB._fields}
            ),
        )
    n = z["pose_log"].shape[0]
    cap = 1024
    while cap < max(n + 1, 1):
        cap *= 2
    hist = np.zeros((cap, 4, 4), np.float32)
    hist[:n] = z["pose_log"]
    htimes = np.zeros((cap,), np.float32)
    if "hist_times" in z:
        htimes[:n] = z["hist_times"]
    else:  # older checkpoint: session ticks = frame index (single camera)
        htimes[:n] = np.arange(n, dtype=np.float32)
    fe.pose_hist = jnp.asarray(hist)
    fe.hist_times = jnp.asarray(htimes)
    fe.ts_log = list(z["ts_log"])
    stats_arr = z["stats_log"]
    if stats_arr.shape[0] > 0 and stats_arr.shape[1] < stepmod.N_STATS_TOTAL:
        # checkpoint predates the pose-carrying stats widening: pad each row
        # to N_STATS_TOTAL with the matching pose from the pose history (the
        # rows are frame-aligned with pose_log) so new frames can append
        # full-width rows without making the log ragged
        pad_poses = np.zeros(
            (stats_arr.shape[0], stepmod.N_STATS_TOTAL - stats_arr.shape[1]),
            np.float32,
        )
        n_pose = min(stats_arr.shape[0], z["pose_log"].shape[0])
        if pad_poses.shape[1] == 16 and n_pose > 0:
            pad_poses[:n_pose] = z["pose_log"][:n_pose].reshape(n_pose, 16)
        stats_arr = np.concatenate([stats_arr, pad_poses], axis=1)
    fe.stats_log = [jnp.asarray(s) for s in stats_arr]
    fe.tick = int(z["tick"])
