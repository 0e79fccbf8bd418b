"""FillIn: composite predicted model maps with raw-frame data where the
prediction has holes.

Equivalent of the reference `FillIn` passes (`Core/src/Shaders/FillIn.{h,cpp}`
+ `fill_rgb/vertex/normal.frag`): tracking wants dense model maps; wherever
the splat prediction is empty (young map, disocclusion), fall back to the
live frame so the tracker always has full support.  `passthrough` mirrors the
reference's lost/frame-to-frame mode where the raw frame replaces the
prediction entirely.

Unlike the reference (which re-renders the model every frame, so prediction
and frame share a camera), the engine tracks against a STORED prediction
rendered at `model_pose`; the live frame's geometry then lives in a different
camera frame and must be transformed by `frame_to_model` before compositing —
otherwise hole-filled pixels have zero residual at identity instead of at the
warm-start relative pose, biasing the tracker toward the stale render pose.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class FilledModel(NamedTuple):
    intensity: jnp.ndarray  # [H,W]
    depth: jnp.ndarray  # [H,W]
    vmap: jnp.ndarray  # [H,W,3]
    nmap: jnp.ndarray  # [H,W,3]


def fill_in(
    pred_intensity: jnp.ndarray,
    pred_depth: jnp.ndarray,
    pred_vmap: jnp.ndarray,
    pred_nmap: jnp.ndarray,
    frame_intensity: jnp.ndarray,
    frame_depth: jnp.ndarray,
    frame_vmap: jnp.ndarray,
    frame_nmap: jnp.ndarray,
    passthrough: jnp.ndarray | bool = False,
    frame_to_model: jnp.ndarray | None = None,
) -> FilledModel:
    """Hole pixels of the prediction take the live frame's data; geometry is
    optionally transformed into the prediction's camera frame first."""
    hole = (pred_depth <= 0) | jnp.asarray(passthrough)
    if frame_to_model is None:
        fv, fn = frame_vmap, frame_nmap
    else:
        R, t = frame_to_model[:3, :3], frame_to_model[:3, 3]
        fv = jnp.sum(R * frame_vmap[..., None, :], axis=-1) + t
        fn = jnp.sum(R * frame_nmap[..., None, :], axis=-1)
    frame_ok = frame_vmap[..., 2] > 0
    take = (hole & frame_ok)[..., None]
    return FilledModel(
        intensity=jnp.where(hole, frame_intensity, pred_intensity),
        depth=jnp.where(hole & frame_ok, frame_depth, pred_depth),
        vmap=jnp.where(take, fv, pred_vmap),
        nmap=jnp.where(take, fn, pred_nmap),
    )
