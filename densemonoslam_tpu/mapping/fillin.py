"""FillIn: composite predicted model maps with raw-frame data where the
prediction has holes.

Equivalent of the reference `FillIn` passes (`Core/src/Shaders/FillIn.{h,cpp}`
+ `fill_rgb/vertex/normal.frag`): tracking wants dense model maps; wherever
the splat prediction is empty (young map, disocclusion), fall back to the
live frame so the tracker always has full support.  `passthrough` mirrors the
reference's lost/frame-to-frame mode where the raw frame replaces the
prediction entirely.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp


class FilledModel(NamedTuple):
    intensity: jnp.ndarray  # [H,W]
    depth: jnp.ndarray  # [H,W]
    vmap: jnp.ndarray  # [H,W,3]
    nmap: jnp.ndarray  # [H,W,3]


@jax.jit
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
) -> FilledModel:
    hole = (pred_depth <= 0) | jnp.asarray(passthrough)
    return FilledModel(
        intensity=jnp.where(hole, frame_intensity, pred_intensity),
        depth=jnp.where(hole, frame_depth, pred_depth),
        vmap=jnp.where(hole[..., None], frame_vmap, pred_vmap),
        nmap=jnp.where(hole[..., None], frame_nmap, pred_nmap),
    )
