"""Pallas TPU kernel: tiled streaming Gram-matrix reduction.

``G = M^T M`` for the tall-skinny row matrices the tracking stack produces
(``M`` is [P, 8]: 6 Jacobian columns + residual + mask, P up to ~300k) is the
normal-equation core of every Gauss-Newton stage (`ops.reductions`).  The
operation is bandwidth-bound — 64 FLOPs per 32 bytes read — so the kernel's
job is simply to stream M through VMEM at line rate while accumulating the
8x8 (padded to 8x128) partial products, using Pallas's implicit grid
pipelining for the HBM->VMEM double buffering.

XLA's own lowering of the dot_general is already good at these shapes; this
kernel exists to (a) pin the accumulation order (bitwise-deterministic
partial sums independent of XLA fusion decisions) and (b) serve as the
in-tree template for hand-tiled TPU kernels.  `gram()` in `ops.reductions`
uses it when `DMS_PALLAS_GRAM=1`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu is unavailable when running on pure-CPU builds
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    _HAS_PLTPU = False

TILE = 4096


def _gram_kernel(m_ref, out_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    block = m_ref[:]  # [TILE, C]
    out_ref[:] = out_ref[:] + jax.lax.dot_general(
        block, block, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def gram_pallas(M: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """[P, C] -> [C, C] Gram matrix via a tiled Pallas reduction.

    P is padded to a TILE multiple with zero rows (which contribute nothing).
    """
    P, C = M.shape
    pad = (-P) % TILE
    if pad:
        M = jnp.concatenate([M, jnp.zeros((pad, C), M.dtype)], axis=0)
    grid = (M.shape[0] // TILE,)
    kwargs = {}
    if _HAS_PLTPU and not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)
        )
    return pl.pallas_call(
        _gram_kernel,
        out_shape=jax.ShapeDtypeStruct((C, C), jnp.float32),
        grid=grid,
        in_specs=[pl.BlockSpec((TILE, C), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((C, C), lambda i: (0, 0)),
        interpret=interpret,
        **kwargs,
    )(M)
