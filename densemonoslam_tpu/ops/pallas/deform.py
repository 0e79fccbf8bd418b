"""Pallas TPU kernel: whole-map embedded-deformation apply.

``deformation.apply_to_map`` evaluates phi(p) = sum_k w_k [A_k (p-g_k) + g_k
+ t_k] for every live surfel, where the k=4 blending nodes come from a
temporal look-back window of the node sequence (`deformation._blend_weights`
semantics).  In XLA this needs either per-point candidate GATHERS (pay ~one
HBM row fetch per candidate) or dense [P, K] distance/weight buffers that
materialise in HBM (4 GB at the reference's map scale — measured ~600 ms per
closure at a 4M-row map, the single largest cost of a loop closure).

This kernel streams the map once: per grid step a [B, 128] block of points
is loaded to VMEM, the FULL node table (K <= 512 rows — a few KB) sits in
VMEM beside it, and the [B, 128, K] distance/mask/weight tensors live and
die in VMEM.  HBM traffic is exactly inputs + outputs (~50 B/point), so the
whole-map apply runs at memory line rate.

Node-selection semantics are IDENTICAL to `deformation._blend_weights_full`:
searchsorted insertion point, LOOKBACK-node window clamp, k+1-nearest
(1 - d/dmax)^2 weights, passthrough where the graph has no support.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu is unavailable on pure-CPU builds
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    _HAS_PLTPU = False

LOOKBACK = 20
K_NEIGHBOURS = 4
_B = 8  # sublane rows per block -> 1024 points per grid step


def _deform_kernel(
    nvalid_ref,  # SMEM (1,) i32
    pts_ref,  # [3, B, 128] point xyz
    tm_ref,  # [1, B, 128] point times
    nrm_ref,  # [3, B, 128] normals
    npos_ref,  # [3, K] node positions
    ntime_ref,  # [1, K] node times (inf = invalid)
    nvalidm_ref,  # [1, K] node valid mask (f32 0/1)
    ntab_ref,  # [K, 16] per-node [A row-major 9 | c 3 | pad 4]
    out_pts_ref,  # [3, B, 128]
    out_nrm_ref,  # [3, B, 128]
):
    n_valid = nvalid_ref[0]
    px = pts_ref[0]  # [B, 128]
    py = pts_ref[1]
    pz = pts_ref[2]
    tm = tm_ref[0]
    K = npos_ref.shape[1]

    gx = npos_ref[0, :]  # [K]
    gy = npos_ref[1, :]
    gz = npos_ref[2, :]
    nt = ntime_ref[0, :]
    nv = nvalidm_ref[0, :]

    # searchsorted(side='right'): nodes with time <= tm
    ins = jnp.sum(
        (nt[None, None, :] <= tm[..., None]).astype(jnp.int32), axis=-1
    )  # [B, 128]
    start = jnp.clip(
        ins - LOOKBACK, 0, jnp.maximum(n_valid - LOOKBACK, 0)
    )
    j = jax.lax.broadcasted_iota(jnp.int32, (1, 1, K), 2)
    in_win = (
        (j >= start[..., None])
        & (j < start[..., None] + LOOKBACK)
        & (j < n_valid)
        & (nv[None, None, :] > 0)
    )
    dx = px[..., None] - gx[None, None, :]
    dy = py[..., None] - gy[None, None, :]
    dz = pz[..., None] - gz[None, None, :]
    d2 = dx * dx + dy * dy + dz * dz  # [B, 128, K]
    inf = jnp.float32(jnp.inf)
    work = jnp.where(in_win, d2, inf)

    # k+1 smallest via repeated min-extraction (all VMEM-resident)
    ds = []
    idxs = []
    for _ in range(K_NEIGHBOURS + 1):
        m = jnp.min(work, axis=-1)  # [B, 128]
        a = jnp.argmin(work, axis=-1).astype(jnp.int32)
        ds.append(m)
        idxs.append(a)
        work = jnp.where(j == a[..., None], inf, work)

    d_sel = jnp.sqrt(jnp.maximum(jnp.stack(ds, axis=-1), 0.0))  # [B,128,5]
    dmax = jnp.maximum(d_sel[..., -1:], 1e-6)
    w = jnp.square(1.0 - d_sel[..., :-1] / dmax)  # [B, 128, 4]
    w = jnp.where(jnp.isfinite(d_sel[..., :-1]), w, 0.0)
    wsum = jnp.sum(w, axis=-1)  # [B, 128]
    has = wsum > 1e-9
    w = w / jnp.maximum(wsum[..., None], 1e-9)

    # dense [B,128,K] weights -> one [B*128, K] x [K, 12] matmul on the MXU
    w_full = jnp.zeros((px.shape[0], px.shape[1], K), jnp.float32)
    for s in range(K_NEIGHBOURS):
        w_full = w_full + jnp.where(
            j == idxs[s][..., None], w[..., s][..., None], 0.0
        )
    B, L = px.shape
    blend = jax.lax.dot_general(
        w_full.reshape(B * L, K), ntab_ref[:],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(B, L, 16)
    # blend[..., :9] = sum w_k A_k (row-major), blend[..., 9:12] = sum w_k c_k
    ox = blend[..., 0] * px + blend[..., 1] * py + blend[..., 2] * pz + blend[..., 9]
    oy = blend[..., 3] * px + blend[..., 4] * py + blend[..., 5] * pz + blend[..., 10]
    oz = blend[..., 6] * px + blend[..., 7] * py + blend[..., 8] * pz + blend[..., 11]
    out_pts_ref[0] = jnp.where(has, ox, px)
    out_pts_ref[1] = jnp.where(has, oy, py)
    out_pts_ref[2] = jnp.where(has, oz, pz)

    nx = nrm_ref[0]
    ny = nrm_ref[1]
    nz = nrm_ref[2]
    rx = blend[..., 0] * nx + blend[..., 1] * ny + blend[..., 2] * nz
    ry = blend[..., 3] * nx + blend[..., 4] * ny + blend[..., 5] * nz
    rz = blend[..., 6] * nx + blend[..., 7] * ny + blend[..., 8] * nz
    norm = jnp.maximum(jnp.sqrt(rx * rx + ry * ry + rz * rz), 1e-9)
    out_nrm_ref[0] = jnp.where(has, rx / norm, nx)
    out_nrm_ref[1] = jnp.where(has, ry / norm, ny)
    out_nrm_ref[2] = jnp.where(has, rz / norm, nz)


def deform_soa_pallas(
    pos: jnp.ndarray,  # [K,3] node positions
    time: jnp.ndarray,  # [K] node times (inf = invalid)
    valid: jnp.ndarray,  # [K] bool
    A: jnp.ndarray,  # [K,3,3]
    t: jnp.ndarray,  # [K,3]
    pts_T: jnp.ndarray,  # [3, P] point xyz (SoA — no [P,3] lane padding)
    times: jnp.ndarray,  # [P]
    nrm_T: jnp.ndarray,  # [3, P]
    interpret: bool = False,
):
    """SoA entry: ([3,P], [3,P]) in -> ([3,P], [3,P]) out.

    Callers slicing columns out of the [N,16] map tensor should build the
    [3,P] views directly — a [P,3] intermediate lane-pads 42x on TPU
    (2 GB of padding at a 4M-row map)."""
    P = pts_T.shape[1]
    K = pos.shape[0]
    Kp = (K + 127) // 128 * 128
    if Kp != K:
        padk = Kp - K
        pos = jnp.concatenate([pos, jnp.zeros((padk, 3), pos.dtype)])
        time = jnp.concatenate([time, jnp.full((padk,), jnp.inf, time.dtype)])
        valid = jnp.concatenate([valid, jnp.zeros((padk,), valid.dtype)])
        A = jnp.concatenate(
            [A, jnp.broadcast_to(jnp.eye(3, dtype=A.dtype), (padk, 3, 3))]
        )
        t = jnp.concatenate([t, jnp.zeros((padk, 3), t.dtype)])
        K = Kp

    blockP = _B * 128
    Pp = (P + blockP - 1) // blockP * blockP
    pad = Pp - P
    if pad:
        pts_T = jnp.concatenate(
            [pts_T, jnp.zeros((3, pad), jnp.float32)], axis=1
        )
        times = jnp.concatenate([times, jnp.zeros((pad,), jnp.float32)])
        nrm_T = jnp.concatenate(
            [nrm_T, jnp.zeros((3, pad), jnp.float32)], axis=1
        )

    rows = Pp // 128
    pts = pts_T.reshape(3, rows, 128)
    tms = times.reshape(1, rows, 128)
    nrm = nrm_T.reshape(3, rows, 128)

    n_valid = jnp.sum(valid.astype(jnp.int32))[None]
    npos = pos.T  # [3, K]
    ntime = time[None, :]
    nvalidm = valid.astype(jnp.float32)[None, :]
    # per-node constant c_k = g_k + t_k - A_k g_k; table [K, 16] = [A9 | c3 | 0]
    c = pos + t - jnp.einsum("kij,kj->ki", A, pos)
    ntab = jnp.concatenate(
        [A.reshape(K, 9), c, jnp.zeros((K, 4), jnp.float32)], axis=-1
    )

    grid = (rows // _B,)
    kwargs = {}
    if _HAS_PLTPU and not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)
        )
    out_pts, out_nrm = pl.pallas_call(
        _deform_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((3, rows, 128), jnp.float32),
            jax.ShapeDtypeStruct((3, rows, 128), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM)
            if _HAS_PLTPU and not interpret
            else pl.BlockSpec((1,), lambda i: (0,)),
            pl.BlockSpec((3, _B, 128), lambda i: (0, i, 0)),
            pl.BlockSpec((1, _B, 128), lambda i: (0, i, 0)),
            pl.BlockSpec((3, _B, 128), lambda i: (0, i, 0)),
            pl.BlockSpec((3, K), lambda i: (0, 0)),
            pl.BlockSpec((1, K), lambda i: (0, 0)),
            pl.BlockSpec((1, K), lambda i: (0, 0)),
            pl.BlockSpec((K, 16), lambda i: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((3, _B, 128), lambda i: (0, i, 0)),
            pl.BlockSpec((3, _B, 128), lambda i: (0, i, 0)),
        ),
        interpret=interpret,
        **kwargs,
    )(n_valid, pts, tms, nrm, npos, ntime, nvalidm, ntab)

    return out_pts.reshape(3, Pp)[:, :P], out_nrm.reshape(3, Pp)[:, :P]


@functools.partial(jax.jit, static_argnames=("interpret",))
def deform_points_pallas(
    pos, time, valid, A, t,
    points: jnp.ndarray,  # [P,3]
    times: jnp.ndarray,  # [P]
    normals: jnp.ndarray,  # [P,3]
    interpret: bool = False,
):
    """[P,3] convenience wrapper; matches
    `deformation.deform_points(graph, points, times, normals)` up to f32
    accumulation order."""
    new_p, new_n = deform_soa_pallas(
        pos, time, valid, A, t, points.T, times, normals.T,
        interpret=interpret,
    )
    return new_p.T, new_n.T
