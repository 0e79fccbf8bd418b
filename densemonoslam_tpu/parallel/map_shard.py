"""Map-axis sharding: surfel-tensor passes distributed over the `map` mesh
axis.

SURVEY §5.7's blueprint maps the reference's time-windowed map to "the surfel
tensor sharded by time-block across chips": the active window stays resident
on the tracking chip while full-map passes (deformation application, INACTIVE
renders, exports) run sharded.  This module provides the first such pass —
`apply_to_map` (the reference `copy_unstable.vert:150-320` GPU deformation of
every surfel) over row blocks — proving the map can exceed one device's
memory: the deformation graph is tiny and replicated, rows are embarrassingly
parallel, so the only communication is the initial shard layout.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from densemonoslam_tpu.mapping import deformation as dg
from densemonoslam_tpu.mapping import surfel_map as sm


def make_sharded_apply_to_map(mesh: Mesh):
    """Build `run(data [N+1,16], count, graph) -> data` with the N surfel
    rows block-sharded over the mesh's `map` axis (graph replicated).
    Bit-identical to `deformation.apply_to_map` on one device; N must divide
    by the `map` axis size."""

    def local(rows, count, gpos, gtime, gvalid, gA, gt):
        graph = dg.DeformGraph(pos=gpos, time=gtime, valid=gvalid, A=gA, t=gt)
        n_local = rows.shape[0]
        base = jax.lax.axis_index("map") * n_local
        idx = base + jnp.arange(n_local)
        alive = (rows[:, sm.CONF] > 0) & (idx < count)
        pts = rows[:, sm.POS]
        nrm = rows[:, sm.NORMAL]
        new_p, new_n = dg.deform_points(
            graph, pts, rows[:, sm.INIT_TIME], nrm
        )
        rows = rows.at[:, sm.POS].set(jnp.where(alive[:, None], new_p, pts))
        rows = rows.at[:, sm.NORMAL].set(
            jnp.where(alive[:, None], new_n, nrm)
        )
        return rows

    sharded = shard_map(
        local,
        mesh=mesh,
        in_specs=(P("map"), P(), P(), P(), P(), P(), P()),
        out_specs=P("map"),
        check_vma=False,
    )

    @jax.jit
    def run(data: jnp.ndarray, count: jnp.ndarray, graph: dg.DeformGraph):
        rows = sharded(
            data[:-1], count, graph.pos, graph.time, graph.valid, graph.A,
            graph.t,
        )
        return data.at[:-1].set(rows)

    return run
