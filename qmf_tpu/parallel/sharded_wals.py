"""SPMD sharded WALS over a device mesh.

This module is the TPU-native answer to the reference's entire distributed
layer (reference distributed/: Scheduler + Labor + hand-rolled TCP wire
protocol). The mapping (SURVEY.md section 2.6 P4, 5.8):

- kPushRate (dataset broadcast to every labor, Scheduler.cpp:225-266)
  -> bucket tensors are laid out ONCE with their row axis sharded over the
  mesh; each device holds only its shard (better than the reference, which
  replicates the whole dataset on every labor).
- kPushFixed (fixed-factor broadcast each half-epoch, Scheduler.cpp:268-326)
  -> the fixed factor side is replicated; when it was produced sharded, XLA
  inserts one all-gather over ICI.
- kCalc / kCalcRsp (dynamic 10k-row bucket scatter + row gather-back,
  RunOneTask.cpp:160-243) -> static row sharding of each degree-bucket;
  solves run where the rows live and results stay on device. Because rows
  inside a degree bucket have near-identical cost, static sharding is
  load-balanced by construction — no dynamic work stealing needed.
- YtY Gramian: computed from row-sharded Y as a per-shard k x k matmul
  followed by one psum over ICI (replacing each labor's full OpenMP
  computeXtX over the whole fixed matrix, Labor.cpp:297-307).

Multi-host deployment uses jax.distributed (see qmf_tpu.distributed); this
module is agnostic to whether mesh devices live on one host or many.
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from qmf_tpu.ops import als_ops
from qmf_tpu.ops.packing import Bucket


def sharded_gramian(y: jax.Array, mesh: Mesh, axis_name: str = "d") -> jax.Array:
    """YtY with the item axis sharded: local k x k matmul + psum over ICI.

    Rows are zero-padded up to a mesh multiple (zero rows add nothing to
    YtY), so any factor-matrix height shards evenly.
    """
    n = y.shape[0]
    pad = (-n) % mesh.size
    if pad:
        y = jnp.concatenate([y, jnp.zeros((pad, y.shape[1]), dtype=y.dtype)])

    def local(y_blk):
        g = jnp.matmul(
            y_blk.T, y_blk, precision=jax.lax.Precision.HIGHEST
        )
        return jax.lax.psum(g, axis_name)

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=P(axis_name, None),
        out_specs=P(),
    )(y)


class ShardedBuckets:
    """Degree buckets with the row axis sharded over the mesh."""

    def __init__(self, buckets: List[Bucket], mesh: Mesh, dtype, axis_name="d"):
        row = NamedSharding(mesh, P(axis_name))
        row2 = NamedSharding(mesh, P(axis_name, None))
        self.row_ids = [jax.device_put(b.row_ids, row) for b in buckets]
        self.col_idx = [jax.device_put(b.col_idx, row2) for b in buckets]
        self.values = [
            jax.device_put(b.values.astype(dtype), row2) for b in buckets
        ]
        self.mask = [jax.device_put(b.mask, row2) for b in buckets]

    def __len__(self):
        return len(self.row_ids)


@functools.partial(jax.jit, static_argnames=("solver", "n_rows"))
def _solve_and_scatter(
    y, yty, col_idx, values, mask, alpha, lam, x_out, row_ids, solver, n_rows
):
    """solve_bucket + scatter of solved rows into the full factor matrix.

    With bucket inputs row-sharded and y replicated, GSPMD partitions the
    einsum/Cholesky across the mesh with no communication; the scatter into
    the replicated x_out inserts the gather over ICI (the kCalcRsp analog —
    except results move chip-to-chip, not over TCP to a scheduler).
    """
    x, loss = als_ops.solve_bucket(
        y, yty, col_idx, values, mask, alpha, lam, solver=solver
    )
    x_out = x_out.at[row_ids].set(x, mode="drop")
    return x_out, jnp.sum(loss)


def iterate_side_sharded(
    y: jax.Array,
    buckets: ShardedBuckets,
    n_rows: int,
    nfactors: int,
    alpha,
    lam,
    mesh: Mesh,
    solver: str = "cholesky",
    dtype=jnp.float32,
    axis_name: str = "d",
) -> Tuple[jax.Array, float]:
    """One sharded half-epoch; returns (replicated new factors, loss sum)."""
    repl = NamedSharding(mesh, P())
    y = jax.device_put(y, repl)
    yty = sharded_gramian(y, mesh, axis_name)
    alpha = jnp.asarray(alpha, dtype=dtype)
    lam = jnp.asarray(lam, dtype=dtype)
    x_out = jax.device_put(jnp.zeros((n_rows, nfactors), dtype=dtype), repl)
    total = 0.0
    for i in range(len(buckets)):
        x_out, loss = _solve_and_scatter(
            y,
            yty,
            buckets.col_idx[i],
            buckets.values[i],
            buckets.mask[i],
            alpha,
            lam,
            x_out,
            buckets.row_ids[i],
            solver,
            n_rows,
        )
        total += float(loss)
    return x_out, total
