"""Row-gather idiom sweep: find the per-row cost floor on this chip.

The WALS epoch is gather-dominated: an epoch gathers ~2*nnz (40M at
ml20m) factor rows of 128-512 B, and the production idiom
``y.astype(bf16)[col]`` measured ~4 ns/row (~30 GB/s effective) —
~25x off HBM bandwidth. This sweep times alternative idioms on one
representative class shape to find what the chip can actually do:

  base      y_bf16[col]                     (production build idiom)
  f32       y[col] then cast                (gather wider rows)
  flat      y_bf16[col.ravel()].reshape     (collapse batch dims)
  take      jnp.take(y_bf16, col, axis=0)
  split4    four independent gathers of n/4 rows each, concatenated
            (tests whether XLA issues concurrent DMA queues)
  sorted    gather with per-row sorted indices (pure locality probe —
            result is permuted, NOT equivalent; timing only)
  pallas    table resident in VMEM, per-row dynamic sublane reads
  pallas_tk jnp.take on the VMEM-resident table inside the kernel

Usage: python -u benchmarks/gather_micro.py [N D ...]
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "benchmarks")
from qmf_tpu.cli.common import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

K = 64
N_ITEMS = 26744
REPS = 10


def timed(fn, *args):
    # scalar readback, not block_until_ready: on the remote axon platform
    # block_until_ready can return at enqueue time, undertiming small ops
    def readback(out):
        return float(jnp.asarray(out).ravel()[0].astype(jnp.float32))

    out = fn(*args)
    readback(out)
    t0 = time.time()
    for _ in range(REPS):
        out = fn(*args)
    readback(out)
    return (time.time() - t0) / REPS


def _gather_kernel(idx_ref, table_ref, out_ref, *, tb):
    def body(t, c):
        out_ref[t] = table_ref[idx_ref[t]]
        return c

    jax.lax.fori_loop(0, tb, body, 0)


def pallas_gather(table, idx, tb=256):
    """Gather rows of ``table`` (resident in VMEM) by flat ``idx``."""
    r = idx.shape[0]
    assert r % tb == 0
    grid = (r // tb,)
    return pl.pallas_call(
        functools.partial(_gather_kernel, tb=tb),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec(table.shape, lambda i, idx_ref: (0, 0)),
            ],
            out_specs=pl.BlockSpec((tb, K), lambda i, idx_ref: (i, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((r, K), table.dtype),
    )(idx, table)


def _take_kernel(idx_ref, table_ref, out_ref):
    tb = out_ref.shape[0]
    idx2d = jnp.broadcast_to(
        idx_ref[...][:, None], (tb, out_ref.shape[1])
    )
    out_ref[...] = jnp.take_along_axis(table_ref[...], idx2d, axis=0)


def pallas_take(table, idx, tb=512):
    r = idx.shape[0]
    assert r % tb == 0
    grid = (r // tb,)
    return pl.pallas_call(
        _take_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tb,), lambda i: (i,)),
            pl.BlockSpec(table.shape, lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((tb, K), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((r, K), table.dtype),
    )(idx, table)


def main():
    rest = sys.argv[1:]
    specs = [(int(rest[i]), int(rest[i + 1])) for i in range(0, len(rest), 2)]
    specs = specs or [(14336, 64), (11520, 256)]

    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.normal(0, 0.1, (N_ITEMS, K)), jnp.float32)
    yb = y.astype(jnp.bfloat16)

    for n, d in specs:
        col = jnp.asarray(rng.integers(0, N_ITEMS, (n, d)), jnp.int32)
        rows = n * d
        print(f"--- ({n}, {d}): {rows/1e6:.2f}M rows", flush=True)

        def report(name, fn, *args):
            try:
                t = timed(jax.jit(fn), *args)
            except Exception as e:  # noqa: BLE001
                print(f"  {name:10s} FAILED: {type(e).__name__}: {e}"[:200],
                      flush=True)
                return
            print(
                f"  {name:10s} {t*1e3:8.2f} ms  {t/rows*1e9:6.2f} ns/row  "
                f"{rows*K*2/t/1e9:7.1f} GB/s(bf16)",
                flush=True,
            )

        report("base", lambda y, c: y.astype(jnp.bfloat16)[c], y, col)
        report("f32", lambda y, c: y[c], y, col)
        report(
            "flat",
            lambda y, c: y.astype(jnp.bfloat16)[c.ravel()].reshape(
                c.shape + (K,)
            ),
            y,
            col,
        )
        report("take", lambda y, c: jnp.take(y, c, axis=0), yb, col)

        def split4(y, c):
            q = c.shape[0] // 4
            parts = [y.astype(jnp.bfloat16)[c[i * q:(i + 1) * q]]
                     for i in range(4)]
            return jnp.concatenate(parts, axis=0)

        report("split4", split4, y, col)

        col_sorted = jnp.sort(col.ravel()).reshape(col.shape)
        report("sorted", lambda y, c: y.astype(jnp.bfloat16)[c], y,
               col_sorted)

        flat = col.ravel()
        pad = (-flat.shape[0]) % 512
        flatp = jnp.pad(flat, (0, pad))
        report("pallas", pallas_gather, yb, flatp)
        report("pallas_tk", pallas_take, yb, flatp)

        # numerics: pallas gather vs base
        try:
            ref = np.asarray(yb[flatp])
            got = np.asarray(jax.jit(pallas_gather)(yb, flatp))
            print(f"  pallas max |diff| = {np.abs(ref - got).max()}",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"  pallas check FAILED: {e}"[:160], flush=True)


if __name__ == "__main__":
    main()
