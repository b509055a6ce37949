"""Decomposition microbenchmark: where does the WALS fused epoch go?

Usage: python -u benchmarks/wals_micro.py [mode ...]
Times ONE user half-epoch of the ml20m k=64 workload with parts of the
solve-bucket body disabled, isolating the cost of each stage:

  full       production body (gather + A/b build + Cholesky + scatter)
  nosolve    x = b (skips the batched Cholesky factor+solve)
  noabuild   skips the A-build einsum (A = YtY + lam I, shared per bucket)
  nogather   fixed-side rows broadcast instead of gathered by col_idx
  noscatter  per-chunk results summed instead of scattered into x_out
  minimal    all of the above off (scan + elementwise floor)

Each mode is one fresh jit compile of the half-epoch program (cached
persistently), then 5 timed executions.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "benchmarks")
from qmf_tpu.cli.common import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import datagen  # noqa: E402
from qmf_tpu.config import WALSConfig  # noqa: E402
from qmf_tpu.data.dataset import Dataset  # noqa: E402
from qmf_tpu.models.wals import WALSEngine  # noqa: E402
from qmf_tpu.ops import als_ops  # noqa: E402

K = int(os.environ.get("QMF_MICRO_K", "64"))
PRECISION = os.environ.get("QMF_MICRO_PRECISION", "default")


def body_variant(y, yty, col_idx, values, mask, alpha, lam, mode):
    prec = als_ops._PRECISION_BY_NAME.get(
        PRECISION, jax.lax.Precision.HIGHEST
    )
    dtype = y.dtype
    d = col_idx.shape[1]
    if "nogather" in mode:
        yg = jnp.broadcast_to(
            y[None, :d, :], (col_idx.shape[0], d, y.shape[1])
        )
    else:
        yg = y[col_idx]
    maskf = mask.astype(dtype)
    w = alpha * values * maskf
    conf = maskf + w
    b = jnp.einsum("bd,bdk->bk", conf, yg, precision=prec)
    if "noabuild" in mode:
        a = yty[None] + lam * jnp.eye(yty.shape[0], dtype=dtype)
        a = jnp.broadcast_to(a, (col_idx.shape[0],) + yty.shape)
    else:
        a = yty[None] + jnp.einsum(
            "bdk,bd,bdl->bkl", yg, w, yg, precision=prec
        ) + lam * jnp.eye(yty.shape[0], dtype=dtype)
    if "nosolve" in mode:
        x = b + a[:, 0, :]  # consume a so it isn't dead-code-eliminated
    else:
        from qmf_tpu.ops import linalg

        x = linalg.solve_spd(a, b)
    loss = jnp.sum(conf, axis=1) - jnp.einsum("bk,bk->b", x, b)
    return x, loss


def half_epoch_variant(y, class_arrays, chunks, n_rows, alpha, lam, mode):
    yty = als_ops.gramian(y)
    x_out = jnp.zeros((n_rows, y.shape[1]), dtype=y.dtype)
    acc = jnp.zeros((y.shape[1],), dtype=y.dtype)
    loss = jnp.zeros((), dtype=y.dtype)
    for (row_ids, col_idx, values, mask), chunk_b in zip(class_arrays, chunks):
        n_chunks = row_ids.shape[0] // chunk_b
        dd = col_idx.shape[1]
        inp = (
            row_ids.reshape(n_chunks, chunk_b),
            col_idx.reshape(n_chunks, chunk_b, dd),
            values.reshape(n_chunks, chunk_b, dd),
            mask.reshape(n_chunks, chunk_b, dd),
        )

        def body(carry, s, mode=mode):
            x_acc, vec, ls = carry
            ids, col, val, m = s
            x, l = body_variant(y, yty, col, val, m, alpha, lam, mode)
            if "noscatter" in mode:
                vec = vec + jnp.sum(x, axis=0)
            else:
                x_acc = x_acc.at[ids].set(x, mode="drop")
            return (x_acc, vec, ls + jnp.sum(l)), None

        (x_out, acc, loss), _ = jax.lax.scan(body, (x_out, acc, loss), inp)
    return x_out, acc, loss


def main():
    modes = sys.argv[1:] or [
        "full", "nosolve", "noabuild", "nogather", "noscatter",
        "nogather+noabuild+nosolve+noscatter",
    ]
    users, items, values = datagen.load_npz("ml20m")
    ds = Dataset(users, items, values)
    cfg = WALSConfig(nepochs=1, nfactors=K, init_seed=0, batch_rows=8192)
    eng = WALSEngine(cfg)
    t0 = time.time()
    eng.init(ds)
    print(f"init {time.time()-t0:.1f}s", flush=True)

    ub = eng._user_buckets
    arrays = [
        (ub.row_ids[i], ub.col_idx[i], ub.values[i], ub.mask[i])
        for i in range(len(ub))
    ]
    alpha = jnp.float32(40.0)
    lam = jnp.float32(0.05)

    for mode in modes:
        fn = jax.jit(
            lambda y, mode=mode: half_epoch_variant(
                y, arrays, eng._user_chunks, eng.nusers, alpha, lam, mode
            )
        )
        t0 = time.time()
        out = fn(eng.item_factors)
        jax.block_until_ready(out)
        print(f"{mode:44s} compile+run {time.time()-t0:6.1f}s", flush=True)
        times = []
        for _ in range(5):
            t0 = time.time()
            out = fn(eng.item_factors)
            jax.block_until_ready(out)
            times.append(time.time() - t0)
        print(
            f"{mode:44s} half-epoch {np.median(times)*1e3:8.1f} ms",
            flush=True,
        )


if __name__ == "__main__":
    main()
