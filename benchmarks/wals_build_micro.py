"""Isolate the WALS build's random-access cost.

Usage: python -u benchmarks/wals_build_micro.py [variant ...]
Variants (default: real seq):
  real    the production user-side build (gather by packed col_idx)
  seq     IDENTICAL program with col_idx replaced by sequential indices of
          the same shape (iota % n_items) — same einsum FLOPs, same output
          sizes, but the factor-row fetch is contiguous. real - seq == the
          pure random-access premium of the build gather.
  f32     the real build at matmul_precision="highest" (f32 gather stream,
          no pre-gather bf16 cast) — doubles gathered bytes per row; if
          real ~= f32, gather cost is per ROW, not per byte.

Informs whether a VMEM-resident Pallas build kernel can beat XLA's gather
(it cannot beat an issue-rate bound, it can beat an HBM-latency bound).
"""

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

REPS = 5


def timed(fn, *args):
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: float(jnp.asarray(x).ravel()[0]), out)
    t0 = time.time()
    for _ in range(REPS):
        out = fn(*args)
    jax.tree_util.tree_map(lambda x: float(jnp.asarray(x).ravel()[0]), out)
    return (time.time() - t0) / REPS, out


def main():
    variants = sys.argv[1:] or ["real", "seq"]
    users, items, values = datagen.load_npz("ml20m")
    ds = Dataset(users, items, values)
    cfg = WALSConfig(
        nepochs=1, nfactors=64, init_seed=0, matmul_precision="default"
    )
    eng = WALSEngine(cfg)
    t0 = time.time()
    eng.init(ds)
    print(f"init {time.time()-t0:.1f}s", flush=True)

    ub = eng._user_buckets
    alpha = jnp.asarray(cfg.confidence_weight, dtype=eng.dtype)
    lam = jnp.asarray(cfg.regularization_lambda, dtype=eng.dtype)
    chunks = tuple(eng._user_chunks)
    n_items = eng.nitems

    def build_side(y, cols, precision):
        yty = als_ops.gramian(y)
        parts = [
            als_ops._scan_class_build(
                y, yty, col_idx, vals, mask, alpha, lam, cb, precision
            )
            for ((_, _, vals, mask), col_idx, cb) in zip(
                [
                    (ub.row_ids[i], ub.col_idx[i], ub.values[i], ub.mask[i])
                    for i in range(len(ub))
                ],
                cols,
                chunks,
            )
        ]
        a = jnp.concatenate([p[0] for p in parts], axis=0)
        b = jnp.concatenate([p[1] for p in parts], axis=0)
        return a, b

    real_cols = [ub.col_idx[i] for i in range(len(ub))]
    for v in variants:
        if v == "seq":
            cols = [
                (
                    jnp.arange(int(np.prod(c.shape)), dtype=jnp.int32)
                    % n_items
                ).reshape(c.shape)
                for c in real_cols
            ]
            prec = "default"
        elif v == "f32":
            cols = real_cols
            prec = "highest"
        else:
            cols = real_cols
            prec = "default"
        fn = jax.jit(lambda y, cs=cols, p=prec: build_side(y, cs, p))
        t0 = time.time()
        dt, _ = timed(fn, eng.item_factors)
        print(
            f"user-side build [{v}]: {dt*1e3:.1f} ms "
            f"(first call {time.time()-t0:.1f}s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
