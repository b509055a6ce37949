"""Per-width-class attribution of the WALS build stage.

The hot/cold feasibility micro (hot_micro.py) showed the cold-only build
(10.3M padded elems after removing the top-1024 hot items) costs 73.5 ms —
~7.1 ns/elem, twice the 3.4 ns/elem gather-issue bound the full build sits
at. This micro times each width class's build scan SEPARATELY (full data
and hot-filtered data) to find where the extra time lives: small-D classes,
scan step count, or the A concatenation.

Usage: python -u benchmarks/build_attrib.py [H]
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

K = 64
REPS = 5
BATCH_ROWS = 8192


def timed(fn, *args):
    out = fn(*args)  # compile
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(REPS):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / REPS


def per_class(eng, y):
    bk = eng._user_buckets
    chunks = eng._user_chunks
    alpha = jnp.asarray(eng.config.confidence_weight, dtype=eng.dtype)
    lam = jnp.asarray(eng.config.regularization_lambda, dtype=eng.dtype)
    yty = als_ops.gramian(y)
    total = 0.0
    rows = []
    for i in range(len(bk)):
        col_idx, vals, mask = bk.col_idx[i], bk.values[i], bk.mask[i]
        n, d = col_idx.shape
        cb = chunks[i]

        fn = jax.jit(
            lambda ci, va, ma, cb=cb: als_ops._scan_class_build(
                y, yty, ci, va, ma, alpha, lam, cb, "default"
            )
        )
        dt = timed(fn, col_idx, vals, mask)
        total += dt
        rows.append((d, n, cb, n * d, dt))
    rows.sort()
    for d, n, cb, elems, dt in rows:
        print(
            f"  D={d:5d} N={n:6d} chunk={cb:5d} elems={elems/1e6:6.2f}M"
            f"  {dt*1e3:7.2f} ms  {dt/max(elems,1)*1e9:5.2f} ns/elem",
            flush=True,
        )
    print(f"  sum of classes: {total*1e3:.1f} ms", flush=True)


def main():
    h = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    users, items, values = datagen.load_npz("ml20m")
    n_cols = int(items.max()) + 1

    cfg = WALSConfig(
        nepochs=1, nfactors=K, init_seed=0, matmul_precision="default",
        batch_rows=BATCH_ROWS,
    )

    print("=== FULL dataset, per-class user-side build ===", flush=True)
    eng = WALSEngine(cfg)
    eng.init(Dataset(users, items, values))
    y = eng.item_factors
    per_class(eng, y)
    del eng

    cnt = np.bincount(items, minlength=n_cols)
    order = np.argsort(cnt)[::-1]
    hot = order[:h]
    is_hot = np.zeros(n_cols, bool)
    is_hot[hot] = True
    cold = ~is_hot[items]
    print(f"=== COLD dataset (H={h}, cov={is_hot[items].mean()*100:.1f}%) ===",
          flush=True)
    eng = WALSEngine(cfg)
    eng.init(Dataset(users[cold], items[cold], values[cold]))
    yc = jnp.asarray(
        np.random.default_rng(0).normal(0, 0.1, (n_cols, K)), jnp.float32
    )
    per_class(eng, yc)


if __name__ == "__main__":
    main()
