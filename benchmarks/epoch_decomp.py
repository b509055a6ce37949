"""WALS epoch decomposition at the PRODUCTION config (hot split + pallas).

Times, from one engine init at ml20m k=64 defaults (device_pack, hot auto,
solver auto, precision default):

  - full fused epoch (the bench number)
  - per-side BUILD with the hot GEMMs (A,b materialized — no DCE)
  - per-side BUILD with hot disabled on the same cold stream
    (isolates the hot GEMM cost; NOT comparable to an unsplit build)
  - per-side SOLVE on the materialized (A, b)
  - gramian + scatter remainder (epoch minus the above)

Usage: python -u benchmarks/epoch_decomp.py [hot_width]
  hot_width: "auto" (default), "0", or an int forced on both sides.
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
    hw = sys.argv[1] if len(sys.argv) > 1 else "auto"
    hot_width = hw if hw == "auto" else int(hw)
    users, items, values = datagen.load_npz("ml20m")
    ds = Dataset(users, items, values)
    cfg = WALSConfig(
        nepochs=1, nfactors=64, init_seed=0, matmul_precision="default",
        batch_rows=8192, hot_width=hot_width,
    )
    eng = WALSEngine(cfg)
    t0 = time.time()
    eng.init(ds)
    print(f"init {time.time()-t0:.1f}s solver={eng._solver}", flush=True)

    alpha = jnp.asarray(cfg.confidence_weight, dtype=eng.dtype)
    lam = jnp.asarray(cfg.regularization_lambda, dtype=eng.dtype)

    # full fused epoch (production path)
    t0 = time.time()
    dt_warm = None
    eng._fused_epoch()
    float(eng.user_factors[0, 0])
    print(f"epoch warmup {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    for _ in range(REPS):
        eng._fused_epoch()
    float(eng.user_factors[0, 0])
    dt_epoch = (time.time() - t0) / REPS
    print(f"FULL fused epoch: {dt_epoch*1e3:.1f} ms", flush=True)

    def side_state(side):
        if side == "user":
            bk, hot, chunks, y = (
                eng._user_buckets, eng._user_hot, eng._user_chunks,
                eng.item_factors,
            )
        else:
            bk, hot, chunks, y = (
                eng._item_buckets, eng._item_hot, eng._item_chunks,
                eng.user_factors,
            )
        arrays = [
            (bk.row_ids[i], bk.col_idx[i], bk.values[i], bk.mask[i])
            for i in range(len(bk))
        ]
        return arrays, hot, chunks, y

    for side in ("user", "item"):
        arrays, hot, chunks, y = side_state(side)

        # NOTE: arrays/hot must be jit ARGUMENTS — closing over them bakes
        # them into the HLO as constants, which blows the remote compile
        # service's request-size limit (HTTP 413) at ml20m scale.
        def build(y, arrays, hot):
            yty = als_ops.gramian(y)
            if hot is not None:
                hot_ids, hot_classes = hot
                y_hot, z = als_ops.hot_tables(y[hot_ids], cfg.matmul_precision)
            else:
                hot_classes = [None] * len(arrays)
                y_hot = z = None
            parts = [
                als_ops._scan_class_build(
                    y, yty, col_idx, vals, mask, alpha, lam, cb,
                    cfg.matmul_precision, hc, y_hot, z,
                )
                for (_, col_idx, vals, mask), cb, hc in zip(
                    arrays, chunks, hot_classes
                )
            ]
            a = jnp.concatenate([p[0] for p in parts], axis=0)
            b = jnp.concatenate([p[1] for p in parts], axis=0)
            return a, b

        t0 = time.time()
        dt_hot, (a, b) = timed(jax.jit(build), y, arrays, hot)
        print(
            f"{side}-side BUILD+hot (A {a.shape}): {dt_hot*1e3:.1f} ms "
            f"(compile {time.time()-t0-dt_hot*(REPS+1):.0f}s)",
            flush=True,
        )
        if hot is not None:
            dt_cold, _ = timed(jax.jit(build), y, arrays, None)
            print(
                f"{side}-side BUILD cold-stream-only: {dt_cold*1e3:.1f} ms "
                f"(hot GEMM cost ~{(dt_hot-dt_cold)*1e3:.1f} ms)",
                flush=True,
            )

        def solve(a, b):
            return als_ops._solve_dispatch(a, b, eng._solver)

        dt_solve, _ = timed(jax.jit(solve), a, b)
        print(f"{side}-side SOLVE [{eng._solver}]: {dt_solve*1e3:.1f} ms",
              flush=True)
        del a, b


if __name__ == "__main__":
    main()
