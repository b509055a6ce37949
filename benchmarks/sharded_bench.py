"""Multi-chip scaling check: sharded WALS epoch time across mesh sizes.

Usage: python -u benchmarks/sharded_bench.py [n_devices ...]   (default 1 8)

Runs the SAME workload through ShardedWALSEngine on an n-device mesh for
each requested size and reports steady epoch wall-clock. On a real pod the
mesh is real chips; on a dev box set
``XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu``
(the script forces CPU itself when QMF_SHARDED_CPU=1) and the numbers
measure GSPMD partitioning overhead rather than real scaling — the
acceptance check is that the 8-device per-chip epoch stays within ~1.3x of
the 1-device epoch (i.e. the sharded program does the same work per chip
without pathological collectives), per the round-3 verdict.

Environment knobs: QMF_SHARDED_PRESET (default ml1m), QMF_SHARDED_NFACTORS
(default 64), QMF_SHARDED_CPU=1 (force CPU + virtual devices),
QMF_SHARDED_ENGINE=bpr (measure the sharded grouped BPR epoch instead of
WALS; k defaults still apply, batch 4096 * n_devices).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "benchmarks")

N_VIRTUAL = int(os.environ.get("QMF_SHARDED_NDEV_MAX", "8"))
if os.environ.get("QMF_SHARDED_CPU", "") == "1":
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={N_VIRTUAL}"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
else:
    from qmf_tpu.cli.common import enable_compilation_cache

    enable_compilation_cache()
    import jax

import datagen  # noqa: E402
from qmf_tpu.config import WALSConfig  # noqa: E402
from qmf_tpu.data.dataset import Dataset  # noqa: E402
from qmf_tpu.parallel import ShardedWALSEngine  # noqa: E402

PRESET = os.environ.get("QMF_SHARDED_PRESET", "ml1m")
NFACTORS = int(os.environ.get("QMF_SHARDED_NFACTORS", "64"))
REPS = int(os.environ.get("QMF_SHARDED_REPS", "3"))


def _measure_wals(ds, n):
    cfg = WALSConfig(
        nepochs=1,
        nfactors=NFACTORS,
        init_seed=0,
        matmul_precision="default",
    )
    eng = ShardedWALSEngine(cfg, n_devices=n)
    t0 = time.time()
    eng.init(ds)
    print(f"n={n}: init {time.time() - t0:.1f}s "
          f"(solver={eng._solver})", flush=True)
    t0 = time.time()
    eng._fused_epoch()
    print(f"n={n}: warmup epoch {time.time() - t0:.1f}s", flush=True)
    times = []
    for _ in range(REPS):
        t0 = time.time()
        loss = eng._fused_epoch()  # float() inside = device sync
        times.append(time.time() - t0)
    return float(np.median(times)), float(loss)


def _measure_bpr(ds, n):
    from qmf_tpu.config import BPRConfig
    from qmf_tpu.parallel import ShardedBPREngine

    k = min(NFACTORS, 30)  # BPR headline config is k=30 (BASELINE.md #3)
    if k != NFACTORS:
        print(f"n={n}: NOTE nfactors capped {NFACTORS} -> {k} for the BPR "
              "engine (set QMF_SHARDED_NFACTORS <= 30 to silence)",
              flush=True)
    cfg = BPRConfig(
        nepochs=1,
        nfactors=k,
        batch_size=4096 * n,
        init_seed=0,
    )
    eng = ShardedBPREngine(cfg, n_devices=n)
    t0 = time.time()
    eng.init(ds)
    path = "grouped" if eng._grouped else "stream"
    print(f"n={n}: init {time.time() - t0:.1f}s ({path} path)", flush=True)

    def _sync():
        return float(eng.params.user_factors[0, 0])

    t0 = time.time()
    eng._epoch()
    _sync()
    print(f"n={n}: warmup epoch {time.time() - t0:.1f}s", flush=True)
    times = []
    for _ in range(REPS):
        t0 = time.time()
        eng._epoch()
        _sync()
        times.append(time.time() - t0)
    return float(np.median(times)), float("nan")


def main():
    sizes = [int(s) for s in sys.argv[1:]] or [1, N_VIRTUAL]
    datagen.ensure_dataset(PRESET)
    users, items, values = datagen.load_npz(PRESET)
    ds = Dataset(users, items, values)
    engine = os.environ.get("QMF_SHARDED_ENGINE", "wals")
    measure = _measure_bpr if engine == "bpr" else _measure_wals
    results = {}
    for n in sizes:
        ep, loss = measure(ds, n)
        results[n] = ep
        print(
            f"n={n}: epoch {ep:.3f}s (loss {loss:.6f})",
            flush=True,
        )
    if len(results) >= 2:
        base = results[min(results)]
        for n, ep in sorted(results.items()):
            print(
                f"n={n}: {ep:.3f}s  vs n={min(results)}: {ep / base:.2f}x",
                flush=True,
            )


if __name__ == "__main__":
    main()
