"""Microbenchmark: batched SPD solve variants at WALS hot shapes (TPU).

Usage: python benchmarks/solver_micro.py [B ...]
Compares the XLA unrolled blocked Cholesky (ops/linalg.py) against the
fused Pallas factor+solve kernel (ops/pallas_solve.py), with and without
the batch-last transposes the wrapper inserts.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
from qmf_tpu.cli.common import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from qmf_tpu.ops import linalg, pallas_solve  # noqa: E402

K = 64
REPS = 50


def timeit(fn, *args):
    x = fn(*args)
    jax.block_until_ready(x)
    _ = float(np.asarray(x).ravel()[0])  # true completion (donation quirk)
    t0 = time.time()
    for _ in range(REPS):
        x = fn(*args)
    _ = float(np.asarray(x).ravel()[0])
    return (time.time() - t0) / REPS


def main():
    sizes = [int(s) for s in sys.argv[1:]] or [512, 2048]
    rng = np.random.default_rng(0)
    for bsz in sizes:
        m = rng.normal(size=(bsz, K, K)).astype(np.float32)
        a = jnp.asarray(m @ m.transpose(0, 2, 1) + 10 * np.eye(K, dtype=np.float32))
        b = jnp.asarray(rng.normal(size=(bsz, K)).astype(np.float32))
        a_t = jnp.asarray(np.asarray(a).transpose(1, 2, 0).copy())
        b_t = jnp.asarray(np.asarray(b).T.copy())

        xla_j = jax.jit(linalg.solve_spd)
        pal_j = jax.jit(pallas_solve.solve_spd)
        t_xla = timeit(xla_j, a, b)
        t_pal = timeit(pal_j, a, b)
        t_ker = timeit(lambda at, bt: pallas_solve.cholesky_solve_t(at, bt), a_t, b_t)
        print(
            f"B={bsz}: xla_blocked={t_xla*1e3:.3f}ms  pallas={t_pal*1e3:.3f}ms  "
            f"pallas_kernel_only={t_ker*1e3:.3f}ms  "
            f"(per-solve: xla {t_xla/bsz*1e6:.2f}us, pallas {t_pal/bsz*1e6:.2f}us)"
        )


if __name__ == "__main__":
    main()
