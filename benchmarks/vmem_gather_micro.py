"""Measure in-kernel gathers from a VMEM-resident factor table vs XLA's
HBM gather — the decision experiment for VERDICT r4 item 2 (VMEM-resident
fixed-side factors).

The WALS epoch is gather-issue-bound: ~41M padded stream rows x ~3.4 ns/row
of HBM random row gather = ~140 ms of the ~199 ms ml20m epoch
(benchmarks/gather_micro.py, epoch_decomp.py). The one untried structural
lever is keeping the fixed-side factor table resident in VMEM and gathering
inside the kernel. This micro answers the gating question: at what ns/row do
Mosaic's in-kernel dynamic loads (jnp.take lowering / per-row pl.ds loads)
issue from a VMEM table?

  - if >= ~3.4 ns/row: the lever is dead, record and move on;
  - if <  ~3.4 ns/row: build the k-split / quantized table variant into the
    fused build+solve kernel.

Usage: python -u benchmarks/vmem_gather_micro.py [n_rows_log2]
Prints ns/row for (a) XLA HBM gather baseline, (b) Pallas VMEM-table gather
via jnp.take, (c) Pallas VMEM-table gather via a fori_loop of row loads.

RESULT (2026-08-20, v5e, jax 0.9.0): the lever is DEAD on this toolchain.
Every in-kernel dynamic-indexing form fails to lower:
  - jnp.take(tab_ref[:], idx_ref[:], axis=0)      -> ValueError (shape rule)
  - jnp.take_along_axis(tab, idx2d, axis=0)       -> lowering AssertionError
  - fori_loop row loads tab_ref[idx_ref[t]]       -> Mosaic compile-helper
    crash (HTTP 500), including at trivial shapes (512x64 table, 64-row
    blocks) and in the pl.ds(idx, 1) form, with idx from scalar-prefetch
    SMEM or from VMEM.
Even if it compiled, a per-row serial VMEM loop issues O(1 row/loop-cycle),
i.e. >= ~1-3 ns/row — at parity with XLA's measured HBM row gather
(3.2-5.0 ns/row, benchmarks/gather_micro.py), so no headroom justifies
fighting the lowering. See benchmarks/README.md "VMEM-resident fixed
factors" dead-end entry.
"""

import functools
import sys
import time

sys.path.insert(0, ".")
from qmf_tpu.cli.common import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

K = 64
TABLE_ROWS = 65536  # 65536 x 64 x bf16 = 8.4 MB (half-k split table size)
BLOCK = 2048  # stream rows per grid step


def _take_kernel(idx_ref, tab_ref, out_ref):
    out_ref[:] = jnp.take(tab_ref[:], idx_ref[:], axis=0, fill_value=0)


def _loop_kernel(idx_ref, tab_ref, out_ref):
    def body(i, _):
        out_ref[i, :] = tab_ref[idx_ref[i], :]
        return 0

    jax.lax.fori_loop(0, BLOCK, body, 0)


def _make(kernel, interpret=False):
    @functools.partial(jax.jit, static_argnames=())
    def run(idx, table):
        n = idx.shape[0]
        return pl.pallas_call(
            kernel,
            grid=(n // BLOCK,),
            in_specs=[
                pl.BlockSpec((BLOCK,), lambda i: (i,)),
                pl.BlockSpec(
                    (TABLE_ROWS, K),
                    lambda i: (0, 0),
                ),
            ],
            out_specs=pl.BlockSpec((BLOCK, K), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((n, K), jnp.bfloat16),
            interpret=interpret,
        )(idx, table)

    return run


def _time(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(reps):
        t0 = time.time()
        jax.block_until_ready(fn(*args))
        times.append(time.time() - t0)
    return float(np.median(times))


def main():
    n = 1 << int(sys.argv[1] if len(sys.argv) > 1 else 22)  # 4M rows default
    rng = np.random.default_rng(0)
    idx = jnp.asarray(
        rng.integers(0, TABLE_ROWS, n).astype(np.int32)
    )
    table = jnp.asarray(
        rng.normal(0, 0.1, (TABLE_ROWS, K)).astype(np.float32)
    ).astype(jnp.bfloat16)

    # XLA HBM gather baseline (what the epoch path does today)
    xla_gather = jax.jit(lambda i, t: jnp.take(t, i, axis=0, fill_value=0))
    t = _time(xla_gather, idx, table)
    print(f"xla_hbm_gather: {t*1e9/n:.2f} ns/row ({t*1e3:.1f} ms / {n} rows)")

    for name, kernel in [("take", _take_kernel), ("loop", _loop_kernel)]:
        try:
            fn = _make(kernel)
            t = _time(fn, idx, table)
            # correctness spot check
            want = np.asarray(table)[np.asarray(idx[:1000])]
            got = np.asarray(fn(idx, table))[:1000]
            ok = np.allclose(got.astype(np.float32), want.astype(np.float32))
            print(
                f"pallas_vmem_{name}: {t*1e9/n:.2f} ns/row "
                f"({t*1e3:.1f} ms) correct={ok}"
            )
        except Exception as e:  # lowering not supported -> record and move on
            print(f"pallas_vmem_{name}: FAILED ({type(e).__name__}: "
                  f"{str(e)[:300]})")


if __name__ == "__main__":
    main()
