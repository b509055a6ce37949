"""Fused build+solve kernel vs the production split path, per width class.

Usage: python -u benchmarks/build_solve_micro.py [NxD ...]
Defaults to the dominant ml20m user-side classes. For each (N, D) class
with k=64 and synthetic indices, times three jitted programs:

  gather   yg = y.bf16[col_idx] alone (the irreducible stream)
  split    gather + XLA einsum build (A, b) + Pallas factor+solve
           (the production solver="pallas" path, un-chunked)
  fused    gather + pallas_solve.build_solve (A never leaves VMEM)

If fused ~= gather + (split - gather)/3-ish, the kernel build is
bandwidth-bound and epoch-level wiring wins; if fused ~= split, the
per-row dot_general loop is latency/issue-bound and the A-traffic saving
is being burned inside the kernel.
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

from qmf_tpu.ops import als_ops, pallas_solve  # noqa: E402

K = 64
N_ITEMS = 26744
REPS = 5


def timed(fn, *args):
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: float(jnp.asarray(x).ravel()[0]), out)
    t0 = time.time()
    for _ in range(REPS):
        out = fn(*args)
    jax.tree_util.tree_map(lambda x: float(jnp.asarray(x).ravel()[0]), out)
    return (time.time() - t0) / REPS


def main():
    specs = []
    for s in sys.argv[1:]:
        n, _, d = s.partition("x")
        specs.append((int(n), int(d)))
    specs = specs or [(14336, 64), (16896, 128), (11520, 256), (10800, 384)]

    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.normal(0, 0.1, (N_ITEMS, K)), jnp.float32)
    alpha = jnp.float32(40.0)
    lam = jnp.float32(0.05)

    for n, d in specs:
        col = jnp.asarray(rng.integers(0, N_ITEMS, (n, d)), jnp.int32)
        vals = jnp.asarray(
            rng.integers(1, 11, (n, d)).astype(np.float32) * 0.5
        )
        mask = jnp.asarray(rng.random((n, d)) < 0.9)

        def gather_only(y, col):
            return jnp.sum(y.astype(jnp.bfloat16)[col], dtype=jnp.float32)

        def split(y, col, vals, mask):
            yty = als_ops.gramian(y)
            a, b, _ = als_ops._build_bucket(
                y, yty, col, vals, mask, alpha, lam, "default"
            )
            return pallas_solve.solve_spd(a, b)

        def fused(y, col, vals, mask):
            yty = als_ops.gramian(y)
            maskf = mask.astype(jnp.float32)
            w = alpha * vals * maskf
            conf = maskf + w
            yg = y.astype(jnp.bfloat16)[col]
            ytyl = yty + lam * jnp.eye(K, dtype=jnp.float32)
            x, b = pallas_solve.build_solve(yg, w, conf, ytyl)
            return x

        tg = timed(jax.jit(gather_only), y, col)
        ts = timed(jax.jit(split), y, col, vals, mask)
        tf = timed(jax.jit(fused), y, col, vals, mask)
        gb = n * d * K * 2 / 1e9
        print(
            f"({n:6d},{d:4d}) yg={gb:5.2f}GB  gather {tg*1e3:7.2f} ms  "
            f"split {ts*1e3:7.2f} ms  fused {tf*1e3:7.2f} ms  "
            f"fused/split {tf/ts:.2f}",
            flush=True,
        )

        # numerics cross-check on the first spec
        if (n, d) == specs[0]:
            xs = jax.jit(split)(y, col, vals, mask)
            xf = jax.jit(fused)(y, col, vals, mask)
            err = float(
                jnp.max(jnp.abs(xs - xf)) / (jnp.max(jnp.abs(xs)) + 1e-9)
            )
            print(f"  max rel |split - fused| = {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
