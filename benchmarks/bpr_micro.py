"""Microbenchmark: BPR SGD step variants at MovieLens-20M shapes (TPU).

Usage: python benchmarks/bpr_micro.py [variant ...]
Times 100-step lax.scan loops of the minibatch SGD step to find where the
epoch wall-clock goes (reference counterpart: the Hogwild update loop,
qmf/bpr/BPREngine.cpp:146-220). Variants:

  base      current production step (binary-search membership, 3 scatters)
  nosample  negatives precomputed (isolates sampling + membership cost)
  merged    pos+neg item scatters merged into one 2B-row scatter
  fused     user+item factors in ONE (U+I, k) array -> single 3B-row scatter
  b32768    base at batch 32768 (vs default 8192)
  unrolled  base with the statically-unrolled membership search
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
from qmf_tpu.cli.common import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from qmf_tpu.ops import bpr_ops  # noqa: E402

U, I, K, NNZ = 138_000, 27_000, 30, 20_000_000
STEPS = 100
NEG_ROUNDS = 1


def make_data(batch):
    rng = np.random.default_rng(0)
    users = rng.integers(0, U, size=NNZ).astype(np.int32)
    items = rng.integers(0, I, size=NNZ).astype(np.int32)
    pos_set = bpr_ops.make_pos_set(users, items, U)
    params = bpr_ops.BPRParams(
        jnp.asarray(rng.normal(0, 0.01, (U, K)).astype(np.float32)),
        jnp.asarray(rng.normal(0, 0.01, (I, K)).astype(np.float32)),
        jnp.zeros((I,), jnp.float32),
    )
    bu = jnp.asarray(users[: STEPS * batch].reshape(STEPS, batch))
    bi = jnp.asarray(items[: STEPS * batch].reshape(STEPS, batch))
    w = jnp.ones((STEPS, batch), jnp.float32)
    return params, pos_set, bu, bi, w


def scan_loop(step_fn, params, *xs):
    def body(carry, inp):
        p, key = carry
        key, sub = jax.random.split(key)
        return (step_fn(p, sub, *inp), key), None

    (params, _), _ = jax.lax.scan(body, (params, jax.random.PRNGKey(0)), xs)
    return params


def timeit(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    out = fn(*args)
    jax.block_until_ready(out)
    return time.time() - t0


def run_variant(name):
    batch = 32768 if name == "b32768" else 8192
    params, pos_set, bu, bi, w = make_data(batch)
    lam = jnp.float32(0.01)
    lr = jnp.float32(0.05)

    if name in ("base", "b32768", "unrolled"):
        def step(p, key, u, i, wt):
            return bpr_ops._sgd_step_body(
                p, key, u, i, wt, pos_set.indptr, pos_set.items,
                lr, lam, lam, lam, n_items=I, use_biases=False,
                neg_rounds=NEG_ROUNDS, max_degree=pos_set.max_degree,
                unroll=(name == "unrolled"),
            )
        args = (bu, bi, w)
    elif name == "nosample":
        rng = np.random.default_rng(1)
        neg = jnp.asarray(
            rng.integers(0, I, size=(STEPS, batch)).astype(np.int32)
        )

        def step(p, key, u, i, wt, n):
            d, pu, qi, qj = bpr_ops._score_diff(p, u, i, n, False)
            e = (1.0 / (1.0 + jnp.exp(d))) * wt
            wcol = wt[:, None]
            uf = p.user_factors.at[u].add(
                lr * (e[:, None] * (qi - qj) - lam * pu * wcol))
            itf = p.item_factors.at[i].add(
                lr * (e[:, None] * pu - lam * qi * wcol))
            itf = itf.at[n].add(lr * (-e[:, None] * pu - lam * qj * wcol))
            return bpr_ops.BPRParams(uf, itf, p.item_biases)
        args = (bu, bi, w, neg)
    elif name == "merged":
        def step(p, key, u, i, wt):
            neg = bpr_ops._sample_negatives_impl(
                key, u, pos_set.indptr, pos_set.items, n_items=I,
                rounds=NEG_ROUNDS, max_degree=pos_set.max_degree)
            d, pu, qi, qj = bpr_ops._score_diff(p, u, i, neg, False)
            e = (1.0 / (1.0 + jnp.exp(d))) * wt
            wcol = wt[:, None]
            uf = p.user_factors.at[u].add(
                lr * (e[:, None] * (qi - qj) - lam * pu * wcol))
            idx = jnp.concatenate([i, neg])
            grad = jnp.concatenate([
                e[:, None] * pu - lam * qi * wcol,
                -e[:, None] * pu - lam * qj * wcol,
            ])
            itf = p.item_factors.at[idx].add(lr * grad)
            return bpr_ops.BPRParams(uf, itf, p.item_biases)
        args = (bu, bi, w)
    elif name == "fused":
        # single (U+I, k) parameter array, one 3B-row scatter
        def step(allp, key, u, i, wt):
            neg = bpr_ops._sample_negatives_impl(
                key, u, pos_set.indptr, pos_set.items, n_items=I,
                rounds=NEG_ROUNDS, max_degree=pos_set.max_degree)
            gi = jnp.concatenate([u, U + i, U + neg])
            rows = allp[gi]
            pu, qi, qj = rows[:batch], rows[batch:2 * batch], rows[2 * batch:]
            d = jnp.sum(pu * (qi - qj), axis=1)
            e = (1.0 / (1.0 + jnp.exp(d))) * wt
            wcol = wt[:, None]
            grad = jnp.concatenate([
                e[:, None] * (qi - qj) - lam * pu * wcol,
                e[:, None] * pu - lam * qi * wcol,
                -e[:, None] * pu - lam * qj * wcol,
            ])
            return allp.at[gi].add(lr * grad)

        allp = jnp.concatenate([params.user_factors, params.item_factors])

        def loop(allp, bu, bi, w):
            return scan_loop(step, allp, bu, bi, w)

        jl = jax.jit(loop, donate_argnums=0)
        dt = timeit(jl, allp, bu, bi, w)
        return dt, batch
    else:
        raise SystemExit(f"unknown variant {name}")

    def loop(params, *xs):
        return scan_loop(step, params, *xs)

    jl = jax.jit(loop, donate_argnums=0)
    dt = timeit(jl, params, *args)
    return dt, batch


def main():
    variants = sys.argv[1:] or [
        "base", "nosample", "merged", "fused", "b32768", "unrolled"
    ]
    for name in variants:
        dt, batch = run_variant(name)
        per_step = dt / STEPS
        ups = batch / per_step
        print(
            f"{name:9s} B={batch}: {per_step*1e3:.3f} ms/step, "
            f"{ups/1e6:.2f} M updates/s"
        )


if __name__ == "__main__":
    main()
