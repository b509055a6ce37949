"""Device-side BPR: negative sampling, minibatch SGD step, eval loss.

TPU-native replacement for the reference's Hogwild! SGD
(qmf/bpr/BPREngine.cpp:146-244, BPREngine-inl.h):

- The reference samples one triplet at a time and applies lock-free racy
  updates from many threads. Here a minibatch of B triplets is sampled and
  updated in one device program: every update in the batch reads the same
  pre-batch parameters (exactly what concurrent Hogwild threads effectively
  do) and duplicate-index gradients are summed by scatter-add — the
  deterministic, synchronous counterpart of Hogwild's statistical behavior.
- Negative sampling: the reference rejection-samples uniform item indices
  until the candidate is outside the user's positive set
  (BPREngine-inl.h:48-60). On device we re-sample a fixed number of rounds;
  membership tests are vectorized binary searches over the sorted
  (user, item) key array. After R rounds the expected residual collision
  rate is (avg_degree/nitems)^R — negligible for real data and bounded by
  construction.

The update rule matches reference BPREngine.cpp:178-220 exactly:
    e = 1 / (1 + exp(score_diff))        (d/dx log sigmoid)
    b_i += lr (e - bias_lambda b_i);  b_j += lr (-e - bias_lambda b_j)
    p_u += lr (e (q_i - q_j) - user_lambda p_u)
    q_i += lr (e p_u - item_lambda q_i)
    q_j += lr (-e p_u - item_lambda q_j)
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class BPRParams(NamedTuple):
    """Model state threaded through jitted steps."""

    user_factors: jax.Array  # (U, k)
    item_factors: jax.Array  # (I, k)
    item_biases: jax.Array  # (I,) — zeros and unused when use_biases=False


class PosSet(NamedTuple):
    """Per-user positive-item sets in CSR form for device membership tests.

    int32-safe at any scale (a flat user*n_items+item key would overflow
    int32 — and TPU jax without x64 truncates int64 — already at
    MovieLens-20M scale: 138k users x 27k items > 2^31).
    """

    indptr: jax.Array  # (U+1,) int32 — per-user segment offsets
    items: jax.Array  # (nnz,) int32 — item ids, sorted within each segment
    max_degree: int  # python int — bounds the binary search depth


def make_pos_set(
    user_idx: np.ndarray, item_idx: np.ndarray, n_users: int
) -> PosSet:
    """Build the CSR positive-set structure (host side, deduplicated)."""
    order = np.lexsort((item_idx, user_idx))
    u = np.asarray(user_idx)[order]
    i = np.asarray(item_idx)[order]
    # dedup (user, item) pairs
    if len(u):
        keep = np.ones(len(u), dtype=bool)
        keep[1:] = (u[1:] != u[:-1]) | (i[1:] != i[:-1])
        u, i = u[keep], i[keep]
    counts = np.bincount(u, minlength=n_users)
    indptr = np.zeros(n_users + 1, dtype=np.int32)
    np.cumsum(counts, out=indptr[1:])
    max_degree = int(counts.max()) if n_users else 0
    return PosSet(
        jnp.asarray(indptr), jnp.asarray(i.astype(np.int32)), max_degree
    )


def _is_member(
    pos_set: PosSet, users: jax.Array, cand: jax.Array, unroll: bool = False
) -> jax.Array:
    """Vectorized per-user binary search: is cand[b] in users[b]'s set?"""
    lo = pos_set.indptr[users]  # (B,)
    hi = pos_set.indptr[users + 1]
    steps = max(1, int(np.ceil(np.log2(max(pos_set.max_degree, 1) + 1))) + 1)
    items = pos_set.items
    if items.shape[0] == 0:
        return jnp.zeros(users.shape, dtype=bool)

    def body(_, lohi):
        lo, hi = lohi
        mid = (lo + hi) // 2
        v = items[jnp.minimum(mid, items.shape[0] - 1)]
        go_right = (v < cand) & (lo < hi)
        lo = jnp.where(go_right, mid + 1, lo)
        hi = jnp.where(go_right | (lo >= hi), hi, mid)
        return lo, hi

    if unroll:
        # statically-unrolled search: straight-line gather chain, no While
        # overhead per probe (historically crashed one TPU runtime build at
        # ML-20M scale inside a fused epoch scan — kept opt-in until the
        # crash is reproduced; see BPRConfig.unroll_membership)
        lohi = (lo, hi)
        for s in range(steps):
            lohi = body(s, lohi)
        lo, hi = lohi
    else:
        lo, hi = jax.lax.fori_loop(0, steps, body, (lo, hi))
    found = items[jnp.minimum(lo, items.shape[0] - 1)] == cand
    return found & (lo < pos_set.indptr[users + 1])


@functools.partial(
    jax.jit, static_argnames=("n_items", "rounds", "max_degree", "unroll")
)
def _sample_negatives_impl(
    key: jax.Array,
    users: jax.Array,
    indptr: jax.Array,
    pos_items: jax.Array,
    n_items: int,
    rounds: int,
    max_degree: int,
    unroll: bool = False,
) -> jax.Array:
    pos_set = PosSet(indptr, pos_items, max_degree)
    b = users.shape[0]
    neg = jnp.zeros((b,), dtype=jnp.int32)
    valid = jnp.zeros((b,), dtype=bool)
    for r in range(rounds):
        key, sub = jax.random.split(key)
        cand = jax.random.randint(sub, (b,), 0, n_items, dtype=jnp.int32)
        cand_ok = ~_is_member(pos_set, users, cand, unroll=unroll)
        take = (~valid) & cand_ok
        neg = jnp.where(take, cand, neg)
        # after the final round, fall back to the last candidate if invalid
        if r == rounds - 1:
            neg = jnp.where(valid | take, neg, cand)
        valid = valid | cand_ok
    return neg


def sample_negatives(
    key: jax.Array,
    users: jax.Array,  # (B,) int32 user indices
    pos_set: PosSet,
    n_items: int,
    rounds: int = 4,
    unroll: bool = False,
) -> jax.Array:
    """Sample one negative item per row, rejecting the user's positives.

    Fixed-round re-sampling (TPU-friendly; no data-dependent loop). Rows
    still colliding after ``rounds`` rounds keep the last candidate —
    residual collision probability is (user_degree/n_items)^rounds.
    """
    return _sample_negatives_impl(
        key,
        users,
        pos_set.indptr,
        pos_set.items,
        n_items=n_items,
        rounds=rounds,
        max_degree=pos_set.max_degree,
        unroll=unroll,
    )


def _score_diff(
    params: BPRParams,
    users: jax.Array,
    pos: jax.Array,
    neg: jax.Array,
    use_biases: bool,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    pu = params.user_factors[users]  # (B, k)
    qi = params.item_factors[pos]
    qj = params.item_factors[neg]
    d = jnp.sum(pu * (qi - qj), axis=1)
    if use_biases:
        d = d + params.item_biases[pos] - params.item_biases[neg]
    return d, pu, qi, qj


def _sgd_step_body(
    params: BPRParams,
    key: jax.Array,
    users: jax.Array,  # (B,) int32
    pos_items: jax.Array,  # (B,) int32
    weight: jax.Array,  # (B,) 0/1 mask for batch padding
    indptr: jax.Array,
    set_items: jax.Array,
    lr: jax.Array,
    user_lambda: jax.Array,
    item_lambda: jax.Array,
    bias_lambda: jax.Array,
    n_items: int,
    use_biases: bool,
    neg_rounds: int,
    max_degree: int,
    unroll: bool = False,
) -> BPRParams:
    """One synchronous minibatch update (reference update(), vectorized)."""
    neg = _sample_negatives_impl(
        key,
        users,
        indptr,
        set_items,
        n_items=n_items,
        rounds=neg_rounds,
        max_degree=max_degree,
        unroll=unroll,
    )
    return _sgd_update_body(
        params, users, pos_items, neg, weight, lr, user_lambda, item_lambda,
        bias_lambda, use_biases=use_biases,
    )


def _sgd_update_body(
    params: BPRParams,
    users: jax.Array,  # (B,) int32
    pos_items: jax.Array,  # (B,) int32
    neg: jax.Array,  # (B,) int32 pre-sampled negatives
    weight: jax.Array,  # (B,) 0/1 mask for batch padding
    lr: jax.Array,
    user_lambda: jax.Array,
    item_lambda: jax.Array,
    bias_lambda: jax.Array,
    use_biases: bool,
) -> BPRParams:
    """The SGD update of one minibatch with negatives already sampled."""
    d, pu, qi, qj = _score_diff(params, users, pos_items, neg, use_biases)
    e = (1.0 / (1.0 + jnp.exp(d))) * weight  # masked loss derivative
    wcol = weight[:, None]

    uf = params.user_factors.at[users].add(
        lr * (e[:, None] * (qi - qj) - user_lambda * pu * wcol)
    )
    # one 2B-row scatter instead of two sequential B-row scatters (additive,
    # so merging is exact up to summation order of duplicate indices)
    epu = e[:, None] * pu
    item_idx = jnp.concatenate([pos_items, neg])
    item_grad = jnp.concatenate(
        [epu - item_lambda * qi * wcol, -epu - item_lambda * qj * wcol]
    )
    itf = params.item_factors.at[item_idx].add(lr * item_grad)
    if use_biases:
        bi = params.item_biases[pos_items]
        bj = params.item_biases[neg]
        bias_grad = jnp.concatenate(
            [e - bias_lambda * bi * weight, -e - bias_lambda * bj * weight]
        )
        ib = params.item_biases.at[item_idx].add(lr * bias_grad)
    else:
        ib = params.item_biases
    return BPRParams(uf, itf, ib)


_sgd_step_impl = functools.partial(
    jax.jit,
    static_argnames=(
        "n_items", "use_biases", "neg_rounds", "max_degree", "unroll"
    ),
    donate_argnums=(0,),
)(_sgd_step_body)


def sgd_step(
    params: BPRParams,
    key: jax.Array,
    users: jax.Array,
    pos_items: jax.Array,
    weight: jax.Array,
    pos_set: PosSet,
    lr: jax.Array,
    user_lambda: jax.Array,
    item_lambda: jax.Array,
    bias_lambda: jax.Array,
    n_items: int,
    use_biases: bool,
    neg_rounds: int,
) -> BPRParams:
    return _sgd_step_impl(
        params,
        key,
        users,
        pos_items,
        weight,
        pos_set.indptr,
        pos_set.items,
        lr,
        user_lambda,
        item_lambda,
        bias_lambda,
        n_items=n_items,
        use_biases=use_biases,
        neg_rounds=neg_rounds,
        max_degree=pos_set.max_degree,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_items",
        "use_biases",
        "neg_rounds",
        "max_degree",
        "shuffle",
        "batch_size",
        "unroll",
    ),
    donate_argnums=(0,),
)
def _sgd_epoch_impl(
    params: BPRParams,
    key: jax.Array,
    users_flat: jax.Array,  # (S*B,) int32 triplet users (padded)
    items_flat: jax.Array,  # (S*B,) int32 positive items
    weights_flat: jax.Array,  # (S*B,) 0/1 padding mask
    indptr: jax.Array,
    set_items: jax.Array,
    lr: jax.Array,
    user_lambda: jax.Array,
    item_lambda: jax.Array,
    bias_lambda: jax.Array,
    n_items: int,
    use_biases: bool,
    neg_rounds: int,
    max_degree: int,
    shuffle: bool,
    batch_size: int,
    unroll: bool = False,
) -> BPRParams:
    """A FULL training epoch as one device program.

    The reference walks the (shuffled) positive-pair vector once per epoch,
    sampling negatives per pair (BPREngine.cpp:146-176). Here the epoch is a
    ``lax.scan`` over minibatches: optional on-device permutation of the
    triplet stream, per-step negative sampling, and the SGD update — a
    single dispatch instead of thousands, which is what the serving-scale
    throughput target needs.

    Note on shuffle semantics: the reference shuffles the positive-pair
    vector and then emits num_negative_samples consecutive updates per pair
    (BPREngine.cpp:172-174, BPREngine-inl.h:21-29); here the expanded
    triplet stream is permuted, an equivalent-in-distribution ordering.

    Negative sampling runs ONCE for the whole epoch before the step scan
    (negatives are parameter-independent, so sampling commutes with the
    updates — the reference samples lazily per pair only because it
    streams). This keeps the per-step serial chain to gathers + the SGD
    scatter; the ~log(max_degree) membership-search rounds run as one wide
    vectorized pass over all S*B triplets instead of S sequential passes.
    """
    if shuffle:
        key, pkey = jax.random.split(key)
        perm = jax.random.permutation(pkey, users_flat.shape[0])
        users_flat = users_flat[perm]
        items_flat = items_flat[perm]
        weights_flat = weights_flat[perm]
    s = users_flat.shape[0] // batch_size
    key, skey = jax.random.split(key)
    neg_flat = _sample_negatives_impl(
        skey,
        users_flat,
        indptr,
        set_items,
        n_items=n_items,
        rounds=neg_rounds,
        max_degree=max_degree,
        unroll=unroll,
    )
    u_steps = users_flat.reshape(s, batch_size)
    i_steps = items_flat.reshape(s, batch_size)
    n_steps = neg_flat.reshape(s, batch_size)
    w_steps = weights_flat.reshape(s, batch_size)

    def body(params, inp):
        u, i, n, w = inp
        params = _sgd_update_body(
            params, u, i, n, w, lr, user_lambda, item_lambda, bias_lambda,
            use_biases=use_biases,
        )
        return params, None

    params, _ = jax.lax.scan(
        body, params, (u_steps, i_steps, n_steps, w_steps)
    )
    return params


def sgd_epoch(
    params: BPRParams,
    key: jax.Array,
    users_flat: jax.Array,
    items_flat: jax.Array,
    weights_flat: jax.Array,
    pos_set: PosSet,
    lr: jax.Array,
    user_lambda: jax.Array,
    item_lambda: jax.Array,
    bias_lambda: jax.Array,
    n_items: int,
    use_biases: bool,
    neg_rounds: int,
    shuffle: bool,
    batch_size: int,
    unroll: bool = False,
) -> BPRParams:
    return _sgd_epoch_impl(
        params,
        key,
        users_flat,
        items_flat,
        weights_flat,
        pos_set.indptr,
        pos_set.items,
        lr,
        user_lambda,
        item_lambda,
        bias_lambda,
        n_items=n_items,
        use_biases=use_biases,
        neg_rounds=neg_rounds,
        max_degree=pos_set.max_degree,
        shuffle=shuffle,
        batch_size=batch_size,
        unroll=unroll,
    )


@functools.partial(jax.jit, static_argnames=("use_biases",))
def eval_loss(
    params: BPRParams,
    users: jax.Array,
    pos: jax.Array,
    neg: jax.Array,
    use_biases: bool,
) -> jax.Array:
    """Mean logistic loss log(1+exp(-d)) over a fixed triplet eval set
    (reference BPREngine.cpp:237-239, 246-261)."""
    d, _, _, _ = _score_diff(params, users, pos, neg, use_biases)
    # log1p(exp(-d)) computed stably
    return jnp.mean(jnp.logaddexp(0.0, -d))


def sample_negatives_host(
    rng: np.random.Generator,
    users: np.ndarray,
    pos_users: np.ndarray,
    pos_items: np.ndarray,
    n_items: int,
) -> np.ndarray:
    """Host-side exact rejection sampling (for fixed eval sets).

    Loops until every row is valid — matching the reference's unbounded
    rejection loop (BPREngine-inl.h:48-60); used only at init time. Host
    numpy has real int64, so a flat key is safe here.
    """
    users = users.astype(np.int64)
    key_set = np.unique(
        pos_users.astype(np.int64) * np.int64(n_items)
        + pos_items.astype(np.int64)
    )
    neg = rng.integers(0, n_items, size=len(users))
    while True:
        keys = users * n_items + neg
        pos_idx = np.searchsorted(key_set, keys)
        pos_idx = np.minimum(pos_idx, len(key_set) - 1)
        bad = key_set[pos_idx] == keys if len(key_set) else np.zeros(
            len(users), dtype=bool
        )
        if not bad.any():
            return neg.astype(np.int64)
        neg[bad] = rng.integers(0, n_items, size=int(bad.sum()))
