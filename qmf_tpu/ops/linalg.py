"""Batched small-matrix linear algebra tuned for TPU.

XLA's stock ``cholesky``/``triangular_solve`` lower to While loops with one
dynamic-sliced column step per iteration — measured at ~65% of the whole
WALS epoch at MovieLens-20M scale. These replacements unroll the same
textbook blocked algorithms statically (block size 8): the per-block scalar
recurrences become straight-line vector ops over the batch dimension, and
the trailing updates become batched matmuls on the MXU. Measured ~3x faster
than the XLA kernels at (16384, 64, 64) with identical accuracy.

Works for any k: matrices are padded to a block multiple with an identity
diagonal (padding rows solve to zero and are sliced off).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_BLOCK = 8
_PREC = jax.lax.Precision.HIGHEST


def _pad_spd(a: jax.Array, b: jax.Array, block: int):
    """Pad (B,k,k)/(B,k) to a block multiple: diag(A, I) and [b, 0]."""
    k = a.shape[-1]
    pad = (-k) % block
    if pad == 0:
        return a, b, k
    bsz = a.shape[0]
    a_p = jnp.zeros((bsz, k + pad, k + pad), dtype=a.dtype)
    a_p = a_p.at[:, :k, :k].set(a)
    eye_idx = jnp.arange(k, k + pad)
    a_p = a_p.at[:, eye_idx, eye_idx].set(1.0)
    b_p = jnp.zeros((bsz, k + pad), dtype=b.dtype)
    b_p = b_p.at[:, :k].set(b)
    return a_p, b_p, k


def _chol_diag_block(ajj):
    """Unrolled dense Cholesky of a (B, nb, nb) diagonal block."""
    nb = ajj.shape[-1]
    l = [[None] * nb for _ in range(nb)]
    for p in range(nb):
        s = ajj[:, p, p]
        for q in range(p):
            s = s - l[p][q] * l[p][q]
        dpp = jnp.sqrt(s)
        l[p][p] = dpp
        inv = 1.0 / dpp
        for r in range(p + 1, nb):
            s2 = ajj[:, r, p]
            for q in range(p):
                s2 = s2 - l[r][q] * l[p][q]
            l[r][p] = s2 * inv
    zero = jnp.zeros_like(l[0][0])
    return jnp.stack(
        [
            jnp.stack([l[r][c] if c <= r else zero for c in range(nb)], axis=1)
            for r in range(nb)
        ],
        axis=1,
    )


def _panel_solve(pan, ljj):
    """X such that X @ ljj^T = pan; pan (B, m, nb), ljj lower (B, nb, nb)."""
    nb = ljj.shape[-1]
    xs = []
    for c in range(nb):
        v = pan[:, :, c]
        for q in range(c):
            v = v - xs[q] * ljj[:, c : c + 1, q]
        xs.append(v / ljj[:, c : c + 1, c])
    return jnp.stack(xs, axis=2)


def cholesky_blocked(a: jax.Array, block: int = _BLOCK) -> jax.Array:
    """Batched lower Cholesky, statically-unrolled right-looking blocks.

    a: (B, k, k) SPD with k a multiple of ``block``.
    """
    k = a.shape[-1]
    cols = []
    for j in range(0, k, block):
        ajj = a[:, j : j + block, j : j + block]
        ljj = _chol_diag_block(ajj)
        if j + block < k:
            pan = a[:, j + block :, j : j + block]
            x = _panel_solve(pan, ljj)
            # trailing Schur update on the MXU
            a22 = a[:, j + block :, j + block :] - jnp.einsum(
                "bik,bjk->bij", x, x, precision=_PREC
            )
            a = a.at[:, j + block :, j + block :].set(a22)
            col = jnp.concatenate(
                [jnp.zeros((a.shape[0], j, block), a.dtype), ljj, x], axis=1
            )
        else:
            col = jnp.concatenate(
                [jnp.zeros((a.shape[0], j, block), a.dtype), ljj], axis=1
            )
        cols.append(col)
    return jnp.concatenate(cols, axis=2)


def solve_lower_blocked(l: jax.Array, b: jax.Array, block: int = _BLOCK):
    """z with L z = b; L (B,k,k) lower, b (B,k). Static block substitution."""
    k = l.shape[-1]
    zs = []
    for j in range(0, k, block):
        rhs = b[:, j : j + block]
        for q, z_q in enumerate(zs):
            lij = l[:, j : j + block, q * block : (q + 1) * block]
            rhs = rhs - jnp.einsum("bij,bj->bi", lij, z_q, precision=_PREC)
        ljj = l[:, j : j + block, j : j + block]
        # unrolled forward substitution within the block
        z_b = []
        for p in range(block):
            v = rhs[:, p]
            for q in range(p):
                v = v - ljj[:, p, q] * z_b[q]
            z_b.append(v / ljj[:, p, p])
        zs.append(jnp.stack(z_b, axis=1))
    return jnp.concatenate(zs, axis=1)


def solve_lower_t_blocked(l: jax.Array, z: jax.Array, block: int = _BLOCK):
    """x with L^T x = z (backward substitution, static blocks)."""
    k = l.shape[-1]
    nblocks = k // block
    xs = [None] * nblocks
    for jb in range(nblocks - 1, -1, -1):
        j = jb * block
        rhs = z[:, j : j + block]
        for qb in range(jb + 1, nblocks):
            q = qb * block
            # (L^T)[j:, q:] = L[q:, j:]^T
            lqj = l[:, q : q + block, j : j + block]
            rhs = rhs - jnp.einsum("bji,bj->bi", lqj, xs[qb], precision=_PREC)
        ljj = l[:, j : j + block, j : j + block]
        x_b = [None] * block
        for p in range(block - 1, -1, -1):
            v = rhs[:, p]
            for q in range(p + 1, block):
                v = v - ljj[:, q, p] * x_b[q]
            x_b[p] = v / ljj[:, p, p]
        xs[jb] = jnp.stack(x_b, axis=1)
    return jnp.concatenate(xs, axis=1)


def solve_spd(a: jax.Array, b: jax.Array, block: int = _BLOCK) -> jax.Array:
    """Batched SPD solve A x = b via the blocked Cholesky above.

    Accepts any k (internally padded to a block multiple with an identity
    diagonal; padded coordinates solve to zero and are sliced off).
    """
    a_p, b_p, k = _pad_spd(a, b, block)
    l = cholesky_blocked(a_p, block)
    z = solve_lower_blocked(l, b_p, block)
    x = solve_lower_t_blocked(l, z, block)
    return x[:, :k]
