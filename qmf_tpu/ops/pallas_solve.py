"""Pallas TPU kernel: batched SPD Cholesky factor + solve, fused.

The WALS inner loop solves ~165k independent k x k SPD systems per epoch
(the Hu-Koren normal equations, reference qmf/wals/WALSEngine.cpp:266-310 —
there one LAPACK ``dsysv_`` call per row). The XLA formulation in
qmf_tpu/ops/linalg.py unrolls a blocked Cholesky into ~1-2k small HLO ops
per scan step; each op carries XLA dispatch/VPU-latency overhead and the
factorization's serial dependency chain makes that overhead the epoch's
dominant cost at MovieLens-20M scale.

This kernel runs the whole factor+solve as ONE fused Pallas program so the
serial chain executes as straight-line VPU code with instruction-level
latencies instead of per-HLO overheads.

Layout: the batch lives in the LAST (lane) dimension — A is (k, k, B) and
b/x are (k, B) — so every scalar step of the factorization is a full-width
vector op over the batch with unit-stride lane access. k must be a multiple
of the 8-row block (callers pad with an identity diagonal; padded
coordinates solve to zero). The factorization overwrites the A tile in VMEM
(right-looking, L stored in the lower triangle; the upper triangle holds
garbage that is never read).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NB = 8  # Cholesky block (rows per panel); k % _NB == 0 required


def _chol_solve_kernel(a_ref, b_ref, x_ref):
    """Factor A=LL^T in place and solve L L^T x = b for one batch tile.

    a_ref: (k, k, TB) — overwritten with L in the lower triangle.
    b_ref: (k, TB), x_ref: (k, TB).
    """
    k = a_ref.shape[0]
    nblocks = k // _NB

    inv_diag = [None] * k  # 1/L[p,p] vectors, reused by the substitutions

    for jb in range(nblocks):
        j = jb * _NB
        # -- diagonal block: dense unblocked Cholesky of A[j:j+8, j:j+8] --
        for p in range(_NB):
            s = a_ref[j + p, j + p, :]
            for q in range(p):
                lpq = a_ref[j + p, j + q, :]
                s = s - lpq * lpq
            d = jnp.sqrt(s)
            a_ref[j + p, j + p, :] = d
            inv = 1.0 / d
            inv_diag[j + p] = inv
            for r in range(p + 1, _NB):
                s2 = a_ref[j + r, j + p, :]
                for q in range(p):
                    s2 = s2 - a_ref[j + r, j + q, :] * a_ref[j + p, j + q, :]
                a_ref[j + r, j + p, :] = s2 * inv
        if j + _NB == k:
            break
        # -- panel solve: X L_jj^T = A[j+8:, j:j+8]  (column sweep) --
        for c in range(_NB):
            v = a_ref[j + _NB :, j + c, :]
            for q in range(c):
                v = v - a_ref[j + _NB :, j + q, :] * a_ref[j + c, j + q, :][None]
            a_ref[j + _NB :, j + c, :] = v * inv_diag[j + c][None]
        # -- trailing Schur update: A22 -= X X^T, in 8-column strips so VMEM
        #    temporaries stay (m, 8, TB)-sized (a full (m, m, TB) update
        #    overflows scoped VMEM). Junk written above the diagonal is
        #    never read. --
        for cb in range(jb + 1, nblocks):
            c = cb * _NB
            acc = a_ref[j + _NB :, c : c + _NB, :]
            for q in range(_NB):
                acc = acc - (
                    a_ref[j + _NB :, j + q, :][:, None, :]
                    * a_ref[c : c + _NB, j + q, :][None, :, :]
                )
            a_ref[j + _NB :, c : c + _NB, :] = acc

    # -- forward substitution: L z = b (z kept in x_ref) --
    for jb in range(nblocks):
        j = jb * _NB
        rhs = b_ref[j : j + _NB, :]
        for q in range(j):  # contributions from all solved rows
            rhs = rhs - a_ref[j : j + _NB, q, :] * x_ref[q, :][None]
        for p in range(_NB):
            v = rhs[p, :]
            for q in range(p):
                v = v - a_ref[j + p, j + q, :] * x_ref[j + q, :]
            x_ref[j + p, :] = v * inv_diag[j + p]

    # -- backward substitution: L^T x = z (in place over x_ref) --
    for jb in range(nblocks - 1, -1, -1):
        j = jb * _NB
        rhs = x_ref[j : j + _NB, :]
        for q in range(j + _NB, k):  # rows below this block
            rhs = rhs - a_ref[q, j : j + _NB, :] * x_ref[q, :][None]
        for p in range(_NB - 1, -1, -1):
            v = rhs[p, :]
            for q in range(p + 1, _NB):
                v = v - a_ref[j + q, j + p, :] * x_ref[j + q, :]
            x_ref[j + p, :] = v * inv_diag[j + p]


@functools.partial(jax.jit, static_argnames=("tb", "interpret"))
def cholesky_solve_t(
    a_t: jax.Array,  # (k, k, B) SPD batch, batch-last layout
    b_t: jax.Array,  # (k, B)
    tb: int = 256,
    interpret: bool = False,
) -> jax.Array:  # (k, B)
    """Fused Cholesky factor+solve over batch tiles of ``tb`` lanes."""
    k, _, bsz = a_t.shape
    if k % _NB:
        raise ValueError(f"k={k} must be a multiple of {_NB} (pad with I)")
    if bsz % tb:
        raise ValueError(f"batch {bsz} must be a multiple of tile {tb}")
    grid = (bsz // tb,)
    return pl.pallas_call(
        _chol_solve_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((k, k, tb), lambda i: (0, 0, i)),
            pl.BlockSpec((k, tb), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((k, tb), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((k, bsz), a_t.dtype),
        interpret=interpret,
    )(a_t, b_t)


def _pick_tile(k: int) -> int:
    """Batch-lane tile size: as wide as VMEM allows (double-buffered A tile
    budget ~12 MB), capped at 256 lanes."""
    budget = 12 * 1024 * 1024
    tb = 256
    while tb > 8 and tb * k * k * 4 * 2 > budget:
        tb //= 2
    return tb


def solve_spd(
    a: jax.Array,  # (B, k, k)
    b: jax.Array,  # (B, k)
    interpret: bool = False,
) -> jax.Array:  # (B, k)
    """Drop-in batched SPD solve (same contract as linalg.solve_spd).

    Pads k to a block multiple with an identity diagonal and transposes to
    the batch-last kernel layout. Use on f32/TPU; f64 callers should use
    linalg.solve_spd (Pallas TPU has no f64).
    """
    bsz, k, _ = a.shape
    pad_k = (-k) % _NB
    if pad_k:
        a = jnp.pad(a, ((0, 0), (0, pad_k), (0, pad_k)))
        kp = k + pad_k
        eye_idx = jnp.arange(k, kp)
        a = a.at[:, eye_idx, eye_idx].set(1.0)
        b = jnp.pad(b, ((0, 0), (0, pad_k)))
    else:
        kp = k
    tb = _pick_tile(kp)
    pad_b = (-bsz) % tb
    if pad_b:
        # identity systems: solve to zero, sliced off below
        a = jnp.pad(a, ((0, pad_b), (0, 0), (0, 0)))
        idx = jnp.arange(kp)
        a = a.at[bsz:, idx, idx].set(1.0)
        b = jnp.pad(b, ((0, pad_b), (0, 0)))
    x_t = cholesky_solve_t(
        a.transpose(1, 2, 0), b.T, tb=tb, interpret=interpret
    )
    return x_t.T[:bsz, :k]
