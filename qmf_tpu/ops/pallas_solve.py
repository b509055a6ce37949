"""Pallas TPU kernel: batched SPD Cholesky factor + solve, fused single-pass.

The WALS inner loop solves ~165k independent k x k SPD systems per epoch
(the Hu-Koren normal equations, reference qmf/wals/WALSEngine.cpp:266-310 —
there one LAPACK ``dsysv_`` call per row). The XLA formulation in
qmf_tpu/ops/linalg.py lowers the blocked factorization to ~20 HLO passes
whose intermediates round-trip through HBM: at ML-20M scale (141k systems of
64x64 = 2.3 GB of A matrices) the solve is bandwidth-bound at many multiples
of the minimum traffic.

This kernel runs the whole factor+solve as ONE fused Pallas program: each
batch tile of A is DMA'd to VMEM once, factored and solved entirely on-chip,
and only x (k values per system) is written back — the theoretical-minimum
HBM traffic of one read of A.

Layout: the batch lives in the LAST (lane) dimension and A is stored
COLUMN-major per system — ``a_t[c, r, lane] = A[r, c]``. Because the
trailing Schur complement of a right-looking Cholesky stays symmetric,
column p of the updated A equals row p, so the factorization only ever
touches contiguous (k, TB) slabs ``a_t[p]`` (no strided column gathers):

    for p in 0..k-1 (unrolled, right-looking, rank-1 updates):
        d        = sqrt(a_t[p, p])               # (TB,) diagonal lanes
        col      = a_t[p] * (1/d)  masked rows>p # L[:, p], zeros elsewhere
        a_t[p]   = col
        a_t[m:, m:] -= col[m:, None] * col[None, m:]   # m = 16*(p//16)

The 16-aligned static slice bounds keep the trailing update at 4 distinct
op shapes (full work would be 2.1x more VPU element-ops) while every slice
offset stays tile-aligned. Zero-masked columns make the full-width updates
exact: lanes c <= p contribute col[c] = 0, so already-written L slabs and
the strict upper triangle are never perturbed. The diagonal is carried in
registers as 1/d (never stored), which lets the forward/backward
substitutions run as full-width masked sweeps too.

k must be a multiple of 8 (callers pad with an identity diagonal; padded
coordinates solve to zero — see :func:`solve_spd`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NB = 8  # k padding granularity (f32 sublane tile)
_SCHUR_ALIGN = 16  # static slice alignment of the trailing update


def _factor_solve_core(a_ref, x_ref):
    """Shared kernel core: factor A = L L^T in place and solve in place.

    a_ref: (k, k, TB) column-major-per-system (a_ref[c, r, :] = A[r, c]);
           overwritten with L stored by columns (slab p = L[:, p], zeros at
           rows <= p; diagonal kept in registers).
    x_ref: (k, TB); holds b on entry, x on return.
    """
    k = a_ref.shape[0]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (k, 1), 0)

    inv_diag = [None] * k  # 1/L[p,p] (TB,) vectors, reused by the subs

    # -- right-looking rank-1 Cholesky, columns unrolled --
    for p in range(k):
        d = jnp.sqrt(a_ref[p, p, :])
        inv = 1.0 / d
        inv_diag[p] = inv
        col = jnp.where(row_ids > p, a_ref[p] * inv[None, :], 0.0)
        a_ref[p] = col
        if p + 1 < k:
            m = _SCHUR_ALIGN * (p // _SCHUR_ALIGN)
            sub = col[m:]
            a_ref[m:, m:, :] = a_ref[m:, m:, :] - sub[:, None, :] * sub[None]

    # -- forward substitution: L z = b (z accumulated in x_ref) --
    for p in range(k):
        xp = x_ref[p, :] * inv_diag[p]
        # slab p is zero at rows <= p, so x[<=p] is untouched by the sweep
        x_ref[...] = x_ref[...] - a_ref[p] * xp[None, :]
        x_ref[p, :] = xp

    # -- backward substitution: L^T x = z (in place over x_ref) --
    # At step p rows > p of x_ref hold final x, rows <= p still hold z;
    # slab p's zero rows <= p make the reduction exactly sum_{r>p} L[r,p] x[r].
    for p in range(k - 1, -1, -1):
        s = jnp.sum(a_ref[p] * x_ref[...], axis=0)
        x_ref[p, :] = (x_ref[p, :] - s) * inv_diag[p]


def _chol_solve_kernel(a_ref, b_ref, x_ref):
    """Batch-last entry: a (k, k, TB), b/x (k, TB)."""
    x_ref[...] = b_ref[...]
    _factor_solve_core(a_ref, x_ref)


def _chol_solve_kernel_nat(a_ref, b_ref, x_ref, at_ref, xt_ref):
    """Natural-layout entry: a (TB, k, k), b/x (TB, k).

    Transposes the tile to batch-last in VMEM (one (TB, k*k) -> (k*k, TB)
    2D transpose on-chip) so callers feed A in the layout the build einsum
    naturally produces — no multi-GB XLA transpose between build and solve.
    """
    tb, k, _ = a_ref.shape
    # Mosaic rejects the one-shot (TB, k, k) -> (TB, k*k) vector reshape
    # ("unsupported shape cast"); k row-slab 2D transposes lower cleanly.
    # at[c, r, :] = a[:, r, c] for all c == transpose of the (TB, k) slab
    # a[:, r, :], written to the strided (k, TB) slab at[:, r, :].
    for r in range(k):
        at_ref[:, r, :] = jnp.transpose(a_ref[:, r, :], (1, 0))
    xt_ref[...] = jnp.transpose(b_ref[...], (1, 0))
    _factor_solve_core(at_ref, xt_ref)
    x_ref[...] = jnp.transpose(xt_ref[...], (1, 0))


@functools.partial(jax.jit, static_argnames=("tb", "interpret"))
def cholesky_solve_t(
    a_t: jax.Array,  # (k, k, B) SPD batch, batch-last (symmetric: layout-free)
    b_t: jax.Array,  # (k, B)
    tb: int = 512,
    interpret: bool = False,
) -> jax.Array:  # (k, B)
    """Fused Cholesky factor+solve over batch tiles of ``tb`` lanes.

    A is symmetric, so the (k, k, B) operand serves directly as the
    column-major-per-system layout the kernel wants.
    """
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
        cost_estimate=pl.CostEstimate(
            flops=bsz * (k * k * k // 3 + 2 * k * k),
            bytes_accessed=(k * k + 2 * k) * bsz * 4,
            transcendentals=bsz * k,
        ),
        interpret=interpret,
    )(a_t, b_t)


@functools.partial(jax.jit, static_argnames=("tb", "interpret"))
def cholesky_solve_nat(
    a: jax.Array,  # (B, k, k) SPD batch, natural layout
    b: jax.Array,  # (B, k)
    tb: int = 512,
    interpret: bool = False,
) -> jax.Array:  # (B, k)
    """Fused Cholesky factor+solve taking A/b/x in natural batch-first
    layout; the batch-last transpose happens per tile inside the kernel."""
    bsz, k, _ = a.shape
    if k % _NB:
        raise ValueError(f"k={k} must be a multiple of {_NB} (pad with I)")
    if bsz % tb:
        raise ValueError(f"batch {bsz} must be a multiple of tile {tb}")
    grid = (bsz // tb,)
    return pl.pallas_call(
        _chol_solve_kernel_nat,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tb, k, k), lambda i: (i, 0, 0)),
            pl.BlockSpec((tb, k), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((tb, k), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((bsz, k), a.dtype),
        scratch_shapes=[
            pltpu.VMEM((k, k, tb), a.dtype),
            pltpu.VMEM((k, tb), a.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=bsz * (k * k * k // 3 + 2 * k * k),
            bytes_accessed=(k * k + 2 * k) * bsz * 4,
            transcendentals=bsz * k,
        ),
        interpret=interpret,
    )(a, b)


def _pick_tile(k: int) -> int:
    """Batch-lane tile: A tile (double-buffered) + the (k, k, TB) Schur
    temporary within a ~10 MB VMEM budget, capped at 512 lanes."""
    budget = 10 * 1024 * 1024
    tb = 512
    while tb > 8 and tb * k * k * 4 * 3 > budget:
        tb //= 2
    return tb


def solve_spd(
    a: jax.Array,  # (B, k, k)
    b: jax.Array,  # (B, k)
    interpret: bool = False,
    layout: str = "nat",
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
    if layout == "nat":
        # per-tile in-VMEM transpose; no whole-batch XLA transpose
        x = cholesky_solve_nat(a, b, tb=tb, interpret=interpret)
        return x[:bsz, :k]
    x_t = cholesky_solve_t(
        a.transpose(1, 2, 0), b.T, tb=tb, interpret=interpret
    )
    return x_t.T[:bsz, :k]


# ---------------------------------------------------------------------------
# Fused normal-equation BUILD + factor + solve
# ---------------------------------------------------------------------------
#
# The WALS half-epoch's HBM traffic on the XLA path is dominated by
# round-trips the math never needed: the gathered factor stream (N, D, k)
# is written by the gather, read twice by the A/b einsums, and the stacked
# A (N, k, k) is written by the build and read back by the solve — ~14 GB
# per ML-20M user side against a ~3.3 GB information-theoretic floor
# (benchmarks/wals_build_micro.py: the build runs AT the measured ~115 GB/s
# effective bandwidth of this part, and sequential indices are no faster
# than random ones, so bytes — not gather addressing — are the bound).
#
# This kernel consumes the gathered stream ONCE and keeps each tile's A
# entirely in VMEM: grid (row tiles x D blocks); step (i, j) accumulates
#   A[t] += sum_d w[t, d] * yg[t, d, :] (x) yg[t, d, :]   (MXU, f32 accum)
#   b[t] += sum_d conf[t, d] * yg[t, d, :]
# into scratch/output blocks that persist across the j axis, and the last
# j step transposes to batch-last and runs the rank-1 factor+solve core.
# HBM: one read of yg/w/conf, one write of x and b. Replaces
# _build_bucket + solve (reference hot loop qmf/wals/WALSEngine.cpp:266-310).


def _accum_cold_tile(yg_ref, w_ref, conf_ref, a_nat, b_ref):
    """Accumulate one (TB, BD, k) cold block into a_nat/b_ref.

    Static unroll over the tile's rows: every VMEM slab offset is a
    compile-time constant (a dynamic fori_loop index forces Mosaic into
    dynamic-sublane addressing on each read/write, which measured ~25%
    SLOWER than the split XLA path; unrolled the same math issues as
    straight-line independent MXU ops).
    """
    tb = yg_ref.shape[0]
    for t in range(tb):
        yg_t = yg_ref[t]  # (bd, k) bf16
        # minor-dim insertion must happen on the f32 value (Mosaic only
        # supports non-no-op minor reshapes for 32-bit types); the bf16
        # cast AFTER matches the DEFAULT-precision einsum's rounding
        w_t = w_ref[t][:, None].astype(yg_t.dtype)  # (bd, 1)
        wy = yg_t * w_t
        a_nat[t] = a_nat[t] + jax.lax.dot_general(
            wy, yg_t, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    # b accumulates tile-wide on the VPU: the per-row alternative is a
    # degenerate (1, bd) x (bd, k) MXU dot per row. OPERANDS round to the
    # stream dtype and products/sums run in f32 — exactly the MXU's
    # bf16 x bf16 -> f32 semantics, so this matches the DEFAULT-precision
    # einsum of the split path bit-for-bit up to summation order.
    conf_rnd = (
        conf_ref[...][:, :, None].astype(yg_ref.dtype).astype(jnp.float32)
    )
    cyg = yg_ref[...].astype(jnp.float32) * conf_rnd
    b_ref[...] = b_ref[...] + jnp.sum(cyg, axis=1)


def _solve_tile(a_nat, b_ref, x_ref, at_ref, xt_ref):
    """Transpose the accumulated tile batch-last and factor+solve it."""
    k = a_nat.shape[1]
    for r in range(k):
        at_ref[:, r, :] = jnp.transpose(a_nat[:, r, :], (1, 0))
    xt_ref[...] = jnp.transpose(b_ref[...], (1, 0))
    _factor_solve_core(at_ref, xt_ref)
    x_ref[...] = jnp.transpose(xt_ref[...], (1, 0))


def _build_solve_kernel(ytyl_ref, yg_ref, w_ref, conf_ref, x_ref, b_ref,
                        a_nat, at_ref, xt_ref):
    j = pl.program_id(1)
    nd = pl.num_programs(1)

    @pl.when(j == 0)
    def _init():
        # start from YtY + lam*I (the dense Gramian term of Hu-Koren A)
        a_nat[...] = jnp.broadcast_to(ytyl_ref[...], a_nat.shape)
        b_ref[...] = jnp.zeros_like(b_ref)

    _accum_cold_tile(yg_ref, w_ref, conf_ref, a_nat, b_ref)

    @pl.when(j == nd - 1)
    def _solve():
        _solve_tile(a_nat, b_ref, x_ref, at_ref, xt_ref)


def _make_build_solve_hot_kernel(nd_hot: int):
    """Kernel variant whose j axis runs the HOT blocks first, then the cold
    blocks: step j < nd_hot adds one (TB, HB) slice of the static hot
    weights via two MXU GEMMs against the rank-1 table Z (the hot/cold
    split of ops/hot.py, computed entirely in VMEM instead of an XLA GEMM
    whose (N, k, k) output would round-trip HBM); steps j >= nd_hot run the
    per-row cold accumulation; the final step factors+solves in place."""

    def kernel(ytyl_ref, yg_ref, w_ref, conf_ref, wa_ref, wb_ref, z_ref,
               yhot_ref, x_ref, b_ref, a_nat, at_ref, xt_ref):
        j = pl.program_id(1)
        nd = pl.num_programs(1)
        tb, _, k = yg_ref.shape

        @pl.when(j == 0)
        def _init():
            a_nat[...] = jnp.broadcast_to(ytyl_ref[...], a_nat.shape)
            b_ref[...] = jnp.zeros_like(b_ref)

        @pl.when(j < nd_hot)
        def _hot():
            # one (tb, hb) x (hb, k) MXU dot per A row-slab r against the
            # slab view z[r] of the rank-1 table (z_ref is (k, hb, k) with
            # z_ref[r, h, :] = y_h[r] * y_h): every accumulation writes a
            # full (tb, k) slab — no lane-slicing or reshape of a flat
            # (tb, k*k) product, which Mosaic cannot shape-cast
            wa = wa_ref[...]
            for r in range(k):
                a_nat[:, r, :] = a_nat[:, r, :] + jax.lax.dot_general(
                    wa, z_ref[r], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            b_ref[...] = b_ref[...] + jax.lax.dot_general(
                wb_ref[...], yhot_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        @pl.when(j >= nd_hot)
        def _cold():
            _accum_cold_tile(yg_ref, w_ref, conf_ref, a_nat, b_ref)

        @pl.when(j == nd - 1)
        def _solve():
            _solve_tile(a_nat, b_ref, x_ref, at_ref, xt_ref)

    return kernel


def _vmem_bytes(shape, itemsize):
    """VMEM footprint of a block: minor dim pads to 128 lanes, second-minor
    to the dtype's sublane multiple (8 f32 / 16 bf16). With k=64 this
    DOUBLES any k-minor buffer — the padding, not the nominal size, is
    what the 16 MB scoped-vmem stack limit sees."""
    s = list(shape)
    s[-1] = -(-s[-1] // 128) * 128
    if len(s) >= 2:
        sub = 8 * (4 // itemsize)
        s[-2] = -(-s[-2] // sub) * sub
    out = itemsize
    for v in s:
        out *= v
    return out


def _block_minor(d: int, cap: int = 256) -> int:
    """Largest legal Mosaic block size for a minor array dim of length d:
    a multiple of 128 that divides d (capped), or d itself (a block equal
    to the full dim is always legal, whatever its length)."""
    for bd in (cap, 128):
        if d > bd and d % bd == 0:
            return bd
    return d


def _build_tiles(n: int, d: int, k: int, h: int = 0, hot_itemsize: int = 2,
                 yg_itemsize: int = 2):
    """(TB, BD, HB) grid tiles for the fused build+solve kernel.

    BD: d unblocked when no 128-multiple divides it (e.g. the pow2_q grid's
    320/448 widths), else 256/128 — a block's minor dim must be a multiple
    of 128 or the full dim. HB: same rule for the hot width h (0 = no hot).
    TB: the largest power of two whose full padded VMEM footprint
    (double-buffered in/out blocks + the three scratches) fits a 10 MB
    budget — headroom under the 16 MB scoped-vmem stack limit for the
    unrolled build loop's ~2-4 MB of Mosaic stack temporaries (measured:
    a 14 MB model OOMed the limit by 2.04 MB).
    """
    bd = _block_minor(d)
    hb = _block_minor(h) if h else 0
    budget = 10 * 1024 * 1024
    tb = 256
    while tb > 8:
        need = (
            2 * _vmem_bytes((tb, bd, k), yg_itemsize)  # yg, double-buffered
            + 4 * _vmem_bytes((tb, bd), 4)       # w + conf, double-buffered
            + _vmem_bytes((tb, k, k), 4)         # a_nat scratch
            + _vmem_bytes((k, k, tb), 4)         # at scratch
            + _vmem_bytes((k, tb), 4)            # xt scratch
            + 4 * _vmem_bytes((tb, k), 4)        # x + b out, double-buffered
            + 2 * _vmem_bytes((k, k), 4)         # ytyl
        )
        if h:
            need += (
                4 * _vmem_bytes((tb, hb), hot_itemsize)   # w_a + w_b blocks
                + 2 * _vmem_bytes((hb, k * k), hot_itemsize)  # z block
                + 2 * _vmem_bytes((hb, k), hot_itemsize)      # y_hot block
            )
        if need <= budget:
            break
        tb //= 2
    return tb, bd, hb


@functools.partial(jax.jit, static_argnames=("interpret",))
def build_solve(
    yg: jax.Array,  # (N, D, k) bf16 gathered fixed-factor rows
    w: jax.Array,  # (N, D) f32 confidence-minus-one weights (alpha*v*mask)
    conf: jax.Array,  # (N, D) f32 confidences (mask + w)
    ytyl: jax.Array,  # (k, k) f32 YtY + lam*I
    hot=None,  # optional (w_a (N, H), w_b (N, H)) static hot weights
    y_hot: jax.Array | None = None,  # (H, k) hot fixed-factor rows
    z: jax.Array | None = None,  # (H, k*k) rank-1 table vec(y_h y_h^T)
    interpret: bool = False,
):
    """Fused Hu-Koren build + Cholesky solve: returns (x (N, k), b (N, k)).

    Rows are independent; callers pad N to a tile multiple with zero
    w/conf rows (their A is YtY + lam*I, SPD, solved and discarded).
    With ``hot`` given, each row's A/b additionally accumulate the
    hot/cold-split head contribution (ops/hot.py) as in-VMEM GEMMs
    against Z/y_hot — the XLA-GEMM equivalent would materialize an
    (N, k, k) hot term in HBM, re-creating the round-trip this kernel
    exists to remove.
    """
    n, d, k = yg.shape
    if k % _NB:
        raise ValueError(f"k={k} must be a multiple of {_NB}")
    h = hot[0].shape[1] if hot is not None else 0
    tb, bd, hb = _build_tiles(
        n, d, k, h, hot[0].dtype.itemsize if hot is not None else 2,
        yg_itemsize=yg.dtype.itemsize,
    )
    if d % bd:
        raise ValueError(f"width {d} not a multiple of block {bd}")
    pad = (-n) % tb
    if pad:
        yg = jnp.pad(yg, ((0, pad), (0, 0), (0, 0)))
        w = jnp.pad(w, ((0, pad), (0, 0)))
        conf = jnp.pad(conf, ((0, pad), (0, 0)))
    npad = n + pad
    nd_cold = d // bd
    base_specs = [
        pl.BlockSpec((k, k), lambda i, j: (0, 0)),
    ]
    out_specs = [
        pl.BlockSpec((tb, k), lambda i, j: (i, 0)),
        pl.BlockSpec((tb, k), lambda i, j: (i, 0)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((npad, k), jnp.float32),
        jax.ShapeDtypeStruct((npad, k), jnp.float32),
    ]
    scratch_shapes = [
        pltpu.VMEM((tb, k, k), jnp.float32),
        pltpu.VMEM((k, k, tb), jnp.float32),
        pltpu.VMEM((k, tb), jnp.float32),
    ]
    cost = pl.CostEstimate(
        flops=npad * d * (k * k + k) * 2
        + npad * h * (k * k + k) * 2
        + npad * (k * k * k // 3 + 2 * k * k),
        bytes_accessed=npad * d * (k * 2 + 8)
        + npad * h * 4
        + 2 * npad * k * 4,
        transcendentals=npad * k,
    )
    if hot is None:
        x, b = pl.pallas_call(
            _build_solve_kernel,
            grid=(npad // tb, nd_cold),
            in_specs=base_specs
            + [
                pl.BlockSpec((tb, bd, k), lambda i, j: (i, j, 0)),
                pl.BlockSpec((tb, bd), lambda i, j: (i, j)),
                pl.BlockSpec((tb, bd), lambda i, j: (i, j)),
            ],
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=scratch_shapes,
            cost_estimate=cost,
            interpret=interpret,
        )(ytyl, yg, w, conf)
        return x[:n], b[:n]

    w_a, w_b = hot
    if h % hb:
        raise ValueError(f"hot width {h} not a multiple of block {hb}")
    nd_hot = h // hb
    # slab view of the rank-1 table: z3[r, h, :] = y_h[r] * y_h (see the
    # kernel's _hot branch for why the flat (H, k*k) layout can't be used)
    z3 = z.reshape(h, k, k).transpose(1, 0, 2)
    if pad:
        w_a = jnp.pad(w_a, ((0, pad), (0, 0)))
        w_b = jnp.pad(w_b, ((0, pad), (0, 0)))
    # hot blocks run first on the j axis, cold blocks after; clamped index
    # maps re-present the same block outside its phase (revisited blocks
    # are not re-fetched, so the only cost is one resident block each)
    cold_j = lambda j: jnp.maximum(j - nd_hot, 0)  # noqa: E731
    hot_j = lambda j: jnp.minimum(j, nd_hot - 1)  # noqa: E731
    x, b = pl.pallas_call(
        _make_build_solve_hot_kernel(nd_hot),
        grid=(npad // tb, nd_hot + nd_cold),
        in_specs=base_specs
        + [
            pl.BlockSpec((tb, bd, k), lambda i, j: (i, cold_j(j), 0)),
            pl.BlockSpec((tb, bd), lambda i, j: (i, cold_j(j))),
            pl.BlockSpec((tb, bd), lambda i, j: (i, cold_j(j))),
            pl.BlockSpec((tb, hb), lambda i, j: (i, hot_j(j))),
            pl.BlockSpec((tb, hb), lambda i, j: (i, hot_j(j))),
            pl.BlockSpec((k, hb, k), lambda i, j: (0, hot_j(j), 0)),
            pl.BlockSpec((hb, k), lambda i, j: (hot_j(j), 0)),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        cost_estimate=cost,
        interpret=interpret,
    )(ytyl, yg, w, conf, w_a, w_b, z3, y_hot)
    return x[:n], b[:n]
