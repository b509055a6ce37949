"""Pallas fused Cholesky solve kernel: correctness vs numpy/linalg oracles.

Runs in Pallas interpret mode on the CPU test backend (the kernel's compiled
path is exercised on real TPU hardware by bench.py and the wals CLI with
--solver=pallas).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.slow  # interpret-mode kernels: ~10 min on 1 vCPU

from qmf_tpu.ops import linalg, pallas_solve


def _random_spd(bsz: int, k: int, seed: int = 0, dtype=np.float32):
    rng = np.random.default_rng(seed)
    m = rng.normal(size=(bsz, k, k))
    a = m @ m.transpose(0, 2, 1) + 0.1 * np.eye(k)
    b = rng.normal(size=(bsz, k))
    return a.astype(dtype), b.astype(dtype)


class TestPallasSolve:
    @pytest.mark.parametrize("k", [8, 16, 64])
    def test_matches_numpy_solve(self, k):
        a, b = _random_spd(16, k, seed=k)
        x = np.asarray(
            pallas_solve.solve_spd(jnp.asarray(a), jnp.asarray(b), interpret=True)
        )
        expect = np.linalg.solve(a.astype(np.float64), b.astype(np.float64)[..., None])[..., 0]
        np.testing.assert_allclose(x, expect, rtol=2e-4, atol=2e-4)

    def test_matches_xla_blocked_cholesky(self):
        a, b = _random_spd(32, 64, seed=3)
        x_pallas = np.asarray(
            pallas_solve.solve_spd(jnp.asarray(a), jnp.asarray(b), interpret=True)
        )
        x_xla = np.asarray(linalg.solve_spd(jnp.asarray(a), jnp.asarray(b)))
        # both are f32 with different accumulation orders
        np.testing.assert_allclose(x_pallas, x_xla, rtol=2e-3, atol=2e-4)

    def test_non_block_multiple_k_padded(self):
        # k=30 (reference default nfactors) is padded to 32 internally
        a, b = _random_spd(8, 30, seed=7)
        x = np.asarray(
            pallas_solve.solve_spd(jnp.asarray(a), jnp.asarray(b), interpret=True)
        )
        expect = np.linalg.solve(a.astype(np.float64), b.astype(np.float64)[..., None])[..., 0]
        np.testing.assert_allclose(x, expect, rtol=2e-4, atol=2e-4)

    @pytest.mark.parametrize("layout", ["nat", "t"])
    def test_layouts_agree(self, layout):
        """The in-kernel-transpose (nat) and batch-last (t) entries solve
        identically."""
        a, b = _random_spd(16, 32, seed=21)
        x = np.asarray(
            pallas_solve.solve_spd(
                jnp.asarray(a), jnp.asarray(b), interpret=True, layout=layout
            )
        )
        expect = np.linalg.solve(
            a.astype(np.float64), b.astype(np.float64)[..., None]
        )[..., 0]
        np.testing.assert_allclose(x, expect, rtol=2e-4, atol=2e-4)

    def test_batch_padding(self):
        # batch not a multiple of the lane tile: padded identity systems
        a, b = _random_spd(13, 16, seed=11)
        x = np.asarray(
            pallas_solve.solve_spd(jnp.asarray(a), jnp.asarray(b), interpret=True)
        )
        assert x.shape == (13, 16)
        expect = np.linalg.solve(a.astype(np.float64), b.astype(np.float64)[..., None])[..., 0]
        np.testing.assert_allclose(x, expect, rtol=2e-4, atol=2e-4)

    def test_solve_bucket_pallas_solver_matches_cholesky(self):
        """als_ops.solve_bucket(solver='pallas') == solver='cholesky'."""
        from qmf_tpu.ops import als_ops
        from qmf_tpu.ops.pallas_solve import solve_spd as pallas_solve_spd

        rng = np.random.default_rng(0)
        k, n_items, bsz, d = 16, 64, 24, 8
        y = jnp.asarray(rng.normal(0, 0.1, (n_items, k)), dtype=jnp.float32)
        yty = als_ops.gramian(y)
        col = jnp.asarray(rng.integers(0, n_items, (bsz, d)), dtype=jnp.int32)
        vals = jnp.asarray(rng.uniform(1, 5, (bsz, d)), dtype=jnp.float32)
        mask = jnp.asarray(rng.random((bsz, d)) < 0.8)
        alpha, lam = jnp.float32(40.0), jnp.float32(0.05)

        # route the pallas solver through interpret mode on CPU
        import qmf_tpu.ops.als_ops as mod

        orig = mod._solve_pallas
        mod._solve_pallas = lambda a, b: pallas_solve_spd(a, b, interpret=True)
        try:
            x_p, loss_p = als_ops._solve_bucket_body(
                y, yty, col, vals, mask, alpha, lam, "pallas"
            )
        finally:
            mod._solve_pallas = orig
        x_c, loss_c = als_ops._solve_bucket_body(
            y, yty, col, vals, mask, alpha, lam, "cholesky"
        )
        np.testing.assert_allclose(
            np.asarray(x_p), np.asarray(x_c), rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(loss_p), np.asarray(loss_c), rtol=1e-4
        )


class TestFusedBuildSolve:
    def _oracle(self, y, col_idx, values, mask, alpha, lam):
        """f64 reference: per-row Hu-Koren normal equations + solve."""
        n, d = col_idx.shape
        k = y.shape[1]
        y64 = y.astype(np.float64)
        yty = y64.T @ y64
        xs, bs = [], []
        for r in range(n):
            a = yty + lam * np.eye(k)
            b = np.zeros(k)
            for c in range(d):
                if not mask[r, c]:
                    continue
                w = alpha * values[r, c]
                yj = y64[col_idx[r, c]]
                a = a + w * np.outer(yj, yj)
                b = b + (1.0 + w) * yj
            xs.append(np.linalg.solve(a, b))
            bs.append(b)
        return np.asarray(xs), np.asarray(bs)

    @pytest.mark.parametrize("n,d", [(8, 8), (24, 16)])
    def test_matches_dense_oracle(self, n, d):
        rng = np.random.default_rng(n * 100 + d)
        k = 16
        n_items = 40
        y = rng.normal(0, 0.3, (n_items, k)).astype(np.float32)
        col_idx = rng.integers(0, n_items, (n, d)).astype(np.int32)
        values = rng.uniform(0.5, 4.0, (n, d)).astype(np.float32)
        mask = (rng.uniform(size=(n, d)) < 0.8)
        alpha, lam = 40.0, 0.05
        maskf = mask.astype(np.float32)
        w = alpha * values * maskf
        conf = maskf + w
        y_bf = jnp.asarray(y).astype(jnp.bfloat16)
        ytyl = (
            jnp.asarray(y).T @ jnp.asarray(y)
            + lam * jnp.eye(k, dtype=jnp.float32)
        )
        x, b = pallas_solve.build_solve(
            y_bf[jnp.asarray(col_idx)],
            jnp.asarray(w),
            jnp.asarray(conf),
            ytyl,
            interpret=True,
        )
        x_want, b_want = self._oracle(y, col_idx, values, mask, alpha, lam)
        # vs the exact f64 oracle the error budget is the bf16 stream and
        # bf16-rounded weights: ~0.4% of the ABSOLUTE-term sum
        # (d * conf_max * |y| ~ 7e2), which dominates cancelled b entries
        np.testing.assert_allclose(np.asarray(b), b_want, rtol=2e-2, atol=3.0)
        np.testing.assert_allclose(np.asarray(x), x_want, rtol=5e-2, atol=5e-2)
        # vs the XLA DEFAULT-precision build + f32 solve (the same bf16
        # rounding, different accumulation order) the match is tight
        from qmf_tpu.ops import als_ops, linalg

        yty = jnp.asarray(y).T @ jnp.asarray(y)
        a_x, b_x, _ = als_ops._build_bucket(
            jnp.asarray(y), yty, jnp.asarray(col_idx),
            jnp.asarray(values), jnp.asarray(mask),
            jnp.asarray(alpha, jnp.float32), jnp.asarray(lam, jnp.float32),
            "default",
        )
        x_x = linalg.solve_spd(a_x, b_x)
        np.testing.assert_allclose(np.asarray(b), np.asarray(b_x),
                                   rtol=5e-3, atol=5e-3)
        # x differs from the XLA path only through rounding of the bf16
        # A-products (interpret mode rounds each product to bf16; XLA CPU
        # upcasts first), amplified per element by cond(A) — elementwise
        # x comparison is meaningless at high weights (the XLA x itself
        # strays equally far from the f64 oracle there). The stable
        # acceptance is the residual against XLA's A: ||Ax - b|| / ||b||.
        del x_x
        res = np.asarray(
            jnp.einsum("bkl,bl->bk", a_x, jnp.asarray(x)) - b_x
        )
        rel = np.linalg.norm(res, axis=1) / np.linalg.norm(
            np.asarray(b_x), axis=1
        )
        assert rel.max() < 5e-3, rel

    def test_hot_inputs_match_unsplit_build(self):
        """The hot/cold-split kernel (in-VMEM GEMMs vs Z) must equal the
        unsplit kernel run on the full entry set (same math, head summed
        on the MXU instead of gathered — ops/hot.py semantics)."""
        rng = np.random.default_rng(21)
        k, n, n_items, h = 16, 24, 40, 8
        d_full, d_cold = 16, 16
        alpha, lam = 40.0, 0.05
        y = rng.normal(0, 0.3, (n_items, k)).astype(np.float32)
        col_idx = rng.integers(0, n_items, (n, d_full)).astype(np.int32)
        values = rng.uniform(0.5, 4.0, (n, d_full)).astype(np.float32)
        mask = rng.uniform(size=(n, d_full)) < 0.8
        # hot set = items 0..h-1; split each row's entries. Everything runs
        # in f32 so the comparison isolates the WIRING (same products, only
        # summation order differs); the production bf16 path's rounding
        # behavior is covered by test_matches_dense_oracle/_multi_block.
        is_hot = (col_idx < h) & mask
        y_f = jnp.asarray(y)
        ytyl = y_f.T @ y_f + lam * jnp.eye(k, dtype=jnp.float32)

        def weights(m):
            mf = m.astype(np.float32)
            w = alpha * values * mf
            return w, mf + w

        # unsplit reference call
        w_all, conf_all = weights(mask)
        x_ref, b_ref = pallas_solve.build_solve(
            y_f[jnp.asarray(col_idx)], jnp.asarray(w_all),
            jnp.asarray(conf_all), ytyl, interpret=True,
        )

        # split call: cold stream keeps non-hot entries; hot entries become
        # dense (n, h) weight rows
        w_cold, conf_cold = weights(mask & ~is_hot)
        w_a = np.zeros((n, h), np.float32)
        w_b = np.zeros((n, h), np.float32)
        for r, c in zip(*np.nonzero(is_hot)):
            w_a[r, col_idx[r, c]] += alpha * values[r, c]
            w_b[r, col_idx[r, c]] += 1.0 + alpha * values[r, c]
        y_hot = y_f[:h]
        z = (y_hot[:, :, None] * y_hot[:, None, :]).reshape(h, k * k)
        x_split, b_split = pallas_solve.build_solve(
            y_f[jnp.asarray(col_idx)], jnp.asarray(w_cold),
            jnp.asarray(conf_cold), ytyl,
            hot=(jnp.asarray(w_a), jnp.asarray(w_b)),
            y_hot=y_hot, z=z, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(b_split), np.asarray(b_ref), rtol=1e-4, atol=1e-3
        )
        np.testing.assert_allclose(
            np.asarray(x_split), np.asarray(x_ref), rtol=1e-3, atol=1e-3
        )

    def test_hot_multi_block(self):
        """Hot width > one block (nd_hot > 1) accumulates all hot slices."""
        rng = np.random.default_rng(33)
        k, n, h = 8, 16, 512  # hb = 256 -> 2 hot blocks
        lam = 0.05
        y_hot = jnp.asarray(
            rng.normal(0, 0.2, (h, k)).astype(np.float32)
        ).astype(jnp.bfloat16)
        z = (y_hot[:, :, None] * y_hot[:, None, :]).reshape(h, k * k)
        w_a = rng.uniform(0, 2.0, (n, h)).astype(np.float32)
        w_b = w_a + (w_a > 0)
        ytyl = lam * jnp.eye(k, dtype=jnp.float32)
        # cold stream: a single fully-masked minimum-width block
        d = 8
        yg = jnp.zeros((n, d, k), jnp.bfloat16)
        zeros = jnp.zeros((n, d), jnp.float32)
        x, b = pallas_solve.build_solve(
            yg, zeros, zeros, ytyl,
            hot=(jnp.asarray(w_a, jnp.bfloat16),
                 jnp.asarray(w_b, jnp.bfloat16)),
            y_hot=y_hot, z=z, interpret=True,
        )
        # oracle in f32 from the bf16-rounded inputs
        yh = np.asarray(y_hot, np.float32)
        wa16 = np.asarray(jnp.asarray(w_a, jnp.bfloat16), np.float32)
        wb16 = np.asarray(jnp.asarray(w_b, jnp.bfloat16), np.float32)
        for r in range(n):
            a_r = lam * np.eye(k) + (yh * wa16[r][:, None]).T @ yh
            b_r = wb16[r] @ yh
            np.testing.assert_allclose(
                np.asarray(b)[r], b_r, rtol=2e-2, atol=1e-2
            )
            np.testing.assert_allclose(
                np.asarray(x)[r], np.linalg.solve(a_r, b_r),
                rtol=3e-2, atol=3e-2,
            )

    def test_row_padding_and_d_blocking(self):
        """N not a tile multiple and D > the block size both work; padded
        rows solve against YtY + lam*I and are sliced off."""
        rng = np.random.default_rng(9)
        k, n, d, n_items = 8, 12, 512, 30  # bd = 256 -> 2 D blocks
        y = rng.normal(0, 0.3, (n_items, k)).astype(np.float32)
        col_idx = rng.integers(0, n_items, (n, d)).astype(np.int32)
        values = rng.uniform(0.5, 2.0, (n, d)).astype(np.float32)
        mask = (rng.uniform(size=(n, d)) < 0.1)
        maskf = mask.astype(np.float32)
        w = 40.0 * values * maskf
        conf = maskf + w
        ytyl = (
            jnp.asarray(y).T @ jnp.asarray(y)
            + 0.05 * jnp.eye(k, dtype=jnp.float32)
        )
        x, b = pallas_solve.build_solve(
            jnp.asarray(y).astype(jnp.bfloat16)[jnp.asarray(col_idx)],
            jnp.asarray(w),
            jnp.asarray(conf),
            ytyl,
            interpret=True,
        )
        assert x.shape == (n, k) and b.shape == (n, k)
        x_want, b_want = self._oracle(y, col_idx, values, mask, 40.0, 0.05)
        # bf16 rounding ~0.4% of the absolute-term sum (~51 active terms
        # x conf~81 x |y|~0.3 ~ 1.2e3) dominates cancelled entries
        np.testing.assert_allclose(np.asarray(b), b_want, rtol=2e-2, atol=5.0)
        np.testing.assert_allclose(np.asarray(x), x_want, rtol=5e-2, atol=5e-2)

    def test_build_tiles_pow2_q_widths(self):
        """Regression (round-3 advisor finding): the pow2_q grid emits
        widths no 128-multiple divides (320 = 5/8*512, 448 = 7/8*512,
        plus the sub-128 quarter points); _build_tiles must fall back to
        an unblocked D (block == full dim is always legal) instead of
        emitting an illegal partial block."""
        for d in (10, 12, 14, 20, 24, 28, 320, 384, 448):
            tb, bd, hb = pallas_solve._build_tiles(64, d, 64)
            assert d % bd == 0, (d, bd)
            assert bd % 128 == 0 or bd == d, (d, bd)
            assert tb >= 8 and hb == 0

    def test_build_solve_pow2_q_width_320(self):
        """End-to-end fused kernel at a pow2_q-only width (solver=fused +
        width_grid=pow2_q crashed here before the _block_minor fallback)."""
        rng = np.random.default_rng(17)
        k, n, d, n_items = 8, 8, 320, 30
        y = rng.normal(0, 0.3, (n_items, k)).astype(np.float32)
        col_idx = rng.integers(0, n_items, (n, d)).astype(np.int32)
        values = rng.uniform(0.5, 2.0, (n, d)).astype(np.float32)
        mask = (rng.uniform(size=(n, d)) < 0.1)
        maskf = mask.astype(np.float32)
        w = 40.0 * values * maskf
        conf = maskf + w
        ytyl = (
            jnp.asarray(y).T @ jnp.asarray(y)
            + 0.05 * jnp.eye(k, dtype=jnp.float32)
        )
        x, b = pallas_solve.build_solve(
            jnp.asarray(y).astype(jnp.bfloat16)[jnp.asarray(col_idx)],
            jnp.asarray(w),
            jnp.asarray(conf),
            ytyl,
            interpret=True,
        )
        assert x.shape == (n, k)
        x_want, b_want = self._oracle(y, col_idx, values, mask, 40.0, 0.05)
        np.testing.assert_allclose(np.asarray(b), b_want, rtol=2e-2, atol=5.0)
        np.testing.assert_allclose(np.asarray(x), x_want, rtol=5e-2, atol=5e-2)
