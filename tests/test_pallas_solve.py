"""Pallas fused Cholesky solve kernel: correctness vs numpy/linalg oracles.

Runs in Pallas interpret mode on the CPU test backend (the kernel's compiled
path is exercised on real TPU hardware by bench.py and the wals CLI with
--solver=pallas).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

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
