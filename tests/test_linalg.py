"""Blocked Cholesky/substitution tests vs numpy float64 oracles."""

import numpy as np
import pytest

import jax.numpy as jnp

from qmf_tpu.ops import linalg


def _spd(rng, b, k, jitter=0.5):
    m = rng.normal(size=(b, k, k))
    return np.einsum("bij,bkj->bik", m, m) / k + jitter * np.eye(k)


class TestBlockedCholesky:
    @pytest.mark.parametrize("k", [8, 16, 64])
    def test_matches_numpy_cholesky(self, k):
        rng = np.random.default_rng(0)
        a = _spd(rng, 5, k)
        l = np.asarray(linalg.cholesky_blocked(jnp.asarray(a)))
        np.testing.assert_allclose(l, np.linalg.cholesky(a), rtol=1e-9,
                                   atol=1e-12)

    @pytest.mark.parametrize("k", [8, 24, 64])
    def test_substitutions(self, k):
        rng = np.random.default_rng(1)
        a = _spd(rng, 4, k)
        l = np.linalg.cholesky(a)
        b = rng.normal(size=(4, k))
        z = np.asarray(
            linalg.solve_lower_blocked(jnp.asarray(l), jnp.asarray(b))
        )
        z_ref = np.stack([np.linalg.solve(l[i], b[i]) for i in range(4)])
        np.testing.assert_allclose(z, z_ref, rtol=1e-9, atol=1e-12)
        x = np.asarray(
            linalg.solve_lower_t_blocked(jnp.asarray(l), jnp.asarray(z))
        )
        x_ref = np.stack(
            [np.linalg.solve(l[i].T, z_ref[i]) for i in range(4)]
        )
        np.testing.assert_allclose(x, x_ref, rtol=1e-8, atol=1e-11)

    @pytest.mark.parametrize("k", [6, 8, 30, 64, 100])
    def test_solve_spd_any_k(self, k):
        """Non-block-multiple k pads with an identity diagonal."""
        rng = np.random.default_rng(2)
        a = _spd(rng, 7, k)
        b = rng.normal(size=(7, k))
        x = np.asarray(linalg.solve_spd(jnp.asarray(a), jnp.asarray(b)))
        x_ref = np.linalg.solve(a, b[..., None])[..., 0]
        np.testing.assert_allclose(x, x_ref, rtol=1e-8, atol=1e-10)

    def test_f32(self):
        rng = np.random.default_rng(3)
        a = _spd(rng, 16, 32).astype(np.float32)
        b = rng.normal(size=(16, 32)).astype(np.float32)
        x = np.asarray(linalg.solve_spd(jnp.asarray(a), jnp.asarray(b)))
        x_ref = np.linalg.solve(
            a.astype(np.float64), b.astype(np.float64)[..., None]
        )[..., 0]
        np.testing.assert_allclose(x, x_ref, rtol=2e-3, atol=1e-4)


class TestSchurInverse:
    @pytest.mark.parametrize("k", [8, 16, 32, 64])
    def test_inv_spd_matches_numpy(self, k):
        rng = np.random.default_rng(3)
        a = _spd(rng, 6, k)
        inv = np.asarray(linalg.inv_spd(jnp.asarray(a)))
        np.testing.assert_allclose(inv, np.linalg.inv(a), rtol=1e-8,
                                   atol=1e-10)

    @pytest.mark.parametrize("k", [8, 30, 64, 100])
    def test_solve_spd_schur_any_k(self, k):
        # non-power-of-two k pads with an identity diagonal internally
        rng = np.random.default_rng(4)
        a = _spd(rng, 5, k)
        b = rng.normal(size=(5, k))
        x = np.asarray(linalg.solve_spd_schur(jnp.asarray(a), jnp.asarray(b)))
        x_ref = np.stack([np.linalg.solve(a[i], b[i]) for i in range(5)])
        np.testing.assert_allclose(x, x_ref, rtol=1e-7, atol=1e-9)

    def test_solve_spd_schur_f32(self):
        rng = np.random.default_rng(5)
        a = _spd(rng, 4, 64).astype(np.float32)
        b = rng.normal(size=(4, 64)).astype(np.float32)
        x = np.asarray(linalg.solve_spd_schur(jnp.asarray(a), jnp.asarray(b)))
        x_ref = np.stack(
            [np.linalg.solve(a[i].astype(np.float64), b[i].astype(np.float64))
             for i in range(4)]
        )
        np.testing.assert_allclose(x, x_ref, rtol=2e-4, atol=2e-4)


class TestMatmulSubstitutionSolve:
    @pytest.mark.parametrize("k", [8, 30, 64, 100])
    def test_matches_numpy(self, k):
        rng = np.random.default_rng(6)
        a = _spd(rng, 5, k)
        b = rng.normal(size=(5, k))
        x = np.asarray(linalg.solve_spd_matmul(jnp.asarray(a), jnp.asarray(b)))
        x_ref = np.stack([np.linalg.solve(a[i], b[i]) for i in range(5)])
        np.testing.assert_allclose(x, x_ref, rtol=1e-8, atol=1e-10)

    def test_ill_conditioned_matches_cholesky_grade(self):
        rng = np.random.default_rng(7)
        k, bsz = 64, 8
        q, _ = np.linalg.qr(rng.normal(size=(bsz, k, k)))
        ev = np.logspace(0, 9, k)
        a = np.einsum("bij,j,bkj->bik", q, ev, q)
        b = rng.normal(size=(bsz, k))
        x = np.asarray(linalg.solve_spd_matmul(jnp.asarray(a), jnp.asarray(b)))
        x_ref = np.stack([np.linalg.solve(a[i], b[i]) for i in range(bsz)])
        rel = np.abs(x - x_ref).max() / np.abs(x_ref).max()
        assert rel < 1e-6, rel
