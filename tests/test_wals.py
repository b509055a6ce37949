"""WALS numeric-oracle and end-to-end tests.

Follows the reference test strategy (qmf/test/WALSEngineTest.cpp): exact
structure tests of grouping, numeric oracle comparisons of the per-row solve
against a naive float64 recomputation, and convergence checks — extended with
bucket-packing invariants the reference layout didn't need.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from qmf_tpu.config import WALSConfig
from qmf_tpu.data.dataset import Dataset
from qmf_tpu.models.wals import WALSEngine
from qmf_tpu.ops import als_ops
from qmf_tpu.ops.packing import (
    group_rows,
    pack_buckets,
    packed_stats,
    pad_widths,
)


def _toy_dataset():
    # users {1,2,3} x items {1,2,3} partial matrix, mirrors the small case in
    # reference WALSEngineTest.cpp:29-84
    users = np.array([1, 1, 2, 2, 3, 3, 3])
    items = np.array([1, 2, 1, 3, 1, 2, 3])
    vals = np.array([1.0, 2.0, 3.0, 1.0, 2.0, 5.0, 3.0])
    return Dataset(users, items, vals)


def _random_coo(rng, n_rows, n_cols, nnz):
    pairs = set()
    while len(pairs) < nnz:
        pairs.add((int(rng.integers(n_rows)), int(rng.integers(n_cols))))
    pairs = sorted(pairs)
    rows = np.array([p[0] for p in pairs])
    cols = np.array([p[1] for p in pairs])
    vals = rng.uniform(0.5, 5.0, size=len(pairs))
    # ensure every row has at least one entry
    missing = set(range(n_rows)) - set(rows.tolist())
    for r in missing:
        rows = np.append(rows, r)
        cols = np.append(cols, int(rng.integers(n_cols)))
        vals = np.append(vals, 1.0)
    return rows, cols, vals


class TestPacking:
    def test_group_rows(self):
        rows = np.array([2, 0, 2, 0, 1])
        cols = np.array([5, 3, 1, 7, 2])
        vals = np.array([1.0, 2.0, 3.0, 4.0, 5.0])
        cols_s, vals_s, indptr, deg = group_rows(rows, cols, vals, 3)
        np.testing.assert_array_equal(deg, [2, 1, 2])
        np.testing.assert_array_equal(indptr, [0, 2, 3, 5])
        # within-row sorted by col (reference sortDataset order)
        np.testing.assert_array_equal(cols_s, [3, 7, 2, 1, 5])
        np.testing.assert_array_equal(vals_s, [2.0, 4.0, 5.0, 3.0, 1.0])

    def test_pack_covers_all_entries_exactly_once(self):
        rng = np.random.default_rng(0)
        rows, cols, vals = _random_coo(rng, 57, 23, 300)
        buckets = pack_buckets(rows, cols, vals, 57, batch_rows=16)
        seen = {}
        for b in buckets:
            assert b.row_ids.shape[0] % 8 == 0
            for r, ci, v, m in zip(b.row_ids, b.col_idx, b.values, b.mask):
                if r == 57:  # padding row
                    assert not m.any()
                    continue
                assert r not in seen
                seen[int(r)] = list(zip(ci[m].tolist(), v[m].tolist()))
        assert set(seen.keys()) == set(range(57))
        total = sum(len(v) for v in seen.values())
        assert total == len(rows)
        # check entries of one row match the raw COO
        r0 = rows == 0
        expect = sorted(zip(cols[r0].tolist(), vals[r0].tolist()))
        assert sorted(seen[0]) == [(c, pytest.approx(v)) for c, v in expect]

    def test_pad_widths_grids(self):
        rng = np.random.default_rng(5)
        deg = np.concatenate(
            [[1, 7, 8, 9, 10, 11, 13, 17, 24, 25, 512, 513, 897],
             rng.integers(1, 3000, 500)]
        )
        for grid, points in [
            ("pow2", {1.0}),
            ("pow2_15", {0.75, 1.0}),
            ("pow2_q", {5 / 8, 6 / 8, 7 / 8, 1.0}),
        ]:
            w = pad_widths(deg, min_width=8, width_grid=grid)
            assert (w >= deg).all() and (w >= 8).all()
            # each width is a grid point: f * 2^i with f in points
            p2 = np.int64(1) << np.ceil(np.log2(w)).astype(np.int64)
            assert set((w / p2).tolist()) <= points
            # minimality: the next grid point down would be < deg (or < min)
            for d, wi in zip(deg, w):
                lower = max(
                    [int(f * (1 << i)) for f in points for i in range(14)
                     if int(f * (1 << i)) < wi],
                    default=0,
                )
                assert lower < d or lower < 8
        # finer grids never pad more
        w2 = pad_widths(deg, width_grid="pow2")
        w15 = pad_widths(deg, width_grid="pow2_15")
        wq = pad_widths(deg, width_grid="pow2_q")
        assert (wq <= w15).all() and (w15 <= w2).all()

    def test_nonfinite_loss_raises_with_remediation(self):
        # the divergence guard (f32 conditioning failures must not save
        # NaN factors silently; reference BPR CHECK(isfinite) analog)
        with pytest.raises(FloatingPointError, match="float64"):
            WALSEngine._check_finite(float("nan"), epoch=3)
        WALSEngine._check_finite(0.25, epoch=3)  # finite: no raise

    def test_coalesce_widths_bounds_classes(self):
        from qmf_tpu.ops.packing import coalesce_widths

        rng = np.random.default_rng(7)
        deg = rng.zipf(1.3, 5000).clip(1, 4000)
        w = pad_widths(deg, min_width=8, width_grid="pow2_q")
        assert len(np.unique(w)) > 12
        wc = coalesce_widths(w, deg, max_classes=12, min_nnz_frac=0.01)
        # still valid padding, never narrower, bounded class count
        assert (wc >= deg).all() and (wc >= w).all()
        assert len(np.unique(wc)) <= 12
        # every surviving width was an original grid width (merges go UP
        # to an existing class, never invent widths)
        assert set(np.unique(wc)) <= set(np.unique(w))
        # tiny classes (<1% nnz) are gone except possibly the largest width
        tot = deg.sum()
        for width in np.unique(wc)[:-1]:
            assert deg[wc == width].sum() >= 0.01 * tot
        # no-op flags return input unchanged
        np.testing.assert_array_equal(
            coalesce_widths(w, deg, max_classes=0, min_nnz_frac=0.0), w
        )

    def test_coalesced_pack_equivalent_factors_f64(self):
        # class merging is a layout choice; the math must not change
        rng = np.random.default_rng(13)
        users = rng.integers(1, 80, 1500)
        items = rng.integers(1, 50, 1500)
        ds = Dataset(users, items, rng.integers(1, 6, 1500).astype(float))
        outs = []
        for max_cls in (0, 3):
            eng = WALSEngine(
                WALSConfig(
                    nepochs=2, nfactors=6, init_seed=4, dtype="float64",
                    max_width_classes=max_cls, min_class_nnz_frac=0.0,
                )
            )
            eng.init(ds)
            eng.optimize()
            outs.append(
                (np.asarray(eng.user_factors), np.asarray(eng.item_factors))
            )
        np.testing.assert_allclose(outs[0][0], outs[1][0], rtol=1e-9)
        np.testing.assert_allclose(outs[0][1], outs[1][1], rtol=1e-9)

    def test_width_grid_equivalent_factors_f64(self):
        # the padding grid is a layout choice; it must not change the math
        rng = np.random.default_rng(11)
        users = rng.integers(1, 80, 1200)
        items = rng.integers(1, 50, 1200)
        ds = Dataset(users, items, rng.integers(1, 6, 1200).astype(float))
        outs = []
        for grid in ("pow2", "pow2_15", "pow2_q"):
            eng = WALSEngine(
                WALSConfig(
                    nepochs=2, nfactors=6, init_seed=4, dtype="float64",
                    width_grid=grid,
                )
            )
            eng.init(ds)
            eng.optimize()
            outs.append(np.asarray(eng.user_factors))
        np.testing.assert_allclose(outs[0], outs[1], rtol=1e-12, atol=1e-12)
        np.testing.assert_allclose(outs[0], outs[2], rtol=1e-12, atol=1e-12)

    def test_pack_power_law_fill_ratio(self):
        # power-law degrees: bucketed padding must stay reasonably dense
        rng = np.random.default_rng(1)
        n_rows = 500
        degs = np.clip((rng.pareto(1.2, n_rows) * 4).astype(int) + 1, 1, 400)
        rows = np.repeat(np.arange(n_rows), degs)
        cols = rng.integers(0, 1000, size=len(rows))
        vals = np.ones(len(rows))
        buckets = pack_buckets(rows, cols, vals, n_rows)
        stats = packed_stats(buckets)
        assert stats["nnz"] == len(rows)
        # at this tiny scale row-padding dominates; large-scale fill is ~0.7
        assert stats["fill_ratio"] > 0.4


class TestSolveBucket:
    @pytest.mark.parametrize("solver", ["cholesky", "lu"])
    def test_matches_naive_reference_f64(self, solver):
        rng = np.random.default_rng(2)
        k, n_items = 8, 40
        y = rng.normal(0, 0.3, size=(n_items, k))
        alpha, lam = 40.0, 0.05
        rows, cols, vals = _random_coo(rng, 12, n_items, 90)
        buckets = pack_buckets(rows, cols, vals, 12, dtype=np.float64)
        yty = als_ops.gramian(jnp.asarray(y))
        for b in buckets:
            x, loss = als_ops.solve_bucket(
                jnp.asarray(y),
                yty,
                jnp.asarray(b.col_idx),
                jnp.asarray(b.values),
                jnp.asarray(b.mask),
                jnp.float64(alpha),
                jnp.float64(lam),
                solver=solver,
            )
            x, loss = np.asarray(x), np.asarray(loss)
            for bi, r in enumerate(b.row_ids):
                if r == 12:
                    continue
                sel = rows == r
                x_ref, loss_ref = als_ops.naive_reference_solve(
                    y, cols[sel], vals[sel], alpha, lam
                )
                np.testing.assert_allclose(x[bi], x_ref, rtol=1e-8, atol=1e-10)
                np.testing.assert_allclose(loss[bi], loss_ref, rtol=1e-8)

    def test_f32_close_to_f64_oracle(self):
        rng = np.random.default_rng(3)
        k, n_items = 16, 60
        y = rng.normal(0, 0.1, size=(n_items, k))
        alpha, lam = 40.0, 0.05
        rows, cols, vals = _random_coo(rng, 20, n_items, 150)
        buckets = pack_buckets(rows, cols, vals, 20, dtype=np.float32)
        y32 = jnp.asarray(y, dtype=jnp.float32)
        yty = als_ops.gramian(y32)
        for b in buckets:
            x, _ = als_ops.solve_bucket(
                y32,
                yty,
                jnp.asarray(b.col_idx),
                jnp.asarray(b.values),
                jnp.asarray(b.mask),
                jnp.float32(alpha),
                jnp.float32(lam),
            )
            x = np.asarray(x)
            for bi, r in enumerate(b.row_ids):
                if r == 20:
                    continue
                sel = rows == r
                x_ref, _ = als_ops.naive_reference_solve(
                    y, cols[sel], vals[sel], alpha, lam
                )
                np.testing.assert_allclose(x[bi], x_ref, rtol=2e-3, atol=2e-4)

    def test_gramian_exact(self):
        rng = np.random.default_rng(4)
        y = rng.normal(size=(30, 6))
        g = np.asarray(als_ops.gramian(jnp.asarray(y)))
        np.testing.assert_allclose(g, y.T @ y, rtol=1e-10)


@pytest.mark.slow
class TestWALSEngine:
    def test_init_double_raises(self):
        engine = WALSEngine(WALSConfig(nfactors=4))
        engine.init(_toy_dataset())
        with pytest.raises(RuntimeError):
            engine.init(_toy_dataset())

    def test_optimize_before_init_raises(self):
        engine = WALSEngine(WALSConfig())
        with pytest.raises(RuntimeError):
            engine.optimize()

    def test_indices_sorted_by_id(self):
        engine = WALSEngine(WALSConfig(nfactors=4))
        ds = Dataset(
            np.array([30, 10, 20]), np.array([5, 7, 5]), np.array([1.0, 1.0, 1.0])
        )
        engine.init(ds)
        np.testing.assert_array_equal(engine.user_index.ids, [10, 20, 30])
        np.testing.assert_array_equal(engine.item_index.ids, [5, 7])
        assert engine.nusers == 3 and engine.nitems == 2

    def test_loss_decreases_and_reconstructs(self):
        # convergence: confidence-weighted reconstruction of observed entries.
        # k=2 < rank so the loss (a weighted SSE, always >= 0;
        # WALSEngine.cpp:289-304) stays away from float noise.
        engine = WALSEngine(
            WALSConfig(
                nepochs=1, nfactors=2, regularization_lambda=0.01, init_seed=7
            )
        )
        ds = _toy_dataset()
        engine.init(ds)
        losses = []
        for _ in range(8):
            engine._iterate("user")
            losses.append(engine._iterate("item"))
        assert losses[-1] < losses[0]
        assert losses[-1] >= 0.0
        # observed entries should be approximated well (alpha=40 weighting)
        u = np.asarray(engine.user_factors)
        v = np.asarray(engine.item_factors)
        pred = u @ v.T
        for uu, ii, vv in zip(ds.user_ids, ds.item_ids, ds.values):
            ui = engine.user_index.idx(uu)
            vi = engine.item_index.idx(ii)
            # implicit feedback: predicts preference ~1 for observed entries
            assert pred[ui, vi] > 0.5

    def test_engine_matches_full_numpy_als_epoch(self):
        """One full epoch vs a straightforward f64 numpy ALS implementation."""
        rng = np.random.default_rng(5)
        n_u, n_i, k = 13, 9, 4
        rows, cols, vals = _random_coo(rng, n_u, n_i, 50)
        # also ensure every item has an entry
        for c in set(range(n_i)) - set(cols.tolist()):
            rows = np.append(rows, 0)
            cols = np.append(cols, c)
            vals = np.append(vals, 1.0)
        user_ids = rows + 100
        item_ids = cols + 200
        ds = Dataset(user_ids, item_ids, vals)

        cfg = WALSConfig(
            nepochs=1,
            nfactors=k,
            regularization_lambda=0.1,
            confidence_weight=10.0,
            init_seed=11,
            dtype="float64",
        )
        engine = WALSEngine(cfg)
        engine.init(ds)
        v0 = np.asarray(engine.item_factors, dtype=np.float64).copy()
        engine.optimize()

        # numpy oracle epoch
        def solve_side(y, srows, scols, n):
            x = np.zeros((n, k))
            loss = 0.0
            for r in range(n):
                sel = srows == r
                xr, lr = als_ops.naive_reference_solve(
                    y, scols[sel], vals[sel], 10.0, 0.1
                )
                x[r] = xr
                loss += lr
            return x, loss

        u_ref, _ = solve_side(v0, rows, cols, n_u)
        v_ref, loss_ref = solve_side(u_ref, cols, rows, n_i)
        np.testing.assert_allclose(
            np.asarray(engine.user_factors), u_ref, rtol=1e-7, atol=1e-9
        )
        np.testing.assert_allclose(
            np.asarray(engine.item_factors), v_ref, rtol=1e-7, atol=1e-9
        )

    def test_distribution_file_init(self, tmp_path):
        p = tmp_path / "uniform.dat"
        vals = [0.001 * i for i in range(1, 13)]
        p.write_text("".join(f"{v:.9f}\n" for v in vals))
        cfg = WALSConfig(nfactors=4, distribution_file=str(p))
        engine = WALSEngine(cfg)
        ds = Dataset(
            np.array([1, 1, 2]), np.array([1, 2, 3]), np.array([1.0, 1.0, 1.0])
        )
        engine.init(ds)
        np.testing.assert_allclose(
            np.asarray(engine.item_factors),
            np.array(vals).reshape(3, 4),
            rtol=1e-6,
        )

    def test_save_factors_roundtrip(self, tmp_path):
        engine = WALSEngine(WALSConfig(nepochs=2, nfactors=3))
        engine.init(_toy_dataset())
        engine.optimize()
        up = tmp_path / "user.txt"
        ip = tmp_path / "item.txt"
        engine.save_user_factors(str(up))
        engine.save_item_factors(str(ip))
        lines = up.read_text().strip().split("\n")
        assert len(lines) == 3
        assert lines[0].split()[0] == "1"  # sorted raw ids
        assert len(lines[0].split()) == 4  # id + 3 factors


@pytest.mark.slow
class TestFusedEpoch:
    def test_fused_matches_per_class_dispatch(self):
        rng = np.random.default_rng(9)
        n_u, n_i = 40, 22
        users = rng.integers(0, n_u, 400) + 1
        items = rng.integers(0, n_i, 400) + 1
        ds = Dataset(users, items, rng.integers(1, 6, 400).astype(float))
        cfg = dict(nepochs=3, nfactors=4, init_seed=3, dtype="float64")
        fused = WALSEngine(WALSConfig(**cfg, fuse_epoch=True))
        fused.init(ds)
        fused.optimize()
        stepped = WALSEngine(WALSConfig(**cfg, fuse_epoch=False))
        stepped.init(ds)
        stepped.optimize()
        np.testing.assert_allclose(
            np.asarray(fused.user_factors),
            np.asarray(stepped.user_factors),
            rtol=1e-12,
        )
        np.testing.assert_allclose(
            np.asarray(fused.item_factors),
            np.asarray(stepped.item_factors),
            rtol=1e-12,
        )


    def test_fused_run_matches_per_epoch_fused(self):
        """The whole-run scan program (als_ops.train_epochs) must equal
        stepping _fused_epoch once per epoch — same factors, same losses."""
        rng = np.random.default_rng(17)
        n_u, n_i = 35, 19
        users = rng.integers(0, n_u, 300) + 1
        items = rng.integers(0, n_i, 300) + 1
        ds = Dataset(users, items, rng.integers(1, 6, 300).astype(float))
        cfg = dict(nepochs=3, nfactors=4, init_seed=5, dtype="float64")

        run = WALSEngine(WALSConfig(**cfg, fuse_epoch=True))
        run.init(ds)
        assert run._can_fuse_run()
        losses_run = run._fused_run(3)

        per = WALSEngine(WALSConfig(**cfg, fuse_epoch=True))
        per.init(ds)
        losses_per = [per._fused_epoch() for _ in range(3)]

        np.testing.assert_allclose(losses_run, losses_per, rtol=1e-12)
        np.testing.assert_allclose(
            np.asarray(run.user_factors),
            np.asarray(per.user_factors),
            rtol=1e-12,
        )
        np.testing.assert_allclose(
            np.asarray(run.item_factors),
            np.asarray(per.item_factors),
            rtol=1e-12,
        )

    def test_fused_run_gated_off_by_per_epoch_work(self):
        """Per-epoch eval/checkpointing must fall back to per-epoch mode."""
        eng = WALSEngine(WALSConfig(nepochs=2, nfactors=4))
        eng.enable_checkpointing("/tmp/qmf_nonexistent_gate_test")
        assert not eng._can_fuse_run()


@pytest.mark.slow
class TestNegativeValues:
    def test_lu_solver_handles_negative_ratings(self):
        """The reference's dsysv_ tolerates indefinite systems from negative
        values (confidence 1 + alpha*v < 0); the lu solver is our analog."""
        rng = np.random.default_rng(11)
        users = rng.integers(1, 20, 200)
        items = rng.integers(1, 15, 200)
        vals = rng.uniform(-0.02, 5.0, 200)  # mildly negative values
        ds = Dataset(users, items, vals)
        eng = WALSEngine(
            WALSConfig(nepochs=2, nfactors=4, solver="lu", init_seed=0,
                       dtype="float64")
        )
        eng.init(ds)
        eng.optimize()
        assert np.isfinite(np.asarray(eng.user_factors)).all()

    def test_lu_matches_cholesky_on_spd(self):
        ds = _toy_dataset()
        outs = []
        for solver in ("cholesky", "lu", "cholesky_xla"):
            eng = WALSEngine(
                WALSConfig(nepochs=2, nfactors=3, solver=solver, init_seed=1,
                           dtype="float64")
            )
            eng.init(ds)
            eng.optimize()
            outs.append(np.asarray(eng.user_factors))
        np.testing.assert_allclose(outs[0], outs[1], rtol=1e-9)
        np.testing.assert_allclose(outs[0], outs[2], rtol=1e-9)
