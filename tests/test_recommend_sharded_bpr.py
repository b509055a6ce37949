"""Top-N recommendation + sharded BPR tests."""

import numpy as np
import pytest

import jax

from qmf_tpu.config import BPRConfig
from qmf_tpu.data.dataset import Dataset
from qmf_tpu.models.bpr import BPREngine
from qmf_tpu.models.recommend import recommend_top_n
from qmf_tpu.ops import bpr_ops
from qmf_tpu.parallel import ShardedBPREngine


class TestRecommend:
    def test_topn_basic(self):
        uf = np.array([[1.0, 0.0], [0.0, 1.0]])
        itf = np.array([[2.0, 0.0], [1.0, 0.0], [0.0, 3.0], [0.0, 0.5]])
        idx, sc = recommend_top_n(uf, itf, [0, 1], n=2)
        np.testing.assert_array_equal(idx[0], [0, 1])  # user 0 ranks item 0,1
        np.testing.assert_array_equal(idx[1], [2, 3])
        assert sc[0][0] == pytest.approx(2.0)

    def test_topn_biases(self):
        uf = np.array([[1.0]])
        itf = np.array([[1.0], [1.0]])
        idx, _ = recommend_top_n(uf, itf, [0], n=1, item_biases=np.array([0.0, 5.0]))
        assert idx[0][0] == 1

    def test_topn_excludes_seen(self):
        uf = np.array([[1.0, 0.0]])
        itf = np.array([[2.0, 0.0], [1.0, 0.0], [0.5, 0.0]])
        seen = bpr_ops.make_pos_set(np.array([0]), np.array([0]), 1)
        idx, sc = recommend_top_n(uf, itf, [0], n=2, seen=seen)
        # item 0 (highest raw score) was seen -> excluded
        np.testing.assert_array_equal(idx[0], [1, 2])


@pytest.mark.slow
class TestShardedBPR:
    def _dataset(self):
        rng = np.random.default_rng(0)
        return Dataset(
            rng.integers(1, 60, 800),
            rng.integers(1, 40, 800),
            np.ones(800),
        )

    @pytest.mark.parametrize("n_dev", [2, 8])
    def test_matches_single_device(self, n_dev):
        """Sharded dp epoch == single-device epoch (same seeds, f64).

        batch_size chosen so the padded triplet stream length is identical
        with and without the mesh (2400 % (75*8) == 0); otherwise the
        epoch permutation legitimately differs (statistically equivalent).
        """
        ds = self._dataset()
        cfg = BPRConfig(
            nepochs=3, nfactors=4, batch_size=75, init_seed=1, dtype="float64"
        )
        single = BPREngine(cfg)
        single.init(ds)
        single.optimize()

        sharded = ShardedBPREngine(cfg, n_devices=n_dev)
        sharded.init(ds)
        sharded.optimize()

        np.testing.assert_allclose(
            np.asarray(sharded.params.user_factors),
            np.asarray(single.params.user_factors),
            rtol=1e-9,
            atol=1e-12,
        )

    def test_params_replicated_batch_sharded(self):
        ds = self._dataset()
        eng = ShardedBPREngine(
            BPRConfig(nepochs=1, nfactors=4, batch_size=64), n_devices=8
        )
        eng.init(ds)
        if eng._grouped:
            assert len(eng._grp_users.sharding.device_set) == 8
        else:
            assert len(eng._tri_users.sharding.device_set) == 8
        eng.optimize()
        assert np.isfinite(np.asarray(eng.params.user_factors)).all()

    def test_legacy_stream_batch_sharded(self):
        """Force the legacy triplet-stream path and check its sharding."""
        ds = self._dataset()
        eng = ShardedBPREngine(
            BPRConfig(nepochs=1, nfactors=4, batch_size=64, grouped_epoch=False),
            n_devices=8,
        )
        eng.init(ds)
        assert not eng._grouped
        assert len(eng._tri_users.sharding.device_set) == 8
        eng.optimize()
        assert np.isfinite(np.asarray(eng.params.user_factors)).all()
