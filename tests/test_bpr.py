"""BPR tests: structure invariants + statistical training checks.

Models the reference's approach (qmf/test/BPREngineTest.cpp): exact init/eval
set invariants (every eval triplet's positive is in the user's positive set,
the negative isn't — BPREngineTest.cpp:54-58,73-77) and a statistical
optimize test asserting >90% of learned pairwise preferences are correct
over repeated trials (BPREngineTest.cpp:80-157).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from qmf_tpu.config import BPRConfig
from qmf_tpu.data.dataset import Dataset
from qmf_tpu.models.bpr import BPREngine
from qmf_tpu.ops import bpr_ops


def _pos_sets(users, items):
    sets = {}
    for u, i in zip(users, items):
        sets.setdefault(int(u), set()).add(int(i))
    return sets


def _toy_dataset():
    # 6 users, 10 items; values < 1.0 must be dropped
    users = [1, 1, 1, 2, 2, 3, 3, 3, 4, 4, 5, 5, 6, 6, 6]
    items = [10, 11, 12, 10, 13, 11, 14, 15, 12, 16, 17, 18, 10, 17, 19]
    vals = [1.0] * 14 + [0.5]
    return Dataset(np.array(users), np.array(items), np.array(vals))


class TestNegativeSampling:
    def test_device_sampling_avoids_positives(self):
        rng = np.random.default_rng(0)
        n_users, n_items = 20, 15
        users = rng.integers(0, n_users, 200).astype(np.int32)
        items = rng.integers(0, n_items, 200).astype(np.int32)
        pos_set = bpr_ops.make_pos_set(users, items, n_users)
        pos_sets = _pos_sets(users, items)

        batch_users = rng.integers(0, n_users, 512).astype(np.int32)
        neg = np.asarray(
            bpr_ops.sample_negatives(
                jax.random.PRNGKey(1),
                jnp.asarray(batch_users),
                pos_set,
                n_items=n_items,
                rounds=12,
            )
        )
        collisions = sum(
            int(n) in pos_sets.get(int(u), set())
            for u, n in zip(batch_users, neg)
        )
        # with 12 rounds at ~2/3 positive density worst user, collisions
        # should be essentially zero
        assert collisions <= 2
        assert (neg >= 0).all() and (neg < n_items).all()

    def test_membership_binary_search(self):
        rng = np.random.default_rng(7)
        n_users, n_items = 50, 1000
        users = rng.integers(0, n_users, 400).astype(np.int32)
        items = rng.integers(0, n_items, 400).astype(np.int32)
        pos_set = bpr_ops.make_pos_set(users, items, n_users)
        truth = _pos_sets(users, items)
        q_users = rng.integers(0, n_users, 300).astype(np.int32)
        q_items = rng.integers(0, n_items, 300).astype(np.int32)
        got = np.asarray(
            bpr_ops._is_member(
                pos_set, jnp.asarray(q_users), jnp.asarray(q_items)
            )
        )
        want = np.array(
            [int(i) in truth.get(int(u), set()) for u, i in zip(q_users, q_items)]
        )
        np.testing.assert_array_equal(got, want)

    def test_membership_unrolled_matches_fori_loop(self):
        rng = np.random.default_rng(11)
        n_users, n_items = 40, 500
        users = rng.integers(0, n_users, 600).astype(np.int32)
        items = rng.integers(0, n_items, 600).astype(np.int32)
        pos_set = bpr_ops.make_pos_set(users, items, n_users)
        q_users = jnp.asarray(rng.integers(0, n_users, 256).astype(np.int32))
        q_items = jnp.asarray(rng.integers(0, n_items, 256).astype(np.int32))
        looped = np.asarray(bpr_ops._is_member(pos_set, q_users, q_items))
        unrolled = np.asarray(
            bpr_ops._is_member(pos_set, q_users, q_items, unroll=True)
        )
        np.testing.assert_array_equal(looped, unrolled)

    def test_membership_beyond_int32_key_range(self):
        # user*n_items+item would overflow int32; CSR search must not care
        n_users, n_items = 3, 2_000_000_000
        users = np.array([0, 2, 2], dtype=np.int64)
        items = np.array([5, 1_999_999_999, 7], dtype=np.int64)
        pos_set = bpr_ops.make_pos_set(users, items, n_users)
        got = np.asarray(
            bpr_ops._is_member(
                pos_set,
                jnp.asarray(np.array([2, 2, 0, 1], dtype=np.int32)),
                jnp.asarray(
                    np.array([1_999_999_999, 42, 5, 5], dtype=np.int32)
                ),
            )
        )
        np.testing.assert_array_equal(got, [True, False, True, False])

    def test_host_sampling_exact(self):
        rng = np.random.default_rng(0)
        users = np.array([0, 0, 1] * 50)
        items = np.array([0, 1, 2] * 50)
        n_items = 4
        neg = bpr_ops.sample_negatives_host(rng, users, users, items, n_items)
        pos_sets = _pos_sets(users, items)
        for u, n in zip(users, neg):
            assert int(n) not in pos_sets[int(u)]


class TestBPRInit:
    def test_filters_low_values_and_first_occurrence_order(self):
        engine = BPREngine(BPRConfig(nfactors=4))
        engine.init(_toy_dataset())
        # value 0.5 element dropped: user 6 has only 3 items... item 19 has
        # value 0.5 -> dropped, so item 19 is NOT in the index
        assert engine.item_index.idx(19) == -1
        assert engine.nusers == 6
        # first-occurrence order: user ids [1,2,3,4,5,6], items [10,11,12,...]
        np.testing.assert_array_equal(engine.user_index.ids, [1, 2, 3, 4, 5, 6])
        assert engine.item_index.ids[0] == 10 and engine.item_index.ids[1] == 11

    def test_eval_set_invariants(self):
        engine = BPREngine(BPRConfig(nfactors=4), eval_num_neg=2)
        ds = _toy_dataset()
        engine.init(ds)
        ev_u, ev_p, ev_n = (np.asarray(x) for x in engine._eval_set)
        assert len(ev_u) == 14 * 2  # one entry per positive per eval_num_neg
        pos_sets = _pos_sets(
            engine.user_index.lookup(ds.user_ids[ds.values >= 1.0]),
            engine.item_index.lookup(ds.item_ids[ds.values >= 1.0]),
        )
        for u, p, n in zip(ev_u, ev_p, ev_n):
            assert int(p) in pos_sets[int(u)]
            assert int(n) not in pos_sets[int(u)]

    def test_init_test_filters_unknown(self):
        engine = BPREngine(BPRConfig(nfactors=4))
        engine.init(_toy_dataset())
        test = Dataset(
            np.array([1, 99, 2]),
            np.array([13, 10, 999]),
            np.array([1.0, 1.0, 1.0]),
        )
        engine.init_test(test)
        ev_u, ev_p, ev_n = (np.asarray(x) for x in engine._test_eval_set)
        # only (1, 13) is fully known
        assert set(ev_u.tolist()) == {engine.user_index.idx(1)}
        assert set(ev_p.tolist()) == {engine.item_index.idx(13)}

    def test_double_init_raises(self):
        engine = BPREngine(BPRConfig(nfactors=4))
        engine.init(_toy_dataset())
        with pytest.raises(RuntimeError):
            engine.init(_toy_dataset())


@pytest.mark.slow
class TestBPROptimize:
    def test_learns_pairwise_preferences(self):
        """Statistical test mirroring reference BPREngineTest optimize:
        after training, most (user, positive, unobserved) pairs should score
        the positive higher."""
        rng = np.random.default_rng(42)
        n_users, n_items = 30, 25
        users, items = [], []
        for u in range(n_users):
            liked = (
                range(0, 12) if u % 2 == 0 else range(12, 24)
            )  # two taste groups
            for i in rng.choice(list(liked), size=8, replace=False):
                users.append(u + 1)
                items.append(i + 1)
        ds = Dataset(
            np.array(users), np.array(items), np.ones(len(users))
        )
        correct, total = 0, 0
        for trial in range(3):
            cfg = BPRConfig(
                nepochs=30,
                nfactors=8,
                init_learning_rate=0.1,
                decay_rate=0.95,
                num_negative_samples=3,
                batch_size=256,
                init_seed=trial,
            )
            engine = BPREngine(cfg)
            engine.init(ds)
            engine.optimize()
            uf = np.asarray(engine.params.user_factors)
            itf = np.asarray(engine.params.item_factors)
            scores = uf @ itf.T
            pos_sets = _pos_sets(engine._data_users, engine._data_items)
            check_rng = np.random.default_rng(trial)
            for _ in range(300):
                u = int(check_rng.integers(engine.nusers))
                pos_list = sorted(pos_sets[u])
                p = pos_list[check_rng.integers(len(pos_list))]
                n = int(check_rng.integers(engine.nitems))
                while n in pos_sets[u]:
                    n = int(check_rng.integers(engine.nitems))
                total += 1
                if scores[u, p] > scores[u, n]:
                    correct += 1
        assert correct / total > 0.9, f"only {correct}/{total} correct"

    def test_eval_loss_decreases(self):
        rng = np.random.default_rng(1)
        users = rng.integers(1, 20, 300)
        items = rng.integers(1, 15, 300)
        ds = Dataset(users, items, np.ones(300))
        cfg = BPRConfig(
            nepochs=1, nfactors=4, batch_size=128, init_learning_rate=0.05
        )
        engine = BPREngine(cfg)
        engine.init(ds)
        l0 = float(
            bpr_ops.eval_loss(engine.params, *engine._eval_set, use_biases=False)
        )
        for _ in range(10):
            engine._epoch()
        l1 = float(
            bpr_ops.eval_loss(engine.params, *engine._eval_set, use_biases=False)
        )
        assert l1 < l0

    def test_divergence_guard(self):
        rng = np.random.default_rng(2)
        ds = Dataset(
            rng.integers(1, 10, 100),
            rng.integers(1, 10, 100),
            np.ones(100),
        )
        cfg = BPRConfig(
            nepochs=40,
            nfactors=4,
            init_learning_rate=1e6,
            decay_rate=1.0,
            batch_size=64,
        )
        engine = BPREngine(cfg)
        engine.init(ds)
        with pytest.raises(FloatingPointError):
            engine.optimize()

    def test_biases_train_and_save(self, tmp_path):
        rng = np.random.default_rng(3)
        ds = Dataset(
            rng.integers(1, 20, 200),
            rng.integers(1, 15, 200),
            np.ones(200),
        )
        cfg = BPRConfig(nepochs=2, nfactors=4, use_biases=True, batch_size=128)
        engine = BPREngine(cfg)
        engine.init(ds)
        engine.optimize()
        item_p = tmp_path / "item.dat"
        engine.save_item_factors(str(item_p))
        # with biases: id + bias + k factors per line
        assert len(item_p.read_text().strip().split("\n")[0].split()) == 6

    def test_bitmap_matches_csr_membership(self):
        rng = np.random.default_rng(12)
        n_users, n_items = 50, 700
        users = rng.integers(0, n_users, 900).astype(np.int32)
        items = rng.integers(0, n_items, 900).astype(np.int32)
        pos_set = bpr_ops.make_pos_set(users, items, n_users)
        bitmap = bpr_ops.make_pos_bitmap(users, items, n_users, n_items)
        q_users = jnp.asarray(rng.integers(0, n_users, 512).astype(np.int32))
        q_items = jnp.asarray(rng.integers(0, n_items, 512).astype(np.int32))
        csr = np.asarray(bpr_ops._is_member(pos_set, q_users, q_items))
        bmp = np.asarray(bpr_ops._is_member_bitmap(bitmap, q_users, q_items))
        np.testing.assert_array_equal(csr, bmp)
        # ground truth
        truth = np.zeros(512, dtype=bool)
        pairs = set(zip(users.tolist(), items.tolist()))
        for j, (u, i) in enumerate(
            zip(np.asarray(q_users).tolist(), np.asarray(q_items).tolist())
        ):
            truth[j] = (u, i) in pairs
        np.testing.assert_array_equal(bmp, truth)

    def test_sparse_device_bitmap_build_matches_dense(self):
        """Sparse catalogs take the device-side scatter-set build path
        (distinct-word pairs smaller than the dense array); it must produce
        bit-identical words to the dense host build."""
        rng = np.random.default_rng(21)
        n_users, n_items = 64, 4000  # wpu=125, 8000 words dense
        users = rng.integers(0, n_users, 300).astype(np.int32)
        items = rng.integers(0, n_items, 300).astype(np.int32)
        # condition for the sparse path in make_pos_bitmap
        assert 300 * 8 < n_users * ((n_items + 31) // 32) * 4
        got = np.asarray(
            bpr_ops.make_pos_bitmap(users, items, n_users, n_items).words
        ).view(np.uint32)
        wpu = (n_items + 31) // 32
        want = np.zeros(n_users * wpu, np.uint32)
        for u, i in zip(users.tolist(), items.tolist()):
            want[u * wpu + (i >> 5)] |= np.uint32(1) << np.uint32(i & 31)
        np.testing.assert_array_equal(got, want)

    def test_sampler_bitmap_rejects_positives(self):
        rng = np.random.default_rng(13)
        n_users, n_items = 20, 40  # dense enough that collisions are likely
        users = rng.integers(0, n_users, 400).astype(np.int32)
        items = rng.integers(0, n_items, 400).astype(np.int32)
        pos_set = bpr_ops.make_pos_set(users, items, n_users)
        bitmap = bpr_ops.make_pos_bitmap(users, items, n_users, n_items)
        q_users = jnp.asarray(rng.integers(0, n_users, 256).astype(np.int32))
        neg = bpr_ops._sample_negatives_impl(
            jax.random.key(3), q_users, pos_set.indptr, pos_set.items,
            n_items=n_items, rounds=8, max_degree=pos_set.max_degree,
            bitmap_words=bitmap.words, wpu=bitmap.words_per_user,
        )
        pairs = set(zip(users.tolist(), items.tolist()))
        hits = sum(
            (u, i) in pairs
            for u, i in zip(
                np.asarray(q_users).tolist(), np.asarray(neg).tolist()
            )
        )
        # 8 rounds on a ~50%-dense matrix: residual collisions ~0.4%
        assert hits <= 5, hits


class TestConfigValidation:
    def test_unknown_item_scatter_rejected(self):
        """Typos must not silently run the sequential path and mis-label
        an A/B measurement (round-5 review finding)."""
        eng = BPREngine(BPRConfig(nepochs=1, nfactors=4, item_scatter="Dense"))
        with pytest.raises(ValueError, match="item_scatter"):
            eng.init(_toy_dataset())
