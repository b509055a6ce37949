"""Tests for the grouped packed BPR epoch (ops/bpr_ops.py sgd_epoch_grouped).

Covers the Feistel stream shuffle, the compacted-rejection presampler, the
2-bit round-index encoding round-trip (presample program vs in-scan
reconstruction), and engine-level learning through the grouped path —
mirroring the statistical approach of reference BPREngineTest.cpp:80-157.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from qmf_tpu.config import BPRConfig
from qmf_tpu.data.dataset import Dataset
from qmf_tpu.models.bpr import BPREngine
from qmf_tpu.ops import bpr_ops


class TestFeistelBijection:
    @pytest.mark.parametrize("m,b", [(1, 4), (3, 5), (7, 8), (550, 6)])
    def test_is_permutation(self, m, b):
        idx = np.asarray(bpr_ops._feistel_bijection(jax.random.PRNGKey(0), m, b))
        n = m << b
        assert idx.shape == (n,)
        assert np.array_equal(np.sort(idx), np.arange(n))

    def test_keys_give_different_orders(self):
        a = np.asarray(bpr_ops._feistel_bijection(jax.random.PRNGKey(1), 5, 6))
        c = np.asarray(bpr_ops._feistel_bijection(jax.random.PRNGKey(2), 5, 6))
        assert not np.array_equal(a, c)

    def test_actually_mixes(self):
        """Shuffled positions should decorrelate from originals."""
        idx = np.asarray(
            bpr_ops._feistel_bijection(jax.random.PRNGKey(3), 100, 8)
        )
        # fraction of fixed points must be tiny; mean displacement large
        n = len(idx)
        assert (idx == np.arange(n)).mean() < 0.01
        assert np.abs(idx - np.arange(n)).mean() > n / 10


def _brute_rounds(rk, users, pos_sets, n_items, n_rounds):
    """Per-slot first non-member round (numpy oracle)."""
    n = len(users)
    f = np.arange(n, dtype=np.int32)
    out = np.full(n, n_rounds - 1, np.int32)
    done = np.zeros(n, bool)
    for r in range(n_rounds):
        cand = np.asarray(
            bpr_ops._cand_hash(rk[r], jnp.asarray(f), n_items)
        )
        ok = np.array(
            [cand[i] not in pos_sets[users[i]] for i in range(n)]
        )
        take = (~done) & ok
        out[take] = r
        done |= take
    return out


class TestSharedSortBitmap:
    def test_presorted_bitmap_equals_raw_build(self):
        """The bitmap built from make_pos_set's lexsorted/deduped output
        (assume_lex_sorted=True, the engine-init fast path) must be
        word-identical to a build from the raw unsorted pairs."""
        rng = np.random.default_rng(5)
        n_users, n_items = 40, 100
        u_idx = rng.integers(0, n_users, 3000).astype(np.int32)
        i_idx = rng.integers(0, n_items, 3000).astype(np.int32)
        raw = bpr_ops.make_pos_bitmap(u_idx, i_idx, n_users, n_items)
        ps, su, si = bpr_ops.make_pos_set(
            u_idx, i_idx, n_users, return_sorted=True
        )
        fast = bpr_ops.make_pos_bitmap(
            su, si, n_users, n_items, assume_lex_sorted=True
        )
        np.testing.assert_array_equal(
            np.asarray(raw.words), np.asarray(fast.words)
        )
        assert raw.words_per_user == fast.words_per_user
        # and the sorted output matches the CSR contents
        assert len(si) == int(ps.indptr[-1])


class TestSampleRounds:
    def test_matches_bruteforce(self):
        rng = np.random.default_rng(0)
        n_users, n_items = 12, 16  # tiny space -> frequent collisions
        u_idx = rng.integers(0, n_users, 400).astype(np.int32)
        i_idx = rng.integers(0, n_items, 400).astype(np.int32)
        bitmap = bpr_ops.make_pos_bitmap(u_idx, i_idx, n_users, n_items)
        pos_sets = {}
        for u, i in zip(u_idx, i_idx):
            pos_sets.setdefault(int(u), set()).add(int(i))
        for u in range(n_users):
            pos_sets.setdefault(u, set())

        users = rng.integers(0, n_users, 600).astype(np.int32)
        rk = jax.random.randint(
            jax.random.PRNGKey(7), (4, 3), 0, 1 << 30, dtype=jnp.int32
        )
        rounds, overflow = jax.jit(
            bpr_ops._sample_rounds, static_argnames=(
                "n_items", "n_rounds", "collide_cap")
        )(rk, jnp.asarray(users), bitmap, n_items=n_items, n_rounds=4,
          collide_cap=600)
        expected = _brute_rounds(np.asarray(rk), users, pos_sets, n_items, 4)
        assert int(overflow) == 0
        np.testing.assert_array_equal(np.asarray(rounds), expected)

    def test_overflow_counted(self):
        """With a tiny collision cap, overflow is reported and extra
        colliders keep round 0 (graceful degradation)."""
        n_users, n_items = 4, 4
        u_idx = np.repeat(np.arange(4, dtype=np.int32), 3)
        i_idx = np.tile(np.arange(3, dtype=np.int32), 4)  # 3/4 items positive
        bitmap = bpr_ops.make_pos_bitmap(u_idx, i_idx, n_users, n_items)
        users = np.zeros(512, np.int32)
        rk = jax.random.randint(
            jax.random.PRNGKey(1), (4, 3), 0, 1 << 30, dtype=jnp.int32
        )
        rounds, overflow = jax.jit(
            bpr_ops._sample_rounds, static_argnames=(
                "n_items", "n_rounds", "collide_cap")
        )(rk, jnp.asarray(users), bitmap, n_items=n_items, n_rounds=4,
          collide_cap=8)
        assert int(overflow) > 0


class TestGroupedPackRoundTrip:
    def test_reconstructed_negatives_avoid_positives(self):
        """Decode the packed (u_enc, pos) stream exactly the way the scan
        body does and check every reconstructed negative against the user's
        positive set."""
        rng = np.random.default_rng(5)
        n_users, n_items, n_pos = 50, 40, 800
        u_idx = rng.integers(0, n_users, n_pos).astype(np.int32)
        i_idx = rng.integers(0, n_items, n_pos).astype(np.int32)
        bitmap = bpr_ops.make_pos_bitmap(u_idx, i_idx, n_users, n_items)
        pos_sets = {}
        for u, i in zip(u_idx, i_idx):
            pos_sets.setdefault(int(u), set()).add(int(i))

        num_neg, n_rounds = 3, 4
        u_shift = 1 + 2 * num_neg
        bs = 128
        pad = (-n_pos) % bs
        gu = np.concatenate([u_idx, np.zeros(pad, np.int32)])
        gi = np.concatenate([i_idx, np.zeros(pad, np.int32)])
        enc, p, rk, overflow = bpr_ops._sample_pack_grouped_impl(
            jax.random.PRNGKey(3),
            jnp.stack([jnp.asarray(gu), jnp.asarray(gi)], axis=1),
            bitmap.words,
            n_items=n_items,
            n_real=n_pos,
            num_neg=num_neg,
            n_rounds=n_rounds,
            shuffle=True,
            wpu=bitmap.words_per_user,
            u_shift=u_shift,
            feistel_b=7,
            collide_cap=4096,
        )
        enc, p = np.asarray(enc), np.asarray(p)
        assert int(overflow) == 0
        valid = (enc & 1).astype(bool)
        assert valid.sum() == n_pos
        users = enc >> u_shift
        # the multiset of valid (user, pos) pairs survives the shuffle
        got = sorted(zip(users[valid].tolist(), p[valid].tolist()))
        want = sorted(zip(u_idx.tolist(), i_idx.tolist()))
        assert got == want

        rk_np = np.asarray(rk)
        n_bad = 0
        for row in np.nonzero(valid)[0]:
            for j in range(num_neg):
                r = (enc[row] >> (1 + 2 * j)) & 3
                f = row * num_neg + j
                cand = int(np.asarray(bpr_ops._cand_hash(
                    rk_np[r], jnp.asarray(f, jnp.int32), n_items
                )))
                if cand in pos_sets.get(int(users[row]), set()):
                    # allowed only if ALL rounds collided (r == last)
                    if r == n_rounds - 1:
                        n_bad += 1
                    else:
                        raise AssertionError(
                            f"round {r} candidate is a positive"
                        )
        # residual collisions must be rare ((deg/I)^4)
        assert n_bad <= n_pos * num_neg * 0.05


@pytest.mark.slow
class TestWordSamplerRoundTrip:
    def test_reconstructed_negatives_avoid_positives(self):
        """membership="word" variant of the round-trip test: decode the
        packed stream exactly the way the scan body's sampler="word" branch
        does (per-ROW shared word, slot j's probe r testing bit
        b0 + _WORD_DELTA[j*(R-1)+r] for r < R-1, fresh unchecked per-slot
        hash for round R-1) and check the reconstructed negatives."""
        rng = np.random.default_rng(11)
        n_users, n_items, n_pos = 50, 75, 800  # 75 -> tail word has 11 bits
        u_idx = rng.integers(0, n_users, n_pos).astype(np.int32)
        i_idx = rng.integers(0, n_items, n_pos).astype(np.int32)
        bitmap = bpr_ops.make_pos_bitmap(u_idx, i_idx, n_users, n_items)
        wpu = bitmap.words_per_user
        pos_sets = {}
        for u, i in zip(u_idx, i_idx):
            pos_sets.setdefault(int(u), set()).add(int(i))

        num_neg, n_rounds = 3, 4
        u_shift = 1 + 2 * num_neg
        bs = 128
        pad = (-n_pos) % bs
        gu = np.concatenate([u_idx, np.zeros(pad, np.int32)])
        gi = np.concatenate([i_idx, np.zeros(pad, np.int32)])
        enc, p, rk, overflow = bpr_ops._sample_pack_grouped_impl(
            jax.random.PRNGKey(7),
            jnp.stack([jnp.asarray(gu), jnp.asarray(gi)], axis=1),
            bitmap.words,
            n_items=n_items,
            n_real=n_pos,
            num_neg=num_neg,
            n_rounds=n_rounds,
            shuffle=True,
            wpu=wpu,
            u_shift=u_shift,
            feistel_b=7,
            collide_cap=4096,
            membership="word",
        )
        enc, p = np.asarray(enc), np.asarray(p)
        assert int(overflow) == 0
        valid = (enc & 1).astype(bool)
        assert valid.sum() == n_pos
        users = enc >> u_shift
        got = sorted(zip(users[valid].tolist(), p[valid].tolist()))
        want = sorted(zip(u_idx.tolist(), i_idx.tolist()))
        assert got == want

        rk_np = np.asarray(rk)
        n_unchecked = 0
        n_bad_unchecked = 0
        for row in np.nonzero(valid)[0]:
            w, b0 = bpr_ops._word_probe(
                rk_np[0], jnp.asarray(row, jnp.int32), wpu
            )
            for j in range(num_neg):
                r = (enc[row] >> (1 + 2 * j)) & 3
                f = jnp.asarray(row * num_neg + j, jnp.int32)
                if r == n_rounds - 1:
                    # fresh unchecked candidate: may rarely be a positive
                    cand = int(np.asarray(
                        bpr_ops._cand_hash(rk_np[r], f, n_items)
                    ))
                    n_unchecked += 1
                    if cand in pos_sets.get(int(users[row]), set()):
                        n_bad_unchecked += 1
                else:
                    delta = bpr_ops._WORD_DELTA[j * (n_rounds - 1) + r]
                    cand = int(w) * 32 + ((int(b0) + delta) & 31)
                    # verified probes must be valid item ids and non-members
                    assert cand < n_items, (row, j, r, cand)
                    assert cand not in pos_sets.get(int(users[row]), set())
        # with ~8% per-slot collision density, most slots resolve in-word
        assert n_unchecked < n_pos * num_neg * 0.5
        assert n_bad_unchecked <= n_pos * num_neg * 0.05

    def test_engine_learns_through_word_sampler(self):
        """Statistical check (reference BPREngineTest.cpp:80-157 style):
        the default word sampler still learns pairwise preferences."""
        rng = np.random.default_rng(13)
        n_users, n_items = 24, 48
        # each user likes a contiguous block of 8 items
        rows, cols = [], []
        for u in range(n_users):
            base = (u * 2) % (n_items - 8)
            for i in range(8):
                rows.append(u)
                cols.append(base + i)
        ds = Dataset(
            np.asarray(rows, np.int64),
            np.asarray(cols, np.int64),
            np.ones(len(rows), np.float64),
        )
        cfg = BPRConfig(
            nepochs=60,
            nfactors=8,
            init_learning_rate=0.1,
            num_negative_samples=3,
            batch_size=64,
            neg_sampler="word",
            init_seed=3,
        )
        eng = BPREngine(cfg)
        eng.init(ds)
        assert eng._grouped
        eng.optimize()
        scores = np.asarray(
            eng.params.user_factors @ eng.params.item_factors.T
        )
        ok = total = 0
        for u in range(n_users):
            ui = eng.user_index.idx(u)
            base = (u * 2) % (n_items - 8)
            pos = set(range(base, base + 8))
            neg = [
                i for i in range(n_items)
                if i not in pos and eng.item_index.idx(i) >= 0
            ][:8]
            for pi in pos:
                for ni in neg:
                    total += 1
                    ok += (
                        scores[ui, eng.item_index.idx(pi)]
                        > scores[ui, eng.item_index.idx(ni)]
                    )
        assert ok / total > 0.9


class TestBloomMembership:
    def test_no_false_negatives(self):
        """Every inserted (user, item) must test positive."""
        rng = np.random.default_rng(2)
        n_users = 40
        u = rng.integers(0, n_users, 500).astype(np.int32)
        i = rng.integers(0, 10_000, 500).astype(np.int32)
        bloom = bpr_ops.make_pos_bloom(u, i, n_users, 256)
        got = np.asarray(
            bpr_ops._is_member_bloom(bloom, jnp.asarray(u), jnp.asarray(i))
        )
        assert got.all()

    def test_false_positive_rate_bounded(self):
        """With 8 bits/positive the fp rate stays well under 15%."""
        rng = np.random.default_rng(4)
        n_users, deg = 50, 32
        u = np.repeat(np.arange(n_users, dtype=np.int32), deg)
        i = rng.integers(0, 100_000, n_users * deg).astype(np.int32)
        bits = 1 << (8 * deg - 1).bit_length()  # engine's sizing rule
        bloom = bpr_ops.make_pos_bloom(u, i, n_users, bits)
        pos = {}
        for uu, ii in zip(u, i):
            pos.setdefault(int(uu), set()).add(int(ii))
        qu = rng.integers(0, n_users, 4000).astype(np.int32)
        qi = rng.integers(0, 100_000, 4000).astype(np.int32)
        hits = np.asarray(
            bpr_ops._is_member_bloom(bloom, jnp.asarray(qu), jnp.asarray(qi))
        )
        truth = np.array([qi[k] in pos[int(qu[k])] for k in range(4000)])
        assert not (truth & ~hits).any()  # no false negatives
        fp = (hits & ~truth).mean()
        assert fp < 0.15, fp

    def test_sample_rounds_bloom_exact_semantics(self):
        """Bloom + CSR verify must give the SAME rounds as the exact
        bitmap presampler wherever the bitmap accepts round 0, and never
        pick a positive candidate before the last round."""
        rng = np.random.default_rng(0)
        n_users, n_items = 12, 16  # tiny space -> frequent collisions
        u_idx = rng.integers(0, n_users, 400).astype(np.int32)
        i_idx = rng.integers(0, n_items, 400).astype(np.int32)
        bitmap = bpr_ops.make_pos_bitmap(u_idx, i_idx, n_users, n_items)
        bloom = bpr_ops.make_pos_bloom(u_idx, i_idx, n_users, 64)
        pos_set = bpr_ops.make_pos_set(u_idx, i_idx, n_users)
        pos_sets = {}
        for u, i in zip(u_idx, i_idx):
            pos_sets.setdefault(int(u), set()).add(int(i))
        for u in range(n_users):
            pos_sets.setdefault(u, set())

        users = rng.integers(0, n_users, 600).astype(np.int32)
        rk = jax.random.randint(
            jax.random.PRNGKey(7), (4, 3), 0, 1 << 30, dtype=jnp.int32
        )
        exact, _ = jax.jit(
            bpr_ops._sample_rounds,
            static_argnames=("n_items", "n_rounds", "collide_cap"),
        )(rk, jnp.asarray(users), bitmap, n_items=n_items, n_rounds=4,
          collide_cap=600)
        # eager: words_per_user is a static python int consumed by
        # _bloom_positions (in production it rides through the pack
        # program's static args)
        via_bloom, overflow = bpr_ops._sample_rounds_bloom(
            rk, jnp.asarray(users), bloom, pos_set, n_items=n_items,
            n_rounds=4, collide_cap=600)
        assert int(overflow) == 0
        np.testing.assert_array_equal(np.asarray(via_bloom), np.asarray(exact))


@pytest.mark.slow
class TestGroupedEpochEngine:
    def _two_group_dataset(self, rng, n_users=30, n_items=24):
        users, items = [], []
        for u in range(n_users):
            liked = range(0, 12) if u % 2 == 0 else range(12, 24)
            for i in rng.choice(list(liked), size=8, replace=False):
                users.append(u + 1)
                items.append(i + 1)
        return Dataset(np.array(users), np.array(items), np.ones(len(users)))

    def test_engine_uses_grouped_path(self):
        engine = BPREngine(BPRConfig(nfactors=4, batch_size=64))
        engine.init(self._two_group_dataset(np.random.default_rng(0)))
        assert engine._grouped

    def test_grouped_learns_pairwise_preferences(self):
        rng = np.random.default_rng(11)
        ds = self._two_group_dataset(rng)
        correct, total = 0, 0
        for trial in range(2):
            cfg = BPRConfig(
                nepochs=30, nfactors=8, init_learning_rate=0.1,
                decay_rate=0.95, num_negative_samples=3, batch_size=64,
                init_seed=trial,
            )
            engine = BPREngine(cfg)
            engine.init(ds)
            assert engine._grouped
            engine.optimize()
            uf = np.asarray(engine.params.user_factors)
            itf = np.asarray(engine.params.item_factors)
            scores = uf @ itf.T
            pos_sets = {}
            for u, i in zip(engine._data_users, engine._data_items):
                pos_sets.setdefault(int(u), set()).add(int(i))
            check = np.random.default_rng(trial)
            for _ in range(200):
                u = int(check.integers(engine.nusers))
                pos_list = sorted(pos_sets[u])
                p = pos_list[check.integers(len(pos_list))]
                n = int(check.integers(engine.nitems))
                while n in pos_sets[u]:
                    n = int(check.integers(engine.nitems))
                total += 1
                if scores[u, p] > scores[u, n]:
                    correct += 1
        assert correct / total > 0.9, f"only {correct}/{total} correct"

    def test_grouped_and_legacy_agree_statistically(self):
        """Same data, grouped vs triplet-stream epochs: both must learn the
        taste groups (the update order differs, so compare quality, not
        bits)."""
        rng = np.random.default_rng(3)
        ds = self._two_group_dataset(rng)
        accs = []
        for grouped in (True, False):
            cfg = BPRConfig(
                nepochs=25, nfactors=8, init_learning_rate=0.1,
                num_negative_samples=2, batch_size=64, init_seed=0,
                grouped_epoch=grouped,
            )
            engine = BPREngine(cfg)
            engine.init(ds)
            assert engine._grouped == grouped
            engine.optimize()
            uf = np.asarray(engine.params.user_factors)
            itf = np.asarray(engine.params.item_factors)
            scores = uf @ itf.T
            # in-group mean minus out-group mean over even users
            even = scores[::2]
            acc = even[:, :12].mean() - even[:, 12:].mean()
            accs.append(acc)
        assert accs[0] > 0.1 and accs[1] > 0.1, accs

    def test_use_biases_grouped(self):
        rng = np.random.default_rng(9)
        ds = self._two_group_dataset(rng)
        cfg = BPRConfig(
            nepochs=5, nfactors=4, use_biases=True, batch_size=64,
            init_seed=1,
        )
        engine = BPREngine(cfg)
        engine.init(ds)
        assert engine._grouped
        engine.optimize()
        assert np.isfinite(np.asarray(engine.params.item_biases)).all()

    def test_num_neg_one_and_two(self):
        rng = np.random.default_rng(13)
        ds = self._two_group_dataset(rng)
        for nn in (1, 2):
            cfg = BPRConfig(
                nepochs=3, nfactors=4, num_negative_samples=nn,
                batch_size=64, init_seed=2,
            )
            engine = BPREngine(cfg)
            engine.init(ds)
            assert engine._grouped
            engine.optimize()
            assert np.isfinite(
                np.asarray(engine.params.user_factors)
            ).all()

    def test_bloom_grouped_learns(self):
        """bitmap_budget_mb=0 forces the Bloom membership path; the grouped
        epoch must still be taken and still learn the taste groups."""
        rng = np.random.default_rng(17)
        ds = self._two_group_dataset(rng)
        cfg = BPRConfig(
            nepochs=25, nfactors=8, init_learning_rate=0.1,
            num_negative_samples=3, batch_size=64, init_seed=0,
            bitmap_budget_mb=0,
        )
        engine = BPREngine(cfg)
        engine.init(ds)
        assert engine._grouped
        assert engine._pos_bitmap is None and engine._pos_bloom is not None
        engine.optimize()
        uf = np.asarray(engine.params.user_factors)
        itf = np.asarray(engine.params.item_factors)
        scores = uf @ itf.T
        even = scores[::2]
        assert even[:, :12].mean() - even[:, 12:].mean() > 0.1

    def test_large_catalog_keeps_grouped_path(self):
        """A catalog beyond the exact-bitmap budget (the reference's design
        ceiling is ~100M rows, distributed/common/Common.h:17-18) must
        still take the grouped fast path via Bloom membership."""
        rng = np.random.default_rng(23)
        n_users, n_raw_items, nnz = 2000, 40_000, 80_000
        users = rng.integers(1, n_users, nnz)
        items = rng.integers(1, n_raw_items, nnz)
        ds = Dataset(users, items, np.ones(nnz))
        cfg = BPRConfig(
            nepochs=2, nfactors=4, batch_size=256, init_seed=0,
            # ~2000 x ~35k dense ids -> ~9 MB exact bitmap > 1 MB budget
            bitmap_budget_mb=1,
        )
        engine = BPREngine(cfg)
        engine.init(ds)
        assert engine._pos_bitmap is None and engine._pos_bloom is not None
        assert engine._grouped
        engine.optimize()
        assert np.isfinite(np.asarray(engine.params.user_factors)).all()

    def test_fallback_when_rounds_exceed_two_bits(self):
        engine = BPREngine(
            BPRConfig(nfactors=4, neg_resample_rounds=8, batch_size=64)
        )
        engine.init(self._two_group_dataset(np.random.default_rng(0)))
        assert not engine._grouped
        engine.optimize()  # legacy path still trains

    def test_checkpoint_resume_grouped(self, tmp_path):
        """Resume must reproduce the straight run bit-exactly (same RNG
        stream -> same shuffles and negatives)."""
        rng = np.random.default_rng(21)
        ds = self._two_group_dataset(rng)

        def run(nepochs, ckpt=None, stop_after=None):
            cfg = BPRConfig(
                nepochs=nepochs, nfactors=4, batch_size=64, init_seed=5
            )
            e = BPREngine(cfg)
            e.init(ds)
            assert e._grouped
            if ckpt:
                e.enable_checkpointing(str(ckpt))
            if stop_after is not None:
                orig = e._epoch
                count = {"n": 0}

                def counted():
                    if count["n"] >= stop_after:
                        raise KeyboardInterrupt
                    count["n"] += 1
                    orig()

                e._epoch = counted
                try:
                    e.optimize()
                except KeyboardInterrupt:
                    pass
            else:
                e.optimize()
            return e

        straight = run(6)
        ck = tmp_path / "ck"
        run(6, ckpt=ck, stop_after=3)
        resumed = run(6, ckpt=ck)
        np.testing.assert_array_equal(
            np.asarray(straight.params.user_factors),
            np.asarray(resumed.params.user_factors),
        )


class TestRejectReasons:
    """grouped_path_reject_reason must return a reason — never raise — for
    any config the legacy triplet path supports (round-3 review findings)."""

    @pytest.mark.parametrize(
        "num_neg,n_rounds",
        [(16, 4), (1, 0), (1, 5), (0, 4), (15, 4)],
    )
    def test_extreme_configs_reject_cleanly(self, num_neg, n_rounds):
        r = bpr_ops.grouped_path_reject_reason(
            100, 100, num_neg, n_rounds, 64, True
        )
        assert isinstance(r, str) and r

    def test_default_config_eligible(self):
        assert (
            bpr_ops.grouped_path_reject_reason(138_493, 26_744, 3, 4, 32768, True)
            is None
        )

    def test_engine_init_with_many_negatives_falls_back(self):
        rng = np.random.default_rng(0)
        ds = Dataset(
            rng.integers(1, 50, 400), rng.integers(1, 60, 400), np.ones(400)
        )
        eng = BPREngine(
            BPRConfig(
                nepochs=1, nfactors=4, num_negative_samples=16, batch_size=64
            )
        )
        eng.init(ds)  # must not raise despite u_shift > 31
        assert not eng._grouped
        eng._epoch()  # legacy path trains
        assert np.isfinite(np.asarray(eng.params.user_factors)).all()


@pytest.mark.slow
class TestMergedScatters:
    def test_merged_equals_sequential(self):
        rng = np.random.default_rng(3)
        n_pos, U, I, nn = 96, 40, 64, 3
        pu = rng.integers(0, U, n_pos).astype(np.int32)
        pi = rng.integers(0, I, n_pos).astype(np.int32)
        params = bpr_ops.BPRParams(
            jnp.asarray(rng.normal(0, 0.1, (U, 8)).astype(np.float32)),
            jnp.asarray(rng.normal(0, 0.1, (I, 8)).astype(np.float32)),
            jnp.asarray(rng.normal(0, 0.1, I).astype(np.float32)),
        )
        bitmap = bpr_ops.make_pos_bitmap(pu, pi, U, I)
        u_shift = 1 + 2 * nn
        enc, p, rk, _ = bpr_ops._sample_pack_grouped_impl(
            jax.random.PRNGKey(1),
            jnp.stack([jnp.asarray(pu), jnp.asarray(pi)], axis=1),
            bitmap.words,
            n_items=I,
            n_real=n_pos,
            num_neg=nn,
            n_rounds=4,
            shuffle=True,
            wpu=bitmap.words_per_user,
            u_shift=u_shift,
            feistel_b=5,
            collide_cap=128,
            membership="bitmap",
        )
        kw = dict(
            use_biases=True, batch_size=32, num_neg=nn, n_items=I,
            n_rounds=4, u_shift=u_shift,
        )
        lr = jnp.float32(0.05)
        lam = jnp.float32(0.01)
        seq = bpr_ops._sgd_epoch_scan_grouped_body(
            params, enc, p, rk, lr, lam, lam, lam,
            item_scatter="seq", **kw,
        )
        for variant in ("merged", "dense"):
            out = bpr_ops._sgd_epoch_scan_grouped_body(
                params, enc, p, rk, lr, lam, lam, lam,
                item_scatter=variant, **kw,
            )
            for name in ("user_factors", "item_factors", "item_biases"):
                np.testing.assert_allclose(
                    np.asarray(getattr(seq, name)),
                    np.asarray(getattr(out, name)),
                    rtol=2e-6,
                    atol=2e-7,
                    err_msg=f"item_scatter={variant} diverges on {name}",
                )
