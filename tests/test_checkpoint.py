"""Checkpoint/resume tests (capability the reference lacks; SURVEY.md 5.4)."""

import numpy as np
import pytest

from qmf_tpu.config import BPRConfig, WALSConfig
from qmf_tpu.data.dataset import Dataset
from qmf_tpu.models.bpr import BPREngine
from qmf_tpu.models.wals import WALSEngine
from qmf_tpu.utils import checkpoint as ckpt


def _dataset(seed=0):
    rng = np.random.default_rng(seed)
    users = rng.integers(1, 40, 500)
    items = rng.integers(1, 25, 500)
    return Dataset(users, items, rng.integers(1, 6, 500).astype(float))


class TestCheckpointPrimitives:
    def test_roundtrip(self, tmp_path):
        arrays = {"a": np.arange(6).reshape(2, 3), "b": np.ones(4)}
        ckpt.save_checkpoint(str(tmp_path), 3, arrays, meta={"x": 1.5})
        path = ckpt.latest_checkpoint(str(tmp_path))
        assert path.endswith("ckpt_000003.npz")
        epoch, back, meta = ckpt.load_checkpoint(path)
        assert epoch == 3 and meta["x"] == 1.5
        np.testing.assert_array_equal(back["a"], arrays["a"])

    def test_latest_pointer_advances(self, tmp_path):
        ckpt.save_checkpoint(str(tmp_path), 1, {"a": np.zeros(1)})
        ckpt.save_checkpoint(str(tmp_path), 2, {"a": np.ones(1)})
        epoch, back, _ = ckpt.load_checkpoint(
            ckpt.latest_checkpoint(str(tmp_path))
        )
        assert epoch == 2 and back["a"][0] == 1.0

    def test_empty_dir(self, tmp_path):
        assert ckpt.latest_checkpoint(str(tmp_path)) is None


@pytest.mark.slow
class TestWALSResume:
    def test_interrupted_run_resumes_to_identical_result(self, tmp_path):
        ds = _dataset()
        cfg = dict(nepochs=4, nfactors=3, init_seed=5, dtype="float64")

        # uninterrupted run
        full = WALSEngine(WALSConfig(**cfg))
        full.init(ds)
        full.optimize()

        # run that "crashes" after epoch 2 ...
        part = WALSEngine(WALSConfig(**dict(cfg, nepochs=2)))
        part.init(ds)
        part.enable_checkpointing(str(tmp_path))
        part.optimize()

        # ... and a fresh process resuming to epoch 4
        resumed = WALSEngine(WALSConfig(**cfg))
        resumed.init(ds)
        resumed.enable_checkpointing(str(tmp_path))
        resumed.optimize()

        np.testing.assert_allclose(
            np.asarray(resumed.user_factors),
            np.asarray(full.user_factors),
            rtol=1e-12,
        )

    def test_resume_skips_done_epochs(self, tmp_path):
        ds = _dataset()
        eng = WALSEngine(WALSConfig(nepochs=2, nfactors=3, init_seed=5))
        eng.init(ds)
        eng.enable_checkpointing(str(tmp_path))
        eng.optimize()
        factors = np.asarray(eng.user_factors).copy()
        # nepochs == already-checkpointed epochs -> optimize is a no-op
        eng2 = WALSEngine(WALSConfig(nepochs=2, nfactors=3, init_seed=99))
        eng2.init(ds)
        eng2.enable_checkpointing(str(tmp_path))
        eng2.optimize()
        np.testing.assert_allclose(np.asarray(eng2.user_factors), factors)


@pytest.mark.slow
class TestBPRResume:
    def test_resume_restores_lr_and_params(self, tmp_path):
        ds = _dataset(1)
        cfg = BPRConfig(nepochs=3, nfactors=4, batch_size=128, decay_rate=0.5)
        eng = BPREngine(cfg)
        eng.init(ds)
        eng.enable_checkpointing(str(tmp_path))
        eng.optimize()
        assert eng.learning_rate == pytest.approx(0.05 * 0.5**3)

        eng2 = BPREngine(
            BPRConfig(nepochs=5, nfactors=4, batch_size=128, decay_rate=0.5)
        )
        eng2.init(ds)
        eng2.enable_checkpointing(str(tmp_path))
        start = eng2._maybe_resume()
        assert start == 4
        # lr restored to the POST-decay value after epoch 3, so resumed
        # epoch 4 trains at exactly the rate a straight run would use
        assert eng2.learning_rate == pytest.approx(0.05 * 0.5**3)
        np.testing.assert_allclose(
            np.asarray(eng2.params.user_factors),
            np.asarray(eng.params.user_factors),
            rtol=1e-6,
        )
        # RNG state restored too: resumed epochs continue the key sequence
        np.testing.assert_array_equal(
            np.asarray(eng2._step_key), np.asarray(eng._step_key)
        )

    def test_resumed_run_matches_straight_run(self, tmp_path):
        """A run interrupted after epoch 2 and resumed to epoch 4 must
        produce bitwise the same parameters as an uninterrupted 4-epoch run
        (requires both the decayed LR and the PRNG key in the snapshot)."""
        ds = _dataset(2)
        cfg = dict(nepochs=4, nfactors=4, batch_size=128, decay_rate=0.5)

        full = BPREngine(BPRConfig(**cfg))
        full.init(ds)
        full.optimize()

        part = BPREngine(BPRConfig(**dict(cfg, nepochs=2)))
        part.init(ds)
        part.enable_checkpointing(str(tmp_path))
        part.optimize()

        resumed = BPREngine(BPRConfig(**cfg))
        resumed.init(ds)
        resumed.enable_checkpointing(str(tmp_path))
        resumed.optimize()

        np.testing.assert_array_equal(
            np.asarray(resumed.params.user_factors),
            np.asarray(full.params.user_factors),
        )
        np.testing.assert_array_equal(
            np.asarray(resumed.params.item_factors),
            np.asarray(full.params.item_factors),
        )
