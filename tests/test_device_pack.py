"""Device-side packing (ops/device_pack.py) vs the host packer.

The device path must be byte-identical to pack_width_classes so engines
initialized either way train identically (the host path is the golden/f64
reference; reference counterpart: groupSignals,
qmf/wals/WALSEngine.cpp:130-163).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from qmf_tpu.config import WALSConfig
from qmf_tpu.data.dataset import Dataset
from qmf_tpu.models.wals import WALSEngine
from qmf_tpu.ops import device_pack
from qmf_tpu.ops.packing import chunks_for_classes, pack_width_classes


def _power_law_coo(rng, n_rows, n_cols, nnz):
    # skewed degrees + deliberate duplicate (row, col) pairs
    rows = (rng.pareto(1.3, nnz) * 3).astype(np.int64) % n_rows
    cols = rng.integers(0, n_cols, nnz)
    vals = rng.uniform(0.5, 5.0, nnz)
    return rows, cols, vals


class TestDevicePackParity:
    @pytest.mark.parametrize("nnz", [50, 5000])
    def test_classes_identical_to_host_packer(self, nnz):
        rng = np.random.default_rng(3)
        n_rows, n_cols = 60, 40
        rows, cols, vals = _power_law_coo(rng, n_rows, n_cols, nnz)

        host = pack_width_classes(
            rows, cols, vals, n_rows, batch_rows=32, dtype=np.float32
        )
        host_chunks = chunks_for_classes(host, batch_rows=32)

        dev, plans = device_pack.pack_width_classes_device(
            jnp.asarray(rows.astype(np.int32)),
            jnp.asarray(cols.astype(np.int32)),
            jnp.asarray(vals, dtype=jnp.float32),
            n_rows,
            np.bincount(rows, minlength=n_rows),
            batch_rows=32,
        )
        assert len(dev) == len(host)
        assert [p.chunk_b for p in plans] == host_chunks
        for (rid, cid, val, mask), hb in zip(dev, host):
            np.testing.assert_array_equal(np.asarray(rid), hb.row_ids)
            np.testing.assert_array_equal(np.asarray(cid), hb.col_idx)
            np.testing.assert_allclose(
                np.asarray(val), hb.values.astype(np.float32), rtol=0
            )
            np.testing.assert_array_equal(np.asarray(mask), hb.mask)

    def test_duplicate_pairs_keep_input_order(self):
        # duplicate (row, col) with distinct values: stable sort must keep
        # file order (reference keeps duplicates as separate signals)
        rows = np.array([2, 2, 2, 1], dtype=np.int64)
        cols = np.array([5, 5, 5, 0], dtype=np.int64)
        vals = np.array([1.0, 2.0, 3.0, 9.0])
        host = pack_width_classes(rows, cols, vals, 3, dtype=np.float32)
        dev, _ = device_pack.pack_width_classes_device(
            jnp.asarray(rows.astype(np.int32)),
            jnp.asarray(cols.astype(np.int32)),
            jnp.asarray(vals, dtype=jnp.float32),
            3,
            np.bincount(rows, minlength=3),
        )
        for (rid, cid, val, mask), hb in zip(dev, host):
            np.testing.assert_array_equal(np.asarray(rid), hb.row_ids)
            np.testing.assert_allclose(
                np.asarray(val), hb.values.astype(np.float32)
            )

    def test_engine_device_pack_matches_host_pack(self):
        rng = np.random.default_rng(7)
        users = rng.integers(1, 50, 600)
        items = rng.integers(1, 30, 600)
        ds = Dataset(users, items, rng.integers(1, 6, 600).astype(float))
        cfg = dict(nepochs=2, nfactors=4, init_seed=1)
        dev_eng = WALSEngine(WALSConfig(**cfg, device_pack=True))
        dev_eng.init(ds)
        dev_eng.optimize()
        host_eng = WALSEngine(WALSConfig(**cfg, device_pack=False))
        host_eng.init(ds)
        host_eng.optimize()
        np.testing.assert_allclose(
            np.asarray(dev_eng.user_factors),
            np.asarray(host_eng.user_factors),
            rtol=0,
            atol=0,
        )
        np.testing.assert_allclose(
            np.asarray(dev_eng.item_factors),
            np.asarray(host_eng.item_factors),
            rtol=0,
            atol=0,
        )
