"""Data-layer tests.

Models the reference's DatasetReaderTest/FactorDataTest/UtilTest coverage
(reference qmf/test/DatasetReaderTest.cpp, FactorDataTest.cpp, UtilTest.cpp)
plus round-trip tests the reference lacks.
"""

import numpy as np
import pytest

from qmf_tpu.data import (
    Dataset,
    FactorData,
    IdIndex,
    MISSING_IDX,
    gen_uniform,
    load_factors,
    read_dataset,
    save_factors,
    write_dataset,
)
from qmf_tpu.utils import split
from qmf_tpu.utils.flags import FlagError, Flags


class TestDatasetReader:
    def test_read_basic(self, tmp_path):
        p = tmp_path / "ratings.txt"
        p.write_text("1 2 3.0\n4 5 6.5\n10 20 -1.25\n")
        ds = read_dataset(str(p))
        assert len(ds) == 3
        np.testing.assert_array_equal(ds.user_ids, [1, 4, 10])
        np.testing.assert_array_equal(ds.item_ids, [2, 5, 20])
        np.testing.assert_allclose(ds.values, [3.0, 6.5, -1.25])

    def test_read_extra_whitespace(self, tmp_path):
        p = tmp_path / "r.txt"
        p.write_text("  1\t2   3.0 \n\n4 5 6\n")
        ds = read_dataset(str(p))
        assert len(ds) == 2
        np.testing.assert_array_equal(ds.user_ids, [1, 4])

    def test_read_bad_format_raises(self, tmp_path):
        # reference CHECK-fails on malformed lines (DatasetReader.cpp:38-41)
        p = tmp_path / "bad.txt"
        p.write_text("1 2 3.0\n4 oops 6\n")
        with pytest.raises(ValueError):
            read_dataset(str(p))

    def test_read_missing_fields_raises(self, tmp_path):
        p = tmp_path / "bad2.txt"
        p.write_text("1 2\n")
        with pytest.raises(ValueError):
            read_dataset(str(p))

    def test_read_empty(self, tmp_path):
        p = tmp_path / "empty.txt"
        p.write_text("")
        assert len(read_dataset(str(p))) == 0

    def test_roundtrip(self, tmp_path):
        ds = Dataset(
            np.array([7, 3, 3]), np.array([1, 2, 9]), np.array([1.0, 0.5, 4.0])
        )
        p = tmp_path / "rt.txt"
        write_dataset(ds, str(p))
        back = read_dataset(str(p))
        np.testing.assert_array_equal(back.user_ids, ds.user_ids)
        np.testing.assert_array_equal(back.item_ids, ds.item_ids)
        np.testing.assert_allclose(back.values, ds.values)

    def test_swapped(self):
        ds = Dataset(np.array([1, 2]), np.array([3, 4]), np.array([1.0, 2.0]))
        sw = ds.swapped()
        np.testing.assert_array_equal(sw.user_ids, [3, 4])
        np.testing.assert_array_equal(sw.item_ids, [1, 2])


class TestIdIndex:
    def test_sorted_order(self):
        idx = IdIndex.from_sorted_ids(np.array([30, 10, 20, 10]))
        np.testing.assert_array_equal(idx.ids, [10, 20, 30])
        assert idx.idx(10) == 0 and idx.idx(20) == 1 and idx.idx(30) == 2
        assert idx.id(2) == 30

    def test_first_occurrence_order(self):
        # BPR getOrSetIdx assigns indices in file order (BPREngine.cpp:69-77)
        idx = IdIndex.from_first_occurrence(np.array([30, 10, 30, 20]))
        np.testing.assert_array_equal(idx.ids, [30, 10, 20])
        assert idx.idx(30) == 0 and idx.idx(10) == 1 and idx.idx(20) == 2

    def test_missing(self):
        idx = IdIndex.from_sorted_ids(np.array([1, 2]))
        assert idx.idx(99) == MISSING_IDX
        assert not idx.contains(99)
        np.testing.assert_array_equal(
            idx.lookup(np.array([2, 99, 1])), [1, MISSING_IDX, 0]
        )

    def test_empty(self):
        idx = IdIndex.from_sorted_ids(np.array([], dtype=np.int64))
        assert idx.size == 0
        np.testing.assert_array_equal(idx.lookup(np.array([5])), [MISSING_IDX])

    def test_with_lookup_constructors_match_two_pass(self):
        """The fused build (index + inverse from one np.unique pass) must be
        exactly the two-pass construct-then-lookup for both orderings."""
        rng = np.random.default_rng(7)
        raw = rng.integers(0, 500, 20000).astype(np.int64)
        a = IdIndex.from_first_occurrence(raw)
        b, idx = IdIndex.from_first_occurrence_with_lookup(raw)
        np.testing.assert_array_equal(a.ids, b.ids)
        np.testing.assert_array_equal(a.lookup(raw), idx)
        c = IdIndex.from_sorted_ids(raw)
        d, idx2 = IdIndex.from_sorted_ids_with_lookup(raw)
        np.testing.assert_array_equal(c.ids, d.ids)
        np.testing.assert_array_equal(c.lookup(raw), idx2)


class TestFactorData:
    def test_save_format_golden(self, tmp_path):
        # golden-string test like reference EngineTest.cpp:113-139
        fd = FactorData(2, 3)
        fd.factors[:] = [[1.0, 2.5, -0.125], [0.0, 1e-10, 3.141592653]]
        index = IdIndex.from_sorted_ids(np.array([5, 42]))
        p = tmp_path / "factors.txt"
        save_factors(fd, index, str(p))
        expected = (
            "5 1.000000000 2.500000000 -0.125000000\n"
            "42 0.000000000 0.000000000 3.141592653\n"
        )
        assert p.read_text() == expected

    def test_save_with_biases(self, tmp_path):
        fd = FactorData(1, 2, with_biases=True)
        fd.factors[:] = [[1.0, 2.0]]
        fd.biases[:] = [0.5]
        index = IdIndex.from_sorted_ids(np.array([9]))
        p = tmp_path / "f.txt"
        save_factors(fd, index, str(p))
        assert p.read_text() == "9 0.500000000 1.000000000 2.000000000\n"

    def test_save_size_mismatch_raises(self, tmp_path):
        # reference CHECK_EQ(nelems, index.size) (Engine.cpp:107)
        fd = FactorData(2, 2)
        index = IdIndex.from_sorted_ids(np.array([1]))
        with pytest.raises(ValueError):
            save_factors(fd, index, str(tmp_path / "x.txt"))

    def test_load_roundtrip(self, tmp_path):
        fd = FactorData(3, 4, with_biases=True)
        rng = np.random.default_rng(0)
        fd.set_factors_uniform(1.0, rng)
        fd.set_biases_uniform(1.0, rng)
        index = IdIndex.from_sorted_ids(np.array([2, 4, 6]))
        p = tmp_path / "f.txt"
        save_factors(fd, index, str(p))
        ids, back = load_factors(str(p), with_biases=True)
        np.testing.assert_array_equal(ids, [2, 4, 6])
        np.testing.assert_allclose(back.factors, fd.factors, atol=1e-9)
        np.testing.assert_allclose(back.biases, fd.biases, atol=1e-9)

    def test_from_file_row_major(self, tmp_path):
        p = tmp_path / "uniform.dat"
        p.write_text("".join(f"{v}\n" for v in [1, 2, 3, 4, 5, 6]))
        fd = FactorData(2, 3)
        fd.set_factors_from_file(str(p))
        np.testing.assert_allclose(fd.factors, [[1, 2, 3], [4, 5, 6]])

    def test_from_file_short_leaves_rest(self, tmp_path):
        # reference logs error and returns early (FactorData.h:83-88)
        p = tmp_path / "short.dat"
        p.write_text("1\n2\n")
        fd = FactorData(2, 2)
        fd.factors[:] = 7.0
        fd.set_factors_from_file(str(p))
        np.testing.assert_allclose(fd.factors, [[1, 2], [7, 7]])

    def test_gen_uniform(self, tmp_path):
        out = tmp_path / "u.dat"
        gen_uniform(100, str(out), seed=1)
        vals = np.loadtxt(str(out))
        assert vals.shape == (100,)
        assert np.all(np.abs(vals) <= 0.01)
        # deterministic with the same seed
        out2 = tmp_path / "u2.dat"
        gen_uniform(100, str(out2), seed=1)
        assert out.read_text() == out2.read_text()


class TestUtil:
    def test_split_matches_reference(self):
        # reference qmf/test/UtilTest.cpp semantics
        assert split("", ",") == []
        assert split("a", ",") == ["a"]
        assert split("a,b,c", ",") == ["a", "b", "c"]
        assert split("a,,b,", ",") == ["a", "", "b", ""]
        assert split("auc,p@10", ",") == ["auc", "p@10"]


class TestFlags:
    def _make(self):
        fl = Flags("test")
        fl.define_integer("nepochs", 10)
        fl.define_float("regularization_lambda", 0.05)
        fl.define_string("train_dataset", "")
        fl.define_bool("test_always", False)
        return fl

    def test_gflags_syntax_variants(self):
        fl = self._make()
        fl.parse(
            [
                "--nepochs=3",
                "-regularization_lambda=0.1",
                "--train_dataset",
                "x.txt",
                "--test_always",
            ]
        )
        assert fl.nepochs == 3
        assert fl.regularization_lambda == 0.1
        assert fl.train_dataset == "x.txt"
        assert fl.test_always is True

    def test_bool_negation_and_values(self):
        fl = self._make()
        fl.parse(["--test_always=true"])
        assert fl.test_always is True
        fl.parse(["--notest_always"])
        assert fl.test_always is False
        fl.parse(["-test_always=0"])
        assert fl.test_always is False

    def test_unknown_flag(self):
        fl = self._make()
        with pytest.raises(FlagError):
            fl.parse(["--bogus=1"])

    def test_positional(self):
        fl = self._make()
        pos = fl.parse(["100", "--nepochs=2", "out.dat"])
        assert pos == ["100", "out.dat"]
        assert fl.nepochs == 2


class TestNativeIO:
    """Native C++ reader/writer parity (skipped when the lib isn't built)."""

    @pytest.fixture(autouse=True)
    def _need_native(self):
        from qmf_tpu.data import native

        if not native.available():
            pytest.skip("libqmf_native.so not built (make -C qmf_tpu/_native)")

    def test_reader_matches_python(self, tmp_path):
        rng = np.random.default_rng(0)
        p = tmp_path / "r.txt"
        lines = [
            f"{u} {i} {v:.3f}\n"
            for u, i, v in zip(
                rng.integers(-5, 10**12, 500),
                rng.integers(0, 10**9, 500),
                rng.uniform(-5, 5, 500),
            )
        ]
        lines.insert(3, "\n")  # blank lines are skipped
        p.write_text("".join(lines))
        from qmf_tpu.data import native

        ds = native.read_dataset(str(p))
        from qmf_tpu.data.dataset import _read_python

        ref = _read_python(str(p))
        np.testing.assert_array_equal(ds.user_ids, ref.user_ids)
        np.testing.assert_array_equal(ds.item_ids, ref.item_ids)
        np.testing.assert_allclose(ds.values, ref.values, rtol=1e-12)

    def test_reader_no_trailing_newline(self, tmp_path):
        p = tmp_path / "r.txt"
        p.write_text("1 2 3.5\n4 5 -6.25e-2")
        from qmf_tpu.data import native

        ds = native.read_dataset(str(p))
        assert len(ds) == 2
        assert ds.values[1] == pytest.approx(-0.0625)

    def test_reader_bad_line(self, tmp_path):
        p = tmp_path / "bad.txt"
        p.write_text("1 2 3.0\nx y z\n")
        from qmf_tpu.data import native

        with pytest.raises(ValueError, match="line 2"):
            native.read_dataset(str(p))

    def test_reader_bare_dot_is_parse_error(self, tmp_path):
        # a value of "." or "-." has no digits and must not parse as 0.0
        from qmf_tpu.data import native

        for bad in (".", "-."):
            p = tmp_path / "dot.txt"
            p.write_text(f"1 2 {bad}\n")
            with pytest.raises(ValueError, match="line 1"):
                native.read_dataset(str(p))

    def test_reader_strtod_parity(self, tmp_path):
        # values must parse bit-identically to the reference's sscanf %lf
        from qmf_tpu.data import native

        cases = [
            "0.1", "2.675", "1e308", "4.9e-324", "123456789.123456789",
            "-0.3333333333333333", "9007199254740993", "1.7976931348623157e308",
        ]
        p = tmp_path / "vals.txt"
        p.write_text("".join(f"1 2 {v}\n" for v in cases))
        ds = native.read_dataset(str(p))
        np.testing.assert_array_equal(ds.values, [float(v) for v in cases])

    def test_reader_open_failure_is_ioerror(self, tmp_path):
        from qmf_tpu.data import native

        with pytest.raises(IOError, match="open"):
            native.read_dataset(str(tmp_path / "nope.txt"))

    def test_writer_matches_python_format(self, tmp_path):
        from qmf_tpu.data import native

        ids = np.array([5, -3], dtype=np.int64)
        factors = np.array([[1.0, 2.5], [0.123456789, -0.5]])
        biases = np.array([0.25, -1.0])
        p1 = tmp_path / "native.txt"
        native.write_factors(str(p1), ids, factors, biases)
        expected = (
            "5 0.250000000 1.000000000 2.500000000\n"
            "-3 -1.000000000 0.123456789 -0.500000000\n"
        )
        assert p1.read_text() == expected


class TestTracingUtils:
    def test_step_timer(self):
        import time

        from qmf_tpu.utils.tracing import StepTimer

        t = StepTimer()
        with t.measure("work"):
            time.sleep(0.01)
        with t.measure("work"):
            pass
        n, total, mean = t.summary()["work"]
        assert n == 2 and total >= 0.01 and mean > 0

    def test_trace_noop_without_dir(self, monkeypatch):
        from qmf_tpu.utils.tracing import annotate, trace

        monkeypatch.delenv("QMF_TPU_TRACE_DIR", raising=False)
        with trace():
            with annotate("region"):
                pass  # must be side-effect free


class TestMultihost:
    def test_single_process_noop(self, monkeypatch):
        from qmf_tpu.parallel import multihost

        monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
        multihost.initialize()  # no coordinator -> no-op
        assert multihost.is_coordinator()
        mesh = multihost.global_mesh()
        assert mesh.size >= 1
