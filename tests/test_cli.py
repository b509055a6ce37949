"""CLI integration tests (round-trip coverage the reference never had)."""

import numpy as np
import pytest

from qmf_tpu.cli import gen_uniform as gen_uniform_cli
from qmf_tpu.cli import wals as wals_cli
from qmf_tpu.data import load_factors, read_dataset


@pytest.fixture
def small_data(tmp_path):
    rng = np.random.default_rng(0)
    train, test = [], []
    for u in range(30):
        liked = list(range(0, 20)) if u % 2 == 0 else list(range(20, 40))
        picks = rng.choice(liked, size=14, replace=False)
        for i in picks[:10]:
            train.append(f"{u + 1} {i + 1} {rng.integers(1, 6)}\n")
        for i in picks[10:]:
            test.append(f"{u + 1} {i + 1} 1\n")
    train_p = tmp_path / "train.txt"
    test_p = tmp_path / "test.txt"
    train_p.write_text("".join(train))
    test_p.write_text("".join(test))
    return train_p, test_p


@pytest.mark.slow
class TestWalsCli:
    def test_end_to_end(self, tmp_path, small_data):
        train_p, test_p = small_data
        user_p = tmp_path / "user.dat"
        item_p = tmp_path / "item.dat"
        rc = wals_cli.main(
            [
                f"--train_dataset={train_p}",
                f"--test_dataset={test_p}",
                "--nepochs=3",
                "--nfactors=6",
                "--test_avg_metrics=auc,p@5",
                "--test_always",
                f"--user_factors={user_p}",
                f"--item_factors={item_p}",
            ]
        )
        assert rc == 0
        ids, fd = load_factors(str(user_p))
        assert len(ids) == 30 and fd.nfactors == 6
        # ids are the raw ids, ascending (sorted-id index order)
        assert list(ids) == sorted(ids.tolist())
        ids_i, fd_i = load_factors(str(item_p))
        assert len(ids_i) == 40

    def test_reference_gflags_syntax(self, tmp_path, small_data):
        train_p, _ = small_data
        # single-dash gflags style, as in the reference examples/README.md
        rc = wals_cli.main(
            [
                f"-train_dataset={train_p}",
                "-nepochs=1",
                "-nfactors=4",
                f"-user_factors={tmp_path / 'u.dat'}",
                f"-item_factors={tmp_path / 'i.dat'}",
            ]
        )
        assert rc == 0

    def test_unknown_metric_fails(self, tmp_path, small_data):
        train_p, _ = small_data
        rc = wals_cli.main(
            [
                f"--train_dataset={train_p}",
                "--test_avg_metrics=bogus",
            ]
        )
        assert rc == 1

    def test_distribution_file_reproducible(self, tmp_path, small_data):
        train_p, _ = small_data
        dist = tmp_path / "uniform.dat"
        gen_uniform_cli.main(["50000", str(dist), "--seed=3"])
        outs = []
        for run in range(2):
            user_p = tmp_path / f"user{run}.dat"
            item_p = tmp_path / f"item{run}.dat"
            rc = wals_cli.main(
                [
                    f"--train_dataset={train_p}",
                    f"--distribution_file={dist}",
                    "--nepochs=2",
                    "--nfactors=4",
                    f"--user_factors={user_p}",
                    f"--item_factors={item_p}",
                ]
            )
            assert rc == 0
            outs.append((user_p.read_text(), item_p.read_text()))
        # bit-identical across runs — the reference's golden technique
        assert outs[0] == outs[1]


@pytest.mark.slow
class TestMultiChipCli:
    """BASELINE config #5 as a one-liner: --n_devices selects the sharded
    engines (8 virtual CPU devices here; the multi-machine entry points
    these replace are reference qmf/wals_scheduler.cpp:27-75)."""

    def test_wals_n_devices_matches_single_chip(self, tmp_path, small_data):
        train_p, _ = small_data
        dist = tmp_path / "uniform.dat"
        gen_uniform_cli.main(["50000", str(dist), "--seed=3"])
        outs = {}
        for nd in (1, 8):
            user_p = tmp_path / f"u{nd}.dat"
            item_p = tmp_path / f"i{nd}.dat"
            rc = wals_cli.main(
                [
                    f"--train_dataset={train_p}",
                    f"--distribution_file={dist}",
                    "--nepochs=2",
                    "--nfactors=4",
                    "--dtype=float64",
                    f"--n_devices={nd}",
                    f"--user_factors={user_p}",
                    f"--item_factors={item_p}",
                ]
            )
            assert rc == 0
            ids_u, fu = load_factors(str(user_p))
            ids_i, fi = load_factors(str(item_p))
            outs[nd] = (ids_u, fu.factors, ids_i, fi.factors)
        np.testing.assert_array_equal(outs[1][0], outs[8][0])
        np.testing.assert_array_equal(outs[1][2], outs[8][2])
        # f64: sharded reduction reorder noise only
        np.testing.assert_allclose(outs[1][1], outs[8][1], rtol=1e-8)
        np.testing.assert_allclose(outs[1][3], outs[8][3], rtol=1e-8)

    def test_wals_n_devices_all(self, tmp_path, small_data):
        train_p, _ = small_data
        rc = wals_cli.main(
            [
                f"--train_dataset={train_p}",
                "--nepochs=1",
                "--nfactors=4",
                "--n_devices=0",  # 0 = all visible devices
                f"--user_factors={tmp_path / 'u.dat'}",
                f"--item_factors={tmp_path / 'i.dat'}",
            ]
        )
        assert rc == 0
        ids, fd = load_factors(str(tmp_path / "u.dat"))
        assert len(ids) == 30 and fd.nfactors == 4

    def test_bpr_n_devices(self, tmp_path, small_data):
        from qmf_tpu.cli import bpr as bpr_cli

        train_p, test_p = small_data
        user_p = tmp_path / "bu8.dat"
        item_p = tmp_path / "bi8.dat"
        rc = bpr_cli.main(
            [
                f"--train_dataset={train_p}",
                f"--test_dataset={test_p}",
                "--nepochs=2",
                "--nfactors=6",
                "--batch_size=128",
                "--n_devices=8",
                "--test_avg_metrics=auc",
                f"--user_factors={user_p}",
                f"--item_factors={item_p}",
            ]
        )
        assert rc == 0
        ids, fd = load_factors(str(user_p))
        assert len(ids) == 30 and fd.nfactors == 6


class TestRecommendCli:
    def test_topn_from_factor_files_with_exclusion(self, tmp_path):
        from qmf_tpu.cli import recommend as rec_cli
        from qmf_tpu.data.factor_io import FactorData, save_factors
        from qmf_tpu.data.id_index import IdIndex

        # users 1,2 with orthogonal tastes over items 10..13
        uf = FactorData(2, 2)
        uf.factors[:] = [[1.0, 0.0], [0.0, 1.0]]
        itf = FactorData(4, 2)
        itf.factors[:] = [[2.0, 0.0], [1.0, 0.0], [0.0, 3.0], [0.0, 0.5]]
        up, ip = tmp_path / "u.dat", tmp_path / "i.dat"
        save_factors(uf, IdIndex(np.array([1, 2])), str(up))
        save_factors(itf, IdIndex(np.array([10, 11, 12, 13])), str(ip))
        seen = tmp_path / "train.txt"
        seen.write_text("1 10 5\n")  # user 1 already saw item 10
        out = tmp_path / "recs.txt"
        rc = rec_cli.main(
            [
                f"--user_factors={up}",
                f"--item_factors={ip}",
                f"--exclude_seen={seen}",
                "--topn=2",
                f"--output={out}",
            ]
        )
        assert rc == 0
        lines = dict(
            (l.split("\t")[0], l.split("\t")[1].split())
            for l in out.read_text().strip().splitlines()
        )
        # user 1: item 10 excluded -> 11 tops; user 2: 12 then 13
        assert lines["1"][0].startswith("11:")
        assert lines["2"][0].startswith("12:")
        assert lines["2"][1].startswith("13:")

    def test_users_subset_and_unknown_user(self, tmp_path):
        from qmf_tpu.cli import recommend as rec_cli
        from qmf_tpu.data.factor_io import FactorData, save_factors
        from qmf_tpu.data.id_index import IdIndex

        uf = FactorData(2, 2)
        uf.factors[:] = [[1.0, 0.0], [0.0, 1.0]]
        itf = FactorData(2, 2)
        itf.factors[:] = [[1.0, 0.0], [0.0, 1.0]]
        up, ip = tmp_path / "u.dat", tmp_path / "i.dat"
        save_factors(uf, IdIndex(np.array([5, 7])), str(up))
        save_factors(itf, IdIndex(np.array([1, 2])), str(ip))
        out = tmp_path / "r.txt"
        rc = rec_cli.main(
            [f"--user_factors={up}", f"--item_factors={ip}",
             "--users=7", "--topn=1", f"--output={out}"]
        )
        assert rc == 0
        assert out.read_text().startswith("7\t2:")
        rc = rec_cli.main(
            [f"--user_factors={up}", f"--item_factors={ip}", "--users=99"]
        )
        assert rc == 1  # unknown raw id fails loudly


class TestGenUniformCli:
    def test_count_and_file(self, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        rc = gen_uniform_cli.main(["123"])
        assert rc == 0
        vals = np.loadtxt("uniform.dat")
        assert vals.shape == (123,)
        assert np.all(np.abs(vals) <= 0.01)


@pytest.mark.slow
class TestBprCli:
    def test_end_to_end_with_biases_and_metrics(self, tmp_path, small_data):
        from qmf_tpu.cli import bpr as bpr_cli

        train_p, test_p = small_data
        user_p = tmp_path / "bu.dat"
        item_p = tmp_path / "bi.dat"
        rc = bpr_cli.main(
            [
                f"--train_dataset={train_p}",
                f"--test_dataset={test_p}",
                "--nepochs=3",
                "--nfactors=6",
                "--use_biases",
                "--batch_size=128",
                "--test_avg_metrics=auc,ap,p@10,r@10",
                "--test_always",
                f"--user_factors={user_p}",
                f"--item_factors={item_p}",
            ]
        )
        assert rc == 0
        from qmf_tpu.data import load_factors

        ids, fd = load_factors(str(item_p), with_biases=True)
        assert fd.with_biases and fd.nfactors == 6

    def test_hogwild_flag_accepted(self, tmp_path, small_data):
        from qmf_tpu.cli import bpr as bpr_cli

        train_p, _ = small_data
        rc = bpr_cli.main(
            [
                f"-train_dataset={train_p}",
                "-nepochs=1",
                "-nfactors=4",
                "-num_hogwild_threads=8",
                "-batch_size=64",
            ]
        )
        assert rc == 0


@pytest.mark.slow
class TestWalsCliPrecision:
    def test_matmul_precision_flag(self, tmp_path, small_data):
        train_p, _ = small_data
        rc = wals_cli.main(
            [
                f"--train_dataset={train_p}",
                "--nepochs=1",
                "--nfactors=4",
                "--matmul_precision=default",
                f"--user_factors={tmp_path / 'u.dat'}",
                f"--item_factors={tmp_path / 'i.dat'}",
            ]
        )
        assert rc == 0


@pytest.mark.slow
class TestSchedulerTaskFailure:
    def test_bad_train_set_marks_failed(self, tmp_path):
        import time

        from tests.test_distributed import SchedulerFixture
        from qmf_tpu.distributed.submit import (
            scheduler_status,
            submit_task_file,
        )

        fx = SchedulerFixture()  # real run_task
        try:
            task_file = tmp_path / "task.pb"
            task_file.write_text(
                'nepochs : 1\ntrain_set : "/does/not/exist.txt"\n'
                'user_factors : "u.dat"\nitem_factors : "i.dat"\n'
            )
            rsp = submit_task_file("127.0.0.1", fx.port, str(task_file))
            assert rsp["status"] == "OK"
            for _ in range(200):
                st = scheduler_status("127.0.0.1", fx.port)
                if st["history"]:
                    break
                time.sleep(0.05)
            assert st["history"][-1]["state"] == "failed"
            assert "error" in st["history"][-1]
        finally:
            fx.close()
