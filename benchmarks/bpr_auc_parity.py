"""BPR quality-parity check: test AUC vs the reference binary.

BPR is stochastic (different RNGs on the two sides), so unlike
auc_parity.py this is a STATISTICAL parity check, not a bit-level one:
both implementations train ml100k-scale BPR at matched hyperparameters
(k=30, 3 negatives, same LR schedule, biases off) on the same 90/10
per-user split, and the test AUCs must land within ``TOL`` (default 0.01)
of each other — the reference's own BPREngineTest uses the same
learned-quality-not-bitwise standard (reference qmf/test/BPREngineTest.cpp:80-157).

Run: python benchmarks/bpr_auc_parity.py   (CPU-safe; forces nothing)
Env: QMF_BPR_PARITY_TOL, QMF_BPR_PARITY_EPOCHS, QMF_BPR_PARITY_BATCH.
"""

from __future__ import annotations

import os
import re
import subprocess
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "benchmarks"))

from auc_parity import split_per_user, write  # noqa: E402

TOL = float(os.environ.get("QMF_BPR_PARITY_TOL", "0.01"))
EPOCHS = int(os.environ.get("QMF_BPR_PARITY_EPOCHS", "10"))
BATCH = int(os.environ.get("QMF_BPR_PARITY_BATCH", "4096"))


def main() -> int:
    import datagen

    subprocess.run(
        [os.path.join(REPO, "benchmarks", "reference_harness", "build.sh")],
        check=True,
        capture_output=True,
    )
    users, items, values = datagen.load_npz("ml100k")
    test_mask = split_per_user(users, items, values)
    work = tempfile.mkdtemp(prefix="qmf_bpr_auc_")
    train_p, test_p = f"{work}/train.txt", f"{work}/test.txt"
    write(train_p, users[~test_mask], items[~test_mask], values[~test_mask])
    write(test_p, users[test_mask], items[test_mask], values[test_mask])

    common = [
        f"-nepochs={EPOCHS}",
        "-nfactors=30",
        "-num_negative_samples=3",
        "-init_learning_rate=0.05",
        "-decay_rate=0.9",
        f"-train_dataset={train_p}",
        f"-test_dataset={test_p}",
        "-test_avg_metrics=auc",
    ]

    print("running reference bpr ...", flush=True)
    ref = subprocess.run(
        ["/tmp/qmf_ref_build/bin/bpr", "-num_hogwild_threads=1", *common,
         f"-user_factors={work}/ru.dat", f"-item_factors={work}/ri.dat"],
        check=True,
        capture_output=True,
        text=True,
    )
    m = re.findall(r"test_avg_auc = ([0-9.]+)", ref.stderr)
    ref_auc = float(m[-1])
    print(f"reference test_avg_auc = {ref_auc:.6f}", flush=True)

    print("running qmf_tpu bpr ...", flush=True)
    from qmf_tpu.cli import bpr as bpr_cli
    from qmf_tpu.metrics.engine import MetricsEngine

    recorded = {}
    orig = MetricsEngine.record_metric

    def spy(self, key, epoch, val):
        recorded[key] = val
        return orig(self, key, epoch, val)

    MetricsEngine.record_metric = spy
    try:
        rc = bpr_cli.main(
            [*common, f"--batch_size={BATCH}",
             f"--user_factors={work}/ou.dat",
             f"--item_factors={work}/oi.dat"]
        )
    finally:
        MetricsEngine.record_metric = orig
    assert rc == 0
    our_auc = recorded["test_avg_auc"]
    diff = abs(our_auc - ref_auc)
    print(f"qmf_tpu  test_avg_auc = {our_auc:.6f}", flush=True)
    print(
        f"abs diff = {diff:.2e} "
        f"({'PASS' if diff <= TOL else 'FAIL'} <= {TOL})"
    )
    return 0 if diff <= TOL else 1


if __name__ == "__main__":
    sys.exit(main())
