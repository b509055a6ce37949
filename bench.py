"""Headline benchmarks: MovieLens-20M-scale WALS epoch time (k=64) and BPR
real triplet updates/s (k=30, 3 negatives) on TPU.

Prints one JSON line per metric:
    {"metric": "ml20m_wals_epoch_time_k64", "value": <seconds>, "unit": "s",
     "vs_baseline": <speedup factor vs the reference>}
    {"metric": "ml20m_bpr_updates_per_s", "value": <real updates/s>,
     "unit": "updates/s", "vs_baseline": <speedup vs the reference>}

BPR throughput counts REAL triplet updates only (padded no-op stream rows
are excluded from the numerator); the reference baseline is the measured
single-core updates/s of the reference `bpr` binary on the same data,
extrapolated by a PERFECT 16x Hogwild thread scaling.

Baseline methodology (see BASELINE.md): the reference publishes no numbers,
so the reference `wals` binary is built from /root/reference via
benchmarks/reference_harness and timed on the SAME synthetic ml20m dataset
on this machine. This box has a single CPU core, while the reference ships
with nthreads=16 defaults; the baseline used for vs_baseline generously
assumes PERFECT 16x thread scaling of the measured single-core epoch time
(reference actual scaling is sub-linear). vs_baseline = baseline_epoch_s /
our_epoch_s, i.e. >1 means faster than the 16-core-extrapolated reference.

Measured reference numbers are cached in benchmarks/baseline_measured.json
(re-measured if absent and the reference toolchain is available).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
BASELINE_FILE = os.path.join(REPO, "benchmarks", "baseline_measured.json")
PRESET = os.environ.get("QMF_BENCH_PRESET", "ml20m")
NFACTORS = int(os.environ.get("QMF_BENCH_NFACTORS", "64"))
EPOCHS = int(os.environ.get("QMF_BENCH_EPOCHS", "7"))
# steady-state timing is rerun when (max-min)/median across the reps exceeds
# this (observed contention signature: BENCH_r04 spread was 1.5x where quiet
# windows hold +-1%); up to SPREAD_ROUNDS measurement rounds are taken and
# the lowest-spread round is reported
SPREAD_THRESHOLD = float(os.environ.get("QMF_BENCH_SPREAD_THRESHOLD", "0.15"))
SPREAD_ROUNDS = int(os.environ.get("QMF_BENCH_SPREAD_ROUNDS", "4"))
SPREAD_RETRY_SLEEP_S = float(os.environ.get("QMF_BENCH_SPREAD_SLEEP_S", "30"))
# bf16 normal-equation builds: validated for quality (test-AUC parity vs the
# reference binary |diff| = 3.8e-05 << 1e-3, benchmarks/auc_parity.py with
# QMF_PARITY_PRECISION=default); engine default stays "highest".
PRECISION = os.environ.get("QMF_BENCH_PRECISION", "default")
ASSUMED_REF_THREAD_SCALING = 16.0
# the shared vCPU has variable steal; baseline subtractions take the median
# of this many independent (1-epoch, 2-epoch) run pairs
BASELINE_REPS = int(os.environ.get("QMF_BENCH_BASELINE_REPS", "3"))
BPR_NFACTORS = int(os.environ.get("QMF_BENCH_BPR_NFACTORS", "30"))
BPR_NUM_NEG = int(os.environ.get("QMF_BENCH_BPR_NUM_NEG", "3"))
BPR_BATCH = int(os.environ.get("QMF_BENCH_BPR_BATCH", "32768"))
WIDTH_GRID = os.environ.get("QMF_BENCH_WIDTH_GRID", "")  # default: config's
SKIP_BPR = os.environ.get("QMF_BENCH_SKIP_BPR", "") == "1"


def _measure_reference(train_path: str) -> dict:
    """Build + time the reference wals single-core on the same data."""
    build = os.path.join(REPO, "benchmarks", "reference_harness", "build.sh")
    out = "/tmp/qmf_ref_build"
    subprocess.run([build], check=True, capture_output=True, env={**os.environ, "OUT": out})
    args = [
        os.path.join(out, "bin", "wals"),
        f"-nfactors={NFACTORS}",
        "-nthreads=1",
        f"-train_dataset={train_path}",
        "-user_factors=/tmp/ref_bench_u.dat",
        "-item_factors=/tmp/ref_bench_i.dat",
    ]
    # isolate epoch time from IO: epoch = t(2 epochs) - t(1 epoch). The
    # shared vCPU's load varies run to run, so take the median of
    # BASELINE_REPS independent subtractions.
    w1, w2 = _timed_reps(args)
    epoch_1core = max(w2 - w1, 1e-9)
    return {
        "preset": PRESET,
        "nfactors": NFACTORS,
        "reps": BASELINE_REPS,
        "ref_wall_1epoch_s": w1,
        "ref_wall_2epoch_s": w2,
        "ref_epoch_1core_s": epoch_1core,
        "ref_epoch_16core_extrapolated_s": epoch_1core
        / ASSUMED_REF_THREAD_SCALING,
    }


def _timed_reps(args):
    """Median wall time of 1-epoch and 2-epoch runs over BASELINE_REPS."""
    import statistics

    w1s, w2s = [], []
    for _ in range(BASELINE_REPS):
        t0 = time.time()
        subprocess.run(args + ["-nepochs=1"], check=True, capture_output=True)
        w1s.append(time.time() - t0)
        t0 = time.time()
        subprocess.run(args + ["-nepochs=2"], check=True, capture_output=True)
        w2s.append(time.time() - t0)
    return statistics.median(w1s), statistics.median(w2s)


def _measure_reference_bpr(train_path: str, n_triplets: int) -> dict:
    """Build + time the reference bpr single-core on the same data.

    Epoch time is isolated from dataset IO/init by the 2-epoch-minus-1-epoch
    subtraction (same method as the WALS baseline). updates/s counts the
    reference's real work: one SGD update per (positive, sampled negative)
    pair, i.e. n_positives * num_negative_samples per epoch
    (/root/reference/qmf/bpr/BPREngine.cpp:146-176).
    """
    build = os.path.join(REPO, "benchmarks", "reference_harness", "build.sh")
    out = "/tmp/qmf_ref_build"
    subprocess.run(
        [build], check=True, capture_output=True, env={**os.environ, "OUT": out}
    )
    args = [
        os.path.join(out, "bin", "bpr"),
        f"-nfactors={BPR_NFACTORS}",
        f"-num_negative_samples={BPR_NUM_NEG}",
        "-num_hogwild_threads=1",
        f"-train_dataset={train_path}",
        "-user_factors=/tmp/ref_bpr_u.dat",
        "-item_factors=/tmp/ref_bpr_i.dat",
    ]
    w1, w2 = _timed_reps(args)
    epoch_1core = max(w2 - w1, 1e-9)
    ups_1core = n_triplets / epoch_1core
    return {
        "preset": PRESET,
        "nfactors": BPR_NFACTORS,
        "num_negative_samples": BPR_NUM_NEG,
        "n_triplets_per_epoch": n_triplets,
        "reps": BASELINE_REPS,
        "ref_wall_1epoch_s": w1,
        "ref_wall_2epoch_s": w2,
        "ref_epoch_1core_s": epoch_1core,
        "ref_updates_per_s_1core": ups_1core,
        "ref_updates_per_s_16core_extrapolated": ups_1core
        * ASSUMED_REF_THREAD_SCALING,
    }


def _measure_steady(step, label: str) -> float:
    """Time EPOCHS steady-state reps of `step()` (which must block until the
    device work is done), with contention detection.

    The single v5e chip and the 1-vCPU host are shared; a concurrent job
    inflates and scatters timings (BENCH_r04: 0.368-0.563 s epochs where
    quiet windows hold +-1%). Guard: compute spread = (max-min)/median; if it
    exceeds SPREAD_THRESHOLD, sleep and re-measure, up to SPREAD_ROUNDS
    rounds, then report the lowest-spread round. Returns the median of that
    round; prints median/min/spread per round.
    """
    import numpy as np

    best = None  # (spread, median, times)
    for rnd in range(1, SPREAD_ROUNDS + 1):
        times = []
        for _ in range(EPOCHS):
            t0 = time.time()
            step()
            times.append(time.time() - t0)
        med = float(np.median(times))
        spread = (max(times) - min(times)) / med if med > 0 else 0.0
        print(
            f"# {label} round {rnd}: {[f'{t:.3f}' for t in times]} "
            f"median {med:.4f}s min {min(times):.4f}s spread {spread*100:.1f}%",
            file=sys.stderr,
        )
        if best is None or spread < best[0]:
            best = (spread, med, times)
        if spread <= SPREAD_THRESHOLD:
            break
        if rnd < SPREAD_ROUNDS:
            print(
                f"# {label}: spread {spread*100:.1f}% > "
                f"{SPREAD_THRESHOLD*100:.0f}% (likely chip/host contention); "
                f"re-measuring in {SPREAD_RETRY_SLEEP_S:.0f}s",
                file=sys.stderr,
            )
            time.sleep(SPREAD_RETRY_SLEEP_S)
    spread, med, times = best
    if spread > SPREAD_THRESHOLD:
        print(
            f"# {label}: WARNING all {SPREAD_ROUNDS} rounds exceeded the "
            f"{SPREAD_THRESHOLD*100:.0f}% spread threshold; reporting the "
            f"lowest-spread round (spread {spread*100:.1f}%)",
            file=sys.stderr,
        )
    print(
        f"# {label} final: median {med:.4f}s min {min(times):.4f}s "
        f"spread {spread*100:.1f}%",
        file=sys.stderr,
    )
    return med


def _wait_for_backend() -> None:
    """Block until the accelerator backend initializes (probed in a
    subprocess — a hung init inside the PJRT plugin ignores signals and
    would wedge this process). The TPU pool has been observed down for
    hours at a stretch; waiting here lets a scheduled bench run survive a
    temporary outage instead of crashing at engine.init."""
    deadline = time.time() + int(
        os.environ.get("QMF_BENCH_BACKEND_WAIT_S", "1800")
    )
    attempt = 0
    while True:
        try:
            probe = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                capture_output=True,
                timeout=300,
            )
            ok = probe.returncode == 0
        except subprocess.TimeoutExpired:  # init hang = backend down
            ok = False
        if ok:
            if attempt:
                print("# backend is back", file=sys.stderr)
            return
        attempt += 1
        if time.time() > deadline:
            print(
                "# accelerator backend unavailable past "
                "QMF_BENCH_BACKEND_WAIT_S; proceeding (will likely fail)",
                file=sys.stderr,
            )
            return
        print(
            f"# backend unavailable (attempt {attempt}); retrying in 60s",
            file=sys.stderr,
        )
        time.sleep(60)


def _get_baseline(key: str, measure) -> dict:
    cache = {}
    if os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            cache = json.load(f)
    if key not in cache:
        try:
            cache[key] = measure()
            with open(BASELINE_FILE, "w") as f:
                json.dump(cache, f, indent=2)
        except Exception as e:  # reference toolchain unavailable
            print(f"# baseline measurement failed: {e}", file=sys.stderr)
            return {}
    return cache.get(key, {})


def main() -> None:
    sys.path.insert(0, os.path.join(REPO, "benchmarks"))
    sys.path.insert(0, REPO)
    import datagen

    train_path = datagen.ensure_dataset(PRESET)

    _wait_for_backend()

    from qmf_tpu.cli.common import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import numpy as np

    from qmf_tpu.config import WALSConfig
    from qmf_tpu.data.dataset import Dataset
    from qmf_tpu.models.wals import WALSEngine

    users, items, values = datagen.load_npz(PRESET)
    ds = Dataset(users, items, values)

    cfg = WALSConfig(
        nepochs=1,
        nfactors=NFACTORS,
        regularization_lambda=0.05,
        confidence_weight=40.0,
        init_seed=0,
        batch_rows=int(os.environ.get("QMF_BENCH_BATCH_ROWS", "8192")),
        matmul_precision=PRECISION,
        **({"width_grid": WIDTH_GRID} if WIDTH_GRID else {}),
        **(
            {"solver": os.environ["QMF_BENCH_SOLVER"]}
            if os.environ.get("QMF_BENCH_SOLVER")
            else {}
        ),
        **(
            {"max_width_classes": int(os.environ["QMF_BENCH_MAX_CLASSES"])}
            if os.environ.get("QMF_BENCH_MAX_CLASSES")
            else {}
        ),
    )
    engine = WALSEngine(cfg)
    t_init = time.time()
    engine.init(ds)
    print(f"# init (pack + transfer): {time.time() - t_init:.2f}s", file=sys.stderr)

    # warmup epoch: triggers all compiles (fused whole-epoch program)
    t0 = time.time()
    engine._fused_epoch()
    print(f"# warmup epoch (incl. compile): {time.time() - t0:.2f}s", file=sys.stderr)

    loss_box = [float("nan")]

    def _step():
        # float(loss) inside _fused_epoch = true device sync
        loss_box[0] = engine._fused_epoch()

    epoch_s = _measure_steady(_step, "wals steady")
    print(f"# final loss: {loss_box[0]:.6f}", file=sys.stderr)

    # MFU estimate: epoch FLOPs = per-side A-build (2*padded_nnz*k^2) +
    # b-build (2*padded_nnz*k) + Cholesky solves ((U+I) * (k^3/3 + 2k^2))
    padded = sum(
        b.size for bk in (engine._user_buckets, engine._item_buckets)
        for b in bk.col_idx
    )
    k = NFACTORS
    n_rows = engine.nusers + engine.nitems
    flops = 2 * padded * k * k + 2 * padded * k + n_rows * (
        k**3 / 3 + 2 * k * k
    )
    eff_tflops = flops / epoch_s / 1e12
    peak_bf16 = 394.0  # v5e MXU peak (bf16)
    print(
        f"# est. epoch FLOPs {flops/1e9:.1f} GF, effective "
        f"{eff_tflops:.2f} TFLOP/s, MFU {eff_tflops/peak_bf16*100:.2f}% "
        f"of bf16 peak",
        file=sys.stderr,
    )

    baseline = _get_baseline(
        f"{PRESET}_k{NFACTORS}", lambda: _measure_reference(train_path)
    )
    base_s = baseline.get("ref_epoch_16core_extrapolated_s")
    vs = (base_s / epoch_s) if base_s else None

    print(
        json.dumps(
            {
                "metric": f"{PRESET}_wals_epoch_time_k{NFACTORS}",
                "value": round(epoch_s, 4),
                "unit": "s",
                "vs_baseline": round(vs, 2) if vs else None,
            }
        )
    )
    del engine

    if not SKIP_BPR:
        _bench_bpr(ds, train_path)


def _bench_bpr(ds, train_path: str) -> None:
    import numpy as np

    from qmf_tpu.config import BPRConfig
    from qmf_tpu.models.bpr import BPREngine

    cfg = BPRConfig(
        nepochs=1,
        nfactors=BPR_NFACTORS,
        num_negative_samples=BPR_NUM_NEG,
        batch_size=BPR_BATCH,
        init_seed=0,
        **(
            {"item_scatter": os.environ["QMF_BENCH_BPR_ITEM_SCATTER"]}
            if os.environ.get("QMF_BENCH_BPR_ITEM_SCATTER")
            else {}
        ),
    )
    eng = BPREngine(cfg)
    t0 = time.time()
    eng.init(ds)
    path = "grouped" if eng._grouped else "stream"
    print(f"# bpr init ({path} path): {time.time() - t0:.2f}s", file=sys.stderr)
    n_real = int(eng._n_real_triplets)

    def _sync():
        # donated-input programs return arrays block_until_ready does NOT
        # wait on (axon backend quirk); fetch a scalar for a true sync
        return float(eng.params.user_factors[0, 0])

    t0 = time.time()
    eng._epoch()
    _sync()
    print(
        f"# bpr warmup epoch (incl. compile): {time.time() - t0:.2f}s",
        file=sys.stderr,
    )
    def _step():
        eng._epoch()
        _sync()

    epoch_s = _measure_steady(_step, "bpr steady")
    ups = n_real / epoch_s
    print(
        f"# bpr: {n_real / 1e6:.1f}M real triplets / {epoch_s:.3f}s "
        f"-> {ups / 1e6:.2f}M updates/s",
        file=sys.stderr,
    )

    baseline = _get_baseline(
        f"{PRESET}_bpr_k{BPR_NFACTORS}_n{BPR_NUM_NEG}"
        if BPR_NUM_NEG != 3
        else f"{PRESET}_bpr_k{BPR_NFACTORS}",
        lambda: _measure_reference_bpr(train_path, n_real),
    )
    base_ups = baseline.get("ref_updates_per_s_16core_extrapolated")
    print(
        json.dumps(
            {
                "metric": f"{PRESET}_bpr_updates_per_s",
                "value": round(ups, 1),
                "unit": "updates/s",
                "vs_baseline": round(ups / base_ups, 2) if base_ups else None,
            }
        )
    )


if __name__ == "__main__":
    main()
