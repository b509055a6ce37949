"""Decompose the grouped BPR epoch: presample program vs SGD scan program.

Usage: python -u benchmarks/bpr_stage_decomp.py [batch_size ...]
Times each of the two device programs of the grouped epoch
(ops/bpr_ops.py sgd_epoch_grouped) separately at the ml20m BASELINE config
(k=30, 3 negatives) so optimization effort lands on the right one.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "benchmarks")
from qmf_tpu.cli.common import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import datagen  # noqa: E402
from qmf_tpu.config import BPRConfig  # noqa: E402
from qmf_tpu.data.dataset import Dataset  # noqa: E402
from qmf_tpu.models.bpr import BPREngine  # noqa: E402
from qmf_tpu.ops import bpr_ops  # noqa: E402

PRESET = os.environ.get("QMF_BPR_PRESET", "ml20m")


def decompose(eng: BPREngine, bs: int):
    cfg = eng.config
    num_neg = cfg.num_negative_samples
    u_shift = 1 + 2 * num_neg
    feistel_b = bs.bit_length() - 1
    bitmap = eng._pos_bitmap if eng._pos_bitmap is not None else eng._pos_bloom
    is_bloom = eng._pos_bitmap is None
    key = jax.random.PRNGKey(0)

    def run_pack(k):
        return bpr_ops._sample_pack_grouped_impl(
            k,
            eng._grp_up,
            bitmap.words,
            n_items=eng.nitems,
            n_real=eng._n_real_pos,
            num_neg=num_neg,
            n_rounds=cfg.neg_resample_rounds,
            shuffle=True,
            wpu=bitmap.words_per_user,
            u_shift=u_shift,
            feistel_b=feistel_b,
            collide_cap=eng._collide_cap,
            membership="bloom" if is_bloom else "bitmap",
            indptr=eng._pos_set.indptr if is_bloom else None,
            csr_items=eng._pos_set.items if is_bloom else None,
            max_degree=eng._pos_set.max_degree if is_bloom else 0,
        )

    enc, p, rk, _ = run_pack(key)
    jax.block_until_ready((enc, p))
    times = []
    for i in range(3):
        t0 = time.time()
        out = run_pack(jax.random.fold_in(key, i))
        jax.block_until_ready(out[:2])
        times.append(time.time() - t0)
    t_pack = float(np.median(times))
    print(f"  presample+encode program: {t_pack:.3f}s "
          f"({[f'{t:.3f}' for t in times]})", flush=True)

    lr = jnp.asarray(0.05, jnp.float32)
    lam = jnp.asarray(0.01, jnp.float32)

    def run_scan(params):
        return bpr_ops._sgd_epoch_scan_grouped_impl(
            params, enc, p, rk, lr, lam, lam, lam,
            use_biases=False, batch_size=bs, num_neg=num_neg,
            n_items=eng.nitems, n_rounds=cfg.neg_resample_rounds,
            u_shift=u_shift,
        )

    params = run_scan(eng.params)  # donates eng.params
    float(params.user_factors[0, 0])
    times = []
    for _ in range(3):
        t0 = time.time()
        params = run_scan(params)
        float(params.user_factors[0, 0])
        times.append(time.time() - t0)
    t_scan = float(np.median(times))
    eng.params = params
    print(f"  sgd grouped scan program: {t_scan:.3f}s "
          f"({[f'{t:.3f}' for t in times]})", flush=True)
    n_real = eng._n_real_triplets
    total = t_pack + t_scan
    n_steps = eng._grp_up.shape[0] // bs
    print(f"  total {total:.3f}s ({n_steps} scan steps, "
          f"{t_scan / n_steps * 1e3:.2f}ms/step) -> "
          f"{n_real / total / 1e6:.2f}M real updates/s", flush=True)


def main():
    sizes = [int(s) for s in sys.argv[1:]] or [32768]
    users, items, values = datagen.load_npz(PRESET)
    ds = Dataset(users, items, values)
    for bs in sizes:
        cfg = BPRConfig(
            nepochs=1, nfactors=30, num_negative_samples=3, batch_size=bs,
            neg_resample_rounds=4, init_seed=0,
        )
        eng = BPREngine(cfg)
        t0 = time.time()
        eng.init(ds)
        if not eng._grouped:
            print(f"bs={bs}: grouped path unavailable, skipping", flush=True)
            continue
        print(f"bs={bs}: init {time.time()-t0:.1f}s; "
              f"{eng._grp_up.shape[0]} stream rows "
              f"({eng._n_real_pos} real positives)", flush=True)
        decompose(eng, min(bs, eng._grp_batch))


if __name__ == "__main__":
    main()
