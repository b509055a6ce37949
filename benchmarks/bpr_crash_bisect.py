"""Bisect the ml20m fused-BPR-epoch TPU worker crash.

Usage: python -u benchmarks/bpr_crash_bisect.py VARIANT
  full        production epoch (shuffle + presample + merged scatter)
  noshuffle   shuffle=False (drops the 55M-row permutation gather)
  splitscatter monkeypatch the update to use separate pos/neg scatters
  nopresample monkeypatch sampling back inside the scan body
Run ONE variant per process — a crash kills the TPU worker (~2 min respawn).
"""

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


def main():
    variant = sys.argv[1]
    users, items, values = datagen.load_npz("ml20m")
    cfg = BPRConfig(
        nepochs=1, nfactors=30, num_negative_samples=3, batch_size=32768,
        init_seed=0,
        shuffle_training_set=(variant != "noshuffle"),
        bitmap_budget_mb=(0 if variant == "nobitmap" else 1024),
    )
    if variant in ("splitscatter", "scan_split"):
        orig_update = bpr_ops._sgd_update_body

        def split_update(params, users, pos_items, neg, weight, lr,
                         user_lambda, item_lambda, bias_lambda, use_biases):
            d, pu, qi, qj = bpr_ops._score_diff(
                params, users, pos_items, neg, use_biases
            )
            e = (1.0 / (1.0 + jnp.exp(d))) * weight
            wcol = weight[:, None]
            uf = params.user_factors.at[users].add(
                lr * (e[:, None] * (qi - qj) - user_lambda * pu * wcol)
            )
            itf = params.item_factors.at[pos_items].add(
                lr * (e[:, None] * pu - item_lambda * qi * wcol)
            )
            itf = itf.at[neg].add(
                lr * (-e[:, None] * pu - item_lambda * qj * wcol)
            )
            return bpr_ops.BPRParams(uf, itf, params.item_biases)

        bpr_ops._sgd_update_body = split_update
    eng = BPREngine(cfg)
    t0 = time.time()
    eng.init(Dataset(users, items, values))
    print(f"{variant}: init {time.time()-t0:.1f}s "
          f"(bitmap={'yes' if eng._pos_bitmap is not None else 'no'})",
          flush=True)

    if variant in ("prep_bitmap", "prep_csr", "scan_only", "scan_split"):
        bm = eng._pos_bitmap if variant == "prep_bitmap" else None
        if variant == "scan_split":
            variant_inner = "scan_only"
        
        if variant.startswith("prep_"):
            t0 = time.time()
            n = bpr_ops._sample_negatives_impl(
                jax.random.key(5), eng._tri_users, eng._pos_set.indptr,
                eng._pos_set.items, n_items=eng.nitems, rounds=4,
                max_degree=eng._pos_set.max_degree,
                bitmap_words=None if bm is None else bm.words,
                wpu=0 if bm is None else bm.words_per_user,
            )
            print(f"{variant}: sample OK {time.time()-t0:.1f}s "
                  f"neg[0]={int(n[0])}", flush=True)
            for _ in range(2):
                t0 = time.time()
                n = bpr_ops._sample_negatives_impl(
                    jax.random.key(6), eng._tri_users, eng._pos_set.indptr,
                    eng._pos_set.items, n_items=eng.nitems, rounds=4,
                    max_degree=eng._pos_set.max_degree,
                    bitmap_words=None if bm is None else bm.words,
                    wpu=0 if bm is None else bm.words_per_user,
                )
                int(n[0])
                print(f"{variant}: sample {time.time()-t0:.2f}s", flush=True)
        else:  # scan_only / scan_split with uniform random negatives
            n = jax.random.randint(
                jax.random.key(7), eng._tri_users.shape, 0, eng.nitems,
                dtype=jnp.int32,
            )
            t0 = time.time()
            params = bpr_ops._sgd_epoch_scan_impl(
                eng.params, eng._tri_users, eng._tri_items, n,
                eng._tri_weights,
                jnp.float32(0.05), jnp.float32(0.025), jnp.float32(0.0025),
                jnp.float32(1.0), use_biases=False, batch_size=32768,
            )
            v = float(params.user_factors[0, 0])
            print(f"{variant}: scan OK {time.time()-t0:.1f}s ({v:.4f})",
                  flush=True)
            eng.params = params
            for _ in range(2):
                t0 = time.time()
                params = bpr_ops._sgd_epoch_scan_impl(
                    eng.params, eng._tri_users, eng._tri_items, n,
                    eng._tri_weights,
                    jnp.float32(0.05), jnp.float32(0.025),
                    jnp.float32(0.0025), jnp.float32(1.0),
                    use_biases=False, batch_size=32768,
                )
                float(params.user_factors[0, 0])
                eng.params = params
                print(f"{variant}: scan {time.time()-t0:.2f}s", flush=True)
        return

    t0 = time.time()
    eng._epoch()
    v = float(eng.params.user_factors[0, 0])
    print(f"{variant}: warmup epoch OK {time.time()-t0:.1f}s ({v:.4f})",
          flush=True)
    times = []
    for _ in range(3):
        t0 = time.time()
        eng._epoch()
        float(eng.params.user_factors[0, 0])
        times.append(time.time() - t0)
    print(f"{variant}: epoch {np.median(times):.2f}s", flush=True)


if __name__ == "__main__":
    main()
