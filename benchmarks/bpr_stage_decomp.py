"""Decompose the packed BPR epoch: sample+pack program vs SGD scan program.

Usage: python -u benchmarks/bpr_stage_decomp.py [batch_size]
Times each of the two device programs of the packed epoch separately at the
ml20m BASELINE config (k=30, 3 negatives) so optimization effort lands on
the right one.
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
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
    users, items, values = datagen.load_npz("ml20m")
    ds = Dataset(users, items, values)
    cfg = BPRConfig(
        nepochs=1, nfactors=30, num_negative_samples=3, batch_size=bs,
        neg_resample_rounds=4, init_seed=0,
    )
    eng = BPREngine(cfg)
    t0 = time.time()
    eng.init(ds)
    print(f"init {time.time()-t0:.1f}s; stream {eng._tri_users.shape[0]} "
          f"rows ({eng._n_real_triplets} real)", flush=True)

    key = jax.random.PRNGKey(0)
    tri_ui = jnp.stack([eng._tri_users, eng._tri_items], axis=1)
    bitmap = eng._pos_bitmap

    def run_pack(k):
        return bpr_ops._sample_pack_impl(
            k, tri_ui, bitmap.words, n_items=eng.nitems,
            n_real=eng._n_real_triplets, neg_rounds=4, shuffle=True,
            wpu=bitmap.words_per_user,
        )

    # warmup
    u, packed, w = run_pack(key)
    jax.block_until_ready((u, packed, w))
    times = []
    for i in range(3):
        t0 = time.time()
        u2, p2, w2 = run_pack(jax.random.fold_in(key, i))
        jax.block_until_ready((u2, p2, w2))
        times.append(time.time() - t0)
    t_pack = float(np.median(times))
    print(f"sample+pack program: {t_pack:.3f}s "
          f"({[f'{t:.3f}' for t in times]})", flush=True)

    lr = jnp.asarray(0.05, jnp.float32)
    lam = jnp.asarray(0.01, jnp.float32)

    def run_scan(params):
        return bpr_ops._sgd_epoch_scan_packed_impl(
            params, key, u, packed, w, lr, lam, lam, lam,
            use_biases=False, batch_size=bs,
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
    print(f"sgd scan program:    {t_scan:.3f}s "
          f"({[f'{t:.3f}' for t in times]})", flush=True)
    n_real = eng._n_real_triplets
    total = t_pack + t_scan
    print(f"total {total:.3f}s -> {n_real/total/1e6:.2f}M real updates/s "
          f"(target 9.8M/s)", flush=True)


if __name__ == "__main__":
    main()
