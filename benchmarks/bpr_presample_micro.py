"""Microbenchmark the grouped-BPR presample+encode program's stages.

Usage: python -u benchmarks/bpr_presample_micro.py [stage ...]
Times truncated variants of ops/bpr_ops.py _sample_pack_grouped_body at the
ml20m shape (18M positives x 3 negatives, exact bitmap) so its ~2s cost
(bpr_stage_decomp.py: the scan is only ~1s) decomposes into stages:

  shuffle    feistel bijection + pos_u/pos_i gathers + encode of valid bit
  member0    + round-0 candidate hash + full-width bitmap membership test
  compact    + jnp.where(member0, size=collide_cap) slot compaction
  rounds     + rounds 1..3 membership tests on the compacted buffer
  full       the production program (adds the rounds scatter + encoding)
  word       the single-gather in-word-probe sampler (neg_sampler="word")
             end to end via _sample_pack_grouped_impl(membership="word")

Every timing fetches a scalar from the result (block_until_ready does not
reliably wait on this backend).
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

NUM_NEG, N_ROUNDS = 3, 4


def main():
    stages = sys.argv[1:] or ["shuffle", "member0", "compact", "rounds", "full"]
    users, items, values = datagen.load_npz("ml20m")
    ds = Dataset(users, items, values)
    cfg = BPRConfig(
        nepochs=1, nfactors=30, num_negative_samples=NUM_NEG,
        batch_size=32768, neg_resample_rounds=N_ROUNDS, init_seed=0,
    )
    eng = BPREngine(cfg)
    t0 = time.time()
    eng.init(ds)
    print(f"init {time.time()-t0:.1f}s", flush=True)
    assert eng._grouped and eng._pos_bitmap is not None

    bitmap = eng._pos_bitmap
    pos_up = eng._grp_up
    pos_u, pos_i = eng._grp_users, eng._grp_items
    n_stream = pos_u.shape[0]
    n_real = eng._n_real_pos
    u_shift = 1 + 2 * NUM_NEG
    feistel_b = eng._grp_batch.bit_length() - 1
    collide_cap = eng._collide_cap
    print(f"n_stream {n_stream}, collide_cap {collide_cap}", flush=True)

    def staged(key, pos_u, pos_i, words, stage: str):
        key, rkey = jax.random.split(key)
        rk = jax.random.randint(rkey, (N_ROUNDS, 3), 0, 1 << 30, jnp.int32)
        key, mkey = jax.random.split(key)
        idx = bpr_ops._feistel_bijection(mkey, n_stream >> feistel_b, feistel_b)
        u = pos_u[idx]
        p = pos_i[idx]
        valid = idx < n_real
        enc = (u << u_shift) | valid.astype(jnp.int32)
        if stage == "shuffle":
            return enc, p
        users_slots = jnp.repeat(u, NUM_NEG)
        n = users_slots.shape[0]
        f = jnp.arange(n, dtype=jnp.int32)
        bm = bpr_ops.PosBitmap(words, bitmap.words_per_user)
        member0 = bpr_ops._is_member_bitmap(
            bm, users_slots, bpr_ops._cand_hash(rk[0], f, eng.nitems)
        )
        if stage == "member0":
            return enc | member0.reshape(n_stream, NUM_NEG)[:, 0], p
        (cidx,) = jnp.where(member0, size=collide_cap, fill_value=n)
        if stage == "compact":
            return enc | (jnp.sum(cidx) & 1), p
        cvalid = cidx < n
        cf = jnp.where(cvalid, cidx, 0)
        cu = users_slots[cf]
        chosen = jnp.full(cidx.shape, N_ROUNDS - 1, jnp.int32)
        found = jnp.zeros(cidx.shape, bool)
        for r in range(1, N_ROUNDS):
            m_r = bpr_ops._is_member_bitmap(
                bm, cu, bpr_ops._cand_hash(rk[r], cf, eng.nitems)
            )
            take = (~found) & (~m_r)
            chosen = jnp.where(take, r, chosen)
            found = found | take
        if stage == "rounds":
            return enc | (jnp.sum(chosen) & 1), p
        rounds = jnp.zeros((n,), jnp.int32).at[cidx].set(chosen, mode="drop")
        rounds_row = rounds.reshape(n_stream, NUM_NEG)
        for j in range(NUM_NEG):
            enc = enc | (rounds_row[:, j] << (1 + 2 * j))
        return enc, p

    def word_full(key, pos_u, pos_i, words):
        # production layout: pre-stacked interleaved rows (closure, so the
        # staged variants' two-array signature stays shared)
        enc, p, rk, _ = bpr_ops._sample_pack_grouped_body(
            key, pos_up, words,
            n_items=eng.nitems, n_real=n_real, num_neg=NUM_NEG,
            n_rounds=N_ROUNDS, shuffle=True, wpu=bitmap.words_per_user,
            u_shift=u_shift, feistel_b=feistel_b, collide_cap=collide_cap,
            membership="word",
        )
        return enc, p

    jfns = {
        s: jax.jit(word_full) if s == "word"
        else jax.jit(lambda k, pu, pi, w, s=s: staged(k, pu, pi, w, s))
        for s in stages
    }
    key = jax.random.PRNGKey(0)
    for s in stages:
        out = jfns[s](key, pos_u, pos_i, bitmap.words)
        _ = int(out[0][0])  # compile + true sync
        ts = []
        for i in range(3):
            t0 = time.time()
            out = jfns[s](jax.random.fold_in(key, i), pos_u, pos_i, bitmap.words)
            _ = int(out[0][0])
            ts.append(time.time() - t0)
        print(f"  {s:8s}: {float(np.median(ts)):.3f}s "
              f"({[f'{t:.3f}' for t in ts]})", flush=True)


if __name__ == "__main__":
    main()
