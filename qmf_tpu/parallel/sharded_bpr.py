"""Data-parallel BPR over a device mesh.

The reference's BPR parallelism is Hogwild threads on one node
(qmf/bpr/BPREngine.cpp:153-164). The multi-chip counterpart is data
parallelism: the minibatch axis is sharded over the mesh, parameters stay
replicated, and the scatter-add gradient merges become cross-chip
reductions that GSPMD inserts automatically — the same jitted epoch
programs as single-chip with sharded in/out layouts, mirroring how sharded
WALS reuses its single-chip program.

Both epoch variants are sharded:
- the grouped packed path (ops/bpr_ops.py sgd_epoch_grouped) — presampling
  shards over the slot axis against a replicated bitmap, and the SGD scan
  shards each step's batch;
- the legacy triplet-stream scan for configurations the grouped path
  rejects.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from qmf_tpu.config import BPRConfig
from qmf_tpu.models.bpr import BPREngine
from qmf_tpu.ops import bpr_ops
from qmf_tpu.parallel.mesh import make_mesh


class ShardedBPREngine(BPREngine):
    def __init__(
        self,
        config: BPRConfig,
        metrics_engine=None,
        eval_num_neg: int = 3,
        eval_seed: int = 42,
        mesh: Optional[Mesh] = None,
        n_devices: Optional[int] = None,
    ):
        super().__init__(config, metrics_engine, eval_num_neg, eval_seed)
        self.mesh = mesh if mesh is not None else make_mesh(n_devices)
        self.axis_name = self.mesh.axis_names[0]
        repl = NamedSharding(self.mesh, P())
        self._epoch_fn = jax.jit(
            bpr_ops._sgd_epoch_impl,
            static_argnames=(
                "n_items",
                "use_biases",
                "neg_rounds",
                "max_degree",
                "shuffle",
                "batch_size",
            ),
            donate_argnums=(0,),
            out_shardings=bpr_ops.BPRParams(repl, repl, repl),
        )
        self._grouped_pack_fn = jax.jit(
            bpr_ops._sample_pack_grouped_body,
            static_argnames=bpr_ops._GROUPED_PACK_STATICS,
        )
        self._grouped_scan_fn = jax.jit(
            bpr_ops._sgd_epoch_scan_grouped_body,
            static_argnames=bpr_ops._GROUPED_SCAN_STATICS,
            donate_argnums=(0,),
            out_shardings=bpr_ops.BPRParams(repl, repl, repl),
        )

    def init(self, dataset) -> None:
        super().init(dataset)
        shard = NamedSharding(self.mesh, P(self.axis_name))
        repl = NamedSharding(self.mesh, P())
        if self._grouped and self._grp_batch % self.mesh.size != 0:
            # a per-step batch must split evenly across the mesh; tiny
            # batches fall back to the legacy stream
            self._build_triplet_stream()
        if self._grouped:
            self._grp_up = jax.device_put(
                self._grp_up, NamedSharding(self.mesh, P(self.axis_name, None))
            )
            if self._pos_bitmap is not None:
                self._pos_bitmap = bpr_ops.PosBitmap(
                    jax.device_put(self._pos_bitmap.words, repl),
                    self._pos_bitmap.words_per_user,
                )
            else:
                self._pos_bloom = bpr_ops.PosBloom(
                    jax.device_put(self._pos_bloom.words, repl),
                    self._pos_bloom.words_per_user,
                )
                self._pos_set = bpr_ops.PosSet(
                    jax.device_put(self._pos_set.indptr, repl),
                    jax.device_put(self._pos_set.items, repl),
                    self._pos_set.max_degree,
                )
        else:
            # batch (triplet) axis sharded over the mesh. Pad the stream so
            # each scan-step batch splits evenly.
            bs = self.config.batch_size
            extra = (-self._tri_users.shape[0]) % (bs * self.mesh.size)
            if extra:
                self._tri_users = jnp.concatenate(
                    [self._tri_users, jnp.zeros(extra, jnp.int32)]
                )
                self._tri_items = jnp.concatenate(
                    [self._tri_items, jnp.zeros(extra, jnp.int32)]
                )
                self._tri_weights = jnp.concatenate(
                    [
                        self._tri_weights,
                        jnp.zeros(extra, self._tri_weights.dtype),
                    ]
                )
            self._tri_users = jax.device_put(self._tri_users, shard)
            self._tri_items = jax.device_put(self._tri_items, shard)
            self._tri_weights = jax.device_put(self._tri_weights, shard)
        self.params = bpr_ops.BPRParams(
            jax.device_put(self.params.user_factors, repl),
            jax.device_put(self.params.item_factors, repl),
            jax.device_put(self.params.item_biases, repl),
        )

    def _place_params(self) -> None:
        """Re-pin resumed (host-loaded) params replicated over the mesh so
        the donated epoch programs see the layouts they were compiled for."""
        repl = NamedSharding(self.mesh, P())
        self.params = bpr_ops.BPRParams(
            jax.device_put(self.params.user_factors, repl),
            jax.device_put(self.params.item_factors, repl),
            jax.device_put(self.params.item_biases, repl),
        )

    def _epoch(self) -> None:
        cfg = self.config
        self._step_key, sub = jax.random.split(self._step_key)
        if self._grouped:
            u_shift = 1 + 2 * cfg.num_negative_samples
            sub, skey = jax.random.split(sub)
            is_bloom = self._pos_bitmap is None
            member = self._pos_bloom if is_bloom else self._pos_bitmap
            use_word = (
                cfg.neg_sampler == "word"
                and not is_bloom
                and bpr_ops.word_sampler_applies(
                    cfg.num_negative_samples, cfg.neg_resample_rounds
                )
            )
            enc, p, rk, n_overflow = self._grouped_pack_fn(
                skey,
                self._grp_up,
                member.words,
                n_items=self.nitems,
                n_real=self._n_real_pos,
                num_neg=cfg.num_negative_samples,
                n_rounds=cfg.neg_resample_rounds,
                shuffle=cfg.shuffle_training_set,
                wpu=member.words_per_user,
                u_shift=u_shift,
                feistel_b=self._grp_batch.bit_length() - 1,
                collide_cap=self._collide_cap,
                membership="word" if use_word
                else ("bloom" if is_bloom else "bitmap"),
                indptr=self._pos_set.indptr if is_bloom else None,
                csr_items=self._pos_set.items if is_bloom else None,
                max_degree=self._pos_set.max_degree if is_bloom else 0,
            )
            self._last_overflow = n_overflow
            self.params = self._grouped_scan_fn(
                self.params,
                enc,
                p,
                rk,
                jnp.asarray(self.learning_rate, dtype=self.dtype),
                jnp.asarray(cfg.user_lambda, dtype=self.dtype),
                jnp.asarray(cfg.item_lambda, dtype=self.dtype),
                jnp.asarray(cfg.bias_lambda, dtype=self.dtype),
                use_biases=cfg.use_biases,
                batch_size=self._grp_batch,
                num_neg=cfg.num_negative_samples,
                n_items=self.nitems,
                n_rounds=cfg.neg_resample_rounds,
                u_shift=u_shift,
                item_scatter=cfg.item_scatter,
                sampler="word" if use_word else "rounds",
                wpu=member.words_per_user if use_word else 0,
            )
            return
        self.params = self._epoch_fn(
            self.params,
            sub,
            self._tri_users,
            self._tri_items,
            self._tri_weights,
            self._pos_set.indptr,
            self._pos_set.items,
            jnp.asarray(self.learning_rate, dtype=self.dtype),
            jnp.asarray(cfg.user_lambda, dtype=self.dtype),
            jnp.asarray(cfg.item_lambda, dtype=self.dtype),
            jnp.asarray(cfg.bias_lambda, dtype=self.dtype),
            n_items=self.nitems,
            use_biases=cfg.use_biases,
            neg_rounds=cfg.neg_resample_rounds,
            max_degree=self._pos_set.max_degree,
            shuffle=cfg.shuffle_training_set,
            batch_size=min(cfg.batch_size, int(self._tri_users.shape[0])),
        )
