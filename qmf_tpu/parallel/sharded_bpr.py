"""Data-parallel BPR over a device mesh.

The reference's BPR parallelism is Hogwild threads on one node
(qmf/bpr/BPREngine.cpp:153-164). The multi-chip counterpart is data
parallelism: the triplet minibatch axis is sharded over the mesh, parameters
stay replicated, and the scatter-add gradient merges become cross-chip
reductions that GSPMD inserts automatically — the same jitted epoch program
as single-chip (qmf_tpu.ops.bpr_ops._sgd_epoch_impl) with sharded
in/out layouts, mirroring how sharded WALS reuses its single-chip program.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
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

    def init(self, dataset) -> None:
        super().init(dataset)
        # batch (triplet) axis sharded over the mesh; params replicated.
        # Pad the stream so each scan-step batch splits evenly.
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
                [self._tri_weights, jnp.zeros(extra, self._tri_weights.dtype)]
            )
        shard = NamedSharding(self.mesh, P(self.axis_name))
        repl = NamedSharding(self.mesh, P())
        self._tri_users = jax.device_put(self._tri_users, shard)
        self._tri_items = jax.device_put(self._tri_items, shard)
        self._tri_weights = jax.device_put(self._tri_weights, shard)
        self.params = bpr_ops.BPRParams(
            jax.device_put(self.params.user_factors, repl),
            jax.device_put(self.params.item_factors, repl),
            jax.device_put(self.params.item_biases, repl),
        )

    def _epoch(self) -> None:
        cfg = self.config
        self._step_key, sub = jax.random.split(self._step_key)
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
