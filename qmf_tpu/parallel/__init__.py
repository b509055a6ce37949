from qmf_tpu.parallel.engine import ShardedWALSEngine  # noqa: F401
from qmf_tpu.parallel.mesh import make_mesh, replicated, row_sharded  # noqa: F401
from qmf_tpu.parallel.sharded_wals import (  # noqa: F401
    ShardedBuckets,
    iterate_side_sharded,
    sharded_gramian,
)
from qmf_tpu.parallel.sharded_bpr import ShardedBPREngine  # noqa: F401
from qmf_tpu.parallel import multihost  # noqa: F401
