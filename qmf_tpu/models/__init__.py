from qmf_tpu.models.bpr import BPREngine  # noqa: F401
from qmf_tpu.models.engine import Engine  # noqa: F401
from qmf_tpu.models.wals import WALSEngine  # noqa: F401
from qmf_tpu.models.recommend import recommend_top_n  # noqa: F401
