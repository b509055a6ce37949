from qmf_tpu.metrics.engine import MetricsEngine  # noqa: F401
from qmf_tpu.metrics.manager import MetricsManager, parse_at_k_metric  # noqa: F401
from qmf_tpu.metrics.metrics import (  # noqa: F401
    AUC,
    AveragePrecision,
    MeanSquaredError,
    Metric,
    Precision,
    Recall,
)
