from qmf_tpu.utils.split import split  # noqa: F401
from qmf_tpu.utils.logging import log  # noqa: F401
from qmf_tpu.utils.tracing import StepTimer, annotate, trace  # noqa: F401
