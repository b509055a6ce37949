from qmf_tpu.distributed.labor import Labor  # noqa: F401
from qmf_tpu.distributed.scheduler import Scheduler, run_task  # noqa: F401
from qmf_tpu.distributed.submit import (  # noqa: F401
    scheduler_status,
    submit_task_file,
)
from qmf_tpu.distributed.taskdef import (  # noqa: F401
    TaskDef,
    load_taskdef,
    parse_taskdef,
)
