from qmf_tpu.data.dataset import Dataset, read_dataset, write_dataset  # noqa: F401
from qmf_tpu.data.id_index import MISSING_IDX, IdIndex  # noqa: F401
from qmf_tpu.data.factor_io import (  # noqa: F401
    FactorData,
    load_factors,
    save_factors,
)
from qmf_tpu.data.gen_uniform import gen_uniform  # noqa: F401
