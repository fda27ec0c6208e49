from bsarec_tpu.utils.logging import set_logger, get_local_time  # noqa: F401
from bsarec_tpu.utils.early_stopping import EarlyStopping  # noqa: F401
