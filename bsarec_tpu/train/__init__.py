from bsarec_tpu.train.trainer import Trainer  # noqa: F401
from bsarec_tpu.train.loop import (  # noqa: F401
    build_train_epoch,
    build_eval_fn,
    make_optimizer,
    sample_negatives,
)
