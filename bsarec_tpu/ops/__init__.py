from bsarec_tpu.ops.masks import causal_additive_mask, bidirectional_additive_mask  # noqa: F401
from bsarec_tpu.ops.frequency import (  # noqa: F401
    lowpass_projection_matrix,
    frequency_filter,
    complex_filter_apply,
)
from bsarec_tpu.ops.losses import (  # noqa: F401
    full_softmax_ce,
    pair_bce_masked,
    pair_logsigmoid_bce,
    bpr_loss,
    info_nce_logits,
)
from bsarec_tpu.ops.topk import masked_topk, topk_metrics  # noqa: F401
from bsarec_tpu.ops.pallas_ce import streaming_softmax_ce  # noqa: F401
from bsarec_tpu.ops.pallas_rank import (  # noqa: F401
    build_seen_bitmask,
    streaming_masked_topk,
)
