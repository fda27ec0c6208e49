from bsarec_tpu.parallel.embedding import (  # noqa: F401
    pad_vocab_rows,
    sharded_embedding_lookup,
)
from bsarec_tpu.parallel.logits import (  # noqa: F401
    sharded_softmax_ce,
    sharded_masked_topk,
)
