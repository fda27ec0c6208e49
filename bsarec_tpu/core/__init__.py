from bsarec_tpu.core.mesh import (  # noqa: F401
    MeshConfig,
    make_mesh,
    batch_sharding,
    replicated,
    vocab_sharding,
    shard_batch,
)
