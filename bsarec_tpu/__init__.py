"""bsarec_tpu — a TPU-native sequential-recommendation framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
BSARec reference (AAAI 2024) and its PREPRec companion (RecSys 2024):
8+ sequential-recommendation models, device-resident input pipelines,
sharded full-catalog training/eval, and multi-host scaling via
`jax.sharding.Mesh` + XLA collectives.

Reference capability map: see SURVEY.md at the repo root.
"""

__version__ = "0.1.0"

from bsarec_tpu.models import MODEL_REGISTRY  # noqa: F401
