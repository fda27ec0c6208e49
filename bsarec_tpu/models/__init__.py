"""Model registry (reference: `src/model/__init__.py:10-19`)."""

from bsarec_tpu.models.base import SequentialRecModel  # noqa: F401
from bsarec_tpu.models.bsarec import BSARecModel
from bsarec_tpu.models.sasrec import SASRecModel
from bsarec_tpu.models.bert4rec import BERT4RecModel
from bsarec_tpu.models.fmlprec import FMLPRecModel
from bsarec_tpu.models.caser import CaserModel
from bsarec_tpu.models.gru4rec import GRU4RecModel
from bsarec_tpu.models.duorec import DuoRecModel
from bsarec_tpu.models.fearec import FEARecModel

MODEL_REGISTRY = {
    "bsarec": BSARecModel,
    "sasrec": SASRecModel,
    "bert4rec": BERT4RecModel,
    "fmlprec": FMLPRecModel,
    "caser": CaserModel,
    "gru4rec": GRU4RecModel,
    "duorec": DuoRecModel,
    "fearec": FEARecModel,
}


def build_model(config) -> SequentialRecModel:
    return MODEL_REGISTRY[config.model_type.lower()](config=config)
