from bsarec_tpu.data.corpus import load_corpus, Corpus  # noqa: F401
from bsarec_tpu.data.pipeline import SeqRecData  # noqa: F401
