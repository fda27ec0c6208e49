"""PREPRec family — pre-trained sequential recommendation via popularity
dynamics (RecSys 2024), re-designed TPU-first.

Capability map to the reference (`/root/reference/repo-b/`):
- popularity encodings & tables     -> preprec/popularity.py
- CSV partition loaders             -> preprec/data.py
- 6 models (NewRec, NewB4Rec,
  SASRec, BERT4Rec, BPRMF, CL4SRec) -> preprec/models.py
- WarpSampler multiprocess pipeline -> preprec/sampler.py (device-resident)
- train_test driver                 -> preprec/train.py
- sampled / full-catalog eval       -> preprec/evaluate.py
- offline popularity preprocessing  -> preprec/preprocess.py
- CLI                               -> python -m bsarec_tpu.preprec.main
"""

from bsarec_tpu.preprec.config import PrepRecConfig  # noqa: F401
