"""cmhse_tpu — a TPU-native JAX/Pallas rebuild of CMHSE (zbwglory/CMHSE, ECCV'18).

Cross-Modal Hierarchical Sequence Embedding for video <-> paragraph retrieval:
ragged frame-feature / caption-token ingestion with bucketed padding,
``lax.scan`` GRU encoders at both hierarchy levels (frames->clip, clips->video;
words->sentence, sentences->paragraph), a Pallas-fused cosine-similarity +
max-of-hinges contrastive ranking loss with in-batch hard negatives, and an
on-device sharded retrieval evaluator (R@1/5/10/50, median rank).

Reference provenance: the reference mount ``/root/reference`` was empty at both
survey and build time (see SURVEY.md section 0); the capability surface is
rebuilt from SURVEY.md + BASELINE.json + the ECCV'18 paper (arXiv:1810.07212).
Citations in docstrings therefore point at SURVEY.md component ids (C1..C15)
and reference *paths* recalled from the VSE++ lineage (e.g. ``model.py``,
``train.py``) rather than unverifiable file:line pairs.
"""

from cmhse_tpu.config import (
    DataConfig,
    LossConfig,
    ModelConfig,
    TrainConfig,
    ExperimentConfig,
    PRESETS,
    get_preset,
)

__version__ = "0.1.0"

__all__ = [
    "DataConfig",
    "LossConfig",
    "ModelConfig",
    "TrainConfig",
    "ExperimentConfig",
    "PRESETS",
    "get_preset",
    "__version__",
]
