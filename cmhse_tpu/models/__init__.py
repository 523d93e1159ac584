from cmhse_tpu.models.gru import MaskedGRU, gru_sequence, masked_mean, flip_padded
from cmhse_tpu.models.encoders import SequenceEncoder, AttentionPool, WordEmbedding
from cmhse_tpu.models.cmhse import CMHSE, ModelOutputs, ReconstructionDecoder

__all__ = [
    "MaskedGRU",
    "gru_sequence",
    "masked_mean",
    "flip_padded",
    "SequenceEncoder",
    "AttentionPool",
    "WordEmbedding",
    "CMHSE",
    "ModelOutputs",
    "ReconstructionDecoder",
]
