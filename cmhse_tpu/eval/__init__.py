from cmhse_tpu.eval.encode import encode_data
from cmhse_tpu.eval.retrieval import evalrank, validate_metrics

__all__ = ["encode_data", "evalrank", "validate_metrics"]
