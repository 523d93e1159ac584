from cmhse_tpu.eval.encode import encode_data, encode_gallery_device
from cmhse_tpu.eval.retrieval import evalrank, validate_metrics
from cmhse_tpu.eval.serve import (Retriever, text_query_batch,
                                  video_query_batch)

__all__ = ["encode_data", "encode_gallery_device", "evalrank",
           "validate_metrics", "Retriever", "text_query_batch",
           "video_query_batch"]
