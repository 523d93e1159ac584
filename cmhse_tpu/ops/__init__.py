from cmhse_tpu.ops.similarity import l2norm, cosine_sim
from cmhse_tpu.ops.loss import (
    contrastive_loss,
    positive_mask_from_ids,
)
from cmhse_tpu.ops.ranking import retrieval_ranks, recall_at_k, retrieval_metrics
from cmhse_tpu.ops.topk import (PreparedGallery, append_to_prepared,
                                prepare_topk_gallery, quantized_sim_topk,
                                should_stream_topk, streaming_sim_topk)

__all__ = [
    "append_to_prepared",
    "l2norm",
    "cosine_sim",
    "contrastive_loss",
    "positive_mask_from_ids",
    "retrieval_ranks",
    "recall_at_k",
    "retrieval_metrics",
    "PreparedGallery",
    "prepare_topk_gallery",
    "quantized_sim_topk",
    "should_stream_topk",
    "streaming_sim_topk",
]
