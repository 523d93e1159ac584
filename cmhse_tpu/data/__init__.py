from cmhse_tpu.data.batch import Batch
from cmhse_tpu.data.vocab import Vocabulary, build_vocab
from cmhse_tpu.data.bucketing import BucketSpec, pad_batch
from cmhse_tpu.data.datasets import (CorrelatedSyntheticDataset, RaggedExample,
                                      SyntheticHierarchicalDataset, PrecompDataset)
from cmhse_tpu.data.loader import batches_from_dataset

__all__ = [
    "Batch",
    "Vocabulary",
    "build_vocab",
    "BucketSpec",
    "pad_batch",
    "RaggedExample",
    "SyntheticHierarchicalDataset",
    "CorrelatedSyntheticDataset",
    "PrecompDataset",
    "batches_from_dataset",
]
