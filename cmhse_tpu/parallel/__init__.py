from cmhse_tpu.parallel.mesh import make_mesh, batch_sharding, replicated
from cmhse_tpu.parallel.eval_sharded import sharded_retrieval_metrics, sharded_sim_topk

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated",
    "sharded_retrieval_metrics",
    "sharded_sim_topk",
]
