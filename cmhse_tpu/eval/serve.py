"""Query-against-gallery serving entry (the "sim-matrix QPS" surface,
BASELINE.json:2; the reference has no serving path — SURVEY.md section 3.5 —
so this is a new, thin layer over the eval stack).

Typical use: encode a gallery once with :func:`build_gallery`, then answer
text->video (or video->text) queries with :meth:`Retriever.retrieve`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from cmhse_tpu.models.cmhse import CMHSE


class Retriever:
    """Holds an encoded gallery on device; answers top-k queries.

    Single-chip path uses one fused GEMM + ``top_k``; with a mesh the gallery
    is column-sharded and :func:`cmhse_tpu.parallel.eval_sharded.
    sharded_sim_topk` runs the distributed top-k.
    """

    def __init__(self, model: CMHSE, params, mesh=None):
        self.model = model
        self.params = params
        self.mesh = mesh
        self.gallery: Array | None = None
        self.gallery_keys: list | None = None

        @jax.jit
        def _encode_text(params, words, word_len, sent_len):
            emb, _ = model.apply({"params": params}, words, word_len,
                                 sent_len, method=CMHSE.encode_text)
            return emb

        self._encode_text = _encode_text

    def build_gallery(self, batches, keys: list | None = None) -> None:
        """Encode video batches into the on-device gallery."""
        from cmhse_tpu.eval.encode import encode_data

        v, _, ids = encode_data(self.model, self.params, batches)
        self.gallery = v
        self.gallery_keys = keys if keys is not None else list(ids)

    def retrieve(
        self, words: Array, word_len: Array, sent_len: Array, k: int = 10
    ) -> tuple[np.ndarray, np.ndarray]:
        """Top-k gallery indices + scores for a batch of tokenized queries."""
        if self.gallery is None:
            raise RuntimeError("call build_gallery() first")
        q = self._encode_text(self.params, words, word_len, sent_len)
        if self.mesh is not None:
            from cmhse_tpu.parallel.eval_sharded import sharded_sim_topk

            scores, idx = sharded_sim_topk(q, self.gallery, k, self.mesh)
        else:
            scores, idx = jax.lax.top_k(
                jnp.dot(q, self.gallery.T,
                        preferred_element_type=jnp.float32), k
            )
        return np.asarray(scores), np.asarray(idx)
