"""Device-resident hybrid index: padded jnp arrays ready for the jitted path.

The reference's shared DuckDB file (SURVEY.md §1 L0) becomes this structure:
CSR impact postings + the chunk-embedding bank live in HBM; every axis is
padded to hardware-friendly multiples so all query-time shapes are static.

Padding scheme:
  * docs   -> multiple of 128; one extra sentinel slot (index ``n_docs_pad``)
    receives scatter writes from masked-out postings and padded chunks.
  * chunks -> multiple of 128 (MXU tile edge for the q x bank matmul);
    padded chunks point at the sentinel doc.
  * postings are used via gathers only, no padding needed.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
import numpy as np

from modern_search_engines_project_tpu.config import Config
from modern_search_engines_project_tpu.index.builder import IndexArtifacts


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclasses.dataclass
class DeviceIndex:
    # BM25
    indptr: jnp.ndarray  # int32 [V+1]
    post_docs: jnp.ndarray  # int32 [nnz]
    post_impact: jnp.ndarray  # float32 [nnz]
    # dense
    chunk_emb: jnp.ndarray  # bank_dtype [n_chunks_pad, dim]
    chunk_doc: jnp.ndarray  # int32 [n_chunks_pad] (pad -> n_docs_pad sentinel)
    doc_chunk_start: jnp.ndarray  # int32 [n_docs_pad + 1]
    doc_n_chunks: jnp.ndarray  # int32 [n_docs_pad + 1]
    # sizes (static)
    n_docs: int
    n_docs_pad: int
    n_chunks_pad: int
    n_terms: int
    nnz: int
    posting_cap: int  # static gather budget per query (Q_CAP)

    @classmethod
    def from_artifacts(
        cls,
        art: IndexArtifacts,
        config: Optional[Config] = None,
        bank_dtype=jnp.float32,
        posting_cap: Optional[int] = None,
    ) -> "DeviceIndex":
        cfg = config or art.config
        n_docs = art.n_docs
        n_docs_pad = max(_round_up(n_docs, 128), 128)
        n_chunks = art.n_chunks
        n_chunks_pad = max(_round_up(n_chunks, 128), 128)
        nnz = int(art.post_docs.shape[0])

        chunk_emb = np.zeros((n_chunks_pad, art.chunk_emb.shape[1]), np.float32)
        chunk_emb[:n_chunks] = art.chunk_emb
        chunk_doc = np.full(n_chunks_pad, n_docs_pad, np.int32)
        chunk_doc[:n_chunks] = art.chunk_doc

        doc_chunk_start = np.zeros(n_docs_pad + 1, np.int32)
        doc_chunk_start[:n_docs] = art.doc_chunk_start
        doc_n_chunks = np.ones(n_docs_pad + 1, np.int32)
        doc_n_chunks[:n_docs] = art.doc_n_chunks

        if posting_cap is None:
            # budget: enough for every query term to be "tuebingen"-common.
            # max term df bounds one term's postings; take the top
            # max_query_terms dfs as the worst-case query, then round up.
            lens = np.diff(art.indptr)
            top_lens = np.sort(lens)[::-1][: cfg.max_query_terms]
            posting_cap = max(1024, _round_up(int(top_lens.sum()) + 1, 1024))

        return cls(
            indptr=jnp.asarray(art.indptr, jnp.int32),
            post_docs=jnp.asarray(art.post_docs, jnp.int32),
            post_impact=jnp.asarray(art.post_impact, jnp.float32),
            chunk_emb=jnp.asarray(chunk_emb, bank_dtype),
            chunk_doc=jnp.asarray(chunk_doc),
            doc_chunk_start=jnp.asarray(doc_chunk_start),
            doc_n_chunks=jnp.asarray(doc_n_chunks),
            n_docs=n_docs,
            n_docs_pad=n_docs_pad,
            n_chunks_pad=n_chunks_pad,
            n_terms=art.n_terms,
            nnz=nnz,
            posting_cap=int(posting_cap),
        )
