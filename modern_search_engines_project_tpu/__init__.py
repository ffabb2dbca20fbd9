"""TPU-native hybrid search framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
Tübingen search engine (StephenTaf/Modern-Search-Engines-Project): a polite
resumable web crawler, hybrid BM25 + dense sliding-window chunk index,
two-stage retrieval (BM25 top-1000 -> cosine rerank with 0.85/0.15 fusion,
positional boosting, per-doc max-pooling, domain diversification), batch
query evaluation, an asyncio serving layer with a D3 bubble UI, and a JAX
bi-encoder training pipeline.

Instead of the reference's DuckDB-plus-HTTP-sidecar architecture
(search_api.py / reranker/reranker_api.py / indexer/*), the entire online
query path is ONE jitted device program over device-resident arrays:
a CSR postings matrix scored by BM25 (XLA / Pallas kernels) with fused
``lax.top_k``, and an HBM chunk-embedding bank scored as a single
query x chunk matmul with masked per-document max pooling — shardable over
a ``jax.sharding.Mesh`` with per-shard top-k + allgather merge over ICI.
"""

__version__ = "0.1.0"

from modern_search_engines_project_tpu.config import Config, DEFAULT_CONFIG

__all__ = ["Config", "DEFAULT_CONFIG", "__version__"]
