"""KektorDB-TPU — a TPU-native vector database, temporal knowledge graph and
cognitive-memory engine.

A from-scratch rebuild of the capabilities of KektorDB (reference: sanonone/kektordb,
a single-node Go server) as a batched, array-oriented, SPMD engine on JAX/XLA/Pallas.

Layer map (mirrors reference SURVEY §1, re-architected TPU-first):

  ops/       distance kernels (MXU blocked matmul / Pallas), int8 quantizer, top-k
  index/     HNSW as dense padded device arrays; brute-force oracle
  parallel/  mesh sharding: shard-per-device sub-indexes, all-gather top-k merge
  engine/    orchestration: indexes, KV, knowledge graph, filters, fusion, decay
  text/      analyzers, Porter2/Italian stemmers, BM25, splitters, compressor
  persist/   checkpoint of dense arrays + binary-framed AOF journal (CRC32)
  server/    HTTP REST, MCP stdio, SSE events, auth, metrics
  services/  embedders, LLM clients, RAG pipeline, gardener, compiler, proxy
  client/    Python SDK
"""

__version__ = "0.1.0"
