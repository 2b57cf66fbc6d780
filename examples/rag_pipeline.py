"""RAG: ingest a directory of markdown, then adaptive retrieval.

Run: python examples/rag_pipeline.py /path/to/docs
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))   # run from anywhere

import sys
import tempfile
import os

from kektordb_tpu.engine import Engine, EngineConfig
from kektordb_tpu.services.embeddings import select_embedder
from kektordb_tpu.services.rag import (AdaptiveRetriever, PipelineConfig,
                                       RAGService, VectorizerService)

docs_dir = sys.argv[1] if len(sys.argv) > 1 else None
if docs_dir is None:
    docs_dir = tempfile.mkdtemp()
    with open(os.path.join(docs_dir, "tpu.md"), "w") as f:
        f.write("# TPUs\n\nTPUs have a systolic MXU array.\n\n"
                "## Memory\n\nHBM feeds VMEM which feeds the compute units.")

engine = Engine(EngineConfig(start_background=False)).open()
embedder = select_embedder("auto")

vec = VectorizerService(engine, embedder, [PipelineConfig(
    name="docs", path=docs_dir, index="kb", splitter="markdown",
    glob="*.md")])
print("ingested:", vec.trigger("docs"))

rag = RAGService(engine, embedder, vec)
out = rag.retrieve("docs", "what feeds the compute units", k=3,
                   include_provenance=True)
print("retrieved:", out["response"][:200])

adaptive = AdaptiveRetriever(engine, embedder).retrieve(
    "kb", "tpu memory hierarchy", token_budget=500)
print("adaptive chunks:", adaptive["chunks_used"],
      "tokens:", adaptive["total_tokens"])
engine.close()
