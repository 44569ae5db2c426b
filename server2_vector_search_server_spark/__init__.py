"""PySpark-native analytics engine with the capabilities of the reference
vector-search server (``5-final-project/Server2-vector_search_server``).

Brand-new Spark-first design — NOT a port. The reference (FastAPI + LangChain +
ChromaDB, see ``/root/reference``) defines WHAT to compute: a chunked-document
data model, filtered k-NN search under an exact score contract
(``score = 1 - squared_l2(q, v)``, ``app.py:418``), catalog aggregations,
dedup-by-name, cascading deletes, and an ingestion pipeline
(parse → sentence-split → greedy chunk-merge → embed → store). This package
re-expresses all of it as DataFrame/SQL logical plans that Catalyst + Tungsten
optimize, plus the LLM-data-pipeline operators (near-dup dedup, ANN similarity
search, text analytics, multimodal column plumbing) a 100 TB training-data
pipeline needs.

Layout:
    session      SparkSession builder tuned for local[32] test / cluster prod
    config       engine constants mirroring the reference's observable knobs
    schema       the core ``chunks`` table schema (SURVEY.md §1.3)
    functions/   scalar/vector/text column expressions + the Chroma filter dialect
    operators/   knn, catalog, dedup, ann, chunking, text analytics
    sources/     document sources (binary/text/zip), chunk store read/write/delete
    streaming/   Structured Streaming ingestion + event-time windows
    plans/       high-level query facades replicating endpoint semantics
"""

__version__ = "0.1.0"
