"""Catalog / existence / dedup / scalar-function query surface over the
``documents`` corpus (SURVEY.md §2 D1/D2/D4/D5, B4/B5, C3, G, H1-H3/H7/H10/H11).

The ``documents`` fixture stands in for the chunk corpus: ``source`` plays the
``doc_name``/collection role, ``doc_id`` the chunk grouping key (FIXTURES.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from server2_vector_search_server_spark.operators import catalog
from server2_vector_search_server_spark.plans.registry import query, tbl


@query(
    "list_documents",
    survey="D1",
    oracle="""
    SELECT source, MIN(doc_id) AS first_doc_id,
           COUNT(*) AS n_docs, MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
    FROM documents GROUP BY source
    """,
)
def list_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1 /list-documents: distinct-by-key catalog scan (app.py:447-484),
    deterministic aggregates instead of the reference's first-seen dict."""
    docs = tbl(spark, sf_dir, "documents")
    return (
        docs.groupBy("source")
        .agg(F.min("doc_id").alias("first_doc_id"),
             F.count(F.lit(1)).alias("n_docs"),
             F.min("n_chars").alias("min_chars"),
             F.max("n_chars").alias("max_chars"))
    )


@query(
    "group_documents_ui",
    survey="D2",
    oracle="""
    SELECT source, array_to_string(list_sort(list(doc_id)), ',') AS doc_ids,
           COUNT(*) AS n_docs
    FROM documents WHERE lang = 'es' GROUP BY source
    """,
)
def group_documents_ui(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D2 /documents_ui: group-and-collect per key (app.py:549-577);
    sort_array for deterministic collection order, serialized to a CSV
    string so the grading canonicalizer (pandas factorize, which cannot
    hash list cells) compares it as a scalar."""
    docs = tbl(spark, sf_dir, "documents").filter(F.col("lang") == "es")
    return (
        docs.groupBy("source")
        .agg(F.array_join(
                F.transform(F.sort_array(F.collect_list("doc_id")),
                            lambda x: x.cast("string")),
                ",").alias("doc_ids"),
             F.count(F.lit(1)).alias("n_docs"))
    )


@query(
    "document_exists",
    survey="B4,B5",
    oracle="""
    SELECT (COUNT(*) > 0) AS doc_exists FROM documents
    WHERE source = 'src3' AND n_chars > 100
    """,
)
def document_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B4/B5 existence probe (vector_store.py:56-89) as one aggregate; the
    where-dict goes through the Chroma dialect translator."""
    docs = tbl(spark, sf_dir, "documents")
    return catalog.document_exists(
        docs, {"$and": [{"source": "src3"}, {"n_chars": {"$gt": 100}}]})


@query(
    "dedup_new_uploads",
    survey="C3",
    oracle="""
    SELECT d.doc_id, d.source FROM documents d
    WHERE d.doc_id >= 400 AND NOT EXISTS (
        SELECT 1 FROM documents e WHERE e.doc_id < 400 AND e.text = d.text)
    ORDER BY d.doc_id
    """,
)
def dedup_new_uploads(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C3 upload dedup guard (app.py:152-157) as a LEFT ANTI join: batch
    'uploads' (doc_id >= 400) against the existing corpus on content."""
    docs = tbl(spark, sf_dir, "documents")
    new = docs.filter(F.col("doc_id") >= 400)
    existing = docs.filter(F.col("doc_id") < 400)
    return (
        catalog.dedup_new_documents(new, existing, on="text")
        .select("doc_id", "source").orderBy("doc_id")
    )


@query(
    "master_union_collections",
    survey="G",
    oracle="""
    SELECT lang AS collection, COUNT(*) AS n_docs,
           MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
    FROM documents GROUP BY lang
    """,
)
def master_union_collections(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G: master == union of per-collection partitions (vector_store.py:115-131
    dual-write, re-expressed). Built as an explicit unionByName of one frame
    per 'collection' (lang), then aggregated — proving the union view carries
    exactly the partitioned data."""
    docs = tbl(spark, sf_dir, "documents")
    langs = [r["lang"] for r in docs.select("lang").distinct().collect()]
    parts = [docs.filter(F.col("lang") == lang) for lang in sorted(langs)]
    union = catalog.union_collections(parts)
    return (
        union.groupBy(F.col("lang").alias("collection"))
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.min("doc_id").alias("min_id"),
             F.max("doc_id").alias("max_id"))
    )


@query(
    "scalar_functions_path",
    survey="H1,H2,H3,H7,H10,H11",
    oracle="""
    SELECT doc_id,
           concat_ws('/', source, 'doc_' || CAST(doc_id AS VARCHAR) || '.TXT')
               AS s3_key,
           lower(regexp_extract(
               concat_ws('/', source, 'doc_' || CAST(doc_id AS VARCHAR) || '.TXT'),
               '(\\.[^.]+)$', 1)) AS ext,
           length(text) AS text_len,
           substring(text, 1, 100) AS preview,
           ROUND(1.0 - CAST(n_chars AS DOUBLE) / 1000, 6) AS sim_analog
    FROM documents WHERE doc_id < 50 ORDER BY doc_id
    """,
)
def scalar_functions_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's scalar-function surface in one projection: S3 key
    templating (H10, app.py:242), extension extract+lower (H3,
    document_processor.py:42,111), length (H7), message truncation (H11,
    app.py:237), similarity-from-distance shape (H2, app.py:418), keyword
    concat (H1, app.py:373)."""
    docs = tbl(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    s3_key = F.concat_ws(
        "/", F.col("source"),
        F.concat(F.lit("doc_"), F.col("doc_id").cast("string"), F.lit(".TXT")))
    return docs.select(
        "doc_id",
        s3_key.alias("s3_key"),
        F.lower(F.regexp_extract(s3_key, r"(\.[^.]+)$", 1)).alias("ext"),
        F.length("text").alias("text_len"),
        F.substring("text", 1, 100).alias("preview"),
        F.round(F.lit(1.0) - F.col("n_chars").cast("double") / 1000, 6)
            .alias("sim_analog"),
    ).orderBy("doc_id")


@query(
    "bool_rollup_statuses",
    survey="D4,D5",
    oracle="""
    SELECT lang,
           COUNT(*) AS n_files,
           bool_and(n_chars > 50) AS all_success,
           bool_or(n_chars > 400) AS any_large,
           COUNT(*) FILTER (WHERE n_chars > 400) AS n_large
    FROM documents GROUP BY lang
    """,
)
def bool_rollup_statuses(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D5: the ZIP batch-status rollup (all/any over per-file statuses,
    app.py:284-294) as grouped boolean aggregates + D4 counts."""
    docs = tbl(spark, sf_dir, "documents")
    return (
        docs.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_files"),
             F.bool_and(F.col("n_chars") > 50).alias("all_success"),
             F.bool_or(F.col("n_chars") > 400).alias("any_large"),
             F.count(F.when(F.col("n_chars") > 400, 1)).alias("n_large"))
    )


@query(
    "list_documents_keyset_page",
    survey="D1-extension(keyset pagination: the catalog listing page the "
           "reference UI would need at scale — seek predicate + LIMIT, "
           "never OFFSET)",
    oracle="""
    SELECT doc_id, source, n_chars
    FROM documents
    WHERE (source, doc_id) > ('src12', 60)
    ORDER BY source, doc_id
    LIMIT 15
    """,
)
def list_documents_keyset_page(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Page 'after (source='src12', doc_id=60)' via a KEYSET (seek) predicate.
    OFFSET-based paging is O(offset) per page — page 10 000 of a 100 TB
    catalog scans and discards 10 000 pages; the seek predicate is pushed
    to the scan (row-group min/max pruning on sorted layout) and every
    page costs the same. The tuple comparison is the standard composite
    cursor; Spark expresses it as the equivalent disjunction, which
    Catalyst still pushes down per-column."""
    docs = tbl(spark, sf_dir, "documents")
    after_source, after_id = "src12", 60
    seek = (F.col("source") > after_source) | (
        (F.col("source") == after_source) & (F.col("doc_id") > after_id))
    return (docs.filter(seek)
            .select("doc_id", "source", "n_chars")
            .orderBy("source", "doc_id")
            .limit(15))
