"""Columnar/text format-source roundtrips: CSV, JSONL, ORC, XML.

The reference ingests .txt/.md/.pdf/.zip uploads; real corpora also arrive
as delimited text, newline-delimited JSON, columnar ORC, and XML feeds.
All four readers here are Spark-NATIVE (no Python in the scan; CSV/JSON/
ORC/XML all split and push down in the JVM), so at 100 TB these are pure
scan-bandwidth paths — the queries exist to pin the correctness traps each
format hides:

* CSV: quoted fields containing the delimiter, embedded newlines
  (multiLine), doubled-quote escapes, and a custom null token;
* JSONL: nested structs, arrays, explicit-null vs absent field, unicode;
* ORC: full write→read roundtrip of real table data — the oracle reads
  the SAME rows from parquet, so any value drift through the ORC codec
  path breaks the hash;
* XML: attributes vs child elements, entity decode, missing optional
  elements (native rowTag reader, Spark 4).

Fixture bytes are written with plain ``open()`` (CSV/JSONL/XML are
byte-transparent formats) so the reader is parsing REAL files, not
Spark-round-tripped ones.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from server2_vector_search_server_spark.plans.registry import (
    query,
    scratch_dir,
    tbl,
)

# ---------------------------------------------------------------------------
# CSV — the quoting/escape/multiline traps

_CSV_BYTES = (
    'id,name,note,val\n'
    '1,"Smith, Jane","line one\nline two",10.5\n'
    '2,plain,"She said ""hi""",\\N\n'
    '3,"trailing space ",simple,0\n'
    '4,unicode café,"comma, and ""q"" and\nnewline",-3.25\n'
)


@query(
    "csv_source_roundtrip",
    survey="A-ext(native CSV source: quoted delimiters, embedded newlines, "
           "doubled-quote escapes, custom null token)",
    oracle="""
    SELECT * FROM (VALUES
      (CAST(1 AS BIGINT), 'Smith, Jane',
       'line one' || chr(10) || 'line two', 10.5),
      (CAST(2 AS BIGINT), 'plain', 'She said "hi"', CAST(NULL AS DOUBLE)),
      (CAST(3 AS BIGINT), 'trailing space ', 'simple', 0.0),
      (CAST(4 AS BIGINT), 'unicode café',
       'comma, and "q" and' || chr(10) || 'newline', -3.25)
    ) AS t(id, name, note, val) ORDER BY id
    """,
)
def csv_source_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse a REAL csv file (written byte-for-byte, not Spark-emitted)
    whose fields exercise every classic trap: delimiter inside quotes,
    newline inside quotes (multiLine), RFC-4180 doubled-quote escape, a
    ``\\N`` null token, preserved trailing space inside quotes, unicode.
    Explicit schema — type inference is a non-goal (it requires an extra
    pass and is nondeterministic across samples at scale).  Scale: the
    JVM CSV reader splits by file (multiLine) or by range; one fixture
    file here, but the code path is the production one."""
    root = scratch_dir("csv_fixture_")
    with open(os.path.join(root, "data.csv"), "w", encoding="utf-8") as fh:
        fh.write(_CSV_BYTES)
    return (spark.read.csv(
        root, header=True, multiLine=True, escape='"', nullValue="\\N",
        schema="id long, name string, note string, val double")
        .orderBy("id"))


# ---------------------------------------------------------------------------
# JSONL — nested structs, arrays, null-vs-absent

_JSONL_BYTES = (
    '{"id": 1, "user": {"name": "ana", "tags": ["a", "b"]}, "score": 1.5}\n'
    '{"id": 2, "user": {"name": "bo", "tags": []}, "score": null}\n'
    '{"id": 3, "user": {"name": "cé", "tags": ["x"]}}\n'
    '{"id": 4, "user": null, "score": -0.5}\n'
)


@query(
    "jsonl_source_roundtrip",
    survey="A-ext(native JSONL source: nested structs, arrays, "
           "explicit-null vs absent field, unicode)",
    oracle="""
    SELECT * FROM (VALUES
      (CAST(1 AS BIGINT), 'ana', CAST(2 AS BIGINT), 'a,b', 1.5, FALSE),
      (CAST(2 AS BIGINT), 'bo', CAST(0 AS BIGINT), '', CAST(NULL AS DOUBLE),
       FALSE),
      (CAST(3 AS BIGINT), 'cé', CAST(1 AS BIGINT), 'x',
       CAST(NULL AS DOUBLE), FALSE),
      (CAST(4 AS BIGINT), CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT),
       CAST(NULL AS VARCHAR), -0.5, TRUE)
    ) AS t(id, user_name, n_tags, tags_csv, score, user_missing)
    ORDER BY id
    """,
)
def jsonl_source_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse REAL newline-delimited JSON with an explicit schema: nested
    struct access, array size/join, the three nullability shapes (field
    explicitly null, field absent, whole struct null — all must surface
    as NULL, and the struct-null case is distinguishable via the parent).
    Scale: the JVM JSON reader is line-splittable — JSONL is THE format
    whose parallelism is free; schema-on-read with an explicit schema
    avoids the inference pass entirely."""
    root = scratch_dir("jsonl_fixture_")
    with open(os.path.join(root, "data.jsonl"), "w", encoding="utf-8") as fh:
        fh.write(_JSONL_BYTES)
    df = spark.read.json(
        root,
        schema=("id long, user struct<name: string, tags: array<string>>, "
                "score double"))
    return (df.select(
        "id",
        F.col("user.name").alias("user_name"),
        F.size("user.tags").cast("long").alias("n_tags"),
        F.array_join("user.tags", ",").alias("tags_csv"),
        "score",
        F.col("user").isNull().alias("user_missing"))
        .orderBy("id"))


# ---------------------------------------------------------------------------
# ORC — real-data roundtrip against the parquet truth

_ORC_DOCS = 120


@query(
    "orc_source_roundtrip",
    survey="A-ext(native ORC sink+source: write real table rows to "
           "lang-partitioned ORC, read back, aggregate — oracle reads the "
           "same rows from parquet, so codec-path drift breaks the hash)",
    oracle=f"""
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           md5(string_agg(text, chr(30) ORDER BY doc_id)) AS corpus_md5
    FROM documents WHERE doc_id < {_ORC_DOCS}
    GROUP BY lang ORDER BY lang
    """,
)
def orc_source_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip real document rows through lang-partitioned ORC and
    aggregate from the ORC scan; the oracle computes the same aggregate
    straight from the parquet truth, so any value mutation through the
    ORC writer/reader (encoding, statistics, partition-column rebuild)
    changes the hash — including the text bytes themselves via the
    order-pinned corpus digest.  Scale: ORC is a splittable columnar
    format with predicate pushdown; partitioning by lang makes the
    per-language read partition-pruned (the same layout discipline as
    the parquet store)."""
    root = scratch_dir("orc_fixture_")
    docs = (tbl(spark, sf_dir, "documents")
            .filter(F.col("doc_id") < _ORC_DOCS))
    out = os.path.join(root, "docs_orc")
    docs.write.partitionBy("lang").mode("overwrite").orc(out)
    back = spark.read.orc(out)
    return (back.groupBy("lang")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_chars").alias("sum_chars"),
                 F.md5(F.encode(F.concat_ws(
                     "\x1e", F.transform(
                         F.array_sort(F.collect_list(
                             F.struct("doc_id", "text"))),
                         lambda s: s["text"])), "UTF-8"))
                 .alias("corpus_md5"))
            .orderBy("lang"))


# ---------------------------------------------------------------------------
# XML — attributes, nested elements, entities, optional fields

_XML_BYTES = (
    "<catalog>\n"
    '  <item sku="A1" active="true">'
    "<name>Widget &amp; Co</name><qty>5</qty>"
    "<dims><w>2</w><h>3</h></dims></item>\n"
    '  <item sku="B2" active="false">'
    "<name>café grinder</name><qty>0</qty></item>\n"
    '  <item sku="C3"><name>&lt;tag&gt; maker</name><qty>7</qty>'
    "<dims><w>1</w><h>9</h></dims></item>\n"
    "</catalog>\n"
)


@query(
    "xml_source_roundtrip",
    survey="A-ext(native XML source, Spark 4 rowTag reader: attributes vs "
           "child elements, entity decode, missing optional nested struct)",
    oracle="""
    SELECT * FROM (VALUES
      ('A1', 'true', 'Widget & Co', CAST(5 AS BIGINT), CAST(2 AS BIGINT),
       CAST(3 AS BIGINT)),
      ('B2', 'false', 'café grinder', CAST(0 AS BIGINT),
       CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)),
      ('C3', CAST(NULL AS VARCHAR), '<tag> maker', CAST(7 AS BIGINT),
       CAST(1 AS BIGINT), CAST(9 AS BIGINT))
    ) AS t(sku, active, name, qty, dim_w, dim_h) ORDER BY sku
    """,
)
def xml_source_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse a REAL XML feed with the native rowTag reader: attributes
    (``_sku``, ``_active`` — one absent), child elements, XML entity
    decode (``&amp;``, ``&lt;``), and an optional nested struct that is
    missing on one row.  Explicit schema, same rationale as CSV.  Scale:
    the XML reader splits on the row tag; feeds shard by file like the
    WARC path."""
    root = scratch_dir("xml_fixture_")
    with open(os.path.join(root, "feed.xml"), "w", encoding="utf-8") as fh:
        fh.write(_XML_BYTES)
    df = (spark.read.format("xml")
          .option("rowTag", "item")
          .schema("_sku string, _active boolean, name string, qty long, "
                  "dims struct<w: long, h: long>")
          .load(root))
    return (df.select(
        F.col("_sku").alias("sku"),
        F.col("_active").cast("string").alias("active"),
        "name", "qty",
        F.col("dims.w").alias("dim_w"), F.col("dims.h").alias("dim_h"))
        .orderBy("sku"))
