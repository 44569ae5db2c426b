"""Semi-structured VARIANT queries (Spark 4 ``parse_json`` /
``variant_get``) — the modern engine path for the reference's
metadata-bearing JSON columns.

The reference stores free-form chunk/request metadata as JSON-ish dicts
(Chroma metadata dicts, FastAPI request bodies); SURVEY.md §2.H records the
JSON-extension surface. ``events_json_props`` covers the classic
``get_json_object`` string path; these queries cover the typed VariantType
path Spark 4 added for exactly this workload: parse once into the binary
variant encoding, shred typed fields with ``variant_get`` path expressions
(nested objects, array indexing), aggregate the shredded columns.

At 100 TB the variant encoding is the right default for semi-structured
columns: parsing happens once at ingest, ``variant_get`` is a JVM-side
binary probe (no per-row JSON re-parse, no Python), and Parquet variant
shredding keeps scans columnar. The DuckDB oracle reproduces the same
shred with its JSON functions over the identical constructed document.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from server2_vector_search_server_spark.plans.registry import query, tbl

# A nested JSON document built deterministically from events columns, so the
# shred exercises: top-level scalar, nested-object fields, array indexing.
_SQL_VJ = """
      '{"k":' || CAST(json_extract(props, '$.k') AS VARCHAR)
      || ',"u":{"id":' || CAST(user_id AS VARCHAR)
      || ',"t":"' || event_type || '"}'
      || ',"vals":[' || CAST(event_id % 5 AS VARCHAR)
      || ',' || CAST(event_id % 3 AS VARCHAR) || ']}'
"""


@query(
    "events_variant_shred",
    survey="H(VariantType: parse_json → variant_get typed shred — nested "
           "object + array paths, Spark 4 semi-structured engine path)",
    oracle=f"""
    WITH enriched AS (
      SELECT event_id, {_SQL_VJ} AS vj
      FROM events WHERE event_id < 20000),
    shred AS (
      SELECT CAST(json_extract(vj, '$.k') AS INTEGER) AS k,
             CAST(json_extract(vj, '$.u.id') AS BIGINT) AS uid,
             json_extract_string(vj, '$.u.t') AS event_type,
             CAST(json_extract(vj, '$.vals[0]') AS BIGINT) AS v0,
             CAST(json_extract(vj, '$.vals[1]') AS BIGINT) AS v1
      FROM enriched)
    SELECT k % 10 AS k_mod, event_type,
           COUNT(*) AS n,
           CAST(SUM(uid) AS BIGINT) AS sum_uid,
           CAST(SUM(v0 * 10 + v1) AS BIGINT) AS sum_vals
    FROM shred
    GROUP BY k_mod, event_type
    ORDER BY k_mod, event_type
    """,
)
def events_variant_shred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse a nested JSON document into a VARIANT once, then shred typed
    fields through ``variant_get`` path expressions — top-level scalar
    (``$.k``), nested object members (``$.u.id``, ``$.u.t``), and array
    elements (``$.vals[0]``). The aggregation runs entirely on the shredded
    typed columns; the variant probe is JVM-side binary access, not JSON
    re-parsing."""
    events = tbl(spark, sf_dir, "events").filter(F.col("event_id") < 20000)
    vj = F.concat(
        F.lit('{"k":'), F.get_json_object("props", "$.k"),
        F.lit(',"u":{"id":'), F.col("user_id").cast("string"),
        F.lit(',"t":"'), F.col("event_type"), F.lit('"}'),
        F.lit(',"vals":['), (F.col("event_id") % 5).cast("string"),
        F.lit(","), (F.col("event_id") % 3).cast("string"), F.lit("]}"))
    v = F.parse_json(vj)
    shred = events.select(
        F.variant_get(v, "$.k", "int").alias("k"),
        F.variant_get(v, "$.u.id", "bigint").alias("uid"),
        F.variant_get(v, "$.u.t", "string").alias("event_type"),
        F.variant_get(v, "$.vals[0]", "bigint").alias("v0"),
        F.variant_get(v, "$.vals[1]", "bigint").alias("v1"))
    return (shred.groupBy((F.col("k") % 10).alias("k_mod"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("uid").cast("long").alias("sum_uid"),
                 (F.sum(F.col("v0") * 10 + F.col("v1"))).cast("long")
                 .alias("sum_vals"))
            .orderBy("k_mod", "event_type"))


@query(
    "events_variant_null_and_types",
    survey="H(VariantType: try_parse_json error tolerance, "
           "is_variant_null vs missing-path semantics, schema_of_variant)",
    oracle="""
    WITH docs AS (
      SELECT event_id,
             CASE event_id % 4
               WHEN 0 THEN '{"a": 1, "b": null}'
               WHEN 1 THEN '{"a": "x"}'
               WHEN 2 THEN 'not json at all'
               ELSE '{"a": 2.5, "b": [1,2]}'
             END AS j
      FROM events WHERE event_id < 8000),
    probed AS (
      -- json_type: 'NULL' for an explicit JSON null, SQL NULL for a
      -- missing path — the same three-way split the variant side probes.
      -- TRY_CAST to JSON (NULL for unparseable) rather than a
      -- json_valid() CASE guard: DuckDB's vectorized expression
      -- evaluation can run a CASE branch's json_type() over rows the
      -- guard excluded and throw Malformed JSON — fired at the 10x
      -- corpus's multi-file layout, not at single-file sf0.01
      SELECT event_id % 4 AS bucket,
             CASE WHEN jv IS NOT NULL THEN 1 ELSE 0 END AS parsed,
             CASE WHEN json_type(jv, '$.b') IS NOT NULL
                  AND json_type(jv, '$.b') != 'NULL' THEN 1 ELSE 0
             END AS has_b,
             CASE WHEN json_type(jv, '$.b') = 'NULL'
                  THEN 1 ELSE 0 END AS b_is_json_null
      FROM (SELECT event_id, TRY_CAST(j AS JSON) AS jv FROM docs))
    SELECT bucket, COUNT(*) AS n,
           CAST(SUM(parsed) AS BIGINT) AS n_parsed,
           CAST(SUM(has_b) AS BIGINT) AS n_has_b,
           CAST(SUM(b_is_json_null) AS BIGINT) AS n_b_null
    FROM probed
    GROUP BY bucket
    ORDER BY bucket
    """,
)
def events_variant_null_and_types(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """The three-way distinction a semi-structured engine must preserve:
    unparseable document (``try_parse_json`` → NULL variant), missing path
    (``variant_get`` → NULL), and an explicit JSON null at the path
    (``is_variant_null`` → true). Counted per bucket of a 4-way fixture mix
    so each branch provably fires."""
    events = tbl(spark, sf_dir, "events").filter(F.col("event_id") < 8000)
    j = (F.when(F.col("event_id") % 4 == 0, '{"a": 1, "b": null}')
         .when(F.col("event_id") % 4 == 1, '{"a": "x"}')
         .when(F.col("event_id") % 4 == 2, "not json at all")
         .otherwise('{"a": 2.5, "b": [1,2]}'))
    v = F.try_parse_json(j)
    b = F.try_variant_get(v, "$.b", "variant")
    probed = events.select(
        (F.col("event_id") % 4).alias("bucket"),
        F.when(v.isNotNull(), 1).otherwise(0).alias("parsed"),
        F.when(b.isNotNull() & ~F.is_variant_null(b), 1).otherwise(0)
        .alias("has_b"),
        F.when(b.isNotNull() & F.is_variant_null(b), 1).otherwise(0)
        .alias("b_is_json_null"))
    return (probed.groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("parsed").cast("long").alias("n_parsed"),
                 F.sum("has_b").cast("long").alias("n_has_b"),
                 F.sum("b_is_json_null").cast("long").alias("n_b_null"))
            .orderBy("bucket"))
