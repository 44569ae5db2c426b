"""Web-curation parity queries: HTML stripping and URL normalization/dedup
(``operators/web.py`` — the C4/RefinedWeb pre-text stages).

Oracle strategy avoids regex-dialect coupling entirely:

* the HTML query is a ROUND-TRIP — documents are wrapped in deterministic
  markup (tags, a style block, a comment, an entity) and the stripper must
  recover a formula the oracle states directly;
* the URL query normalizes MESSY synthesized URLs whose canonical form is
  an arithmetic formula of ``doc_id`` — the oracle builds the expectation,
  Spark must reach it through ``normalize_url``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from server2_vector_search_server_spark.operators.web import (
    normalize_url,
    strip_html,
    url_domain,
)
from server2_vector_search_server_spark.plans.registry import query, tbl

# Docs whose text survives the stripper's whitespace collapse verbatim:
# single-spaced, no tabs/newlines, no entity/tag characters.
_PLAIN_TEXT_PRED = (
    "doc_id < 200 AND text NOT LIKE '%  %' AND text NOT LIKE '%&%' "
    "AND text NOT LIKE '%<%' AND text NOT LIKE '%>%' "
    "AND text NOT LIKE '%' || chr(9) || '%' "
    "AND text NOT LIKE '%' || chr(10) || '%'")


@query(
    "web_strip_html_roundtrip",
    survey="web curation(HTML->text stripping: tags, script/style blocks, "
           "comments, entity decode — exact round-trip)",
    oracle=f"""
    SELECT doc_id,
           md5('A&B Title ' || CAST(doc_id AS VARCHAR) || chr(10) || text)
             AS stripped_md5
    FROM documents
    WHERE {_PLAIN_TEXT_PRED}
    ORDER BY doc_id
    """,
)
def web_strip_html_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wrap each document in realistic markup — a style block that must die
    wholesale, an HTML comment, a title with an ``&amp;`` entity, block tags
    whose closers become newlines — and strip it back. The oracle states the
    recovered text directly (title line + newline + original text), so any
    stripper regression (leaked tag, dropped paragraph boundary, undecoded
    entity, mangled whitespace) changes the hash."""
    docs = (tbl(spark, sf_dir, "documents")
            .filter(F.expr(_PLAIN_TEXT_PRED)))
    html = F.concat(
        F.lit("<html><head><title>x</title>"
              "<style>p{color:red}</style></head>\n<body>"
              "<h1>A&amp;B Title "),
        F.col("doc_id").cast("string"),
        F.lit("</h1><!-- boilerplate --><p>"),
        F.col("text"),
        F.lit("</p><script>var x=1;</script></body></html>"))
    return (docs.select("doc_id",
                        F.md5(strip_html(html)).alias("stripped_md5"))
            .orderBy("doc_id"))


@query(
    "web_url_dedup_domains",
    survey="web curation(URL normalization + URL-level dedup + per-domain "
           "rollup — the RefinedWeb URL-filter shape)",
    oracle="""
    WITH canon AS (
      SELECT doc_id,
             'https://www.site' || CAST(doc_id % 7 AS VARCHAR)
               || '.example.com/p/' || CAST(doc_id AS VARCHAR)
               || '?id=' || CAST(doc_id AS VARCHAR) AS url,
             'site' || CAST(doc_id % 7 AS VARCHAR) || '.example.com'
               AS domain
      FROM documents WHERE doc_id < 300)
    SELECT domain,
           CAST(2 * COUNT(*) AS BIGINT) AS n_urls,
           CAST(COUNT(*) AS BIGINT) AS n_unique_urls
    FROM canon
    GROUP BY domain
    ORDER BY domain
    """,
)
def web_url_dedup_domains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each doc contributes TWO url variants — a messy one (uppercase
    authority, default port, tracking params, trailing slash on a third of
    paths, fragment) and its canonical twin. ``normalize_url`` must collapse
    both to the same key, so per-domain ``n_unique_urls`` is exactly half of
    ``n_urls``; the oracle builds the canonical forms arithmetically. The
    rollup is the per-domain quota/blocklist aggregation, one shuffle on the
    domain key."""
    docs = tbl(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    sid = (F.col("doc_id") % 7).cast("string")
    did = F.col("doc_id").cast("string")
    messy = F.concat(
        F.lit("HTTPS://WWW.Site"), sid, F.lit(".Example.COM:443/p/"), did,
        F.when(F.col("doc_id") % 3 == 0, F.lit("/")).otherwise(F.lit("")),
        F.lit("?utm_source=x&id="), did, F.lit("&utm_campaign=c#frag"))
    clean = F.concat(
        F.lit("https://www.site"), sid, F.lit(".example.com/p/"), did,
        F.lit("?id="), did)
    urls = (docs.select("doc_id",
                        F.explode(F.array(messy, clean)).alias("raw_url"))
            .withColumn("url", normalize_url(F.col("raw_url"))))
    return (urls.withColumn("domain", url_domain(F.col("url")))
            .groupBy("domain")
            .agg(F.count(F.lit(1)).cast("long").alias("n_urls"),
                 F.count_distinct("url").cast("long")
                 .alias("n_unique_urls"))
            .orderBy("domain"))
