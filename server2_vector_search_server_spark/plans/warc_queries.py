"""WARC web-archive ingestion parity queries (SURVEY §2 A-family extension).

The reference ingests uploads (``app.py:160-228``); the 100 TB analog is
crawl ingestion, and WARC is its container format.  ``warc_ingest_manifest``
drives ``sources/warc.py`` end-to-end over REAL spec-correct archive bytes
(built by the module's own serializer, one plain file + one
CommonCrawl-style multi-member-gzip file) and reduces every record to
hashable scalars; the DuckDB oracle is the literal expected manifest with
digests precomputed from the SAME fixture byte definitions, so any drift in
record framing, gzip member resync, chunked transfer decoding, or charset
handling changes the hash.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from server2_vector_search_server_spark.plans.registry import query, scratch_dir
from server2_vector_search_server_spark.sources import warc as W

# --- fixture definition (bytes are what the oracle digests are computed on)

_HTML_A = b"<html><body><h1>Alpha</h1><p>First page &amp; more.</p></body></html>"
_TXT_B = b"Hello chunked transfer world"
_HTML_C = b"<html><body>gone</body></html>"
_TXT_D = "café page".encode("latin-1")     # ISO-8859-1 body
_REQ_A = b"GET /a HTTP/1.1\r\nHost: example.com\r\n\r\n"
_INFO = b"software: spark-graft-fixture\r\n"

_FILE0 = [
    {"warc_type": "warcinfo", "payload": _INFO,
     "content_type": "application/warc-fields"},
    {"warc_type": "request", "target_uri": "http://example.com/a",
     "payload": _REQ_A, "content_type": "application/http;msgtype=request"},
    {"warc_type": "response", "target_uri": "http://example.com/a",
     "payload": W.http_response_bytes(200, "text/html; charset=utf-8", _HTML_A),
     "content_type": "application/http;msgtype=response"},
    {"warc_type": "response", "target_uri": "http://example.com/b",
     "payload": W.http_response_bytes(200, "text/plain", _TXT_B, chunked=True),
     "content_type": "application/http;msgtype=response"},
]

_FILE1 = [
    {"warc_type": "response", "target_uri": "http://example.com/c",
     "payload": W.http_response_bytes(404, "text/html", _HTML_C),
     "content_type": "application/http;msgtype=response"},
    {"warc_type": "revisit", "target_uri": "http://example.com/a",
     "payload": b"", "content_type": "message/http"},
    {"warc_type": "response", "target_uri": "http://example.com/d",
     "payload": W.http_response_bytes(
         200, "text/html; charset=ISO-8859-1", _TXT_D),
     "content_type": "application/http;msgtype=response"},
]


def _md5(b: bytes) -> str:
    return hashlib.md5(b).hexdigest()


def _text_md5(body: bytes, charset: str) -> str:
    """Digest of the decoded text re-encoded utf-8 (the Spark-side form)."""
    return _md5(body.decode(charset).encode("utf-8"))


# expected manifest rows: (fname, seq, type, uri, status, n_bytes,
#                          payload_md5, text_md5)
_EXPECTED = [
    ("crawl0.warc", 0, "warcinfo", "", -1, len(_INFO), _md5(_INFO), None),
    ("crawl0.warc", 1, "request", "http://example.com/a", -1, len(_REQ_A),
     _md5(_REQ_A), None),
    ("crawl0.warc", 2, "response", "http://example.com/a", 200, len(_HTML_A),
     _md5(_HTML_A), _text_md5(_HTML_A, "utf-8")),
    ("crawl0.warc", 3, "response", "http://example.com/b", 200, len(_TXT_B),
     _md5(_TXT_B), _text_md5(_TXT_B, "utf-8")),
    ("crawl1.warc.gz", 0, "response", "http://example.com/c", 404,
     len(_HTML_C), _md5(_HTML_C), _text_md5(_HTML_C, "utf-8")),
    ("crawl1.warc.gz", 1, "revisit", "http://example.com/a", -1, 0,
     _md5(b""), None),
    ("crawl1.warc.gz", 2, "response", "http://example.com/d", 200,
     len(_TXT_D), _md5(_TXT_D), _text_md5(_TXT_D, "iso-8859-1")),
]


def _oracle_sql() -> str:
    rows = []
    for fname, seq, typ, uri, status, n, pm, tm in _EXPECTED:
        tmlit = "NULL" if tm is None else f"'{tm}'"
        rows.append(
            f"('{fname}', CAST({seq} AS BIGINT), '{typ}', '{uri}', "
            f"{status}, CAST({n} AS BIGINT), '{pm}', {tmlit})")
    return (
        "SELECT * FROM (VALUES\n  " + ",\n  ".join(rows) + "\n) AS t(fname, "
        "record_seq, warc_type, target_uri, http_status, n_bytes, "
        "payload_md5, text_md5)\nORDER BY fname, record_seq")


def write_warc_fixture(root: str) -> str:
    """Write the two fixture archives under ``root``; returns ``root``."""
    with open(os.path.join(root, "crawl0.warc"), "wb") as f:
        f.write(W.build_warc_bytes(_FILE0))
    with open(os.path.join(root, "crawl1.warc.gz"), "wb") as f:
        f.write(W.build_warc_bytes(_FILE1, gzip_members=True))
    return root


@query(
    "warc_ingest_manifest",
    survey="A-ext(WARC crawl source: record framing + multi-member gzip + "
           "chunked HTTP decode + charset decode, on real archive bytes)",
    oracle=_oracle_sql(),
)
def warc_ingest_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse one plain and one CommonCrawl-style (gzip-per-record) archive
    through the distributed WARC source and manifest every record: type,
    target URI, HTTP status, transfer-decoded body length + digest, and the
    charset-decoded text digest for text/* responses.  Exercises all four
    hard paths at once — header folding-free framing by Content-Length,
    gzip member resynchronisation, chunked transfer decoding (crawl0 seq 3),
    and ISO-8859-1 charset decode (crawl1 seq 2)."""
    root = write_warc_fixture(scratch_dir("warc_fixture_"))
    files = W.parse_warc(
        spark.read.format("binaryFile").load(root))
    text = W.decode_text_payload(F.col("payload"), F.col("http_content_type"))
    return (files
            .select(
                F.element_at(F.split("warc_path", "/"), -1).alias("fname"),
                "record_seq", "warc_type",
                F.coalesce("target_uri", F.lit("")).alias("target_uri"),
                F.coalesce("http_status", F.lit(-1)).alias("http_status"),
                F.length("payload").cast("long").alias("n_bytes"),
                F.md5("payload").alias("payload_md5"),
                F.md5(F.encode(text, "UTF-8")).alias("text_md5"))
            .orderBy("fname", "record_seq"))


# ---------------------------------------------------------------------------
# the composed crawl-curation pipeline: WARC -> HTML text -> canonical URL
# -> exact dedup.  One query running the whole CommonCrawl front half.

def _page(title: str, body: str) -> bytes:
    return (f"<html><head><title>t</title></head><body><h1>{title}</h1>"
            f"<p>{body}</p></body></html>").encode()


def _stripped(title: str, body: str) -> str:
    """What ``strip_html`` recovers from ``_page``: title line + body line
    (title block dies, block closers become newlines, tags/whitespace
    collapse) — stated directly, the web_strip_html_roundtrip contract."""
    return f"{title}\n{body}"


_CRAWL_PAGES = [
    # (file, uri, status, ctype, title, body) — two exact-duplicate bodies
    # at different hosts, one messy URL, one 404, one non-HTML.
    (0, "http://a.example.com/p1", 200, "text/html; charset=utf-8",
     "Alpha One", "alpha body words here"),
    (0, "HTTP://A.Example.COM:80/p2?utm_source=z&x=1", 200, "text/html",
     "Beta Two", "beta body words"),
    (0, "http://a.example.com/p3", 404, "text/html", "Gone", "nope"),
    (1, "http://b.example.com/q1", 200, "text/html",
     "Alpha One", "alpha body words here"),          # dup of /p1
    (1, "http://b.example.com/q2", 200, "text/html",
     "Gamma Three", "gamma unique body"),
]


def _crawl_expected() -> list[tuple[str, int, str, int]]:
    """(kept_url, n_chars, text_md5, n_dupes) — the hand-derived result of
    the full pipeline over ``_CRAWL_PAGES``."""
    rows = []
    for url, title, body, dupes in [
            ("http://a.example.com/p1", "Alpha One",
             "alpha body words here", 2),
            ("http://a.example.com/p2?x=1", "Beta Two",
             "beta body words", 1),
            ("http://b.example.com/q2", "Gamma Three",
             "gamma unique body", 1)]:
        text = _stripped(title, body)
        rows.append((url, len(text),
                     hashlib.md5(text.encode()).hexdigest(), dupes))
    return sorted(rows)


def _crawl_oracle() -> str:
    rows = ",\n      ".join(
        f"('{u}', CAST({n} AS BIGINT), '{m}', CAST({d} AS BIGINT))"
        for u, n, m, d in _crawl_expected())
    return ("SELECT * FROM (VALUES\n      " + rows + "\n    ) AS t(url, "
            "n_chars, text_md5, n_dupes) ORDER BY url")


@query(
    "web_crawl_curation_e2e",
    survey="A-ext+web curation composed (the CommonCrawl front half in one "
           "plan: WARC parse -> status/type gate -> charset decode -> HTML "
           "strip -> URL normalize -> exact text dedup keep-min-URL)",
    oracle=_crawl_oracle(),
)
def web_crawl_curation_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole crawl-ingestion front half as ONE composed plan, the way a
    RefinedWeb/C4-style user would actually run this engine: parse real
    WARC bytes (one plain file, one gzip-per-record file with a chunked
    response), keep only 200 text/html responses, decode, strip markup,
    normalize the URL (case, default port, tracking params), then exact-
    dedup on the stripped text keeping the smallest canonical URL per
    digest.  The oracle is the hand-derived 3-row manifest — the 404, the
    text/plain response, and the cross-host duplicate must all vanish, and
    the messy URL must surface in canonical form.  Scale shape: parse and
    strip are one mapInPandas + projection stage (bytes never shuffle);
    the only shuffle is the dedup groupBy on the text digest — the
    dedup_exact shape."""
    from server2_vector_search_server_spark.operators.web import (
        normalize_url,
        strip_html,
    )

    root = scratch_dir("warc_crawl_")
    for fi, fname, gz in [(0, "crawl0.warc", False),
                          (1, "crawl1.warc.gz", True)]:
        records = []
        for f, uri, status, ctype, title, body in _CRAWL_PAGES:
            if f != fi:
                continue
            records.append({
                "warc_type": "response", "target_uri": uri,
                "payload": W.http_response_bytes(
                    status, ctype, _page(title, body),
                    chunked=(fname.endswith(".gz"))),
                "content_type": "application/http;msgtype=response"})
        if fi == 0:
            records.append({"warc_type": "warcinfo", "payload": _INFO,
                            "content_type": "application/warc-fields"})
        else:
            records.append({
                "warc_type": "response",
                "target_uri": "http://a.example.com/p4",
                "payload": W.http_response_bytes(
                    200, "text/plain", b"plain text, not html"),
                "content_type": "application/http;msgtype=response"})
        with open(os.path.join(root, fname), "wb") as fh:
            fh.write(W.build_warc_bytes(records, gzip_members=gz))

    recs = W.parse_warc(spark.read.format("binaryFile").load(root))
    html = (recs
            .filter((F.col("warc_type") == "response")
                    & (F.col("http_status") == 200)
                    & F.lower(F.col("http_content_type"))
                    .startswith("text/html")))
    text = strip_html(W.decode_text_payload(
        F.col("payload"), F.col("http_content_type")))
    pages = html.select(
        normalize_url(F.col("target_uri")).alias("url"),
        text.alias("text"))
    return (pages
            .groupBy(F.md5(F.encode("text", "UTF-8")).alias("text_md5"),
                     F.length("text").cast("long").alias("n_chars"))
            .agg(F.min("url").alias("url"),
                 F.count("*").alias("n_dupes"))
            .select("url", "n_chars", "text_md5", "n_dupes")
            .orderBy("url"))
