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
