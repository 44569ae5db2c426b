"""WARC source unit tests: record framing, gzip member resync, chunked
transfer decode, charset decode, truncation surfacing, and the Spark-side
mapInPandas expansion (batching + schema)."""

from __future__ import annotations

import gzip
import hashlib

from server2_vector_search_server_spark.sources import warc as W


def _one(records, **kw):
    return list(W.iter_warc_records(W.build_warc_bytes(records, **kw)))


def test_plain_roundtrip_types_and_payloads():
    recs = _one([
        {"warc_type": "warcinfo", "payload": b"software: x\r\n"},
        {"warc_type": "response", "target_uri": "http://e/x",
         "payload": W.http_response_bytes(200, "text/plain", b"body!")},
    ])
    assert [r["warc_type"] for r in recs] == ["warcinfo", "response"]
    assert recs[0]["payload"] == b"software: x\r\n"
    assert recs[1]["http_status"] == 200
    assert recs[1]["payload"] == b"body!"
    assert recs[1]["target_uri"] == "http://e/x"
    assert not recs[0]["truncated"] and not recs[1]["truncated"]


def test_gzip_members_resync():
    """Each record its own gzip member (CommonCrawl layout): the cursor
    must restart the decompressor at every member boundary."""
    records = [
        {"warc_type": "response", "target_uri": f"http://e/{i}",
         "payload": W.http_response_bytes(
             200, "text/plain", f"payload-{i}".encode() * (i + 1))}
        for i in range(5)
    ]
    recs = _one(records, gzip_members=True)
    assert len(recs) == 5
    assert [r["payload"] for r in recs] == [
        f"payload-{i}".encode() * (i + 1) for i in range(5)]


def test_single_member_gzip_whole_file():
    """A whole-file gzip (not per-record members) must also parse."""
    blob = gzip.compress(W.build_warc_bytes(
        [{"warc_type": "warcinfo", "payload": b"a: b\r\n"}]))
    recs = list(W.iter_warc_records(blob))
    assert len(recs) == 1 and recs[0]["payload"] == b"a: b\r\n"


def test_chunked_decode_exact():
    for body in (b"", b"x", b"Hello chunked world", b"A" * 100001):
        raw = W.http_response_bytes(200, "text/plain", body, chunked=True)
        status, ctype, got = W.split_http_response(raw)
        assert status == 200 and got == body, len(body)


def test_http_header_folding_and_case():
    raw = (b"HTTP/1.1 200 OK\r\n"
           b"CONTENT-TYPE: text/html;\r\n charset=utf-8\r\n"
           b"Content-Length: 2\r\n\r\nhi")
    status, ctype, body = W.split_http_response(raw)
    assert status == 200 and body == b"hi"
    assert "text/html" in ctype and "charset=utf-8" in ctype


def test_non_http_payload_passthrough():
    status, ctype, body = W.split_http_response(b"not an http block")
    assert status is None and ctype is None and body == b"not an http block"


def test_truncated_record_surfaces_not_raises():
    blob = W.build_warc_bytes(
        [{"warc_type": "response", "target_uri": "http://e/t",
          "payload": W.http_response_bytes(200, "text/plain", b"full body")}])
    recs = list(W.iter_warc_records(blob[:-20]))   # cut mid-payload
    assert len(recs) == 1
    assert recs[0]["truncated"] is True


def test_malformed_ends_file_not_job():
    good = W.build_warc_bytes(
        [{"warc_type": "warcinfo", "payload": b"k: v\r\n"}])
    recs = list(W.iter_warc_records(good + b"GARBAGE NOT A VERSION LINE\r\n"))
    assert len(recs) == 1   # the good record parsed; garbage ended the file


def test_warc_header_folding():
    blob = (b"WARC/1.0\r\n"
            b"WARC-Type: response\r\n"
            b"WARC-Target-URI: http://example.com/very\r\n long\r\n"
            b"Content-Length: 0\r\n\r\n\r\n\r\n")
    recs = list(W.iter_warc_records(blob))
    assert recs[0]["target_uri"] == "http://example.com/very long"


def test_streaming_cursor_large_payload():
    """Payload far larger than the pull chunk exercises buffer compaction."""
    body = bytes(range(256)) * 8192          # 2 MiB
    blob = W.build_warc_bytes(
        [{"warc_type": "resource", "target_uri": "http://e/big",
          "payload": body},
         {"warc_type": "warcinfo", "payload": b"after: big\r\n"}],
        gzip_members=True)
    recs = list(W.iter_warc_records(blob))
    assert hashlib.md5(recs[0]["payload"]).hexdigest() == \
        hashlib.md5(body).hexdigest()
    assert recs[1]["payload"] == b"after: big\r\n"


def test_spark_parse_warc_batching(spark, tmp_path):
    """mapInPandas expansion: small batch_rows forces multiple Arrow
    batches from one file; schema and per-record values survive."""
    records = [
        {"warc_type": "response", "target_uri": f"http://e/{i}",
         "payload": W.http_response_bytes(200, "text/plain",
                                          f"b{i}".encode())}
        for i in range(7)
    ]
    p = tmp_path / "t.warc.gz"
    p.write_bytes(W.build_warc_bytes(records, gzip_members=True))
    files = spark.read.format("binaryFile").load(str(tmp_path))
    out = W.parse_warc(files, batch_rows=3).orderBy("record_seq").collect()
    assert [r.record_seq for r in out] == list(range(7))
    assert [bytes(r.payload) for r in out] == [
        f"b{i}".encode() for i in range(7)]
    assert all(r.http_status == 200 for r in out)
    assert out[0].warc_path.endswith("t.warc.gz")


def test_decode_text_payload_charsets(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("café".encode("utf-8"), "text/plain; charset=utf-8"),
         ("café".encode("latin-1"), "text/html; charset=ISO-8859-1"),
         (b"\x00binary", "application/octet-stream"),
         (b"plain default", "text/plain")],
        "payload binary, ctype string")
    got = df.select(
        W.decode_text_payload(F.col("payload"), F.col("ctype"))
        .alias("t")).collect()
    assert got[0].t == "café"
    assert got[1].t == "café"
    assert got[2].t is None
    assert got[3].t == "plain default"


def test_corrupt_gzip_ends_file_not_job():
    """Bad deflate bytes inside a member must end that file's record
    stream, not raise out of the executor."""
    good = W.build_warc_bytes(
        [{"warc_type": "warcinfo", "payload": b"k: v\r\n"}],
        gzip_members=True)
    corrupt = good[:20] + b"\xff\x00\xde\xad" + good[28:]
    recs = list(W.iter_warc_records(corrupt))
    assert recs == [] or all("payload" in r for r in recs)


def test_malformed_chunk_framing_falls_back_to_raw():
    raw = (b"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n"
           b"Transfer-Encoding: chunked\r\n\r\nZZZ not hex\r\nbody")
    status, ctype, body = W.split_http_response(raw)
    assert status == 200
    assert body == b"ZZZ not hex\r\nbody"   # surfaced raw, not dropped


def test_oversized_header_line_ends_file():
    blob = (W.build_warc_bytes(
        [{"warc_type": "warcinfo", "payload": b"a: 1\r\n"}])
        + b"WARC/1.0\r\n" + b"X" * (2 << 20))   # 2 MiB headerless line
    recs = list(W.iter_warc_records(blob))
    assert len(recs) == 1   # the good record survives; garbage ends file
