"""File-source tests: text read, zip expansion + member-name decode chain
(SURVEY.md §2 A2/A4, app.py:160-198 parity)."""

from __future__ import annotations

import io
import zipfile

import pytest
from pyspark.sql import functions as F

from server2_vector_search_server_spark.sources.files import (
    decode_member_name,
    expand_zip,
    file_extension,
    parse_pdf_members,
    parse_text_members,
    read_binary_files,
    read_text_files,
)


def test_decode_chain_utf8_flag():
    # flag bit 11 set → name used as-is (NFC-normalized)
    assert decode_member_name("한글.txt", 0x800) == "한글.txt"


def test_decode_chain_cp437_utf8():
    # simulate zipfile's cp437 round-trip of a utf-8 name without the flag
    mangled = "한글.txt".encode("utf-8").decode("cp437")
    assert decode_member_name(mangled, 0) == "한글.txt"


def test_decode_chain_cp437_euckr_fallback():
    mangled = "한글.txt".encode("euc-kr").decode("cp437")
    assert decode_member_name(mangled, 0) == "한글.txt"


def test_decode_chain_nfc_normalization():
    decomposed = "한글.txt"  # NFD form
    import unicodedata

    nfd = unicodedata.normalize("NFD", decomposed)
    assert decode_member_name(nfd, 0x800) == \
        unicodedata.normalize("NFC", decomposed)


def _make_zip(members: dict[str, bytes]) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for name, data in members.items():
            zf.writestr(name, data)
    return buf.getvalue()


@pytest.fixture()
def zip_dir(tmp_path):
    blob = _make_zip({
        "a.txt": "hello alpha".encode(),
        "dir/b.md": "hello beta".encode(),
        "한글문서.txt": "annyeong".encode(),
        "ignore.bin": b"\x00\x01",
    })
    p = tmp_path / "archive.zip"
    p.write_bytes(blob)
    return str(tmp_path)


def test_expand_zip_and_parse_text(spark, zip_dir):
    files = read_binary_files(spark, zip_dir, glob="*.zip")
    members = expand_zip(files)
    got = {r["member_name"]: r["content"] for r in members.collect()}
    assert set(got) == {"a.txt", "dir/b.md", "한글문서.txt", "ignore.bin"}
    texts = parse_text_members(members)
    by_name = {r["member_name"]: r["text"] for r in texts.collect()}
    assert by_name == {"a.txt": "hello alpha", "dir/b.md": "hello beta",
                       "한글문서.txt": "annyeong"}


def test_read_text_files(spark, tmp_path):
    (tmp_path / "x.txt").write_text("file content here")
    df = read_text_files(spark, str(tmp_path / "x.txt"))
    row = df.first()
    assert row["content"] == "file content here"
    assert row["path"].endswith("x.txt")


def test_file_extension_dispatch(spark):
    df = spark.createDataFrame(
        [("A.PDF",), ("b.tar.gz",), ("noext",), ("dir.d/file.TXT",)],
        "name string")
    got = [r[0] for r in df.select(file_extension(F.col("name"))).collect()]
    assert got == [".pdf", ".gz", "", ".txt"]


def test_pdf_members_extract_text_via_zip(spark, zip_dir):
    """A1 end-to-end on real bytes: a zipped PDF flows through expand_zip →
    parse_pdf_members and yields its text (pypdf when installed, else the
    bundled pure-Python fallback — either way the text must come out)."""
    import pathlib

    from server2_vector_search_server_spark.sources.pdf_fallback import (
        build_minimal_pdf,
    )

    blob = _make_zip({"doc.pdf": build_minimal_pdf(
        ["First page here.", "Second page there."])})
    p = pathlib.Path(zip_dir) / "pdfarchive.zip"
    p.write_bytes(blob)
    files = read_binary_files(spark, str(p))
    rows = parse_pdf_members(expand_zip(files)).collect()
    assert len(rows) == 1
    assert rows[0]["text"] == "First page here.\nSecond page there."
    assert rows[0]["total_pages"] == 2


def test_pdf_fallback_escapes_tj_arrays_and_flate():
    """The pure-Python extractor handles literal-string escapes (incl.
    octal + line continuation), TJ arrays with kerning numbers, the ' and "
    show operators, and FlateDecode streams."""
    from server2_vector_search_server_spark.sources import pdf_fallback as pf

    content = (rb"BT [(Ka) -80 (fka \050esc\051)] TJ ET "
               rb"BT (line\ntwo \101) ' ET")
    assert pf._text_objects(content) == ["Kafka (esc)", "line\ntwo A"]

    for compress in (False, True):
        blob = pf.build_minimal_pdf(
            ["Parity (nested) text \\ here", "한국어 텍스트"],
            compress=compress)
        assert pf.extract_text(blob) == \
            "Parity (nested) text \\ here\n한국어 텍스트"


def test_pdf_fallback_cid_type0_tounicode():
    """CID/Type0 text (VERDICT r4 item 6): hex strings are CID codes, not
    character bytes — only the font's /ToUnicode CMap recovers the text.
    The multilingual case the reference's Korean-centric domain hits."""
    from server2_vector_search_server_spark.sources import pdf_fallback as pf

    lines = ["한국어 문서입니다.", "Mixed 한글 and ASCII!"]
    blob = pf.build_minimal_pdf(lines, cid=True)
    # raw-byte decoding of these hex strings would yield CID garbage —
    # prove the CMap is actually consulted
    assert pf.extract_text(blob) == "\n".join(lines)
    assert pf.count_pages(blob) == 2
    # bfrange increment form: codes 0x10..0x12 -> '가' '각' '갂'
    cmap = (b"1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n"
            b"1 beginbfrange\n<0010> <0012> <AC00>\nendbfrange\n")
    table, code_len = pf._parse_tounicode(cmap)
    assert code_len == 2
    assert [table[c] for c in (0x10, 0x11, 0x12)] == ["가", "각", "갂"]
    # bfrange array form
    cmap2 = (b"1 beginbfrange\n<0001> <0002> [<0041> <0042>]\nendbfrange\n")
    table2, _ = pf._parse_tounicode(cmap2)
    assert table2 == {1: "A", 2: "B"}


def test_documents_jsonl_and_csv_roundtrip(spark, tables, tmp_path):
    """Source-format breadth: the same documents ingest identically from
    JSONL and headered CSV (explicit schemas — schema-on-read, no
    inference in production paths) as from parquet."""
    docs = tables["documents"].filter(F.col("doc_id") < 50) \
        .select("doc_id", "text", "lang", "source", "n_chars")
    jl, cs = str(tmp_path / "docs_jsonl"), str(tmp_path / "docs_csv")
    docs.coalesce(1).write.json(jl)
    # quote/escape defaults round-trip commas and quotes in text
    docs.coalesce(1).write.option("header", True).csv(cs)
    schema = ("doc_id long, text string, lang string, source string, "
              "n_chars long")
    back_j = spark.read.schema(schema).json(jl)
    back_c = (spark.read.schema(schema).option("header", True).csv(cs))
    for back in (back_j, back_c):
        assert back.count() == docs.count()
        diff = (docs.exceptAll(back)).unionAll(back.exceptAll(docs))
        assert diff.count() == 0


def test_count_pages_multi_node_page_tree():
    """count_pages must follow the Catalog's /Pages reference to the ROOT
    of a multi-node page tree — an intermediate /Pages node serialized
    earlier carries only its subtree's /Count (code-review r4 finding)."""
    from server2_vector_search_server_spark.sources.pdf_fallback import (
        build_minimal_pdf,
        count_pages,
    )

    # intermediate node (obj 7, /Count 50) appears BEFORE the root
    # (obj 2, /Count 100) in byte order; the catalog points at obj 2
    blob = (b"%PDF-1.4\n"
            b"7 0 obj\n<< /Type /Pages /Parent 2 0 R /Count 50 >>\nendobj\n"
            b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
            b"2 0 obj\n<< /Type /Pages /Kids [7 0 R 8 0 R] /Count 100 >>\n"
            b"endobj\n"
            b"8 0 obj\n<< /Type /Pages /Parent 2 0 R /Count 50 >>\nendobj\n"
            b"%%EOF\n")
    assert count_pages(blob) == 100
    # root without /Count must not borrow one from a later object:
    # falls through to max-over-Pages-nodes
    blob2 = (b"%PDF-1.4\n"
             b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
             b"2 0 obj\n<< /Kids [7 0 R] >>\nendobj\n"
             b"7 0 obj\n<< /Type /Pages /Count 50 >>\nendobj\n%%EOF\n")
    assert count_pages(blob2) == 50
    # flat fixture PDFs still count correctly through the catalog path
    assert count_pages(build_minimal_pdf(["a", "b", "c"])) == 3
    # object number must match exactly (obj 12 is not obj 2)
    blob3 = (b"%PDF-1.4\n"
             b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
             b"12 0 obj\n<< /Type /Pages /Count 9 >>\nendobj\n"
             b"2 0 obj\n<< /Type /Pages /Count 4 >>\nendobj\n%%EOF\n")
    assert count_pages(blob3) == 4


def test_pdf_fallback_hex_strings():
    # PDF 32000-1 §7.3.4.3: hex strings show like literals — whitespace
    # inside ignored, odd digit count zero-padded; also inside TJ arrays
    from server2_vector_search_server_spark.sources import pdf_fallback as pf

    blob = pf.build_minimal_pdf(["Hex page one", "Zwei!"],
                                hex_strings=True)
    assert pf.extract_text(blob) == "Hex page one\nZwei!"

    # hand-built content: whitespace inside hex, odd length, TJ mix
    content = (b"BT <4865 6C6C 6F> Tj ET "
               b"BT [(lit-) <6A6F696E65 64> -250 (!)] TJ ET "
               b"BT <5> Tj ET")   # odd length: '5' -> 0x50 = 'P'
    page = pf.build_minimal_pdf(["x"])
    # graft raw content into a stream the extractor will scan
    blob2 = page.replace(b"BT /F1 12 Tf 72 720 Td (x) Tj ET", content)
    assert pf.extract_text(blob2) == "Hello\nlit-joined!\nP"


def test_local_object_store_contract(tmp_path):
    """put/get/exists/list/delete with atomic writes and key safety — the
    contract S3ObjectStore mirrors (SURVEY A6)."""
    import pytest

    from server2_vector_search_server_spark.sources.object_store import (
        LocalObjectStore,
    )

    store = LocalObjectStore(str(tmp_path / "objs"))
    store.put_bytes("col/a.txt", b"alpha")
    store.put_bytes("col/sub/b.bin", b"\x00\x01")
    store.put_bytes("other/c.txt", b"c")
    assert store.get_bytes("col/a.txt") == b"alpha"
    assert store.exists("col/a.txt") and not store.exists("col/z.txt")
    assert store.list_keys("col/") == ["col/a.txt", "col/sub/b.bin"]
    # overwrite is idempotent (atomic replace)
    store.put_bytes("col/a.txt", b"alpha")
    assert store.get_bytes("col/a.txt") == b"alpha"
    assert store.delete_prefix("col/") == 2
    assert store.list_keys() == ["other/c.txt"]
    # a filesystem-backed store must refuse keys that escape its root
    with pytest.raises(ValueError):
        store.put_bytes("../escape.txt", b"x")
    with pytest.raises(ValueError):
        store.put_bytes("/abs.txt", b"x")


def test_s3_object_store_gate_or_real_path():
    """Where boto3 is absent the S3 backend raises the house
    NotImplementedError gate naming the local twin; where it IS present
    (this container ships it) the REAL client path is driven through
    botocore's Stubber — put/get round-trip a payload and the wire-level
    parameters (bucket, key, body) are asserted by the stub itself."""
    import pytest

    from server2_vector_search_server_spark.sources.object_store import (
        S3ObjectStore,
    )

    try:
        import boto3  # type: ignore  # noqa: F401
    except ImportError:
        with pytest.raises(NotImplementedError, match="boto3"):
            S3ObjectStore("bucket")
        return

    import io

    from botocore.response import StreamingBody
    from botocore.stub import Stubber

    store = S3ObjectStore("bkt", region="us-east-1",
                          access_key="k", secret_key="s")
    payload = b"raw archive bytes"
    with Stubber(store._client) as stub:
        stub.add_response(
            "put_object", {},
            {"Bucket": "bkt", "Key": "col/a.txt", "Body": payload})
        stub.add_response(
            "get_object",
            {"Body": StreamingBody(io.BytesIO(payload), len(payload))},
            {"Bucket": "bkt", "Key": "col/a.txt"})
        store.put_bytes("col/a.txt", payload)
        assert store.get_bytes("col/a.txt") == payload
        stub.assert_no_pending_responses()
    # key safety holds on the S3 path too
    with pytest.raises(ValueError):
        store.put_bytes("../escape", b"x")


def test_archive_members_manifest_and_bytes(spark, tmp_path):
    """archive_members puts partition-locally and the manifest's md5/size
    match the archived bytes exactly."""
    import hashlib

    from server2_vector_search_server_spark.sources.object_store import (
        LocalObjectStore,
        archive_members,
    )

    root = str(tmp_path / "arc")
    members = spark.createDataFrame(
        [("a.txt", bytearray(b"alpha bytes")),
         ("b.bin", bytearray(b"\x00\xff\x10"))],
        "member_name string, content binary")
    rows = {r["object_key"]: r for r in
            archive_members(members, "colX", store_root=root).collect()}
    store = LocalObjectStore(root)
    assert set(rows) == {"colX/a.txt", "colX/b.bin"}
    for key, r in rows.items():
        data = store.get_bytes(key)
        assert r["n_bytes"] == len(data)
        assert r["content_md5"] == hashlib.md5(data).hexdigest()
