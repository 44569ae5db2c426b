"""A3 DOCX source: stdlib OOXML extractor + Spark elements path.

Reference behavior mirrored: ``UnstructuredWordDocumentLoader(mode=
"elements")`` at ``/root/reference/document_processor.py:48-50`` — one
element per paragraph/table in body order. The live upload path rejects
``.docx`` (``document_processor.py:114-117``); this covers the dormant
loader path, closing the last source-format row of SURVEY §2.
"""

from __future__ import annotations

import pytest

from server2_vector_search_server_spark.sources.docx_fallback import (
    build_minimal_docx,
    extract_text,
    parse_doc,
    parse_docx_elements,
)


def test_paragraphs_in_body_order():
    blob = build_minimal_docx(["First.", "Second.", "Third."])
    assert parse_docx_elements(blob) == [
        ("paragraph", "First."),
        ("paragraph", "Second."),
        ("paragraph", "Third.")]


def test_empty_and_whitespace_paragraphs_skipped():
    blob = build_minimal_docx(["", "Kept.", "   ", "\t"])
    assert parse_docx_elements(blob) == [("paragraph", "Kept.")]


def test_tab_br_run_elements_fold_to_characters():
    blob = build_minimal_docx(["a\tb", "x\ny"])
    assert parse_docx_elements(blob) == [
        ("paragraph", "a\tb"), ("paragraph", "x\ny")]


def test_table_rows_tab_joined_newline_rows():
    blob = build_minimal_docx(
        ["Before table."], table=[["h1", "h2"], ["v1", "v2"]])
    els = parse_docx_elements(blob)
    assert els == [("paragraph", "Before table."),
                   ("table", "h1\th2\nv1\tv2")]


def test_br_and_tab_inside_cells_fold_to_spaces():
    """ADVICE r7: a <w:br/> or <w:tab/> INSIDE a table cell must not leak
    a literal \\n / \\t into the cell text — that would corrupt the
    \\t-cells/\\n-rows framing and diverge from the python-docx branch's
    normalization. Both fold to single spaces (blank segments dropped)."""
    blob = build_minimal_docx(
        ["p"], table=[["Line1\nLine2", "A\tB"], ["\n x \n", "ok"]])
    els = parse_docx_elements(blob)
    assert els == [("paragraph", "p"),
                   ("table", "Line1 Line2\tA B\n x \tok")]


def test_multibyte_utf8_text_roundtrip():
    blob = build_minimal_docx(["한국어 문단입니다.", "ひらがな & <tags>"])
    # XML escaping must round-trip the & and <> characters
    assert parse_docx_elements(blob) == [
        ("paragraph", "한국어 문단입니다."),
        ("paragraph", "ひらがな & <tags>")]


def test_extract_text_joins_elements_double_newline():
    blob = build_minimal_docx(["A.", "B."], table=[["c"]])
    assert extract_text(blob) == "A.\n\nB.\n\nc"


def test_non_docx_bytes_raise():
    import zipfile
    with pytest.raises(zipfile.BadZipFile):
        parse_docx_elements(b"not a zip at all")
    # a zip without the word/ part is also rejected (KeyError)
    import io
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("other.txt", "x")
    with pytest.raises(KeyError):
        parse_docx_elements(buf.getvalue())


def test_legacy_doc_gated():
    with pytest.raises(NotImplementedError, match="OLE2/CFB"):
        parse_doc(b"\xd0\xcf\x11\xe0")


def test_fixture_builder_deterministic():
    a = build_minimal_docx(["same"], table=[["t"]])
    b = build_minimal_docx(["same"], table=[["t"]])
    assert a == b


def test_parse_docx_members_spark_path(spark):
    """The mapInPandas elements path: per-element rows, non-docx members
    filtered out, file columns carried through."""
    from server2_vector_search_server_spark.sources.files import (
        parse_docx_members,
    )

    members = spark.createDataFrame(
        [("arc", "a.docx",
          bytearray(build_minimal_docx(["P one.", "P two."],
                                       table=[["c1", "c2"]]))),
         ("arc", "skip.txt", bytearray(b"plain")),
         ("arc", "b.docx", bytearray(build_minimal_docx(["Solo."])))],
        "archive string, member_name string, content binary")
    rows = (parse_docx_members(members)
            .orderBy("member_name", "element_index").collect())
    got = [(r["member_name"], r["element_index"], r["category"], r["text"])
           for r in rows]
    assert got == [
        ("a.docx", 0, "paragraph", "P one."),
        ("a.docx", 1, "paragraph", "P two."),
        ("a.docx", 2, "table", "c1\tc2"),
        ("b.docx", 0, "paragraph", "Solo.")]
    assert rows[0]["archive"] == "arc"


# ---------------------------------------------------------------------------
# property: build -> parse round-trips arbitrary paragraph/table content

from hypothesis import given, settings
from hypothesis import strategies as st

# XML-legal text: printable without control chars, minus the two BMP
# noncharacters U+FFFE/U+FFFF that the XML 1.0 Char production (and
# expat) reject outright — category filters alone don't exclude them and
# a generated one makes the parse legitimately fail. TAB/NEWLINE are
# exercised through the run-element folding.
_plain = st.text(
    alphabet=st.characters(blacklist_categories=("Cc", "Cs"),
                           blacklist_characters="\ufffe\uffff"),
    min_size=0, max_size=40)
# cells MAY contain TAB/NEWLINE (run elements <w:tab/>/<w:br/>): the
# parser folds them to spaces per the backend-independent cell contract
# (ADVICE r7), so the property computes the same fold for its expectation.
_cell = st.text(
    alphabet=st.characters(blacklist_categories=("Cc", "Cs"),
                           whitelist_characters="\t\n",
                           blacklist_characters="\ufffe\uffff"),
    min_size=1, max_size=20).filter(lambda s: s.strip())


def _fold_cell(s: str) -> str:
    """The cell-text contract both DOCX backends implement."""
    return " ".join(seg for seg in s.split("\n")
                    if seg.strip()).replace("\t", " ")


@given(paras=st.lists(_plain, max_size=6),
       table=st.one_of(st.none(),
                       st.lists(st.lists(_cell, min_size=1, max_size=3),
                                min_size=1, max_size=3)))
@settings(max_examples=60, deadline=None)
def test_build_parse_roundtrip_property(paras, table):
    """Every non-blank paragraph comes back verbatim (TAB/NEWLINE
    included), blank ones are skipped, and the table (if any) arrives
    last with tab-joined cells — for arbitrary XML-legal content,
    proving the escaping and the run-element encoding are inverses of
    the parser."""
    blob = build_minimal_docx(paras, table=table)
    els = parse_docx_elements(blob)
    want = [("paragraph", p) for p in paras if p.strip()]
    if table is not None:
        rows = "\n".join("\t".join(_fold_cell(c) for c in r)
                         for r in table)
        if rows.strip():
            want.append(("table", rows))
    assert els == want
