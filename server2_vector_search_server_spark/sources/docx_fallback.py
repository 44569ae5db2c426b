"""Pure-Python DOCX (OOXML WordprocessingML) extractor — stdlib only.

SURVEY.md §2 A3: the reference's dormant Word path loads ``.docx`` with
``UnstructuredWordDocumentLoader(mode="elements")``
(``document_processor.py:48-50``) — one LangChain Document per document
ELEMENT (paragraph / table), in document order.  The live upload allowlist
rejects ``.docx`` (``document_processor.py:114-117``), so this stayed a
justified non-goal through round 6; round 7 closes it anyway because the
format is cheap to support honestly: a ``.docx`` is a ZIP whose main part
``word/document.xml`` is declarative XML, parseable with ``zipfile`` +
``xml.etree`` alone — no C extension, no optional wheel.

Element semantics mirrored from the loader's "elements" mode:

  * each non-empty ``<w:p>`` paragraph → one ``paragraph`` element whose
    text is the concatenation of its ``<w:t>`` runs, with ``<w:tab/>`` → TAB
    and ``<w:br/>`` / ``<w:cr/>`` → NEWLINE (the run-level whitespace
    elements Word writes instead of literal characters);
  * each ``<w:tbl>`` table → one ``table`` element, cells joined by TAB
    within a row and rows by NEWLINE (unstructured's plain-text table
    rendering) — nested paragraphs inside cells join with a space;
  * empty paragraphs (no runs, or whitespace-only) are skipped, as the
    loader drops empty elements;
  * headings are still paragraphs here: distinguishing Title/NarrativeText
    requires the style part (``word/styles.xml``) and a layout model —
    out of scope exactly as the PDF fallback's auto-column detection is
    (``pdf_fallback.extract_text_layout``).

Legacy binary ``.doc`` (OLE2/CFB, pre-2007) is NOT parsed: it needs a
compound-file reader plus the FIB/piece-table format, which no stdlib
module provides. ``parse_doc`` raises ``NotImplementedError`` with that
justification — the same import-gate honesty rule as the KSS/pillow stubs.

Scale: parsing is per-file Python over Arrow batches (``mapInPandas`` in
``sources.files.parse_docx_members``); a .docx is at most a few MB, so the
unit of parallelism is the file, same as the binaryFile scan that carries
it.
"""

from __future__ import annotations

import io
import zipfile
from xml.etree import ElementTree

# WordprocessingML main namespace (ECMA-376 Part 1 §11.3.10).
_W = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"


def _run_text(elem: ElementTree.Element) -> str:
    """Text of one paragraph/run subtree: <w:t> content plus the run-level
    whitespace elements (<w:tab/>, <w:br/>, <w:cr/>) Word uses instead of
    literal characters."""
    parts: list[str] = []
    for node in elem.iter():
        tag = node.tag
        if tag == f"{_W}t":
            parts.append(node.text or "")
        elif tag == f"{_W}tab":
            parts.append("\t")
        elif tag in (f"{_W}br", f"{_W}cr"):
            parts.append("\n")
    return "".join(parts)


def _cell_text(tc: ElementTree.Element) -> str:
    """A table cell's text: non-blank paragraphs joined by a single space,
    with intra-paragraph ``<w:br/>``/``<w:cr/>`` newlines folded to spaces
    the same way and ``<w:tab/>`` folded too — embedded ``\\n``/``\\t``
    would corrupt the rows-joined-by-newline / cells-joined-by-tab table
    framing, and the python-docx branch (``files.py``) applies the
    identical fold so cell text is backend-independent (ADVICE r7)."""
    paras = [_run_text(p) for p in tc.iter(f"{_W}p")]
    segs = [s for p in paras for s in p.split("\n") if s.strip()]
    return " ".join(segs).replace("\t", " ")


def parse_docx_elements(blob: bytes) -> list[tuple[str, str]]:
    """DOCX bytes → ordered ``(category, text)`` elements.

    ``category`` is ``"paragraph"`` or ``"table"``; order is document
    order (the loader's elements mode preserves it). Raises
    ``zipfile.BadZipFile`` / ``KeyError`` on non-docx input — callers that
    want the reference's swallow-and-log behavior catch at their layer
    (``load_document`` returns ``[]`` on loader failure,
    ``document_processor.py:74-84``)."""
    with zipfile.ZipFile(io.BytesIO(blob)) as zf:
        xml = zf.read("word/document.xml")
    root = ElementTree.fromstring(xml)
    body = root.find(f"{_W}body")
    if body is None:
        return []
    out: list[tuple[str, str]] = []
    for child in body:
        if child.tag == f"{_W}p":
            text = _run_text(child)
            if text.strip():
                out.append(("paragraph", text))
        elif child.tag == f"{_W}tbl":
            rows = []
            for tr in child.iter(f"{_W}tr"):
                cells = [_cell_text(tc) for tc in tr.findall(f"{_W}tc")]
                rows.append("\t".join(cells))
            if any(r.strip() for r in rows):
                out.append(("table", "\n".join(rows)))
    return out


def extract_text(blob: bytes) -> str:
    """Whole-document text: elements joined by double newline (the join
    the reference's splitter sees after ``loader.load()`` concatenation —
    one Document per element, page_content separated when re-joined)."""
    return "\n\n".join(t for _, t in parse_docx_elements(blob))


def parse_doc(blob: bytes) -> list[tuple[str, str]]:
    """Legacy binary ``.doc`` (OLE2 compound file). Not implemented:
    requires a CFB reader + Word FIB/piece-table parsing that no stdlib
    module provides, and the reference's own live path never accepts the
    extension either (``document_processor.py:114-117``)."""
    raise NotImplementedError(
        "legacy .doc (OLE2/CFB) parsing requires a compound-file reader; "
        "only OOXML .docx is supported (reference's live allowlist rejects "
        "both, document_processor.py:114-117)")


# --------------------------------------------------------------------------
# fixture builder — real .docx bytes, deterministic (stable zip metadata)

_CONTENT_TYPES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
    'content-types">'
    '<Default Extension="rels" ContentType="application/vnd.'
    'openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/word/document.xml" ContentType="application/vnd.'
    'openxmlformats-officedocument.wordprocessingml.document.main+xml"/>'
    '</Types>')

_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/'
    'relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
    'officeDocument/2006/relationships/officeDocument" '
    'Target="word/document.xml"/>'
    '</Relationships>')


def _xml_escape(s: str) -> str:
    return (s.replace("&", "&amp;").replace("<", "&lt;")
            .replace(">", "&gt;"))


def _para_xml(text: str) -> str:
    """One <w:p>; TAB and NEWLINE in ``text`` round-trip through the
    run-level elements the extractor folds back (tab/br)."""
    runs = []
    for i, seg in enumerate(text.split("\n")):
        if i:
            runs.append("<w:br/>")
        for j, piece in enumerate(seg.split("\t")):
            if j:
                runs.append("<w:tab/>")
            if piece:
                runs.append(f'<w:t xml:space="preserve">'
                            f"{_xml_escape(piece)}</w:t>")
    return f"<w:p><w:r>{''.join(runs)}</w:r></w:p>"


def build_minimal_docx(paragraphs: list[str],
                       table: list[list[str]] | None = None) -> bytes:
    """Build a real, spec-minimal ``.docx``: [Content_Types].xml +
    package rels + word/document.xml. Byte-deterministic (fixed zip
    timestamps, stored — not deflated — members) so oracle fixtures can
    hash the parse output without a backend pin."""
    body = [_para_xml(p) for p in paragraphs]
    if table is not None:
        rows = "".join(
            "<w:tr>" + "".join(
                f"<w:tc>{_para_xml(cell)}</w:tc>" for cell in row)
            + "</w:tr>"
            for row in table)
        body.append(f"<w:tbl>{rows}</w:tbl>")
    document = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<w:document xmlns:w="{_W[1:-1]}">'
        f"<w:body>{''.join(body)}</w:body></w:document>")
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as zf:
        for name, payload in (("[Content_Types].xml", _CONTENT_TYPES),
                              ("_rels/.rels", _RELS),
                              ("word/document.xml", document)):
            info = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            zf.writestr(info, payload)
    return buf.getvalue()
