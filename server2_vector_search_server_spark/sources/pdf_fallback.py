"""Pure-Python PDF text extraction fallback (SURVEY.md §2 A1/J6).

The reference's primary ingest format is PDF via DoclingLoader
(``document_processor.py:47,120-121``). No PDF library ships in this
container, so :func:`extract_text` implements the minimal subset needed to
run the A1 path end-to-end on real bytes: it scans ``stream``/``endstream``
content blocks, inflates ``/FlateDecode`` streams with stdlib zlib, and
collects the literal and hex strings fed to the text-showing operators
(``Tj``, ``'``, ``"``, and ``TJ`` arrays) inside ``BT``/``ET`` text objects,
applying PDF string escapes (including octal) and hex decoding (whitespace
ignored, odd length zero-padded, PDF 32000-1 §7.3.4.3). ``pypdf`` is
preferred when importable (``sources/files.parse_pdf_members``); this
fallback keeps the pipeline honest-but-executable when it is not.

Known limits (documented, acceptable for the ingest contract): nested
unescaped parentheses, non-Flate filters, CID/Type0 font re-mapping (hex
strings are decoded as raw Latin-1-ish bytes, which is correct only for
simple fonts), and positioning-aware word spacing are not handled — text
comes back in content-stream order, one line per text object.

:func:`build_minimal_pdf` is the deterministic fixture generator used by
tests and the registry parity query: it emits a complete single-xref PDF
(readable by strict parsers too) with one page per text line, optionally
Flate-compressed, so both decode branches are exercised.
"""

from __future__ import annotations

import re
import zlib

_STREAM_RE = re.compile(rb"stream\r?\n(.*?)\r?\nendstream", re.DOTALL)
# literal or hex string followed by a show operator, or a TJ array
_SHOW_RE = re.compile(
    rb"\((?P<lit>(?:\\.|[^\\()])*)\)\s*(?:Tj|'|\")"
    rb"|<(?P<hexs>[0-9A-Fa-f \r\n\t]*)>\s*(?:Tj|'|\")"
    rb"|\[(?P<arr>(?:\((?:\\.|[^\\()])*\)"
    rb"|<[0-9A-Fa-f \r\n\t]*>|[^\]])*)\]\s*TJ",
    re.DOTALL)
# strings inside a TJ array, in order (literal or hex)
_ARR_STR_RE = re.compile(
    rb"\((?P<lit>(?:\\.|[^\\()])*)\)|<(?P<hexs>[0-9A-Fa-f \r\n\t]*)>",
    re.DOTALL)
_ESCAPE_RE = re.compile(rb"\\(\r\n|\r|\n|[0-7]{1,3}|.)", re.DOTALL)
_ESCAPES = {b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b",
            b"f": b"\f", b"(": b"(", b")": b")", b"\\": b"\\"}


def _unescape(lit: bytes) -> bytes:
    def sub(m: re.Match) -> bytes:
        esc = m.group(1)
        if esc in (b"\r\n", b"\r", b"\n"):      # line continuation
            return b""
        if esc in _ESCAPES:
            return _ESCAPES[esc]
        if esc[:1].isdigit():
            return bytes([int(esc, 8) & 0xFF])
        return esc                               # unknown escape: drop the \
    return _ESCAPE_RE.sub(sub, lit)


def _unhex(hexs: bytes) -> bytes:
    """PDF hex string body -> bytes: whitespace ignored, odd length padded
    with a trailing 0 (PDF 32000-1 §7.3.4.3)."""
    h = re.sub(rb"\s+", b"", hexs)
    if len(h) % 2:
        h += b"0"
    try:
        return bytes.fromhex(h.decode("ascii"))
    except ValueError:
        return b""


def _content_streams(blob: bytes) -> list[bytes]:
    """Every stream body, inflated when its object dict names FlateDecode."""
    out = []
    pos = 0
    for m in _STREAM_RE.finditer(blob):
        # the stream's dict sits between the previous object boundary and
        # the `stream` keyword — enough context to spot the filter
        head = blob[max(pos, m.start() - 512):m.start()]
        data = m.group(1)
        if b"/FlateDecode" in head:
            try:
                data = zlib.decompress(data)
            except zlib.error:
                continue
        out.append(data)
        pos = m.end()
    return out


def _text_objects(content: bytes) -> list[bytes]:
    """Concatenated show-operator strings, one entry per BT..ET block."""
    blocks = []
    for bt in re.finditer(rb"\bBT\b(.*?)\bET\b", content, re.DOTALL):
        parts = []
        for m in _SHOW_RE.finditer(bt.group(1)):
            if m.group("lit") is not None:
                parts.append(_unescape(m.group("lit")))
            elif m.group("hexs") is not None:
                parts.append(_unhex(m.group("hexs")))
            else:
                for sm in _ARR_STR_RE.finditer(m.group("arr")):
                    if sm.group("lit") is not None:
                        parts.append(_unescape(sm.group("lit")))
                    else:
                        parts.append(_unhex(sm.group("hexs")))
        if parts:
            blocks.append(b"".join(parts))
    return blocks


def extract_text(blob: bytes) -> str:
    """Extract the showable text of a PDF, one line per text object."""
    lines: list[bytes] = []
    for content in _content_streams(blob):
        lines.extend(_text_objects(content))
    return "\n".join(ln.decode("utf-8", "replace") for ln in lines)


_PAGE_RE = re.compile(rb"/Type\s*/Page\b(?!s)")
_PAGES_COUNT_RE = re.compile(rb"/Type\s*/Pages[^>]*?/Count\s+(\d+)")
_CATALOG_PAGES_RE = re.compile(
    rb"/Type\s*/Catalog[^>]*?/Pages\s+(\d+)\s+\d+\s+R")


def count_pages(blob: bytes) -> int:
    """Page count without a PDF library — the ``total_pages`` loader
    metadata the reference's Docling path records into its WAL (VERDICT r3
    'what's missing' item 3). Resolution order:

    1. the ``/Count`` of the page-tree ROOT, found by following the
       Catalog's ``/Pages N 0 R`` reference (authoritative — an
       intermediate ``/Pages`` node's ``/Count`` covers only its subtree,
       and incremental writers serialize intermediates in any order);
    2. the MAX ``/Count`` over all ``/Type /Pages`` nodes (the root's
       count is ≥ every subtree's, so max is order-independent);
    3. counting ``/Type /Page`` leaf objects.
    """
    cat = _CATALOG_PAGES_RE.search(blob)
    if cat:
        obj_num = cat.group(1)
        # the referenced object's body, bounded at its endobj so a root
        # without /Count can't borrow one from a later object
        body = re.search(
            rb"(?<![0-9])" + obj_num + rb"\s+\d+\s+obj\b(.*?)endobj",
            blob, re.DOTALL)
        if body:
            m = re.search(rb"/Count\s+(\d+)", body.group(1))
            if m:
                return int(m.group(1))
    counts = [int(m) for m in _PAGES_COUNT_RE.findall(blob)]
    if counts:
        return max(counts)
    return len(_PAGE_RE.findall(blob))


# --------------------------------------------------------------------------
# fixture generation

def _escape_literal(text: str) -> bytes:
    raw = text.encode("utf-8")
    return raw.replace(b"\\", rb"\\").replace(b"(", rb"\(") \
              .replace(b")", rb"\)")


def build_minimal_pdf(lines: list[str], *, compress: bool = False,
                      hex_strings: bool = False) -> bytes:
    """A complete, strictly-valid single-page-per-line PDF with the given
    text lines — correct xref offsets so real parsers accept it too.
    ``hex_strings=True`` emits each line as ``<hex> Tj`` instead of a
    literal string, exercising the hex decode branch."""
    objs: list[bytes] = []
    n_pages = len(lines)
    page_ids = [4 + 2 * i for i in range(n_pages)]
    kids = " ".join(f"{pid} 0 R" for pid in page_ids)
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")                 # 1
    objs.append(f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>"
                .encode())                                            # 2
    objs.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    for i, line in enumerate(lines):                                  # 3
        if hex_strings:
            content = (b"BT /F1 12 Tf 72 720 Td <"
                       + line.encode("utf-8").hex().encode() + b"> Tj ET")
        else:
            content = (b"BT /F1 12 Tf 72 720 Td (" + _escape_literal(line)
                       + b") Tj ET")
        filt = b""
        if compress:
            content = zlib.compress(content)
            filt = b" /Filter /FlateDecode"
        objs.append((f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                     f"/Resources << /Font << /F1 3 0 R >> >> "
                     f"/Contents {page_ids[i] + 1} 0 R >>").encode())
        objs.append(b"<< /Length " + str(len(content)).encode()
                    + filt + b" >>\nstream\n" + content + b"\nendstream")

    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
            f"startxref\n{xref_at}\n%%EOF\n").encode()
    return bytes(out)
