"""File sources (SURVEY.md §2 A1/A2/A4, J5/J6).

Reference ingestion reads PDFs (DoclingLoader), text/markdown (TextLoader,
utf-8) and ZIP archives whose member names go through a 3-stage decode chain
(``app.py:160-198``). Spark-first realization:

  * text files: ``spark.read.text(wholetext=True)`` + ``input_file_name`` —
    one row per file, splittable listing, no Python in the scan;
  * arbitrary/binary files: ``spark.read.format("binaryFile")`` — each row
    carries (path, modificationTime, length, content);
  * ZIP expansion: ``mapInPandas`` over binaryFile rows, one input archive →
    N member rows, applying the reference's exact member-name decode chain
    (UTF-8 flag → CP437→UTF-8 → CP437→EUC-KR(ignore), then NFC normalize);
  * PDF parsing: gated behind import-try (no pdf lib in this container); text
    members decode as UTF-8 like TextLoader.

Scale: binaryFile splits at file granularity; ZIP members are processed
streaming per archive (never materializing the whole archive's members in
memory at once beyond one Arrow batch). For 100 TB of many small archives
this parallelizes by archive; for few huge archives, repartition by path
first so each executor owns whole archives.
"""

from __future__ import annotations

import io
import unicodedata
import zipfile
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEMBER_SCHEMA = ("archive string, member_name string, content binary")


def read_text_files(spark: SparkSession, path: str) -> DataFrame:
    """A2: whole-file text rows (TextLoader analog, utf-8)."""
    return (
        spark.read.text(path, wholetext=True)
        .select(F.input_file_name().alias("path"),
                F.col("value").alias("content"))
    )


def read_binary_files(spark: SparkSession, path: str,
                      glob: str | None = None) -> DataFrame:
    """A1/A4 carrier: binary rows with file metadata."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def decode_member_name(raw_name: str, flag_bits: int) -> str:
    """The reference's ZIP member-name decode chain (``app.py:172-194``):
    UTF-8 flag honored; else CP437→UTF-8; else CP437→EUC-KR with errors
    ignored; any failure falls back to the raw name; NFC-normalize."""
    try:
        if flag_bits & 0x800:            # bit 11: name already UTF-8
            decoded = raw_name
        else:
            cp437 = raw_name.encode("cp437")
            try:
                decoded = cp437.decode("utf-8")
            except UnicodeDecodeError:
                decoded = cp437.decode("euc-kr", "ignore")
        return unicodedata.normalize("NFC", decoded)
    except Exception:
        return raw_name


def expand_zip(files: DataFrame, *, path_col: str = "path",
               content_col: str = "content") -> DataFrame:
    """A4/J5: archive rows → member rows (flatMap-style UDTF via mapInPandas).

    Directories and zero-byte members are skipped (the reference only
    processes extracted *files*, ``app.py:203-228``).
    """
    import pandas as pd

    cols = [path_col, content_col]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"archive": [], "member_name": [], "content": []}
            for path, blob in zip(pdf[path_col], pdf[content_col]):
                with zipfile.ZipFile(io.BytesIO(blob)) as zf:
                    for member in zf.infolist():
                        if member.is_dir():
                            continue
                        name = decode_member_name(member.filename,
                                                  member.flag_bits)
                        out["archive"].append(path)
                        out["member_name"].append(name)
                        out["content"].append(zf.read(member))
            yield pd.DataFrame(out)

    return files.select(*cols).mapInPandas(run, schema=MEMBER_SCHEMA)


def file_extension(col) -> "F.Column":
    """H3: lowercase extension extract (``document_processor.py:42,111``)."""
    return F.lower(F.regexp_extract(col, r"(\.[^.\\/]+)$", 1))


def parse_text_members(members: DataFrame,
                       name_col: str = "member_name",
                       content_col: str = "content") -> DataFrame:
    """A2 for extracted members: binary→utf-8 text for .txt/.md members."""
    return (
        members.filter(file_extension(F.col(name_col)).isin(".txt", ".md"))
        .withColumn("text", F.decode(F.col(content_col), "UTF-8"))
        .drop(content_col)
    )


def parse_docx_members(members: DataFrame,
                       name_col: str = "member_name",
                       content_col: str = "content") -> DataFrame:
    """A3: DOCX→elements (the reference's dormant Word path,
    ``UnstructuredWordDocumentLoader(mode="elements")`` at
    ``document_processor.py:48-50`` — one Document per paragraph/table
    element, document order). Backend per Python worker: ``python-docx``
    when importable (paragraphs + tables walked in body order), else the
    bundled stdlib OOXML extractor (``sources/docx_fallback.py``).

    Backend parity scope: both yield identical (category, text) elements
    for the WordprocessingML subset ``build_minimal_docx`` emits — plain
    runs, tab/br run elements (including INSIDE table cells), simple
    (unmerged, non-nested) tables with any number of cell paragraphs;
    both branches fold intra-cell newlines (paragraph joins and
    ``<w:br/>``) and tabs to single spaces so cell text can never
    corrupt the \\t-cells/\\n-rows table framing. Exotic constructs (hyperlink-wrapped runs, merged cells,
    nested tables) follow the active backend's own reading and are NOT
    part of the hashable contract. One output row per element:
    (…file cols, element_index, category, text)."""
    import pandas as pd

    docs = members.filter(file_extension(F.col(name_col)) == ".docx")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        try:
            import docx  # type: ignore  # python-docx

            def extract(blob: bytes) -> list[tuple[str, str]]:
                d = docx.Document(io.BytesIO(blob))
                # body-order walk: python-docx's .paragraphs/.tables lose
                # interleaving, so iterate the underlying body element and
                # wrap each child — same document order as the fallback
                from docx.table import Table
                from docx.text.paragraph import Paragraph
                out = []
                for child in d.element.body:
                    if child.tag.endswith("}p"):
                        text = Paragraph(child, d).text
                        if text.strip():
                            out.append(("paragraph", text))
                    elif child.tag.endswith("}tbl"):
                        t = Table(child, d)

                        def cell(c) -> str:
                            # python-docx newline-joins ALL cell
                            # paragraphs (empty included) and renders
                            # <w:br/> as "\n" / <w:tab/> as "\t" inside
                            # them; the fallback space-joins the
                            # non-blank newline-split segments and folds
                            # tabs — apply the identical fold here so
                            # cell text is backend-independent and never
                            # corrupts the \t-cells/\n-rows table framing
                            segs = " ".join(s for s in c.text.split("\n")
                                            if s.strip())
                            return segs.replace("\t", " ")

                        rows = ["\t".join(cell(c) for c in row.cells)
                                for row in t.rows]
                        if any(r.strip() for r in rows):
                            out.append(("table", "\n".join(rows)))
                return out
        except ImportError:
            from server2_vector_search_server_spark.sources \
                .docx_fallback import parse_docx_elements as extract
        for pdf in batches:
            keep = pdf.drop(columns=[content_col])
            rows = {c: [] for c in keep.columns}
            rows.update({"element_index": [], "category": [], "text": []})
            for i in range(len(pdf)):
                for idx, (cat, text) in enumerate(
                        extract(pdf[content_col].iloc[i])):
                    for c in keep.columns:
                        rows[c].append(keep[c].iloc[i])
                    rows["element_index"].append(idx)
                    rows["category"].append(cat)
                    rows["text"].append(text)
            yield pd.DataFrame(rows)

    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                       for f in docs.schema if f.name != content_col)
    return docs.mapInPandas(
        run, schema=f"{schema}, element_index int, category string, "
                    "text string")


def parse_pdf_members(members: DataFrame,
                      name_col: str = "member_name",
                      content_col: str = "content",
                      layout: str | None = None,
                      n_columns: int = 2) -> DataFrame:
    """A1: PDF→text (the reference's headline format, DoclingLoader at
    ``document_processor.py:101,120-121``). Backend selection per Python
    worker: ``pypdf`` when importable, else the bundled pure-Python
    extractor (``sources/pdf_fallback.py`` — stdlib-only: Flate inflate +
    text-show operator scan), so the path executes end-to-end on real PDF
    bytes in this container. The Spark shape is the same either way:
    Arrow-batched ``mapInPandas``, one text row per input PDF.

    ``layout`` selects positioned reading-order extraction instead of
    content-stream order: ``"rows"`` (top-to-bottom lines, table cells
    left-to-right — the row-major order Docling emits for tables) or
    ``"columns"`` (``n_columns`` vertical bands read left band first —
    multi-column reading order). Layout modes always use the bundled
    positioned extractor, never pypdf, so the output is backend-pinned
    and oracle-hashable (see ``pdf_fallback.extract_text_layout`` for why
    the column count is explicit)."""
    import pandas as pd

    pdfs = members.filter(file_extension(F.col(name_col)) == ".pdf")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if layout is not None:
            from server2_vector_search_server_spark.sources.pdf_fallback \
                import count_pages, extract_text_layout

            def extract(blob: bytes) -> tuple[str, int]:
                return (extract_text_layout(blob, mode=layout,
                                            n_columns=n_columns),
                        count_pages(blob))
        else:
            try:
                import pypdf  # type: ignore

                def extract(blob: bytes) -> tuple[str, int]:
                    reader = pypdf.PdfReader(io.BytesIO(blob))
                    return ("\n".join(p.extract_text() or ""
                                      for p in reader.pages),
                            len(reader.pages))
            except ImportError:
                from server2_vector_search_server_spark.sources \
                    .pdf_fallback import count_pages, extract_text

                def extract(blob: bytes) -> tuple[str, int]:
                    return extract_text(blob), count_pages(blob)
        for pdf in batches:
            out = pdf.drop(columns=[content_col]).copy()
            parsed = [extract(blob) for blob in pdf[content_col]]
            out["text"] = [t for t, _ in parsed]
            # total_pages: the loader metadata the reference's Docling path
            # persists alongside the text (its WAL rows carry it); both
            # backends produce it — pypdf from the page list, the fallback
            # from the page tree /Count
            out["total_pages"] = [n for _, n in parsed]
            yield out

    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                       for f in pdfs.schema if f.name != content_col)
    return pdfs.mapInPandas(
        run, schema=f"{schema}, text string, total_pages int")
