"""Exercise the import-gated real-library branches WITHOUT the libraries.

The container prohibits installs, so ``sentence_transformers`` / ``pypdf`` /
``kss`` are absent and their branches (``embedding._load_model``,
``sources/files.parse_pdf_members``'s pypdf path, ``chunking._kss_split``)
normally never execute (VERDICT r4 item 3). These tests run them under
CLEARLY-MARKED DETERMINISTIC FAKE modules so the *glue* is proven: worker-side
import resolution, batching, column shapes, the no-E5-prefix contract
(reference ``embedding.py:11-15``), ``normalize_embeddings=True``, pypdf's
page-list wiring (reference ``document_processor.py:120-121``), and KSS's
error fallback (reference ``text_spliter.py:57,66-68``).

Mechanics: the gated imports happen inside Spark *Python workers*, which a
driver-side ``sys.modules`` stub never reaches. So the fakes are written as
real modules into a temp dir, exported via ``PYTHONPATH``, and the whole
scenario runs in a fresh subprocess SparkSession (PYTHONPATH propagates
driver → JVM → pyspark workers in local mode). One subprocess covers all
three branches to pay the ~15 s Spark startup once. The fakes embed their own
contract assertions — a violated contract raises in the worker and fails the
job. Isolated from the shared test session, so the absent-library behavior
asserted elsewhere (``test_embedding.py``) is unaffected.
"""

from __future__ import annotations

import os
import pathlib
import subprocess
import sys
import textwrap

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent

_FAKE_SENTENCE_TRANSFORMERS = '''\
"""DETERMINISTIC FAKE of sentence_transformers (glue test only)."""
import numpy as np

EXPECTED_MODEL = "intfloat/multilingual-e5-large-instruct"


class SentenceTransformer:
    def __init__(self, name):
        # the engine must request the reference's exact model (config.py:35)
        assert name == EXPECTED_MODEL, f"unexpected model {name!r}"
        self.name = name

    def encode(self, texts, normalize_embeddings=False):
        # reference embedding.py:24-26 normalizes; the engine must ask for it
        assert normalize_embeddings is True
        # reference embedding.py:11-15 adds NO query:/passage: E5 prefixes;
        # texts must arrive verbatim
        assert all(not t.startswith(("query: ", "passage: ")) for t in texts)
        out = np.array([[float(len(t)), 1.0, 0.5] for t in texts])
        return out / np.linalg.norm(out, axis=1, keepdims=True)
'''

_FAKE_PYPDF = '''\
"""DETERMINISTIC FAKE of pypdf (glue test only)."""


class _Page:
    def __init__(self, text):
        self._text = text

    def extract_text(self):
        return self._text


class PdfReader:
    def __init__(self, stream):
        data = stream.read()
        # the real PDF bytes must reach the reader intact
        assert data.startswith(b"%PDF"), data[:16]
        self.pages = [_Page(f"FAKEPDF:p{i}:{len(data)}") for i in range(2)]
'''

_FAKE_KSS = '''\
"""DETERMINISTIC FAKE of kss (glue test only)."""


def split_sentences(text):
    if "BOOM" in text:
        raise RuntimeError("simulated kss failure")
    return ["FAKEKSS::" + p.strip() for p in text.split(".") if p.strip()]
'''

_FAKE_DOCX_INIT = '''\
"""DETERMINISTIC FAKE of python-docx (glue test only).

Parses the REAL OOXML zip with stdlib (the genuine library wraps lxml the
same way) and exposes exactly the API surface parse_docx_members touches:
Document(stream).element.body iteration + Paragraph/Table wrappers.
"""
import io
import zipfile
from xml.etree import ElementTree

W = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"


class _DocElement:
    def __init__(self, body):
        self.body = body


class Document:
    def __init__(self, stream):
        data = stream.read()
        # real docx bytes must reach the library intact
        assert data[:2] == b"PK", data[:8]
        with zipfile.ZipFile(io.BytesIO(data)) as zf:
            xml = zf.read("word/document.xml")
        root = ElementTree.fromstring(xml)
        self.element = _DocElement(list(root.find(W + "body")))
'''

_FAKE_DOCX_TABLE = '''\
"""FAKE docx.table (glue test only)."""
from docx import W


class _Cell:
    def __init__(self, tc):
        # python-docx newline-joins ALL cell paragraphs, empty ones
        # included — emit that shape (surrounded by blank paragraphs) so
        # the caller's normalization to space-joined non-blank text is
        # exercised, not just pass-through
        self.text = "\\n".join(
            ["", "FAKEDOCX::" + "".join(t.text or ""
                                        for t in tc.iter(W + "t")), ""])


class _Row:
    def __init__(self, tr):
        self.cells = [_Cell(tc) for tc in tr.findall(W + "tc")]


class Table:
    def __init__(self, elem, parent):
        self.rows = [_Row(tr) for tr in elem.iter(W + "tr")]
'''

_FAKE_DOCX_PARAGRAPH = '''\
"""FAKE docx.text.paragraph (glue test only)."""
from docx import W


class Paragraph:
    def __init__(self, elem, parent):
        # marker prefix proves the python-docx BRANCH ran, not the fallback
        self.text = "FAKEDOCX::" + "".join(
            t.text or "" for t in elem.iter(W + "t"))
'''

_FAKE_PIL_INIT = '''\
"""DETERMINISTIC FAKE of Pillow (glue test only).

Blob format ``IMG:<w>:<h>:<payload>``; anything else raises OSError the way
real Pillow raises UnidentifiedImageError — exercising the null-row
quarantine. Exposes exactly the API surface _pil_image_features touches:
Image.open(stream) -> .size/.getbands/.convert("L").resize((8,8),
LANCZOS).getdata(), including the Pillow>=9.1 Image.Resampling namespace.
"""
'''

_FAKE_PIL_IMAGE = '''\
"""FAKE PIL.Image (glue test only)."""


class Resampling:
    LANCZOS = "lanczos"


LANCZOS = Resampling.LANCZOS


class _Gray:
    def __init__(self, px):
        self._px = px

    def resize(self, shape, resample):
        # the operator must request the 8x8 aHash grid with LANCZOS
        assert shape == (8, 8), shape
        assert resample == Resampling.LANCZOS, resample
        return _Gray([self._px[i % len(self._px)] for i in range(64)])

    def getdata(self):
        return list(self._px)


class _Img:
    def __init__(self, data):
        parts = data.split(b":", 3)
        self.size = (int(parts[1]), int(parts[2]))
        self._payload = parts[3]

    def getbands(self):
        return ("R", "G", "B")

    def convert(self, mode):
        assert mode == "L", mode
        px = [(v * 3 + 7) % 256 for v in self._payload[:64]] or [0]
        return _Gray(px)


def open(stream):
    data = stream.read()
    if not data.startswith(b"IMG:"):
        raise OSError("cannot identify image file (fake)")
    return _Img(data)
'''

_SCENARIO = '''\
import math

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

spark = (SparkSession.builder.master("local[4]")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

# --- 1. embed_with_model default path: worker imports the (fake) library ---
from server2_vector_search_server_spark.embedding import embed_with_model

texts = spark.createDataFrame(
    [(1, "alpha"), (2, "bravo charlie"), (3, "delta echo foxtrot")],
    "id long, content string")
rows = {r["id"]: r["embedding"]
        for r in embed_with_model(texts).orderBy("id").collect()}
assert set(rows) == {1, 2, 3}
for rid, text in [(1, "alpha"), (2, "bravo charlie"),
                  (3, "delta echo foxtrot")]:
    vec = rows[rid]
    assert len(vec) == 3, vec                     # fake dim flows through
    n = float(len(text))
    norm = math.sqrt(n * n + 1.0 + 0.25)
    expect = [n / norm, 1.0 / norm, 0.5 / norm]
    assert all(abs(a - b) < 1e-6 for a, b in zip(vec, expect)), (vec, expect)
print("OK embed_with_model")

# --- 2. parse_pdf_members pypdf branch over real fixture PDF bytes ---------
from server2_vector_search_server_spark.sources.files import parse_pdf_members
from server2_vector_search_server_spark.sources.pdf_fallback import (
    build_minimal_pdf,
)

blob = build_minimal_pdf(["hello world", "second page"])
members = spark.createDataFrame(
    [("doc.pdf", bytearray(blob))], "member_name string, content binary")
out = parse_pdf_members(members).collect()
assert len(out) == 1
row = out[0]
# marker text proves the PYPDF branch ran (not the bundled fallback), with
# the exact blob delivered and total_pages wired from reader.pages
assert row["text"] == f"FAKEPDF:p0:{len(blob)}\\nFAKEPDF:p1:{len(blob)}", row
assert row["total_pages"] == 2
print("OK parse_pdf_members pypdf branch")

# --- 3. kss split: primary path + the reference error fallback ------------
from server2_vector_search_server_spark.operators.chunking import (
    split_sentences,
)

got = split_sentences("Hi there. Bye now.", mode="kss")
assert got == ["FAKEKSS::Hi there", "FAKEKSS::Bye now"], got
# text_spliter.py:66-68: on ANY kss error, fall back to newline split
got = split_sentences("BOOM line one\\nline two", mode="kss")
assert got == ["BOOM line one", "line two"], got
print("OK kss branch + error fallback")

# --- 4. parse_docx_members python-docx branch over real OOXML bytes -------
from server2_vector_search_server_spark.sources.files import (
    parse_docx_members,
)
from server2_vector_search_server_spark.sources.docx_fallback import (
    build_minimal_docx,
)

docx_members = spark.createDataFrame(
    [("m.docx", bytearray(build_minimal_docx(
        ["Para one.", "Para two."], table=[["c1", "c2"]])))],
    "member_name string, content binary")
rows = (parse_docx_members(docx_members)
        .orderBy("element_index").collect())
got = [(r["element_index"], r["category"], r["text"]) for r in rows]
# FAKEDOCX:: markers prove the python-docx branch ran (not the bundled
# stdlib fallback), in body order with the table interleaving preserved
assert got == [
    (0, "paragraph", "FAKEDOCX::Para one."),
    (1, "paragraph", "FAKEDOCX::Para two."),
    (2, "table", "FAKEDOCX::c1\\tFAKEDOCX::c2"),
], got
print("OK parse_docx_members python-docx branch")

# --- 5. extract_image_features decoder="pil" branch ------------------------
from server2_vector_search_server_spark.operators.multimodal import (
    extract_image_features,
)

good = b"IMG:16:12:" + bytes(range(80))
media = spark.createDataFrame(
    [("g", bytearray(good)), ("bad", bytearray(b"JUNKJUNK"))],
    "media_id string, content binary")
rows = {r["media_id"]: r
        for r in extract_image_features(media, decoder="pil").collect()}
# expected features re-derived with the fake's formulas: proves the real
# aHash fold (mean threshold, bit order, two's-complement) and the
# dimension/band wiring run over what the decoder returned
px = [(v * 3 + 7) % 256 for v in bytes(range(80))[:64]]
mean = sum(px) / 64.0
bits = 0
for i, p in enumerate(px):
    if p > mean:
        bits |= 1 << i
if bits >= 1 << 63:
    bits -= 1 << 64
g = rows["g"]
assert (g["width"], g["height"], g["n_channels"]) == (16, 12, 3), dict(g.asDict())
assert abs(g["mean_luma"] - mean / 255.0) < 1e-12, g["mean_luma"]
assert g["phash"] == bits, (g["phash"], bits)
# undecodable bytes -> null-feature quarantine row, never a job failure
bad = rows["bad"]
assert bad["width"] is None and bad["phash"] is None \
    and bad["mean_luma"] is None, dict(bad.asDict())
print("OK extract_image_features pil branch")

spark.stop()
print("ALL-OK")
'''


@pytest.mark.slow  # r11: driver-window tier, see OPTIMIZATION_r11.md
def test_gated_branches_run_under_fake_modules(tmp_path):
    fakes = tmp_path / "fakes"
    fakes.mkdir()
    (fakes / "sentence_transformers.py").write_text(
        _FAKE_SENTENCE_TRANSFORMERS)
    (fakes / "pypdf.py").write_text(_FAKE_PYPDF)
    (fakes / "kss.py").write_text(_FAKE_KSS)
    docx_pkg = fakes / "docx"
    (docx_pkg / "text").mkdir(parents=True)
    (docx_pkg / "__init__.py").write_text(_FAKE_DOCX_INIT)
    (docx_pkg / "table.py").write_text(_FAKE_DOCX_TABLE)
    (docx_pkg / "text" / "__init__.py").write_text("")
    (docx_pkg / "text" / "paragraph.py").write_text(_FAKE_DOCX_PARAGRAPH)
    pil_pkg = fakes / "PIL"
    pil_pkg.mkdir()
    (pil_pkg / "__init__.py").write_text(_FAKE_PIL_INIT)
    (pil_pkg / "Image.py").write_text(_FAKE_PIL_IMAGE)
    script = tmp_path / "scenario.py"
    script.write_text(textwrap.dedent(_SCENARIO))
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        [str(fakes), str(REPO)] +
        ([env["PYTHONPATH"]] if env.get("PYTHONPATH") else []))
    proc = subprocess.run(
        [sys.executable, str(script)], env=env, cwd=str(REPO),
        capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr[-4000:]
    out = proc.stdout
    assert "ALL-OK" in out, (out, proc.stderr[-4000:])
    assert "OK embed_with_model" in out
    assert "OK parse_pdf_members pypdf branch" in out
    assert "OK kss branch + error fallback" in out
    assert "OK parse_docx_members python-docx branch" in out
    assert "OK extract_image_features pil branch" in out
