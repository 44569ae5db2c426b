"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

North-star surface for a 100 TB training-data pipeline. Design (per brief):
media bytes ride in a ``binary`` column with a typed metadata struct
alongside; decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` stages. The media libraries (Pillow, ffmpeg,
torchaudio) are NOT in this container, so ``decoder="stub"`` derives
deterministic fake features from the bytes (the distributed plumbing —
schema, batching, partitioning, UDF signatures — is fully real and tested).
``decoder="pil"`` is a REAL Pillow decode path (dimensions, bands, mean
luma, 8×8 aHash, null-row quarantine for corrupt blobs), import-gated: it
raises ``NotImplementedError`` when Pillow is absent and is exercised by
fake-module injection in ``tests/test_fake_library_injection.py`` plus an
env-gated real-Pillow test, the same pattern as the E5 embedding path.

Scale notes: media rows are large — the operators avoid shuffling content
bytes (feature extraction projects bytes away before any wide operation), and
``repartition_for_media`` sizes partitions by rows, not file count, to keep
Arrow batches bounded.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType(), False),
    T.StructField("modality", T.StringType(), False),   # image|audio|video
    T.StructField("content", T.BinaryType(), True),
    T.StructField("mime_type", T.StringType(), True),
    T.StructField("byte_size", T.LongType(), True),
    T.StructField("metadata", T.MapType(T.StringType(), T.StringType()), True),
])

IMAGE_FEATURES_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType(), False),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("n_channels", T.IntegerType(), True),
    T.StructField("mean_luma", T.DoubleType(), True),
    T.StructField("phash", T.LongType(), True),
])


def attach_media_metadata(df: DataFrame, *, content_col: str = "content",
                          id_col: str = "media_id") -> DataFrame:
    """Cheap JVM-side metadata: byte size + content digest id (no Python)."""
    out = df.withColumn("byte_size", F.length(F.col(content_col)).cast("long"))
    if id_col not in df.columns:
        out = out.withColumn(id_col, F.md5(F.col(content_col)))
    return out


def _stub_image_features(media_id: str, blob: bytes) -> dict:
    """Deterministic fake decode: features derived from a content digest.
    Replace with a real decoder (Pillow) when available — same row shape."""
    h = hashlib.sha256(blob or b"").digest()
    width = 64 + h[0] % 192            # plausible 64..255
    height = 64 + h[1] % 192
    return {
        "media_id": media_id,
        "width": int(width),
        "height": int(height),
        "n_channels": 3,
        # plain division, no rounding: k/255.0 is bit-exact on any engine,
        # while round() semantics differ (banker's vs half-away) — keeps the
        # DuckDB oracle twin byte-identical
        "mean_luma": h[2] / 255.0,
        "phash": int.from_bytes(h[3:11], "big", signed=True),
    }


def _pil_image_features(media_id: str, blob: bytes) -> dict:
    """Real decode via Pillow: width/height/bands from the decoded image,
    ``mean_luma`` and a 64-bit average-hash (aHash — mean-thresholded 8×8
    grayscale downsample; the classic public perceptual hash) so near-dup
    blocking downstream works on real pixels. Undecodable bytes yield a
    null-feature row (media_id kept, every feature NULL) — the quarantine
    shape a 100 TB media pipeline needs, since one corrupt blob must not
    fail a whole Arrow batch. Imported lazily so this body only runs on
    workers that passed the driver-side import gate."""
    import io

    from PIL import Image  # type: ignore

    none_row = {"media_id": media_id, "width": None, "height": None,
                "n_channels": None, "mean_luma": None, "phash": None}
    try:
        img = Image.open(io.BytesIO(blob or b""))
        width, height = img.size
        n_channels = len(img.getbands())
        # Pillow >= 9.1 moved resampling filters to Image.Resampling
        lanczos = getattr(getattr(Image, "Resampling", Image), "LANCZOS")
        px = list(img.convert("L").resize((8, 8), lanczos).getdata())
    except Exception:
        return none_row
    mean = sum(px) / 64.0
    bits = 0
    for i, p in enumerate(px):
        if p > mean:
            bits |= 1 << i
    if bits >= 1 << 63:                      # two's-complement into LongType
        bits -= 1 << 64
    return {
        "media_id": media_id,
        "width": int(width),
        "height": int(height),
        "n_channels": int(n_channels),
        # plain division (see _stub_image_features on round() semantics)
        "mean_luma": mean / 255.0,
        "phash": bits,
    }


def build_bmp24(rows: "list[list[tuple[int, int, int]]]") -> bytes:
    """Encode RGB pixel rows (row 0 = TOP) as a standard uncompressed
    24-bit BMP (BITMAPINFOHEADER, bottom-up, 4-byte row padding) — the
    test/fixture twin of :func:`_bmp_image_features`."""
    import struct

    height = len(rows)
    width = len(rows[0]) if rows else 0
    stride = (3 * width + 3) & ~3
    body = bytearray()
    for y in range(height - 1, -1, -1):          # bottom-up storage order
        line = bytearray()
        for r, g, b in rows[y]:
            line += bytes((b, g, r))             # BGR on disk
        line += b"\x00" * (stride - len(line))
        body += line
    header = struct.pack("<2sIHHI", b"BM", 54 + len(body), 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                      len(body), 2835, 2835, 0, 0)
    return header + dib + bytes(body)


def _bmp_luma_grid(blob: bytes) -> "tuple[int, int, list[int]]":
    """Decode uncompressed 24-bit BMP bytes (BITMAPINFOHEADER, stdlib
    struct) to ``(width, height, row-major TOP-DOWN exact-int lumas)``
    where luma = r+g+b (0..765).  Handles bottom-up vs top-down storage
    (negative height), BGR byte order, and 4-byte row padding; raises on
    anything else — callers decide the quarantine shape.  Shared by the
    feature extractor and the tile/downsample operator so the two paths
    can never disagree on pixel decoding."""
    import struct

    if blob[:2] != b"BM":
        raise ValueError("not a BMP")
    offset = struct.unpack_from("<I", blob, 10)[0]
    width = struct.unpack_from("<i", blob, 18)[0]
    height = struct.unpack_from("<i", blob, 22)[0]
    bpp = struct.unpack_from("<H", blob, 28)[0]
    compression = struct.unpack_from("<I", blob, 30)[0]
    if bpp != 24 or compression != 0 or width <= 0 or height == 0:
        raise ValueError("unsupported BMP variant")
    top_down = height < 0
    h = -height if top_down else height
    stride = (3 * width + 3) & ~3
    if len(blob) < offset + stride * h:
        raise ValueError("truncated pixel array")
    lumas = [0] * (width * h)                 # exact ints, row-major TOP
    for row in range(h):
        y = row if top_down else h - 1 - row
        base = offset + row * stride
        for x in range(width):
            p = base + 3 * x
            lumas[y * width + x] = blob[p] + blob[p + 1] + blob[p + 2]
    return width, h, lumas


def _luma_feature_row(media_id: str, width: int, h: int,
                      lumas: "list[int]") -> dict:
    """Shared feature fold for the stdlib image decoders (BMP/PNG): the
    documented exact-integer contract — ``mean_luma`` = Σluma/(n·765)
    (one division of two exact ints), ``phash`` = 64-bit block-mean hash
    where bit (i·8+j) is decided by the integer cross-product
    ``block_sum·n > total·block_n`` so no float enters the hash.  One
    implementation shared by both decoders so the formats can never
    disagree on the fold arithmetic."""
    n = width * h
    total = sum(lumas)
    block_sum = [[0] * 8 for _ in range(8)]
    block_n = [[0] * 8 for _ in range(8)]
    for y in range(h):
        bi = (y * 8) // h
        for x in range(width):
            bj = (x * 8) // width
            block_sum[bi][bj] += lumas[y * width + x]
            block_n[bi][bj] += 1
    bits = 0
    for bi in range(8):
        for bj in range(8):
            if block_sum[bi][bj] * n > total * block_n[bi][bj]:
                bits |= 1 << (bi * 8 + bj)
    if bits >= 1 << 63:
        bits -= 1 << 64
    return {"media_id": media_id, "width": int(width), "height": int(h),
            "n_channels": 3, "mean_luma": total / (n * 765),
            "phash": bits}


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def build_png(rows: "list[list[tuple[int, int, int]]]") -> bytes:
    """Encode RGB pixel rows (row 0 = TOP) as a real 8-bit truecolor PNG
    (stdlib struct+zlib).  Row ``y`` uses scanline filter ``y % 5``, so a
    fixture taller than 4 rows exercises EVERY filter type (None, Sub,
    Up, Average, Paeth) against the decoder — the test/fixture twin of
    :func:`_png_luma_grid`."""
    import struct
    import zlib

    height = len(rows)
    width = len(rows[0]) if rows else 0
    stride = 3 * width
    raw = bytearray()
    prev = bytes(stride)
    for y in range(height):
        line = bytearray()
        for r, g, b in rows[y]:
            line += bytes((r, g, b))
        f = y % 5
        raw.append(f)
        for i in range(stride):
            a = line[i - 3] if i >= 3 else 0
            up = prev[i]
            c = prev[i - 3] if i >= 3 else 0
            if f == 0:
                raw.append(line[i])
            elif f == 1:
                raw.append((line[i] - a) & 0xFF)
            elif f == 2:
                raw.append((line[i] - up) & 0xFF)
            elif f == 3:
                raw.append((line[i] - (a + up) // 2) & 0xFF)
            else:
                raw.append((line[i] - _paeth(a, up, c)) & 0xFF)
        prev = bytes(line)

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (_PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw), 9))
            + chunk(b"IEND", b""))


def _paeth(a: int, b: int, c: int) -> int:
    """PNG Paeth predictor (RFC 2083 §6.6)."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _png_luma_grid(blob: bytes) -> "tuple[int, int, list[int]]":
    """Decode 8-bit PNG bytes (stdlib struct+zlib) to ``(width, height,
    row-major TOP-DOWN exact-int lumas)`` with luma = r+g+b (0..765),
    the same contract as :func:`_bmp_luma_grid`.  Supports the five
    scanline filters and color types 0 (gray, luma 3·v), 2 (RGB),
    3 (palette via PLTE), 4 (gray+alpha) and 6 (RGBA; alpha ignored).
    Raises on bit depths other than 8 and on Adam7 interlace — callers
    decide the quarantine shape."""
    import struct
    import zlib

    if blob[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    ihdr = None
    plte = b""
    idat = bytearray()
    pos = 8
    while pos + 8 <= len(blob):
        ln, typ = struct.unpack_from(">I4s", blob, pos)
        data = blob[pos + 8:pos + 8 + ln]
        if len(data) < ln:
            raise ValueError("truncated chunk")
        pos += 12 + ln
        if typ == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif typ == b"PLTE":
            plte = data
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
    if ihdr is None:
        raise ValueError("missing IHDR")
    width, h, depth, ctype, comp, filt, interlace = ihdr
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype)
    if (depth != 8 or channels is None or comp != 0 or filt != 0
            or interlace != 0 or width <= 0 or h <= 0):
        raise ValueError("unsupported PNG variant")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) < h * (1 + stride):
        raise ValueError("truncated pixel data")
    lumas = [0] * (width * h)
    prev = bytearray(stride)
    p = 0
    for y in range(h):
        f = raw[p]
        line = bytearray(raw[p + 1:p + 1 + stride])
        p += 1 + stride
        if f == 1:
            for i in range(channels, stride):
                line[i] = (line[i] + line[i - channels]) & 0xFF
        elif f == 2:
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif f == 3:
            for i in range(stride):
                a = line[i - channels] if i >= channels else 0
                line[i] = (line[i] + (a + prev[i]) // 2) & 0xFF
        elif f == 4:
            for i in range(stride):
                a = line[i - channels] if i >= channels else 0
                c = prev[i - channels] if i >= channels else 0
                line[i] = (line[i] + _paeth(a, prev[i], c)) & 0xFF
        elif f != 0:
            raise ValueError(f"bad filter byte {f}")
        for x in range(width):
            q = x * channels
            if ctype == 2 or ctype == 6:
                luma = line[q] + line[q + 1] + line[q + 2]
            elif ctype == 3:
                pi = 3 * line[q]
                if pi + 2 >= len(plte):
                    raise ValueError("palette index out of range")
                luma = plte[pi] + plte[pi + 1] + plte[pi + 2]
            else:                       # gray / gray+alpha
                luma = 3 * line[q]
            lumas[y * width + x] = luma
        prev = line
    return width, h, lumas


def _png_image_features(media_id: str, blob: bytes) -> dict:
    """REAL PNG decode with ZERO dependencies (stdlib struct + zlib):
    chunk walk, concatenated-IDAT inflate, all five scanline unfilters
    (incl. Paeth), color types 0/2/3/4/6 at bit depth 8.  Same feature
    contract as ``_bmp_image_features`` via the shared
    ``_luma_feature_row`` fold; undecodable / interlaced / 16-bit blobs
    yield the null-feature quarantine row."""
    none_row = {"media_id": media_id, "width": None, "height": None,
                "n_channels": None, "mean_luma": None, "phash": None}
    try:
        width, h, lumas = _png_luma_grid(blob)
    except Exception:
        return none_row
    return _luma_feature_row(media_id, width, h, lumas)


def _bmp_image_features(media_id: str, blob: bytes) -> dict:
    """REAL image decode with ZERO dependencies: parse uncompressed 24-bit
    BMP bytes (BITMAPINFOHEADER) with stdlib struct — like the WAV path,
    this real decoder runs in ANY container, no import gate. Handles the
    format's actual quirks: bottom-up vs top-down row order (negative
    height), BGR byte order, 4-byte row padding, pixel-array offset from
    the file header.

    Feature contract (documented so the byte-blind oracle can mirror it):
    ``luma`` per pixel is the exact integer r+g+b (0..765);
    ``mean_luma`` = Σluma / (n·765) — one division of two exact ints, so
    IEEE-identical on any engine; ``phash`` is the 64-bit block-mean hash:
    the image is cut into an 8×8 grid (pixel (x, y) belongs to block
    (y·8//H, x·8//W)) and bit (i·8+j) is set iff the block's mean luma
    exceeds the global mean, decided by the EXACT integer cross-product
    ``block_sum · n > total · block_n`` — no float enters the hash.
    Undecodable / non-24bpp / compressed blobs yield the null-feature
    quarantine row."""
    import struct

    none_row = {"media_id": media_id, "width": None, "height": None,
                "n_channels": None, "mean_luma": None, "phash": None}
    try:
        width, h, lumas = _bmp_luma_grid(blob)
    except Exception:
        return none_row
    return _luma_feature_row(media_id, width, h, lumas)


def extract_image_features(media: DataFrame, *, decoder: str = "stub",
                           content_col: str = "content",
                           id_col: str = "media_id") -> DataFrame:
    """Image decode + feature extraction via mapInPandas (J1-shaped: one
    decoder instance per worker, Arrow batches, bytes projected away).
    ``decoder="pil"`` runs the real Pillow decode (``_pil_image_features``)
    when the library is importable and raises ``NotImplementedError``
    otherwise; ``decoder="bmp"`` is a REAL stdlib decode of uncompressed
    24-bit BMP (never gated — see ``_bmp_image_features``);
    ``decoder="stub"`` is the deterministic fake for containers without
    media libraries."""
    import pandas as pd

    if decoder == "pil":
        try:
            import PIL  # type: ignore  # noqa: F401
        except ImportError as exc:
            raise NotImplementedError(
                "Pillow not installed in this container; use decoder='stub' "
                "for the deterministic fake, or install Pillow.") from exc
        extract = _pil_image_features
    elif decoder == "bmp":
        extract = _bmp_image_features          # stdlib-real, never gated
    elif decoder == "png":
        extract = _png_image_features          # stdlib-real, never gated
    elif decoder == "stub":
        extract = _stub_image_features
    else:
        raise ValueError(f"unknown decoder {decoder!r}")

    src = media.select(id_col, content_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [extract(m, b)
                    for m, b in zip(pdf[id_col], pdf[content_col])]
            yield pd.DataFrame(rows, columns=[f.name for f in
                                              IMAGE_FEATURES_SCHEMA.fields])

    return src.mapInPandas(run, schema=IMAGE_FEATURES_SCHEMA)


AUDIO_FEATURES_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType(), False),
    T.StructField("sample_rate", T.IntegerType(), True),
    T.StructField("n_channels", T.IntegerType(), True),
    T.StructField("n_samples", T.LongType(), True),
    T.StructField("duration_s", T.DoubleType(), True),
    T.StructField("rms", T.DoubleType(), True),
    T.StructField("zero_crossings", T.LongType(), True),
])

_AUDIO_NONE = {"sample_rate": None, "n_channels": None, "n_samples": None,
               "duration_s": None, "rms": None, "zero_crossings": None}


def _stub_audio_features(media_id: str, blob: bytes) -> dict:
    """Deterministic fake: header-shaped features from a content digest
    (non-WAV containers — mp3/flac decode would need ffmpeg)."""
    h = hashlib.sha256(blob or b"").digest()
    n = max(1, len(blob or b""))
    return {"media_id": media_id, "sample_rate": 8000, "n_channels": 1,
            "n_samples": n, "duration_s": n / 8000.0,
            "rms": h[0] / 255.0, "zero_crossings": int(h[1])}


def _wav_audio_features(media_id: str, blob: bytes) -> dict:
    """REAL decode of RIFF/WAVE PCM via the stdlib ``wave`` module — no
    third-party dependency, so unlike images (Pillow) and video (ffmpeg)
    the audio decode path runs for real in ANY container. Features are
    computed over channel 0 of 16-bit PCM: ``rms = sqrt(Σs²/n)`` with the
    sum folded as an exact Python int (arbitrary precision, order-free)
    and the final divide/sqrt in IEEE double — bit-reproducible against a
    SQL twin that folds the same integers (Σs² < 2^53 ⇒ the double
    conversion is exact); ``zero_crossings`` counts sign-bit transitions
    ((a >= 0) != (b >= 0)) as an exact count. Undecodable bytes and
    unsupported widths (8/24/32-bit) yield the null-feature quarantine
    row, same policy as the image path."""
    import io
    import math
    import struct
    import wave

    try:
        w = wave.open(io.BytesIO(blob or b""), "rb")
        nch = w.getnchannels()
        width = w.getsampwidth()
        rate = w.getframerate()
        nf = w.getnframes()
        frames = w.readframes(nf)
        if width != 2 or nch < 1:
            raise ValueError("only 16-bit PCM supported")
        samples = struct.unpack(f"<{len(frames) // 2}h", frames)
    except Exception:
        return {"media_id": media_id, **_AUDIO_NONE}
    ch0 = samples[::nch]
    n = len(ch0)
    if n == 0:
        return {"media_id": media_id, "sample_rate": int(rate),
                "n_channels": int(nch), "n_samples": 0, "duration_s": 0.0,
                "rms": 0.0, "zero_crossings": 0}
    sumsq = sum(s * s for s in ch0)                  # exact int fold
    zc = sum(1 for a, b in zip(ch0, ch0[1:]) if (a >= 0) != (b >= 0))
    return {"media_id": media_id, "sample_rate": int(rate),
            "n_channels": int(nch), "n_samples": n,
            "duration_s": n / float(rate),
            "rms": math.sqrt(sumsq / n), "zero_crossings": zc}


def extract_audio_features(media: DataFrame, *, decoder: str = "stub",
                           content_col: str = "content",
                           id_col: str = "media_id") -> DataFrame:
    """Audio decode + feature extraction via mapInPandas. ``decoder="wav"``
    is a REAL stdlib decode (``_wav_audio_features``); ``decoder="stub"``
    is the digest fake for formats needing external decoders."""
    import pandas as pd

    if decoder == "wav":
        extract = _wav_audio_features
    elif decoder == "stub":
        extract = _stub_audio_features
    else:
        raise ValueError(f"unknown decoder {decoder!r}")

    src = media.select(id_col, content_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [extract(m, b)
                    for m, b in zip(pdf[id_col], pdf[content_col])]
            yield pd.DataFrame(rows, columns=[f.name for f in
                                              AUDIO_FEATURES_SCHEMA.fields])

    return src.mapInPandas(run, schema=AUDIO_FEATURES_SCHEMA)


def audio_frame_energy(media: DataFrame, *, frame_len: int = 400,
                       content_col: str = "content",
                       id_col: str = "media_id") -> DataFrame:
    """One row per fixed-length audio frame with its EXACT integer energy
    (Σs² over channel-0 16-bit PCM samples) — the front half of
    energy-based voice-activity detection: decode is map-side (bytes
    never shuffle; only the tiny (media_id, frame_index, energy) rows
    do), and the segmentation back half is plain DataFrame windowing, so
    an hour-long recording fans out to ~9k frame rows instead of one
    giant blob row.  The trailing partial frame is DROPPED (only full
    frames are comparable under a per-frame threshold); undecodable or
    non-16-bit blobs contribute zero rows — the quarantine policy of the
    other real decoders.  Exactness: each energy is an exact Python-int
    fold boxed to BIGINT, so thresholding downstream is an integer
    compare on any engine."""
    import io
    import struct
    import wave

    import pandas as pd

    if frame_len < 1:
        raise ValueError("frame_len must be >= 1")

    out_schema = T.StructType([
        T.StructField("media_id", T.StringType(), False),
        T.StructField("frame_index", T.IntegerType(), False),
        T.StructField("energy", T.LongType(), False),
    ])
    src = media.select(id_col, content_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_index": [], "energy": []}
            for m, blob in zip(pdf[id_col], pdf[content_col]):
                try:
                    w = wave.open(io.BytesIO(bytes(blob or b"")), "rb")
                    nch = w.getnchannels()
                    if w.getsampwidth() != 2 or nch < 1:
                        raise ValueError("only 16-bit PCM supported")
                    frames = w.readframes(w.getnframes())
                    samples = struct.unpack(
                        f"<{len(frames) // 2}h", frames)[::nch]
                except Exception:
                    continue                    # quarantine: zero frames
                for f in range(len(samples) // frame_len):
                    seg = samples[f * frame_len:(f + 1) * frame_len]
                    out["media_id"].append(m)
                    out["frame_index"].append(f)
                    out["energy"].append(sum(s * s for s in seg))
            yield pd.DataFrame(out)

    return src.mapInPandas(run, schema=out_schema)


def image_tile_stats(media: DataFrame, *, grid: int = 4,
                     content_col: str = "content",
                     id_col: str = "media_id") -> DataFrame:
    """Integer box-downsample / patch extraction over REAL BMP bytes: one
    row per tile of a ``grid × grid`` cut — (tile_row, tile_col, n_px,
    luma_sum), all exact integers.  ``luma_sum / n_px`` IS the resized
    image's pixel value (box filter), kept as the sum/count pair so no
    rounding policy enters the engine; downstream consumers divide once.
    Tile assignment mirrors the pHash block rule — pixel (x, y) belongs
    to tile (y·g//H, x·g//W) — so every pixel lands in exactly one tile
    at ANY aspect ratio (no dropped remainder rows/cols, unlike
    stride-based crops).

    This is the vision-pipeline 'resize / patch-extract' verb with the
    same discipline as the other real decoders: decode is map-side via
    ``_bmp_luma_grid`` (bytes never shuffle; tile rows are tiny),
    undecodable blobs contribute zero rows (quarantine).  On a 100 TB
    media corpus the emitted (id, tile, sums) rows are what feeds patch
    statistics / thumbnail stores — pixels stay inside the task that
    decoded them."""
    import pandas as pd

    if grid < 1:
        raise ValueError("grid must be >= 1")

    out_schema = T.StructType([
        T.StructField("media_id", T.StringType(), False),
        T.StructField("tile_row", T.IntegerType(), False),
        T.StructField("tile_col", T.IntegerType(), False),
        T.StructField("n_px", T.LongType(), False),
        T.StructField("luma_sum", T.LongType(), False),
    ])
    src = media.select(id_col, content_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "tile_row": [], "tile_col": [],
                   "n_px": [], "luma_sum": []}
            for m, blob in zip(pdf[id_col], pdf[content_col]):
                try:
                    width, h, lumas = _bmp_luma_grid(bytes(blob or b""))
                except Exception:
                    continue                    # quarantine: zero tiles
                g = min(grid, width, h)         # never emit empty tiles
                sums = [[0] * g for _ in range(g)]
                ns = [[0] * g for _ in range(g)]
                for y in range(h):
                    bi = (y * g) // h
                    for x in range(width):
                        bj = (x * g) // width
                        sums[bi][bj] += lumas[y * width + x]
                        ns[bi][bj] += 1
                for bi in range(g):
                    for bj in range(g):
                        out["media_id"].append(m)
                        out["tile_row"].append(bi)
                        out["tile_col"].append(bj)
                        out["n_px"].append(ns[bi][bj])
                        out["luma_sum"].append(sums[bi][bj])
            yield pd.DataFrame(out)

    return src.mapInPandas(run, schema=out_schema)


def vad_segments(frame_energy: DataFrame, *, frame_len: int,
                 sample_rate: int, mean_energy_threshold: int,
                 id_col: str = "media_id") -> DataFrame:
    """Energy-based voice-activity segments from :func:`audio_frame_energy`
    rows: a frame is ACTIVE iff ``energy > threshold · frame_len`` (an
    all-integer compare — the mean-energy threshold never becomes a
    float), and consecutive active frames merge into one segment via the
    gaps-and-islands identity (frame_index − row_number is constant
    within a run).  Returns one row per segment with exact frame bounds,
    the exact summed energy, and start/end seconds (single division,
    rounded to the house 6 decimals).

    Scale shape: one shuffle on ``media_id`` for the window, then a
    partial-aggregable groupBy on (media_id, island) — both proportional
    to frame rows, which are ~4 orders of magnitude smaller than the
    audio bytes. The window partitions by recording, so skew is bounded
    by the longest single recording, not the corpus."""
    from pyspark.sql import Window

    active = frame_energy.filter(
        F.col("energy") > F.lit(int(mean_energy_threshold) * frame_len))
    w = Window.partitionBy(id_col).orderBy("frame_index")
    isl = active.withColumn(
        "island", F.col("frame_index") - F.row_number().over(w))
    segs = (isl.groupBy(id_col, "island")
            .agg(F.min("frame_index").alias("start_frame"),
                 F.max("frame_index").alias("end_frame"),
                 F.count(F.lit(1)).cast("long").alias("n_frames"),
                 F.sum("energy").cast("long").alias("energy_total")))
    w2 = Window.partitionBy(id_col).orderBy("start_frame")
    per_s = float(sample_rate)
    return (segs.withColumn("seg_index",
                            (F.row_number().over(w2) - 1).cast("int"))
            .select(id_col, "seg_index", "start_frame", "end_frame",
                    "n_frames", "energy_total",
                    F.round(F.col("start_frame") * frame_len / per_s, 6)
                    .alias("start_s"),
                    F.round((F.col("end_frame") + 1) * frame_len / per_s, 6)
                    .alias("end_s")))


def build_pcm16_wav(samples, *, sample_rate: int = 8000,
                    n_channels: int = 1) -> bytes:
    """Encode 16-bit PCM samples to WAV bytes with the stdlib encoder —
    the test/fixture twin of :func:`_wav_audio_features` (encode→decode
    round-trips losslessly, PCM is raw)."""
    import io
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_channels)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue()


def build_gif89a(frame_delays_cs, *, width: int = 2,
                 height: int = 2) -> bytes:
    """Minimal animated GIF89a: one frame per entry of ``frame_delays_cs``
    (delay in centiseconds, the format's native unit), 2-color global
    table, tiny opaque LZW payload per frame — the fixture twin of
    :func:`parse_gif_frames`, which never inspects the pixel data."""
    import struct

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", width, height, 0x80, 0, 0)  # 2-color GCT
    out += b"\x00\x00\x00\xff\xff\xff"
    for d in frame_delays_cs:
        out += b"\x21\xf9\x04\x00" + struct.pack("<H", d) + b"\x00\x00"
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, width, height) + b"\x00"
        out += b"\x02"                        # LZW min code size
        out += b"\x02\x44\x01"                # one 2-byte data sub-block
        out += b"\x00"                        # sub-block terminator
    out += b"\x3b"
    return bytes(out)


def parse_gif_frames(blob: bytes) -> "tuple[int, int, list[int]]":
    """REAL parse of the GIF89a/87a container with stdlib struct — like
    the WAV and BMP paths, ungated and runnable in any container. Walks
    the block structure (extensions, image descriptors, length-prefixed
    data sub-blocks) WITHOUT LZW-decoding pixels: frame sampling needs
    per-frame Graphic Control delays, not pixel values — exactly the
    metadata an ffmpeg-based sampler would read. Returns
    ``(width, height, [delay_cs per frame])``; raises on non-GIF or
    truncated bytes (callers quarantine by emitting zero frame rows)."""
    import struct

    if blob[:6] not in (b"GIF89a", b"GIF87a"):
        raise ValueError("not a GIF")
    width, height = struct.unpack_from("<HH", blob, 6)
    packed = blob[10]
    pos = 13
    if packed & 0x80:                          # skip global color table
        pos += 3 * (2 ** ((packed & 0x07) + 1))
    delays: list[int] = []
    pending = 0

    def skip_subblocks(p: int) -> int:
        while True:
            n = blob[p]
            p += 1 + n
            if n == 0:
                return p

    while True:
        b0 = blob[pos]
        if b0 == 0x3B:                         # trailer
            break
        if b0 == 0x21:                         # extension
            label = blob[pos + 1]
            pos += 2
            if label == 0xF9:                  # Graphic Control Extension
                pending = struct.unpack_from("<H", blob, pos + 2)[0]
            pos = skip_subblocks(pos)
        elif b0 == 0x2C:                       # image descriptor = a frame
            pos += 9
            lpacked = blob[pos]
            pos += 1
            if lpacked & 0x80:                 # skip local color table
                pos += 3 * (2 ** ((lpacked & 0x07) + 1))
            pos += 1                           # LZW minimum code size
            pos = skip_subblocks(pos)
            delays.append(pending)
            pending = 0
        else:
            raise ValueError(f"unknown GIF block 0x{b0:02x}")
    return int(width), int(height), delays


def sample_video_frames(media: DataFrame, *,
                        every_n_seconds: float | None = None,
                        decoder: str = "stub",
                        content_col: str = "content",
                        id_col: str = "media_id") -> DataFrame:
    """Frame sampling: one video row → N frame rows (UDTF shape).

    ``every_n_seconds=None`` (default) samples at the container's native
    frame rate — every real frame for GIF; the stub's fake video is one
    frame per second by construction, so None ≡ 1.0 there.  A float is
    HONORED on both paths (ADVICE r8: the GIF path used to accept and
    silently ignore it): for GIF, the first frame at/after each k·interval
    boundary is emitted (with its true timestamp and original frame
    index), sparse frames advance the boundary past themselves so a long
    still doesn't re-emit.

    ``decoder="gif"`` walks REAL container bytes (:func:`parse_gif_frames`)
    at cumulative Graphic-Control timestamps (exact centisecond ints,
    divided once by 100.0); corrupt blobs contribute zero rows — a
    frame-less video, not a job failure.  ``decoder="stub"`` emits
    deterministic frame indices from a fake byte-size duration (non-GIF
    containers would need ffmpeg — same row shape)."""
    import pandas as pd

    if decoder not in ("stub", "gif"):
        raise ValueError(f"unknown decoder {decoder!r}")
    if every_n_seconds is not None and not every_n_seconds > 0:
        raise ValueError("every_n_seconds must be positive or None")

    out_schema = T.StructType([
        T.StructField("media_id", T.StringType(), False),
        T.StructField("frame_index", T.IntegerType(), False),
        T.StructField("frame_time_s", T.DoubleType(), False),
    ])
    src = media.select(id_col, content_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_index": [], "frame_time_s": []}
            for m, blob in zip(pdf[id_col], pdf[content_col]):
                if decoder == "gif":
                    try:
                        _, _, delays = parse_gif_frames(bytes(blob or b""))
                    except Exception:
                        continue               # quarantine: zero frames
                    cum = 0
                    # exact-integer boundary test: frame time is cum
                    # centiseconds, boundary k·interval — compare
                    # cum >= k·interval·100 in centiseconds so float
                    # accumulation never drifts the cut
                    next_k = 0
                    for i, d in enumerate(delays):
                        if (every_n_seconds is None
                                or cum >= next_k * every_n_seconds * 100.0):
                            out["media_id"].append(m)
                            out["frame_index"].append(i)
                            out["frame_time_s"].append(cum / 100.0)
                            if every_n_seconds is not None:
                                # advance past this frame's time so a
                                # long still frame is emitted once
                                next_k += 1
                                while (next_k * every_n_seconds * 100.0
                                       <= cum):
                                    next_k += 1
                        cum += d
                    continue
                duration = max(1.0, len(blob or b"") / 1e5)
                n = int(duration / (1.0 if every_n_seconds is None
                                    else every_n_seconds))
                for i in range(n):
                    out["media_id"].append(m)
                    out["frame_index"].append(i)
                    out["frame_time_s"].append(round(
                        i * (1.0 if every_n_seconds is None
                             else every_n_seconds), 6))
            yield pd.DataFrame(out)

    return src.mapInPandas(run, schema=out_schema)


def phash_near_duplicate_pairs(features: DataFrame, *,
                               hash_col: str = "phash",
                               id_col: str = "media_id",
                               max_hamming: int = 3) -> DataFrame:
    """Perceptual-hash image near-dedup: pairs whose 64-bit pHash differs
    in ≤ ``max_hamming`` bits — the standard image-dedup move (same image
    re-encoded/resized drifts a few pHash bits; distinct images differ in
    ~32). Candidates via Manku segment blocking (the SimHash machinery
    applied to the image modality): split the 64-bit hash into
    ``max_hamming + 1`` segments — a pair within the radius must agree
    exactly on ≥ 1 segment (pigeonhole) — equi-join per segment, then
    verify with XOR+popcount. Shuffle ∝ images × segments, never n².

    Segment extraction uses ARITHMETIC shift + mask: ``(h >> off) & mask``
    equals the logical-shift segment for any off ≤ 64−seg_bits, and is
    what DuckDB's ``>>`` computes too — keeping the oracle twin bit-exact
    on negative (sign-bit-set) hashes."""
    n_segments = max_hamming + 1
    seg_bits = 64 // n_segments
    mask = (1 << seg_bits) - 1
    h = F.col(hash_col)
    segs = F.array(*[
        F.shiftright(h, i * seg_bits).bitwiseAND(F.lit(mask))
        for i in range(n_segments)])
    keyed = features.select(
        F.col(id_col).alias("id"), h.alias("h"),
        F.posexplode(segs).alias("seg_idx", "seg_val"))
    cand = (keyed.select(F.col("id").alias("id_a"), F.col("h").alias("h_a"),
                         "seg_idx", "seg_val")
            .join(keyed.select(F.col("id").alias("id_b"),
                               F.col("h").alias("h_b"),
                               "seg_idx", "seg_val"),
                  ["seg_idx", "seg_val"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", "h_a", "h_b").distinct())
    return (cand.withColumn(
                "hamming",
                F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b"))))
            .filter(F.col("hamming") <= max_hamming)
            .select("id_a", "id_b", "hamming"))


def repartition_for_media(df: DataFrame, rows_per_partition: int = 256) -> DataFrame:
    """Bound Arrow batch memory for large binary rows: partition count from
    row count, not input file layout."""
    n = max(1, df.count() // rows_per_partition)
    return df.repartition(n)


def chunk_audio_windows(media: DataFrame, *, window_s: float = 2.0,
                        hop_s: float = 1.0, sample_rate: int = 8000,
                        content_col: str = "content",
                        id_col: str = "media_id") -> DataFrame:
    """Audio windowing plumbing: one audio row → N overlapping analysis
    windows (the STFT/VAD/ASR-chunking front end). The stub derives a fake
    duration from byte count (1 byte/sample at ``sample_rate``) and a fake
    per-window RMS from the content digest; a real build decodes PCM with
    soundfile/ffmpeg — identical row shape, identical fan-out (UDTF shape:
    rows multiply by duration/hop, so repartition_for_media applies
    upstream exactly as for video)."""
    import hashlib

    import pandas as pd

    out_schema = T.StructType([
        T.StructField("media_id", T.StringType(), False),
        T.StructField("window_index", T.IntegerType(), False),
        T.StructField("start_s", T.DoubleType(), False),
        T.StructField("end_s", T.DoubleType(), False),
        T.StructField("rms_stub", T.DoubleType(), False),
    ])
    src = media.select(id_col, content_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k.name: [] for k in out_schema.fields}
            for m, blob in zip(pdf[id_col], pdf[content_col]):
                blob = blob or b""
                h = hashlib.sha256(blob).digest()
                duration = max(window_s, len(blob) / float(sample_rate))
                n = int((duration - window_s) / hop_s) + 1
                for i in range(n):
                    out["media_id"].append(m)
                    out["window_index"].append(i)
                    out["start_s"].append(i * hop_s)
                    out["end_s"].append(i * hop_s + window_s)
                    # plain division, no rounding (banker's-vs-half-away)
                    out["rms_stub"].append(h[i % 32] / 255.0)
            yield pd.DataFrame(out)

    return src.mapInPandas(run, schema=out_schema)


def resample_audio_features(media: DataFrame, *, l: int, m: int,
                            content_col: str = "content",
                            id_col: str = "media_id") -> DataFrame:
    """Rational L/M resample of channel-0 16-bit PCM (sample-rate
    conversion, the front of any multi-corpus audio normalization) with
    linear interpolation carried in EXACT scaled integers: output j sits
    at input position j·M/L, i.e. between i0 = ⌊j·M/L⌋ and i0+1 with
    fractional numerator frac = (j·M) mod L, and the sample is kept as
    out_scaled = s[i0]·(L−frac) + s[i0+1]·frac — the true value times L,
    never a float — so Σout² and sign transitions are exact integer
    folds any engine reproduces bit-for-bit.  n_out = ⌊(n−1)·L/M⌋ + 1
    (every output position must have a right neighbor or frac == 0).
    No anti-alias filter: this is the interpolation contract only —
    a decimating production path composes a FIR low-pass (a windowed
    dot product per frame, same mapInPandas shape) in front.

    Scale: decode + resample + fold are all map-side inside one
    mapInPandas; only the 6-column feature rows ever shuffle.
    Undecodable / non-16-bit blobs quarantine to zero rows (the policy
    of every real decoder here)."""
    import io
    import struct
    import wave

    import pandas as pd

    if l < 1 or m < 1:
        raise ValueError("l and m must be >= 1")

    out_schema = T.StructType([
        T.StructField("media_id", T.StringType(), False),
        T.StructField("n_in", T.LongType(), False),
        T.StructField("n_out", T.LongType(), False),
        T.StructField("sumsq_scaled", T.LongType(), False),
        T.StructField("zero_crossings_out", T.LongType(), False),
    ])
    src = media.select(id_col, content_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k.name: [] for k in out_schema.fields}
            for mid, blob in zip(pdf[id_col], pdf[content_col]):
                try:
                    w = wave.open(io.BytesIO(bytes(blob or b"")), "rb")
                    nch = w.getnchannels()
                    if w.getsampwidth() != 2 or nch < 1:
                        raise ValueError("only 16-bit PCM supported")
                    frames = w.readframes(w.getnframes())
                    s = struct.unpack(
                        f"<{len(frames) // 2}h", frames)[::nch]
                except Exception:
                    continue
                n = len(s)
                if n < 2:
                    continue
                n_out = (n - 1) * l // m + 1
                res = []
                for j in range(n_out):
                    pos = j * m
                    i0, frac = divmod(pos, l)
                    s1 = s[i0 + 1] if frac else s[i0]
                    res.append(s[i0] * (l - frac) + s1 * frac)
                sumsq = sum(v * v for v in res)      # exact int fold
                zc = sum(1 for a, b in zip(res, res[1:])
                         if (a >= 0) != (b >= 0))
                out["media_id"].append(mid)
                out["n_in"].append(n)
                out["n_out"].append(n_out)
                out["sumsq_scaled"].append(sumsq)
                out["zero_crossings_out"].append(zc)
            yield pd.DataFrame(out)

    return src.mapInPandas(run, schema=out_schema)


SOBEL_X = ((-1, 0, 1), (-2, 0, 2), (-1, 0, 1))
SOBEL_Y = ((-1, -2, -1), (0, 0, 0), (1, 2, 1))


def image_conv3x3_stats(media: DataFrame, *,
                        kx: "tuple" = SOBEL_X, ky: "tuple" = SOBEL_Y,
                        decoder: str = "bmp",
                        content_col: str = "content",
                        id_col: str = "media_id") -> DataFrame:
    """3×3 convolution feature extraction (default Sobel) over REAL
    decoded images — the edge/texture verb of a vision preprocessing
    pipeline, next to tile downsampling.  Per interior pixel the two
    kernel responses Gx, Gy are EXACT integers (luma ≤ 765, kernel sums
    ≤ ±8·765) and the per-image statistics fold as exact ints: edge
    energy Σ(|Gx|+|Gy|) (the L1 gradient magnitude — no sqrt, no float
    policy enters the engine) and the max gradient.  Valid-mode borders
    (no padding) keep the arithmetic assumption-free.

    Scale: decode + convolve are map-side in one mapInPandas; only the
    5-column stat rows shuffle.  Undecodable blobs quarantine to zero
    rows (the house decoder policy)."""
    import pandas as pd

    if decoder == "bmp":
        grid_of = _bmp_luma_grid
    elif decoder == "png":
        grid_of = _png_luma_grid
    else:
        raise ValueError(f"unknown decoder {decoder!r}")

    out_schema = T.StructType([
        T.StructField("media_id", T.StringType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("n_interior", T.LongType(), False),
        T.StructField("edge_energy", T.LongType(), False),
        T.StructField("max_grad", T.LongType(), False),
    ])
    src = media.select(id_col, content_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k.name: [] for k in out_schema.fields}
            for mid, blob in zip(pdf[id_col], pdf[content_col]):
                try:
                    w, h, luma = grid_of(bytes(blob or b""))
                except Exception:
                    continue
                if w < 3 or h < 3:
                    continue
                energy = 0
                mx = 0
                for y in range(1, h - 1):
                    for x in range(1, w - 1):
                        gx = gy = 0
                        for dy in (-1, 0, 1):
                            row = (y + dy) * w
                            for dx in (-1, 0, 1):
                                v = luma[row + x + dx]
                                gx += kx[dy + 1][dx + 1] * v
                                gy += ky[dy + 1][dx + 1] * v
                        g = abs(gx) + abs(gy)
                        energy += g
                        if g > mx:
                            mx = g
                out["media_id"].append(mid)
                out["width"].append(w)
                out["height"].append(h)
                out["n_interior"].append((w - 2) * (h - 2))
                out["edge_energy"].append(energy)
                out["max_grad"].append(mx)
            yield pd.DataFrame(out)

    return src.mapInPandas(run, schema=out_schema)
