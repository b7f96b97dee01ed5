"""Multimodal column plumbing (beyond-reference; SURVEY §7.1 M7): treat
image/audio/video payloads as opaque ``binary`` columns with a typed metadata
struct, and run decode / feature-extract / frame-sample as Arrow-batched
Pandas operations via ``mapInPandas``.

The codec (`decode_image`) is REAL for image headers: Pillow when
importable (full pixel access), else pure-stdlib parsers for PNG IHDR,
GIF logical-screen descriptors, and JPEG SOF frames (width/height/mode
from the published container formats — no library needed). Pixel access
without Pillow covers 8-bit RGB PNG (all five row filters) and
non-interlaced palette GIF (full LZW decompression) — both
decompression-bomb-guarded; JPEG is dims-only (a full Huffman+IDCT
baseline decode is Pillow's job). Payloads that aren't a recognized
image fall through to the deterministic identity fake (`_fake_decode`), so
the synthetic text-payload testdata still exercises the full Arrow
plumbing, while mixed PNG/GIF/JPEG fixtures in
tests/test_docs_pipeline.py prove actual decoded dimensions end-to-end.
Deep media transforms (resample, full frame extraction) would sit behind
the same hooks with ffmpeg in production.

Scale design: ``mapInPandas`` streams Arrow record batches through each task
(no row-at-a-time pickling, no driver collect); payload bytes never leave
the executor, and output schemas are fixed ``StructType``s so downstream
stages stay columnar. Partition count follows the input splits — for a
100 TB media corpus, tune ``spark.sql.files.maxPartitionBytes`` so one batch
of payloads fits executor memory.

The md5/byte-length features are engine-portable (DuckDB ``md5``/
``octet_length`` on the source text), so even the UDF path is oracle-checked
— rare for Python-side code, and deliberate: it proves the Arrow round-trip
is lossless.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import ensure_parallelism
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("payload", BinaryType()),
        StructField(
            "meta",
            StructType(
                [
                    StructField("mime", StringType()),
                    StructField("n_bytes", LongType()),
                ]
            ),
        ),
    ]
)

FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("content_md5", StringType()),
        # decode_image output — null when the payload is not an image
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("img_mode", StringType()),
    ]
)

FRAMES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame_md5", StringType()),
        StructField("n_frame_bytes", LongType()),
    ]
)

RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        # null for non-image payloads (same convention as media_features)
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("n_bytes", LongType()),
        StructField("thumb", BinaryType()),
        # md5 of the RESIZED RAW RGB bytes — codec-independent (the encoded
        # PNG bytes in ``thumb`` are deterministic only per backend/zlib)
        StructField("rgb_md5", StringType()),
    ]
)

FRAME_CHARS = 64
THUMB_MAX_SIDE = 64
#: decompression-bomb cap for the stdlib PNG pixel decode: 16 MP ≈ 48 MB of
#: raw RGB — far above any thumbnail-stage input, far below executor memory
MAX_DECODE_PIXELS = 16_000_000


def media_table(docs: DataFrame) -> DataFrame:
    """documents → media rows: utf-8 payload bytes + typed metadata struct.
    (With real media, ``payload`` would come straight off parquet/binaryFile.)"""
    docs = ensure_parallelism(docs)
    return docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.octet_length("text").cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


try:  # Pillow is optional; the stdlib header parsers below always work
    from PIL import Image as _PILImage  # type: ignore

    _HAVE_PIL = True
except ImportError:  # pragma: no cover - environment-dependent
    _PILImage = None
    _HAVE_PIL = False


def codec_backend() -> str:
    """The active image-codec backend, e.g. ``"pillow-11.0.0"`` or
    ``"stdlib"``. Thumbnail BYTES are deterministic only within one backend
    (decoded dims and ``rgb_md5`` are backend-independent), so a cluster must
    pin one backend corpus-wide; this identifier is logged once per job
    (`log_codec_backend`) and stamped into every upsert-sink manifest so a
    mixed-backend deployment is detectable from the written artifacts."""
    if _HAVE_PIL:
        import PIL

        return f"pillow-{PIL.__version__}"
    return "stdlib"


_BACKEND_LOGGED = False


def log_codec_backend() -> str:
    """Log the active backend once per driver process; returns the id."""
    global _BACKEND_LOGGED
    backend = codec_backend()
    if not _BACKEND_LOGGED:
        import logging

        logging.getLogger(__name__).warning(
            "multimodal image codec backend: %s", backend
        )
        _BACKEND_LOGGED = True
    return backend

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
#: PNG IHDR color-type byte → mode name (PNG spec, table 11.1)
_PNG_MODES = {0: "L", 2: "RGB", 3: "P", 4: "LA", 6: "RGBA"}


def decode_image(payload: bytes) -> dict | None:
    """Decode an image payload's dimensions/mode, or None if the payload is
    not a recognized image.

    Pillow when available (decodes every format it knows); otherwise a
    pure-stdlib parse of the three self-describing containers we commit
    test fixtures for: PNG (signature + IHDR — width/height are bytes
    16..24 big-endian, color type byte 25), GIF87a/89a (logical screen
    width/height, little-endian at bytes 6..10), and JPEG (SOF marker
    scan, ``_jpeg_dims`` — a real crawl is mostly JPEG, so the
    dimensions-only fallback keeps the features pipeline informative even
    without Pillow). Returns ``{"width", "height", "mode"}``. Runs inside
    the Arrow batch loop — must never raise on arbitrary bytes."""
    if _HAVE_PIL:
        import io

        try:
            with _PILImage.open(io.BytesIO(payload)) as im:
                return {"width": im.width, "height": im.height, "mode": im.mode}
        except Exception:
            return None
    if payload[:8] == _PNG_SIG and len(payload) >= 26 and payload[12:16] == b"IHDR":
        return {
            "width": int.from_bytes(payload[16:20], "big"),
            "height": int.from_bytes(payload[20:24], "big"),
            "mode": _PNG_MODES.get(payload[25], "unknown"),
        }
    if payload[:6] in (b"GIF87a", b"GIF89a") and len(payload) >= 10:
        return {
            "width": int.from_bytes(payload[6:8], "little"),
            "height": int.from_bytes(payload[8:10], "little"),
            "mode": "P",
        }
    if payload[:2] == b"\xff\xd8":
        return _jpeg_dims(payload)
    return None


#: SOF0..SOF15 markers that carry frame dimensions (ITU T.81 §B.2.2);
#: C4/C8/CC are DHT/JPG/DAC, not frames
_JPEG_SOF = frozenset(range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}


def _jpeg_dims(payload: bytes) -> dict | None:
    """JPEG dimensions via an SOF marker scan (ITU T.81 Annex B): walk the
    marker segments from SOI, skipping entropy-free segments by their
    declared length, until a start-of-frame marker yields
    (precision, height, width, #components). Dimensions only — a full
    baseline decode (Huffman + IDCT) is Pillow's job; this keeps the
    never-raise contract and real dims for the ~70% of a web crawl that is
    JPEG. Returns None on anything malformed or truncated."""
    n = len(payload)
    if payload[:2] != b"\xff\xd8":
        return None
    pos = 2
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            return None
        marker = payload[pos + 1]
        if marker == 0xFF:  # fill byte
            pos += 1
            continue
        if marker == 0x01 or 0xD0 <= marker <= 0xD8:  # standalone markers
            pos += 2
            continue
        if marker in (0xD9, 0xDA):  # EOI / SOS before any SOF: give up
            return None
        seglen = int.from_bytes(payload[pos + 2 : pos + 4], "big")
        if seglen < 2 or pos + 2 + seglen > n:
            return None
        if marker in _JPEG_SOF:
            body = payload[pos + 4 : pos + 2 + seglen]
            if len(body) < 6:
                return None
            return {
                "width": int.from_bytes(body[3:5], "big"),
                "height": int.from_bytes(body[1:3], "big"),
                "mode": {1: "L", 3: "RGB", 4: "CMYK"}.get(body[5], "unknown"),
            }
        pos += 2 + seglen
    return None


def _fake_decode(payload: bytes) -> bytes:
    """Deterministic stand-in for a non-image codec: identity bytes."""
    return payload


def _png_decode_rgb(payload: bytes) -> tuple[int, int, bytes] | None:
    """Stdlib PNG pixel decode → (width, height, raw RGB bytes), or None.

    Supports the mainstream still-image case: 8-bit color type 2 (RGB),
    non-interlaced, any of the five PNG row filters (None/Sub/Up/Average/
    Paeth — the published reconstruction algorithms, PNG spec §9). Other
    color types / bit depths return None and are Pillow's job when it is
    installed. Truncated or corrupt chunk structure returns None — this
    runs inside the Arrow batch loop and must never raise on arbitrary
    bytes."""
    import struct
    import zlib

    if payload[:8] != _PNG_SIG:
        return None
    pos, idat = 8, b""
    w = h = None
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        if len(body) < length:  # truncated chunk
            return None
        if tag == b"IHDR":
            if length != 13:
                return None
            w, h, bit_depth, color_type, _, _, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if bit_depth != 8 or color_type != 2 or interlace != 0:
                return None
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + length
    if not w or not h or not idat:
        return None
    # decompression-bomb guard: the expected output size is fully determined
    # by the IHDR dims, so (a) reject declared dims over the pixel cap before
    # touching zlib, and (b) hand zlib a hard output bound — a crafted tiny
    # deflate stream can otherwise expand to gigabytes inside the Arrow
    # batch loop and OOM the executor, violating the never-fail contract
    if w * h > MAX_DECODE_PIXELS:
        return None
    stride, bpp = 3 * w, 3
    expected = h * (1 + stride)
    try:
        raw = zlib.decompressobj().decompress(idat, expected + 1)
    except zlib.error:
        return None
    if len(raw) != expected:  # overflow (== expected+1) or truncation
        return None
    out = bytearray()
    prev = bytearray(stride)
    for y in range(h):
        row_start = y * (1 + stride)
        ftype = raw[row_start]
        row = bytearray(raw[row_start + 1 : row_start + 1 + stride])
        if ftype == 1:  # Sub
            for i in range(bpp, stride):
                row[i] = (row[i] + row[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = row[i - bpp] if i >= bpp else 0
                row[i] = (row[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = row[i - bpp] if i >= bpp else 0
                b, c = prev[i], prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                row[i] = (row[i] + pred) & 0xFF
        elif ftype != 0:
            return None
        out += row
        prev = row
    return w, h, bytes(out)


def _gif_decode_rgb(payload: bytes) -> tuple[int, int, bytes] | None:
    """Stdlib GIF pixel decode → (width, height, raw RGB bytes), or None.

    Implements the published GIF89a spec (W3C/CompuServe): logical screen
    descriptor, global/local color table, extension-block skipping, and
    the variable-code-size LZW decompression of the first image's data
    sub-blocks. Supported subset: non-interlaced, first frame covering the
    full logical screen (the overwhelmingly common still-image case);
    interlaced or partial frames return None (Pillow's job when
    installed). Same decompression-bomb posture as the PNG path: declared
    dims are capped BEFORE decoding and the LZW loop emits at most
    width×height indices, so a crafted stream cannot expand past the
    pixel budget. Never raises on arbitrary bytes."""
    if payload[:6] not in (b"GIF87a", b"GIF89a") or len(payload) < 13:
        return None
    w = int.from_bytes(payload[6:8], "little")
    h = int.from_bytes(payload[8:10], "little")
    if not w or not h or w * h > MAX_DECODE_PIXELS:
        return None
    flags = payload[10]
    pos, gct = 13, None
    if flags & 0x80:
        n = 3 * (2 << (flags & 7))
        gct = payload[pos : pos + n]
        if len(gct) < n:
            return None
        pos += n
    # skip extension blocks (0x21 label, then length-prefixed sub-blocks)
    while pos < len(payload) and payload[pos] == 0x21:
        pos += 2
        while pos < len(payload) and payload[pos] != 0:
            pos += 1 + payload[pos]
        pos += 1
    if pos + 10 > len(payload) or payload[pos] != 0x2C:
        return None
    ix = int.from_bytes(payload[pos + 1 : pos + 3], "little")
    iy = int.from_bytes(payload[pos + 3 : pos + 5], "little")
    iw = int.from_bytes(payload[pos + 5 : pos + 7], "little")
    ih = int.from_bytes(payload[pos + 7 : pos + 9], "little")
    iflags = payload[pos + 9]
    pos += 10
    if (ix, iy, iw, ih) != (0, 0, w, h) or iflags & 0x40:  # partial/interlaced
        return None
    palette = gct
    if iflags & 0x80:
        n = 3 * (2 << (iflags & 7))
        palette = payload[pos : pos + n]
        if len(palette) < n:
            return None
        pos += n
    if palette is None or pos >= len(payload):
        return None
    min_code = payload[pos]
    pos += 1
    if not 2 <= min_code <= 11:
        return None
    data = bytearray()
    while pos < len(payload):
        bs = payload[pos]
        pos += 1
        if bs == 0:
            break
        data += payload[pos : pos + bs]
        pos += bs
        if pos > len(payload):
            return None
    # LZW (GIF variant): codes packed LSB-first, size grows 1 bit when the
    # table fills to 2^size, table capped at 4096, reset on the clear code
    npix = w * h
    clear, end = 1 << min_code, (1 << min_code) + 1
    total_bits = 8 * len(data)
    bitpos = 0
    code_size = min_code + 1
    table: dict[int, tuple[int, ...]] = {i: (i,) for i in range(clear)}
    next_code = end + 1
    prev: tuple[int, ...] | None = None
    indices: list[int] = []
    while len(indices) < npix:
        if bitpos + code_size > total_bits:
            return None
        # read from a 4-byte sliding window, never a whole-stream big int:
        # ``(bits >> bitpos)`` over one big integer copies the entire
        # remaining stream per code — O(bytes²) total, measured 36s for an
        # 800×800 GIF and hours at the 16 MP cap, a CPU bomb the pixel cap
        # does not bound. A code is ≤ 12 bits, so byte-aligned window + ≤7
        # bit shift always covers it.
        byte0 = bitpos >> 3
        window = int.from_bytes(data[byte0 : byte0 + 4], "little")
        code = (window >> (bitpos & 7)) & ((1 << code_size) - 1)
        bitpos += code_size
        if code == clear:
            code_size = min_code + 1
            table = {i: (i,) for i in range(clear)}
            next_code = end + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            entry = table.get(code)
            if entry is None:
                return None
        elif code in table:
            entry = table[code]
        elif code == next_code:
            entry = prev + (prev[0],)
        else:
            return None
        if prev is not None and next_code < 4096:
            table[next_code] = prev + (entry[0],)
            next_code += 1
            if next_code == (1 << code_size) and code_size < 12:
                code_size += 1
        indices.extend(entry)
        prev = entry
    if len(indices) < npix:
        return None
    pal_n = len(palette) // 3
    out = bytearray()
    for idx in indices[:npix]:
        if idx >= pal_n:
            return None
        out += palette[3 * idx : 3 * idx + 3]
    return w, h, bytes(out)


def _png_encode_rgb(w: int, h: int, rgb: bytes) -> bytes:
    """Stdlib 8-bit RGB PNG encode (filter 0 rows; fixed zlib level so the
    bytes are deterministic for a given zlib build)."""
    import struct
    import zlib

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    stride = 3 * w
    raw = b"".join(
        b"\x00" + rgb[y * stride : (y + 1) * stride] for y in range(h)
    )
    return (
        _PNG_SIG
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def resize_image(payload: bytes, max_side: int) -> dict | None:
    """Downsample an image payload so its longer side is ≤ ``max_side``
    (never upscales). Returns {"width", "height", "payload"} with a PNG
    payload, or None when the bytes aren't a decodable image.

    Pillow when available; otherwise the stdlib pixel decodes above (RGB
    PNG, or palette GIF via ``_gif_decode_rgb``) with nearest-neighbor
    sampling (``src = (dst · src_len) // dst_len`` — pure integer math).
    JPEG has no stdlib pixel path (dims-only ``_jpeg_dims``), so JPEG
    payloads resize to null under the stdlib backend — stamped per table
    via the sink's ``writer_env`` so a mixed-backend corpus is detectable.
    Determinism is PER BACKEND: within one codec backend
    the output is reproducible run-over-run, but Pillow's thumbnail
    rounding and PNG encoder differ from the stdlib path, so a cluster
    must pin one backend corpus-wide (the same rule as any codec
    dependency); the oracle therefore checks the null contract, and the
    fixture tests run whichever backend this environment has."""
    if _HAVE_PIL:
        import io

        try:
            with _PILImage.open(io.BytesIO(payload)) as im:
                im = im.convert("RGB")
                im.thumbnail((max_side, max_side), _PILImage.NEAREST)
                buf = io.BytesIO()
                im.save(buf, format="PNG")
                return {
                    "width": im.width,
                    "height": im.height,
                    "payload": buf.getvalue(),
                    "rgb_md5": hashlib.md5(im.tobytes()).hexdigest(),
                }
        except Exception:
            return None
    decoded = _png_decode_rgb(payload) or _gif_decode_rgb(payload)
    if decoded is None:
        return None
    w, h, rgb = decoded
    if max(w, h) <= max_side:
        ow, oh = w, h
    elif w >= h:
        ow = max_side
        oh = max(1, (h * max_side) // w)
    else:
        oh = max_side
        ow = max(1, (w * max_side) // h)
    out = bytearray()
    for y in range(oh):
        sy = (y * h) // oh
        base = sy * 3 * w
        for x in range(ow):
            sx = (x * w) // ow
            out += rgb[base + 3 * sx : base + 3 * sx + 3]
    return {
        "width": ow,
        "height": oh,
        "payload": _png_encode_rgb(ow, oh, bytes(out)),
        "rgb_md5": hashlib.md5(bytes(out)).hexdigest(),
    }


def _resized_dims(w: int, h: int, max_side: int) -> tuple[int, int]:
    """Thumbnail dims for ``resize_image`` (kept aspect-exact for the
    synthetic classes below so Pillow's round() and the stdlib floor-div
    agree)."""
    if max(w, h) <= max_side:
        return w, h
    if w >= h:
        return max_side, max(1, (h * max_side) // w)
    return max(1, (w * max_side) // h), max_side


def _make_png_classes() -> list[dict]:
    """Deterministic solid-color RGB PNG classes for the driver-visible
    decode queries: the payload bytes, their md5/length, the decoded dims,
    and the resize-stage expectations (dims + md5 of the resized RAW RGB —
    codec-independent because the images are solid-color, so any sampling
    kernel reproduces the same pixels). Dims of the >64px classes divide
    evenly by the thumbnail ratio so Pillow and the stdlib path agree."""
    dims = [
        (16, 16),
        (24, 32),
        (40, 24),
        (64, 64),  # boundary: exactly max_side, no resize
        (128, 96),  # → 64×48
        (96, 128),  # → 48×64
        (128, 64),  # → 64×32
        (256, 128),  # → 64×32
    ]
    classes = []
    for cls, (w, h) in enumerate(dims):
        color = bytes(((cls * 37) % 256, (cls * 73) % 256, (cls * 151) % 256))
        payload = _png_encode_rgb(w, h, color * (w * h))
        rw, rh = _resized_dims(w, h, THUMB_MAX_SIDE)
        classes.append(
            {
                "width": w,
                "height": h,
                "payload": payload,
                "n_bytes": len(payload),
                "md5": hashlib.md5(payload).hexdigest(),
                "resized_width": rw,
                "resized_height": rh,
                "rgb_md5": hashlib.md5(color * (rw * rh)).hexdigest(),
            }
        )
    return classes


#: module-level so queries() and oracle_sql() (same process) see identical
#: bytes; executors receive the payloads as plan literals, never re-encode
PNG_CLASSES = _make_png_classes()
SYNTH_IMG_EVERY = 5  # doc_id % 5 == 0 rows carry a PNG payload


def synthetic_media_table(docs: DataFrame, every: int = SYNTH_IMG_EVERY) -> DataFrame:
    """Mixed-modality media table: every ``every``-th doc_id carries a REAL
    (deterministic, solid-color) PNG payload from ``PNG_CLASSES``, the rest
    keep their utf-8 text bytes. The class index is a pure doc_id formula,
    so a SQL oracle can predict the decoded dims/mode — this is what makes
    the image-decode path driver-gate-visible instead of fixture-only.
    The payloads enter the plan as binary LITERALS (JVM-side ``element_at``
    on an array literal — no Python in the payload-construction hot path)."""
    docs = ensure_parallelism(docs)
    payloads = F.array(*[F.lit(bytearray(c["payload"])) for c in PNG_CLASSES])
    cls = (F.floor(F.col("doc_id") / every) % len(PNG_CLASSES)).cast("int")
    is_img = F.col("doc_id") % every == 0
    payload = F.when(is_img, F.element_at(payloads, cls + 1)).otherwise(
        F.encode("text", "UTF-8")
    )
    mime = F.when(is_img, F.lit("image/png")).otherwise(F.lit("text/plain"))
    return docs.select(
        "doc_id", payload.alias("payload"), mime.alias("mime")
    ).select(
        "doc_id",
        "payload",
        F.struct(
            F.col("mime"), F.octet_length("payload").cast("long").alias("n_bytes")
        ).alias("meta"),
    )


def media_features(media: DataFrame) -> DataFrame:
    """Per-payload features via mapInPandas (Arrow batches of binary): byte
    stats + md5 for every payload, and REAL decoded image dimensions
    (``decode_image`` — Pillow or the stdlib PNG/GIF header parse) where the
    payload is a recognized image, nulls where it is not."""
    log_codec_backend()

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = pdf["payload"].map(_fake_decode)
            imgs = [decode_image(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": decoded.map(len).astype("int64"),
                    "content_md5": decoded.map(
                        lambda b: hashlib.md5(b).hexdigest()
                    ),
                    "width": pd.array(
                        [i["width"] if i else None for i in imgs], dtype="Int64"
                    ),
                    "height": pd.array(
                        [i["height"] if i else None for i in imgs], dtype="Int64"
                    ),
                    "img_mode": pd.array(
                        [i["mode"] if i else None for i in imgs], dtype="object"
                    ),
                }
            )

    # mapInPandas is opaque to column pruning — project to exactly the two
    # columns the function reads so nothing else (the meta struct) is
    # transposed and shipped through Arrow (guide §4.1)
    return media.select("doc_id", "payload").mapInPandas(extract, FEATURES_SCHEMA)


def media_resize(media: DataFrame, max_side: int = THUMB_MAX_SIDE) -> DataFrame:
    """Thumbnail generation via mapInPandas: every image payload is decoded
    and downsampled so its longer side is ≤ ``max_side`` (``resize_image``
    — Pillow or the stdlib PNG path), re-encoded as PNG; non-image payloads
    yield null thumb columns. The training-data "resize" stage: payload
    bytes never leave the executor, output stays a columnar binary column
    sized for an embedding model's input."""
    log_codec_backend()

    def shrink(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            thumbs = [resize_image(bytes(p), max_side) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": pd.array(
                        [t["width"] if t else None for t in thumbs], dtype="Int64"
                    ),
                    "height": pd.array(
                        [t["height"] if t else None for t in thumbs], dtype="Int64"
                    ),
                    "n_bytes": pd.array(
                        [len(t["payload"]) if t else None for t in thumbs],
                        dtype="Int64",
                    ),
                    "thumb": pd.array(
                        [t["payload"] if t else None for t in thumbs],
                        dtype="object",
                    ),
                    "rgb_md5": pd.array(
                        [t["rgb_md5"] if t else None for t in thumbs],
                        dtype="object",
                    ),
                }
            )

    # project to the read set before the Python boundary (guide §4.1)
    return media.select("doc_id", "payload").mapInPandas(shrink, RESIZE_SCHEMA)


def frame_sample(media: DataFrame, frame_chars: int = FRAME_CHARS) -> DataFrame:
    """Frame sampling: split each payload into fixed-size frames, one output
    row per frame (the video-pipeline shape: 1 input row → N frame rows,
    still streamed per Arrow batch)."""

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [],
                "frame_idx": [],
                "frame_md5": [],
                "n_frame_bytes": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                text = _fake_decode(payload).decode("utf-8")
                for i in range(0, len(text), frame_chars):
                    chunk = text[i : i + frame_chars]
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i // frame_chars)
                    out["frame_md5"].append(
                        hashlib.md5(chunk.encode("utf-8")).hexdigest()
                    )
                    out["n_frame_bytes"].append(len(chunk.encode("utf-8")))
            yield pd.DataFrame(out)

    # project to the read set before the Python boundary (guide §4.1)
    return media.select("doc_id", "payload").mapInPandas(frames, FRAMES_SCHEMA)
