"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Design (per the north star): media rides in ``binary`` columns with a
sibling metadata struct; decode / feature-extract / resize / frame-sample
are Arrow-batched ``mapInPandas`` stages so bytes never round-trip through
Python row-at-a-time. The actual codecs (PIL/librosa/ffmpeg) are NOT in
this container, so the decode kernels are STUBS behind ``decoder=``:
``"fake"`` is a deterministic featureless decoder (checksum + length +
byte histogram head) that keeps the plumbing — schemas, batch shapes,
partitioning — real and testable; ``"pil"``/``"librosa"`` raise
NotImplementedError with the exact dependency needed.

Scale notes: binary payloads dominate row size — keep them out of shuffle
(extract features first, then drop the bytes), size
``spark.sql.files.maxPartitionBytes`` so a partition of blobs fits in
executor memory, and never collect() a blob column.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = "payload binary, meta struct<mime string, width int, height int, duration_ms long>"

FEATURE_SCHEMA = (
    "doc_id long, n_bytes long, checksum string, head string"
)


def pack_media(df: DataFrame, bytes_col: str, mime: str) -> DataFrame:
    """Wrap a binary column into the canonical (payload, meta) pair."""
    return df.withColumn("payload", F.col(bytes_col)).withColumn(
        "meta",
        F.struct(
            F.lit(mime).alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ),
    )


IMAGE_FEATURE_SCHEMA = (
    "doc_id long, n_bytes long, checksum string, width int, height int, "
    "mode string, mean_luma double"
)


def _fake_features(payload: bytes) -> dict:
    return {
        "n_bytes": len(payload),
        "checksum": hashlib.md5(payload).hexdigest(),
        "head": payload[:8].hex(),
    }


def _pil_image():
    try:
        from PIL import Image

        return Image
    except ImportError:
        return None


def _header_dims(p: bytes):
    """Dependency-free container-header parse: PNG IHDR, GIF logical
    screen, JPEG SOF0/2. Real metadata extraction (not a fake), usable
    when no codec library is installed."""
    if p[:8] == b"\x89PNG\r\n\x1a\n" and p[12:16] == b"IHDR":
        return (
            int.from_bytes(p[16:20], "big"),
            int.from_bytes(p[20:24], "big"),
            "png",
        )
    if p[:6] in (b"GIF87a", b"GIF89a"):
        return (
            int.from_bytes(p[6:8], "little"),
            int.from_bytes(p[8:10], "little"),
            "gif",
        )
    if p[:2] == b"\xff\xd8":  # JPEG: scan segments for a SOF marker
        i = 2
        while i + 9 < len(p) and p[i] == 0xFF:
            marker, seglen = p[i + 1], int.from_bytes(p[i + 2 : i + 4], "big")
            if marker in (0xC0, 0xC1, 0xC2, 0xC3):
                return (
                    int.from_bytes(p[i + 7 : i + 9], "big"),
                    int.from_bytes(p[i + 5 : i + 7], "big"),
                    "jpeg",
                )
            i += 2 + seglen
    return None, None, None


def _image_features(payload: bytes) -> dict:
    """PIL full decode when installed (dimensions + mode + mean luma of a
    bounded thumbnail); otherwise the pure-header parse (dimensions only,
    mean_luma NULL)."""
    p = bytes(payload)
    base = {"n_bytes": len(p), "checksum": hashlib.md5(p).hexdigest()}
    Image = _pil_image()
    if Image is not None:
        import io

        with Image.open(io.BytesIO(p)) as im:
            w, h, mode = im.width, im.height, im.mode
            thumb = im.convert("L").copy()
            thumb.thumbnail((32, 32))  # bounded work per payload
            hist = thumb.histogram()
            n = sum(hist) or 1
            luma = sum(i * c for i, c in enumerate(hist)) / n
        return {**base, "width": w, "height": h, "mode": mode, "mean_luma": luma}
    w, h, fmt = _header_dims(p)
    return {**base, "width": w, "height": h, "mode": fmt, "mean_luma": None}


AUDIO_FEATURE_SCHEMA = (
    "doc_id long, n_bytes long, checksum string, channels int, "
    "sample_rate int, bits int, duration_ms long, mean_abs double"
)


def _audio_features(payload: bytes) -> dict:
    """Dependency-free RIFF/WAVE parse (the audio analog of
    ``_header_dims``): fmt-chunk metadata for any WAV; for PCM16 also a
    real decode of a bounded sample prefix (mean |amplitude| in [0, 1]).
    Compressed containers (mp3/ogg/flac) need a codec library this
    container doesn't ship — they raise, explicitly."""
    import struct

    p = bytes(payload)
    base = {"n_bytes": len(p), "checksum": hashlib.md5(p).hexdigest()}
    if len(p) < 44 or p[:4] != b"RIFF" or p[8:12] != b"WAVE":
        raise NotImplementedError(
            "audio decode without codec libraries supports RIFF/WAVE only "
            "(PCM16 gets a real bounded decode; mp3/ogg/flac need "
            "librosa/soundfile)"
        )
    off, fmt, data = 12, None, None
    while off + 8 <= len(p):
        cid, csz = p[off : off + 4], struct.unpack("<I", p[off + 4 : off + 8])[0]
        body = p[off + 8 : off + 8 + csz]
        if cid == b"fmt " and csz >= 16:
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        off += 8 + csz + (csz & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("malformed WAV: missing fmt/data chunk")
    audio_format, channels, rate, byte_rate, _block, bits = fmt
    duration_ms = int(len(data) * 1000 // byte_rate) if byte_rate else 0
    mean_abs = None
    if audio_format == 1 and bits == 16 and len(data) >= 2:
        import array

        n = min(len(data) // 2, 32768)  # bounded work per payload
        samples = array.array("h")
        samples.frombytes(data[: 2 * n])
        mean_abs = sum(abs(s) for s in samples) / (n * 32768.0)
    return {
        **base, "channels": channels, "sample_rate": rate, "bits": bits,
        "duration_ms": duration_ms, "mean_abs": mean_abs,
    }


def extract_features(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    decoder: str = "fake",
) -> DataFrame:
    """mapInPandas feature extraction; output drops the payload so bytes
    never shuffle.

    decoders: ``fake`` (checksum/length/head — plumbing tests),
    ``image`` (PIL full decode when importable, else a real pure-Python
    PNG/GIF/JPEG header parse; ``pil`` forces PIL or raises),
    ``audio`` (dependency-free RIFF/WAVE parse + bounded PCM16 decode;
    ``librosa`` forces the codec-library path, absent here, and raises).
    """
    if decoder == "fake":
        decode, schema = _fake_features, FEATURE_SCHEMA
    elif decoder in ("pil", "image"):
        if decoder == "pil" and _pil_image() is None:
            raise NotImplementedError(
                "decoder='pil' needs Pillow installed; decoder='image' "
                "falls back to header-only parsing without it"
            )
        decode, schema = _image_features, IMAGE_FEATURE_SCHEMA
    elif decoder in ("librosa", "audio"):
        if decoder == "librosa":
            raise NotImplementedError(
                "decoder='librosa' needs librosa/soundfile installed; "
                "decoder='audio' does a dependency-free RIFF/WAVE parse "
                "(real PCM16 decode of a bounded prefix)"
            )
        decode, schema = _audio_features, AUDIO_FEATURE_SCHEMA
    else:
        raise ValueError(f"unknown decoder {decoder!r}")

    # a NULL payload (corrupt corpus row — they exist at 100 TB) yields an
    # all-null feature row with the id retained, like a SQL expression
    # would; bytes(None) would crash the whole task
    null_row = {f.split()[0]: None for f in
                (p.strip() for p in schema.split(","))
                if f.split()[0] != id_col}

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                dict(null_row) if p is None else decode(p)
                for p in pdf[payload_col]
            ]
            out = pd.DataFrame(feats)
            out.insert(0, id_col, pdf[id_col].values)
            yield out

    return df.select(id_col, payload_col).mapInPandas(run, schema)


def frame_sample(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    every_n_bytes: int = 64,
    frame_len: int = 8,
) -> DataFrame:
    """Deterministic 'frame sampling' stand-in: slice the payload every N
    bytes (the video-frame-sampling plumbing: one input row → many frame
    rows, schema ``(id, frame_no, frame_bytes)``)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nos, frames = [], [], []
            for i, p in zip(pdf[id_col], pdf[payload_col]):
                if p is None:  # NULL payload explodes to zero frames,
                    continue   # like SQL explode(NULL)
                p = bytes(p)
                for no, off in enumerate(range(0, len(p), every_n_bytes)):
                    ids.append(i)
                    nos.append(no)
                    frames.append(p[off : off + frame_len])
            yield pd.DataFrame({id_col: ids, "frame_no": nos, "frame_bytes": frames})

    return df.select(id_col, payload_col).mapInPandas(
        run, f"{id_col} long, frame_no int, frame_bytes binary"
    )


def _encode_png(w: int, h: int, rgb: tuple) -> bytes:
    """A valid 8-bit RGB PNG built with stdlib only (zlib + struct) —
    the deterministic-fallback encoder for environments without a codec
    library. Output parses in any PNG reader (including _header_dims)."""
    import struct
    import zlib

    def chunk(tag, data):
        c = tag + data
        return struct.pack(">I", len(data)) + c + struct.pack(
            ">I", zlib.crc32(c) & 0xFFFFFFFF
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + bytes(rgb) * w for _ in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _fit_dims(src_w, src_h, tw: int, th: int) -> tuple:
    """Aspect-preserving fit inside (tw, th); unknown source dims fall
    back to the target box."""
    if not src_w or not src_h:
        return tw, th
    scale = min(tw / src_w, th / src_h, 1.0)  # never upscale in fit mode
    return max(1, int(src_w * scale)), max(1, int(src_h * scale))


def resize_images(
    df: DataFrame,
    size: tuple,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    fit: bool = True,
    decoder: str = "auto",
) -> DataFrame:
    """mapInPandas image resize: ``(id, payload)`` →
    ``(id, payload, width, height)`` with the payload re-encoded as PNG
    at the new dimensions — the third multimodal verb (decode /
    feature-extract / **resize** / frame-sample).

    decoders: ``pil`` — real decode + Lanczos resize + PNG re-encode
    (raises if PIL is not importable); ``fake`` — CLEARLY-MARKED
    deterministic stand-in for codec-less environments: output dims are
    computed from the REAL container header (``_header_dims``) with the
    same fit math, and the payload is a valid stdlib-built PNG whose
    fill color derives from md5(payload), so plumbing (schema, Arrow
    batch shape, one-row-in-one-row-out, downstream header parses) is
    fully exercised while the pixel content is synthetic; ``auto`` —
    pil when importable, else fake.

    Scale shape: no shuffle (mapInPandas over the scan), bytes stay
    inside their task, work per row is bounded by the target box.
    """
    tw, th = int(size[0]), int(size[1])
    if tw < 1 or th < 1:
        raise ValueError(f"target size must be positive; got {size!r}")
    if decoder not in ("auto", "pil", "fake"):
        raise ValueError(f"unknown decoder {decoder!r}")
    use_pil = decoder in ("auto", "pil") and _pil_image() is not None
    if decoder == "pil" and not use_pil:
        raise ImportError("resize_images(decoder='pil'): PIL not importable")

    def one(payload: bytes) -> tuple:
        p = bytes(payload)
        if use_pil:
            import io

            Image = _pil_image()
            with Image.open(io.BytesIO(p)) as im:
                if fit:
                    im = im.copy()
                    im.thumbnail((tw, th))
                    out_im = im
                else:
                    out_im = im.resize((tw, th))
                buf = io.BytesIO()
                out_im.convert("RGB").save(buf, format="PNG")
                return buf.getvalue(), out_im.width, out_im.height
        sw, sh, _fmt = _header_dims(p)
        w, h = _fit_dims(sw, sh, tw, th) if fit else (tw, th)
        color = tuple(hashlib.md5(p).digest()[:3])
        return _encode_png(w, h, color), w, h

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # NULL payloads null-propagate (see multimodal_features)
            outs = [(None, None, None) if p is None else one(p)
                    for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    payload_col: [o[0] for o in outs],
                    "width": [o[1] for o in outs],
                    "height": [o[2] for o in outs],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        run, f"{id_col} long, {payload_col} binary, width int, height int"
    )
