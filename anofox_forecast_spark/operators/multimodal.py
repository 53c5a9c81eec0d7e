"""Multimodal (image/audio/video) column plumbing.

Beyond-parity surface (BASELINE.json north star). Media payloads are opaque
``binary`` columns with typed metadata structs; heavy decode/resize/sample
steps run as Arrow-batched ``mapInPandas`` over iterator-of-batches (constant
memory per task regardless of partition size).

Decode strategy: pillow is auto-detected per worker and used when present;
PNG payloads additionally decode through a dependency-free stdlib-zlib
decoder (``_png_gray_thumb``), so the real-decode branch runs and is tested
even in this container. Non-PNG formats without pillow raise the documented
``NotImplementedError`` stub. The Spark-side contract — schemas, batch
iteration, partitioning, header sniffing (PNG/JPEG/GIF/WAV magic +
dimensions) — is real in every mode.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType([
    T.StructField("format", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("is_valid", T.BooleanType()),
])


def sniff_media(payload: bytes | None) -> dict:
    """Pure-python magic-byte sniffing: PNG / JPEG / GIF / RIFF-WAV.
    Returns format + dimensions where the header carries them."""
    out = {"format": "unknown", "width": None, "height": None,
           "n_bytes": len(payload) if payload else 0, "is_valid": False}
    if not payload or len(payload) < 12:
        return out
    if payload[:8] == b"\x89PNG\r\n\x1a\n" and len(payload) >= 24:
        w, h = struct.unpack(">II", payload[16:24])
        out.update(format="png", width=int(w), height=int(h), is_valid=True)
    elif payload[:2] == b"\xff\xd8":
        out.update(format="jpeg", is_valid=True)
        # walk JPEG segments for SOF0/SOF2 dimensions
        i = 2
        while i + 9 < len(payload):
            if payload[i] != 0xFF:
                break
            marker = payload[i + 1]
            if marker in (0xC0, 0xC2):
                h, w = struct.unpack(">HH", payload[i + 5:i + 9])
                out.update(width=int(w), height=int(h))
                break
            seg_len = struct.unpack(">H", payload[i + 2:i + 4])[0]
            i += 2 + seg_len
    elif payload[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", payload[6:10])
        out.update(format="gif", width=int(w), height=int(h), is_valid=True)
    elif payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        out.update(format="wav", is_valid=True)
    return out


def media_metadata(df: DataFrame, binary_col: str) -> DataFrame:
    """Adds a ``media_meta`` struct column via iterator-of-batches
    mapInPandas — constant memory, no per-row Python overhead."""
    out_schema = T.StructType(df.schema.fields
                              + [T.StructField("media_meta", MEDIA_META_SCHEMA)])

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [sniff_media(p) for p in pdf[binary_col]]
            pdf = pdf.copy()
            pdf["media_meta"] = [
                {"format": m["format"], "width": m["width"], "height": m["height"],
                 "n_bytes": m["n_bytes"], "is_valid": m["is_valid"]}
                for m in metas]
            yield pdf

    return df.mapInPandas(fn, out_schema)


def _pil():
    """Runtime-detected PIL module, or None. Evaluated on the WORKER (inside
    the mapInPandas closure), so a cluster with pillow installed gets the
    real decoder with no code change; this sandbox (no media libs) gets the
    documented stub."""
    try:
        from PIL import Image  # noqa: PLC0415
        return Image
    except ImportError:
        return None


def _decode_stub(payload: bytes, op: str, **kwargs):
    """Placeholder for the real decode. Raises by default; the deterministic
    fake below is used by tests to exercise the plumbing."""
    raise NotImplementedError(
        f"media op {op!r} requires an image/audio library not present in this "
        "environment; install pillow/ffmpeg on the cluster (the operators "
        "auto-detect and use them) or pass fake=True for plumbing tests")


def _png_gray_thumb(payload: bytes, size: int = 8) -> list[float] | None:
    """Dependency-free PNG decode -> ``size``x``size`` grayscale thumbnail in
    [0,1] (stdlib zlib only). Covers the real-decode contract when pillow is
    absent: 8-bit depth, non-interlaced, color types 0/2/3/4/6. Returns None
    for anything it can't decode (caller falls back to the stub error).
    Nearest-neighbor sampling + ITU-R 601-2 luma — the same thumbnail
    contract as the pillow branch, not guaranteed bit-identical to it."""
    import zlib
    if not payload or payload[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    pos, idat, plte = 8, b"", None
    w = h = bit_depth = color_type = interlace = None
    try:
        while pos + 8 <= len(payload):
            (length,) = struct.unpack(">I", payload[pos:pos + 4])
            ctype = payload[pos + 4:pos + 8]
            data = payload[pos + 8:pos + 8 + length]
            if ctype == b"IHDR":
                w, h, bit_depth, color_type, _, _, interlace = \
                    struct.unpack(">IIBBBBB", data)
            elif ctype == b"PLTE":
                plte = data
            elif ctype == b"IDAT":
                idat += data
            elif ctype == b"IEND":
                break
            pos += 12 + length
        if not w or not h or bit_depth != 8 or interlace != 0:
            return None
        channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color_type)
        if channels is None or (color_type == 3 and plte is None):
            return None
        raw = zlib.decompress(idat)
        stride = w * channels
        if len(raw) < h * (stride + 1):
            return None
        # unfilter scanlines (PNG filters 0-4: None/Sub/Up/Average/Paeth)
        prev = bytearray(stride)
        rows = []
        for r in range(h):
            off = r * (stride + 1)
            ft = raw[off]
            line = bytearray(raw[off + 1:off + 1 + stride])
            bpp = channels
            if ft == 1:    # Sub
                for i in range(bpp, stride):
                    line[i] = (line[i] + line[i - bpp]) & 0xFF
            elif ft == 2:  # Up
                for i in range(stride):
                    line[i] = (line[i] + prev[i]) & 0xFF
            elif ft == 3:  # Average
                for i in range(stride):
                    a = line[i - bpp] if i >= bpp else 0
                    line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
            elif ft == 4:  # Paeth
                for i in range(stride):
                    a = line[i - bpp] if i >= bpp else 0
                    b = prev[i]
                    c = prev[i - bpp] if i >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                    line[i] = (line[i] + pred) & 0xFF
            elif ft != 0:
                return None
            rows.append(line)
            prev = line
        out = []
        for yi in range(size):
            sy = min(int((yi + 0.5) * h / size), h - 1)
            line = rows[sy]
            for xi in range(size):
                sx = min(int((xi + 0.5) * w / size), w - 1)
                o = sx * channels
                if color_type == 0 or color_type == 4:
                    lum = line[o]
                elif color_type == 3:
                    pi = line[o] * 3
                    r8, g8, b8 = plte[pi], plte[pi + 1], plte[pi + 2]
                    lum = (299 * r8 + 587 * g8 + 114 * b8) // 1000
                else:
                    lum = (299 * line[o] + 587 * line[o + 1]
                           + 114 * line[o + 2]) // 1000
                out.append(lum / 255.0)
        return out
    except Exception:  # noqa: BLE001 — malformed payload -> not decodable
        return None


def image_features(df: DataFrame, binary_col: str, id_col: str,
                   fake: bool = False) -> DataFrame:
    """Feature-extraction contract: (id, feature_vector array<float>).

    Decode strategy, checked per worker at runtime:
    1. ``fake=True`` → deterministic byte-histogram 'embedding' that
       exercises the full distributed path (schema, Arrow batches,
       partitioning) without a decoder (the oracle-checked mode).
    2. pillow present → real decode: 8×8 grayscale thumbnail, 64-dim
       float vector in [0,1].
    3. PNG payload → the same thumbnail via the dependency-free
       ``_png_gray_thumb`` decoder (stdlib zlib), so the real-decode
       branch runs even without pillow.
    4. otherwise → NotImplementedError (documented stub)."""
    schema = T.StructType([
        T.StructField(id_col, df.schema[id_col].dataType),
        T.StructField("feature_vector", T.ArrayType(T.FloatType())),
    ])

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        pil = _pil()
        for pdf in batches:
            feats = []
            for payload in pdf[binary_col]:
                b = payload or b""
                if not fake:
                    if pil is not None:
                        img = pil.open(io.BytesIO(b)).convert("L").resize((8, 8))
                        feats.append([p / 255.0 for p in img.getdata()])
                        continue
                    thumb = _png_gray_thumb(b)
                    if thumb is not None:
                        feats.append(thumb)
                        continue
                    _decode_stub(payload, "image_features")
                hist = [0.0] * 16
                for byte in b[:4096]:
                    hist[byte >> 4] += 1.0
                total = sum(hist) or 1.0
                feats.append([v / total for v in hist])
            yield pd.DataFrame({id_col: pdf[id_col], "feature_vector": feats})

    return df.mapInPandas(fn, schema)


def frame_sample(df: DataFrame, binary_col: str, id_col: str,
                 every_n: int = 10, fake: bool = False) -> DataFrame:
    """Video frame-sampling contract: one output row per sampled frame
    (id, frame_index, frame binary). Fake mode emits deterministic byte
    slices so the explode-shaped output path is tested."""
    schema = T.StructType([
        T.StructField(id_col, df.schema[id_col].dataType),
        T.StructField("frame_index", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ])

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for rid, payload in zip(pdf[id_col], pdf[binary_col]):
                if not fake:
                    _decode_stub(payload, "frame_sample")
                b = payload or b""
                n_frames = max(len(b) // 256, 1)
                for fi in range(0, n_frames, every_n):
                    ids.append(rid)
                    idxs.append(fi)
                    frames.append(b[fi * 256:(fi + 1) * 256])
            yield pd.DataFrame({id_col: ids, "frame_index": idxs, "frame": frames})

    return df.mapInPandas(fn, schema)
