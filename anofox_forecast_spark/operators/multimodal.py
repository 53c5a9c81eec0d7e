"""Multimodal (image/audio/video) column plumbing.

Beyond-parity surface (BASELINE.json north star). Media payloads are opaque
``binary`` columns with typed metadata structs; heavy decode/resize/sample
steps run as Arrow-batched ``mapInPandas`` over iterator-of-batches (constant
memory per task regardless of partition size).

Decode strategy: pillow is auto-detected per worker and used when present;
PNG payloads additionally decode through a dependency-free stdlib-zlib
decoder (``_png_gray_thumb``) and Y4M video through the uncompressed-
container parser (``_y4m_frames``), so the real-decode branches of both
``image_features`` and ``frame_sample`` run and are tested even in this
container. Codec formats without pillow/ffmpeg raise the documented
``NotImplementedError`` stub. The Spark-side contract — schemas, batch
iteration, partitioning, header sniffing (PNG/JPEG/GIF/WAV/Y4M magic +
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
    elif payload[:9] == b"YUV4MPEG2" and b"\x0a" in payload:
        out.update(format="y4m", is_valid=True)
        for tag in payload[9:payload.index(b"\x0a")].split(b" "):
            if tag.startswith(b"W") and tag[1:].isdigit():
                out.update(width=int(tag[1:]))
            elif tag.startswith(b"H") and tag[1:].isdigit():
                out.update(height=int(tag[1:]))
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
                    raise AssertionError(
                        "unreachable: _decode_stub must raise")
                hist = [0.0] * 16
                for byte in b[:4096]:
                    hist[byte >> 4] += 1.0
                total = sum(hist) or 1.0
                feats.append([v / total for v in hist])
            yield pd.DataFrame({id_col: pdf[id_col], "feature_vector": feats})

    return df.mapInPandas(fn, schema)


def _y4m_frame_offsets(payload: bytes):
    """Header-only parse of a YUV4MPEG2 (.y4m) payload — the standard
    UNCOMPRESSED video container (plain-text ``YUV4MPEG2 W.. H.. ...``
    stream header, then ``FRAME``-delimited raw planes; no codec).
    Returns ``(frame_size, [data_start_offset, ...])`` without copying
    any frame bytes, or None if not Y4M / malformed. 4:2:0 (default
    when no ``C`` tag), 4:2:2, 4:4:4 and mono chroma tags supported."""
    if not payload or not payload.startswith(b"YUV4MPEG2"):
        return None
    try:
        nl = payload.index(b"\x0a")
        w = h = None
        chroma = b"420"
        for tag in payload[9:nl].split(b" "):
            if tag.startswith(b"W"):
                w = int(tag[1:])
            elif tag.startswith(b"H"):
                h = int(tag[1:])
            elif tag.startswith(b"C"):
                chroma = tag[1:]
        if not w or not h:
            return None
        if chroma.startswith(b"420"):
            fsize = w * h + 2 * ((w + 1) // 2) * ((h + 1) // 2)
        elif chroma.startswith(b"422"):
            fsize = w * h + 2 * ((w + 1) // 2) * h
        elif chroma.startswith(b"444"):
            fsize = 3 * w * h
        elif chroma.startswith(b"mono"):
            fsize = w * h
        else:
            return None
        offsets, pos = [], nl + 1
        while pos < len(payload):
            if payload[pos:pos + 5] != b"FRAME":
                return None
            fnl = payload.index(b"\x0a", pos)
            if fnl + 1 + fsize > len(payload):
                return None
            offsets.append(fnl + 1)
            pos = fnl + 1 + fsize
        return fsize, offsets
    except (ValueError, IndexError):
        return None


def _y4m_frames(payload: bytes) -> list[bytes] | None:
    """All raw frame payloads of a Y4M stream (frame-header params
    stripped), or None — materializing convenience over
    ``_y4m_frame_offsets``; callers sampling a subset should slice from
    the offsets instead of copying every frame."""
    parsed = _y4m_frame_offsets(payload)
    if parsed is None:
        return None
    fsize, offsets = parsed
    return [payload[o:o + fsize] for o in offsets]


def frame_sample(df: DataFrame, binary_col: str, id_col: str,
                 every_n: int = 10, fake: bool = False) -> DataFrame:
    """Video frame-sampling contract: one output row per sampled frame
    (id, frame_index, frame binary).

    Decode strategy, checked per payload on the worker:
    1. ``fake=True`` → deterministic byte slices exercising the
       explode-shaped distributed path (the oracle-checked mode).
    2. Y4M payload → REAL frame sampling via the dependency-free
       ``_y4m_frames`` parser (uncompressed container, no codec):
       every ``every_n``-th raw frame, ``frame_index`` = its position
       in the stream.
    3. otherwise → NotImplementedError (codec formats need ffmpeg on
       the workers; documented stub)."""
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
                    # offsets-only parse: only the SAMPLED frames are
                    # sliced out of the payload (~1/every_n of the bytes
                    # copied, review finding on worker memory)
                    parsed = _y4m_frame_offsets(payload or b"")
                    if parsed is None:
                        # correctness must not silently depend on the stub
                        # raising (r10 ADVICE): make the no-fallthrough
                        # explicit so a future returning decode branch
                        # can't unpack None below
                        _decode_stub(payload, "frame_sample")
                        raise AssertionError(
                            "unreachable: _decode_stub must raise")
                    fsize, offsets = parsed
                    for fi in range(0, len(offsets), every_n):
                        ids.append(rid)
                        idxs.append(fi)
                        frames.append(payload[offsets[fi]:offsets[fi]
                                              + fsize])
                    continue
                b = payload or b""
                n_frames = max(len(b) // 256, 1)
                for fi in range(0, n_frames, every_n):
                    ids.append(rid)
                    idxs.append(fi)
                    frames.append(b[fi * 256:(fi + 1) * 256])
            yield pd.DataFrame({id_col: ids, "frame_index": idxs, "frame": frames})

    return df.mapInPandas(fn, schema)


def _wav_pcm_samples(payload: bytes):
    """Dependency-free PCM WAV decode (stdlib struct + numpy): RIFF/WAVE
    with an integer-PCM ``fmt `` chunk (8/16/32-bit, any channel count).
    Returns ``(mono float64 array in [-1, 1], sample_rate)`` — channels
    averaged — or None for anything else (compressed codecs, float WAV,
    malformed), letting the caller fall back to the documented stub."""
    import numpy as np
    if (not payload or len(payload) < 44 or payload[:4] != b"RIFF"
            or payload[8:12] != b"WAVE"):
        return None
    try:
        pos, fmt, data = 12, None, None
        while pos + 8 <= len(payload):
            cid = payload[pos:pos + 4]
            (clen,) = struct.unpack("<I", payload[pos + 4:pos + 8])
            body = payload[pos + 8:pos + 8 + clen]
            if cid == b"fmt " and len(body) >= 16:
                fmt = struct.unpack("<HHIIHH", body[:16])
            elif cid == b"data":
                data = body
            pos += 8 + clen + (clen & 1)   # chunks are word-aligned
        if fmt is None or data is None:
            return None
        audio_fmt, n_ch, rate, _, _, bits = fmt
        if audio_fmt != 1 or n_ch < 1 or rate < 1:   # integer PCM only
            return None
        if bits == 16:
            x = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
        elif bits == 8:                               # 8-bit WAV is unsigned
            x = (np.frombuffer(data, dtype="u1").astype(np.float64)
                 - 128.0) / 128.0
        elif bits == 32:
            x = np.frombuffer(data, dtype="<i4").astype(np.float64) \
                / 2147483648.0
        else:
            return None
        n = (len(x) // n_ch) * n_ch
        if n == 0:
            return None
        return x[:n].reshape(-1, n_ch).mean(axis=1), int(rate)
    except Exception:  # noqa: BLE001 — malformed payload -> not decodable
        return None


AUDIO_FEATURES_SCHEMA = T.StructType([
    T.StructField("n_samples", T.LongType()),
    T.StructField("sample_rate", T.IntegerType()),
    T.StructField("duration_s", T.DoubleType()),
    T.StructField("rms", T.DoubleType()),
    T.StructField("zero_crossing_rate", T.DoubleType()),
    T.StructField("spectral_centroid_hz", T.DoubleType()),
])


def audio_features(df: DataFrame, binary_col: str, id_col: str,
                   fake: bool = False) -> DataFrame:
    """Audio feature-extraction contract: (id, audio struct) with
    ``n_samples / sample_rate / duration_s / rms / zero_crossing_rate /
    spectral_centroid_hz`` — the audio sibling of ``image_features``
    (beyond-parity; the reference has no media operators).

    Decode strategy, per payload on the worker:
    1. ``fake=True`` → deterministic features from the raw byte stream
       (exercises the distributed path without a decoder).
    2. integer-PCM WAV → REAL decode via the dependency-free
       ``_wav_pcm_samples`` parser; spectral centroid from one numpy
       rFFT over the (channel-averaged) signal.
    3. otherwise → NotImplementedError (compressed codecs need
       soundfile/ffmpeg on the workers; documented stub)."""
    import numpy as np
    schema = T.StructType([
        T.StructField(id_col, df.schema[id_col].dataType),
        T.StructField("audio", AUDIO_FEATURES_SCHEMA),
    ])

    def feats(x, rate):
        n = len(x)
        rms = float(np.sqrt(np.mean(x * x))) if n else 0.0
        zcr = (float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1])))
               if n > 1 else 0.0)
        # power-spectrum weighting (|X|^2): a magnitude-weighted centroid
        # gives the broadband quantization-noise floor enough mass to pull
        # a pure tone's centroid ~20% high
        pw = np.abs(np.fft.rfft(x)) ** 2 if n else np.array([])
        fhz = np.fft.rfftfreq(n, d=1.0 / rate) if n else np.array([])
        tot = float(pw.sum())
        cen = float((fhz * pw).sum() / tot) if tot > 0 else 0.0
        return {"n_samples": n, "sample_rate": int(rate),
                "duration_s": n / float(rate), "rms": rms,
                "zero_crossing_rate": zcr, "spectral_centroid_hz": cen}

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for payload in pdf[binary_col]:
                b = payload or b""
                if fake:
                    x = (np.frombuffer(b[:4096], dtype="u1")
                         .astype(np.float64) - 128.0) / 128.0
                    out.append(feats(x, 8000))
                    continue
                dec = _wav_pcm_samples(b)
                if dec is None:
                    _decode_stub(payload, "audio_features")
                    raise AssertionError(
                        "unreachable: _decode_stub must raise")
                out.append(feats(*dec))
            yield pd.DataFrame({id_col: pdf[id_col], "audio": out})

    return df.mapInPandas(fn, schema)
