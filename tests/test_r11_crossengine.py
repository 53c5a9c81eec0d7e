"""Driver-key-grade cross-engine evidence for the r10 real-decode lanes
WITHOUT thawing the frozen 240-key contract (r10 verdict item #6).

Both engines construct the identical binary payload in-query from the
same deterministic bytes:

- ``audio_features``: Spark decodes a synthesized 16-bit PCM WAV (hex
  literal -> unhex) through the distributed mapInPandas lane; DuckDB
  re-derives every feature from FIRST PRINCIPLES over the same sample
  sequence in pure SQL — rms/zcr as aggregates, the spectral centroid
  via an explicit O(n^2) DFT (sum of cos/sin projections) replacing
  numpy's rFFT. Equality at the contract's pin quantum proves the whole
  decode + feature path, not just the plumbing.
- ``frame_sample`` (Y4M): Spark parses the uncompressed container and
  slices sampled frames; DuckDB computes the same frames as blob
  substrings at arithmetically-derived offsets. Bytes compared EXACTLY.
"""

from __future__ import annotations

import math
import struct

import duckdb
import numpy as np
import pytest

from anofox_forecast_spark.operators.multimodal import (audio_features,
                                                        frame_sample)

RATE, N = 8000, 64


def _wav_payload() -> tuple[bytes, list[int]]:
    """Deterministic 16-bit PCM mono WAV: s[j] = ((j*2557+17) % 65536) - 32768
    — full int16 range incl. negatives and a spread of magnitudes."""
    ints = [((j * 2557 + 17) % 65536) - 32768 for j in range(N)]
    data = struct.pack(f"<{N}h", *ints)
    fmt = struct.pack("<HHIIHH", 1, 1, RATE, RATE * 2, 2, 16)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body, ints


def _y4m_payload() -> tuple[bytes, int, bytes]:
    w, h, n_frames = 4, 4, 7
    fsize = w * h + 2 * ((w + 1) // 2) * ((h + 1) // 2)   # C420 = 24
    head = b"YUV4MPEG2 W4 H4 F25:1 Ip A1:1 C420\x0a"
    out = [head]
    for i in range(n_frames):
        out.append(b"FRAME\x0a"
                   + bytes((i * 31 + j * 7 + 3) % 256 for j in range(fsize)))
    return b"".join(out), fsize, head


def test_audio_features_matches_duckdb_first_principles(spark):
    payload, ints = _wav_payload()
    df = spark.createDataFrame([(1, payload)], "doc_id int, media binary")
    got = audio_features(df, "media", "doc_id").collect()
    assert len(got) == 1
    a = got[0]["audio"]

    # DuckDB: same sample sequence from the same integer recurrence; DFT
    # power spectrum over k = 0..N/2 replaces numpy's rfft
    con = duckdb.connect()
    row = con.execute(f"""
        WITH s AS (
          SELECT j, (((j * 2557 + 17) % 65536) - 32768) / 32768.0 AS x
          FROM range({N}) t(j)
        ), spec AS (
          SELECT k.k,
                 power(sum(s.x * cos(2 * pi() * k.k * s.j / {N})), 2)
               + power(sum(s.x * sin(2 * pi() * k.k * s.j / {N})), 2) AS pw
          FROM range({N // 2 + 1}) k(k) CROSS JOIN s
          GROUP BY k.k
        )
        SELECT {N}::BIGINT AS n_samples,
               {RATE} AS sample_rate,
               {N} / {RATE}.0 AS duration_s,
               (SELECT sqrt(avg(x * x)) FROM s) AS rms,
               (SELECT avg(CASE WHEN (x < 0) != (lag_x < 0) THEN 1.0
                           ELSE 0.0 END)
                FROM (SELECT x, lag(x) OVER (ORDER BY j) AS lag_x FROM s)
                WHERE lag_x IS NOT NULL) AS zero_crossing_rate,
               (SELECT sum(k * {RATE}.0 / {N} * pw) / sum(pw)
                FROM spec) AS spectral_centroid_hz
    """).fetchone()
    assert a["n_samples"] == row[0]
    assert a["sample_rate"] == row[1]
    assert a["duration_s"] == pytest.approx(row[2], abs=0)
    # contract-style pin quantum (6dp): Welford/pairwise-vs-sequential
    # summation and FFT-vs-naive-DFT agree to ~1e-9 abs here
    for name, spark_v, duck_v in [("rms", a["rms"], row[3]),
                                  ("zcr", a["zero_crossing_rate"], row[4]),
                                  ("centroid", a["spectral_centroid_hz"],
                                   row[5])]:
        assert round(spark_v, 6) == round(duck_v, 6), (
            f"{name}: spark {spark_v!r} vs duckdb {duck_v!r}")


def test_frame_sample_y4m_matches_duckdb_blob_slices(spark):
    payload, fsize, head = _y4m_payload()
    every_n = 3
    df = spark.createDataFrame([(1, payload)], "doc_id int, media binary")
    got = {r["frame_index"]: bytes(r["frame"])
           for r in frame_sample(df, "media", "doc_id",
                                 every_n=every_n).collect()}

    con = duckdb.connect()
    hexs = payload.hex()
    # DuckDB has no BLOB substring — slice the hex text (2 chars/byte)
    # and re-decode, byte arithmetic unchanged
    rows = con.execute(f"""
        SELECT i AS frame_index,
               from_hex(substring('{hexs}',
                         ({len(head)} + i * (6 + {fsize}) + 6) * 2 + 1,
                         {fsize} * 2)) AS frame
        FROM range(7) t(i) WHERE i % {every_n} = 0
    """).fetchall()
    want = {i: bytes(b) for i, b in rows}
    assert got == want and len(got) == 3
    # sanity: frames genuinely differ (the parse is not returning a
    # constant slice) and match the generator
    assert len(set(got.values())) == 3


def test_audio_features_spark_side_is_distributed(spark):
    """The lane stays a mapInPandas over partitions (no collect): many
    payloads across partitions all decode."""
    payload, _ = _wav_payload()
    df = spark.createDataFrame([(i, payload) for i in range(6)],
                               "doc_id int, media binary").repartition(3)
    out = audio_features(df, "media", "doc_id").collect()
    assert len(out) == 6
    assert len({r["audio"]["rms"] for r in out}) == 1
