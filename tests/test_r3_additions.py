"""Round-3 additions: unified relational SimHash, deterministic IVF,
Laplace variant semantics, pure-python PNG decode, stats pushdown."""

import numpy as np
import pytest
from pyspark.sql import functions as F


def _toy_docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dogs"),
        (3, "completely different text with no overlap at all here"),
        (4, "the quick brown fox jumps over the lazy dog"),
        (5, "pack my box with five dozen liquor jugs"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_simhash_xxhash64_relational_matches_column_expr(spark):
    # the unified relational path (explode -> vote -> reassemble) must agree
    # bit for bit with the per-row Column-expression form for the FAST path
    # too, not just md5 (round-2 verdict: the fast path had kept the slow
    # 64-fold expression shape)
    from anofox_forecast_spark.operators.dedup import _simhash_df, simhash
    docs = _toy_docs(spark)
    rel = {r["__id"]: r["__sh"]
           for r in _simhash_df(docs, "doc_id", "text",
                                hash_fn="xxhash64").collect()}
    col = {r["doc_id"]: r["sh"]
           for r in docs.select("doc_id",
                                simhash(F.col("text"), hash_fn="xxhash64")
                                .alias("sh")).collect()}
    assert rel == col


def test_simhash_fast_path_is_relational(spark):
    # the default (xxhash64) pair pipeline must use the explode/vote shape:
    # no per-row 64-pass aggregate folds -> the plan contains the two
    # hash-partitioned vote aggregations and stays Python-free
    from anofox_forecast_spark.operators.dedup import simhash_pairs
    df = simhash_pairs(_toy_docs(spark), "doc_id", "text")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "xxhash64" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # relational vote shape: a hash aggregate keyed on (__id, __b)
    assert "__b" in plan, "expected exploded per-bit vote aggregation"


def test_ivf_centroid_sample_deterministic(spark):
    # same data, different partition layout -> identical result set
    from anofox_forecast_spark.operators.similarity import cosine_topk_ivf
    rng = np.random.default_rng(7)
    rows = [(i, rng.standard_normal(8).tolist()) for i in range(200)]
    df1 = spark.createDataFrame(rows, ["id", "emb"]).repartition(1)
    df2 = spark.createDataFrame(rows[::-1], ["id", "emb"]).repartition(13)
    q = rng.standard_normal(8).tolist()
    r1 = [(r.id, round(r.cosine, 9)) for r in
          cosine_topk_ivf(df1, "id", "emb", q, k=5, n_clusters=4,
                          n_probe=2).collect()]
    r2 = [(r.id, round(r.cosine, 9)) for r in
          cosine_topk_ivf(df2, "id", "emb", q, k=5, n_clusters=4,
                          n_probe=2).collect()]
    assert r1 == r2 and len(r1) == 5


def test_laplace_variant_semantics():
    # auto / auto_aid / skaters must select different leaf pools
    # (forecast.rs:51-88) and therefore different forecasts
    from anofox_forecast_spark.functions import models as M
    rng = np.random.default_rng(3)
    # intermittent series: mostly zeros with occasional demand
    y = np.where(rng.random(60) < 0.25, rng.integers(1, 9, 60), 0).astype(float)
    outs = {}
    for v in ("auto", "auto_aid", "skaters"):
        r = M.forecast(y, 6, "Laplace", season_length=1,
                       params={"laplace_variant": v})
        outs[v] = r
        assert r.model_name == f"Laplace({v})"
    assert not np.allclose(outs["auto"].point, outs["auto_aid"].point)
    assert not np.allclose(outs["auto"].point, outs["skaters"].point)
    # aliases parse (forecast.rs:65-71); unknown variant is a clean error
    r = M.forecast(y, 6, "Laplace", season_length=1,
                   params={"laplace_variant": "aid"})
    assert r.model_name == "Laplace(auto_aid)"
    with pytest.raises(ValueError, match="laplace_variant"):
        M.forecast(y, 6, "Laplace", season_length=1,
                   params={"laplace_variant": "bogus"})
    # auto_aid adds an intermittent leaf on intermittent data
    assert any(k.startswith("aid_") for k in outs["auto_aid"].params["weights"])
    assert {"sma", "theta"} <= set(outs["skaters"].params["weights"])


def _make_png(w, h, pixels, color_type=2, filter_type=0):
    """Minimal pure-python PNG encoder for tests: 8-bit, non-interlaced.
    pixels = row-major list of tuples (RGB) or ints (gray)."""
    import struct as st
    import zlib

    def chunk(ctype, data):
        return (st.pack(">I", len(data)) + ctype + data
                + st.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    channels = 3 if color_type == 2 else 1
    ihdr = st.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = b""
    prev = bytes(w * channels)
    for y in range(h):
        row = []
        for x in range(w):
            p = pixels[y * w + x]
            row.extend(p if isinstance(p, tuple) else (p,))
        line = bytes(row)
        if filter_type == 2:  # Up
            enc = bytes((line[i] - prev[i]) & 0xFF for i in range(len(line)))
        else:
            enc = line
        raw += bytes([filter_type]) + enc
        prev = line
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


def test_png_real_decode_branch(spark):
    # the non-fake decode branch must execute without pillow: pure-python
    # PNG decode -> 8x8 grayscale thumbnail
    from anofox_forecast_spark.operators.multimodal import (
        _png_gray_thumb, image_features)
    # solid mid-gray RGB 16x16 (filter 0) -> every thumbnail pixel = luma
    rgb = _make_png(16, 16, [(100, 150, 200)] * 256)
    lum = (299 * 100 + 587 * 150 + 114 * 200) // 1000
    t = _png_gray_thumb(rgb)
    assert t is not None and len(t) == 64
    assert all(abs(v - lum / 255.0) < 1e-9 for v in t)
    # grayscale gradient with Up-filtered rows decodes identically to the
    # unfiltered encoding of the same image
    pix = [min(x * 8 + y, 255) for y in range(32) for x in range(32)]
    g0 = _png_gray_thumb(_make_png(32, 32, pix, color_type=0, filter_type=0))
    g2 = _png_gray_thumb(_make_png(32, 32, pix, color_type=0, filter_type=2))
    assert g0 == g2
    # end-to-end through Spark mapInPandas with fake=False
    df = spark.createDataFrame([(1, bytearray(rgb))], ["doc_id", "payload"])
    out = image_features(df, "payload", "doc_id", fake=False).collect()
    assert len(out) == 1 and len(out[0].feature_vector) == 64
    assert abs(out[0].feature_vector[0] - lum / 255.0) < 1e-6


def test_ivf_build_search_split(spark, tmp_path):
    # build-once / probe-many: the split form returns the same results as
    # the one-shot cosine_topk_ivf, and a parquet table partitioned by
    # __cell prunes non-probed cells at scan time
    from anofox_forecast_spark.operators.similarity import (
        cosine_topk_ivf, ivf_build, ivf_search)
    rng = np.random.default_rng(21)
    rows = [(i, rng.standard_normal(8).tolist()) for i in range(300)]
    df = spark.createDataFrame(rows, ["id", "emb"])
    q = rng.standard_normal(8).tolist()
    one_shot = [(r.id, round(r.cosine, 9)) for r in
                cosine_topk_ivf(df, "id", "emb", q, k=5, n_clusters=4,
                                n_probe=2).collect()]
    indexed, cents = ivf_build(df, "id", "emb", n_clusters=4)
    split = [(r.id, round(r.cosine, 9)) for r in
             ivf_search(indexed, cents, "id", "emb", q, k=5,
                        n_probe=2).collect()]
    assert one_shot == split and len(split) == 5
    assert len(cents) == 4 and all(len(c) == 8 for c in cents)
    # persisted index: __cell partition column -> probe prunes partitions
    path = str(tmp_path / "ivf_index")
    indexed.write.partitionBy("__cell").parquet(path)
    reread = spark.read.parquet(path)
    probe = ivf_search(reread, cents, "id", "emb", q, k=5, n_probe=2)
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "__cell" in plan
    got = [(r.id, round(r.cosine, 9)) for r in probe.collect()]
    assert got == split


def test_png_decoder_palette_rgba_gray_alpha():
    # color types 3 (palette), 6 (RGBA), 4 (gray+alpha) decode to the same
    # luma as the equivalent truecolor/gray image
    import struct as st
    import zlib

    from anofox_forecast_spark.operators.multimodal import _png_gray_thumb

    def chunk(ctype, data):
        return (st.pack(">I", len(data)) + ctype + data
                + st.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    def png(w, h, color_type, raw_rows, plte=None):
        ihdr = st.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
        raw = b"".join(b"\x00" + r for r in raw_rows)
        out = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        if plte is not None:
            out += chunk(b"PLTE", plte)
        return out + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")

    w = h = 8
    lum = (299 * 10 + 587 * 200 + 114 * 30) // 1000
    # palette: one entry (10, 200, 30), all pixels index 0
    pal = png(w, h, 3, [bytes(w) for _ in range(h)],
              plte=bytes([10, 200, 30]))
    t3 = _png_gray_thumb(pal)
    assert t3 == [lum / 255.0] * 64
    # RGBA: same color, alpha ignored by the luma contract
    rgba_row = bytes([10, 200, 30, 255] * w)
    t6 = _png_gray_thumb(png(w, h, 6, [rgba_row for _ in range(h)]))
    assert t6 == [lum / 255.0] * 64
    # gray+alpha: gray value 77
    ga_row = bytes([77, 255] * w)
    t4 = _png_gray_thumb(png(w, h, 4, [ga_row for _ in range(h)]))
    assert t4 == [77 / 255.0] * 64
