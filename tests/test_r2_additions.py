"""Round-2 additions: mqloss_by, bootstrap quantiles, feature config loaders,
and the conformal learn/apply SQL path."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F


def test_mqloss_by_matches_manual(spark):
    from anofox_forecast_spark.functions.metrics import ts_mqloss_by
    rows = [("a", i, float(i), float(i) - 1.0, float(i), float(i) + 2.0)
            for i in range(1, 6)]
    df = spark.createDataFrame(rows, ["id", "ds", "actual", "f10", "f50", "f90"])
    out = ts_mqloss_by(df, "ds", "actual", ["f10", "f50", "f90"],
                       [0.1, 0.5, 0.9]).collect()
    assert len(out) == 1
    # pinball: q=0.1 err=+1 -> 0.1; q=0.5 err=0 -> 0; q=0.9 err=-2 -> 0.2
    assert out[0]["metric_value"] == pytest.approx((0.1 + 0.0 + 0.2) / 3)


def test_mqloss_by_validates():
    from anofox_forecast_spark.functions.metrics import ts_mqloss_by
    with pytest.raises(ValueError):
        ts_mqloss_by(None, "ds", "a", ["f1"], [0.1, 0.9])
    with pytest.raises(ValueError):
        ts_mqloss_by(None, "ds", "a", ["f1"], [1.5])


def test_bootstrap_quantiles_deterministic_and_ordered(spark):
    from anofox_forecast_spark.operators.conformal import ts_bootstrap_quantiles
    df = spark.createDataFrame(
        [("s1", [1.0, -1.0, 0.5, -0.5, 0.2], [10.0, 11.0, 12.0])],
        ["id", "resid", "fc"])
    a = ts_bootstrap_quantiles(df, "id", "resid", "fc", [0.1, 0.5, 0.9],
                               n_paths=100).collect()
    b = ts_bootstrap_quantiles(df, "id", "resid", "fc", [0.1, 0.5, 0.9],
                               n_paths=100).collect()
    assert sorted(map(str, a)) == sorted(map(str, b)), "seeded → reproducible"
    by_q = {r["quantile"]: r["values"] for r in a}
    assert len(by_q) == 3 and all(len(v) == 3 for v in by_q.values())
    for t in range(3):
        assert by_q[0.1][t] <= by_q[0.5][t] <= by_q[0.9][t]
    # paths accumulate residuals → q90-q10 spread widens with horizon
    assert (by_q[0.9][2] - by_q[0.1][2]) > (by_q[0.9][0] - by_q[0.1][0])


def test_feature_config_loaders(spark, tmp_path):
    from anofox_forecast_spark.operators import features as FE
    tpl = FE.ts_features_config_template(spark)
    assert tpl.count() == len(FE.FEATURE_NAMES)
    assert tpl.columns == ["feature", "params_json"]

    cfg = FE.ts_features_config_from_json('{"features": ["mean", "median"]}')
    assert cfg["feature_names"] == ["mean", "median"]

    with pytest.warns(UserWarning, match="nope_feature"):
        cfg = FE.ts_features_config_from_json(
            '{"features": ["mean", "nope_feature"]}')
    assert cfg["feature_names"] == ["mean"]  # unknown warned + dropped

    p = tmp_path / "cfg.json"
    p.write_text('{"features": ["sum"], "overrides": {"sum": {"k": 1}}}')
    cfg = FE.ts_features_config_from_json(str(p))
    assert cfg["feature_names"] == ["sum"]
    assert cfg["overrides"][0]["feature"] == "sum"

    with pytest.warns(UserWarning, match="std_x"):
        cfg = FE.ts_features_config_from_csv(
            "feature,params_json\nmean,{}\nstd_x,{}")
    assert cfg["feature_names"] == ["mean"]

    # config drives ts_features_by
    df = spark.createDataFrame([("a", i, float(i)) for i in range(10)],
                               ["id", "ds", "y"])
    out = FE.ts_features_by(df, "id", "ds", "y", features=cfg["feature_names"])
    assert out.columns == ["id", "mean"]


def test_conformal_learn_apply_roundtrip(spark):
    from anofox_forecast_spark.operators.conformal import (
        ts_conformal_apply_profile, ts_conformal_learn_by)
    rows = [("a", float(i), float(i) + (1 if i % 2 else -1))
            for i in range(1, 41)]
    df = spark.createDataFrame(rows, ["id", "actual", "forecast"])
    prof = ts_conformal_learn_by(df, "id", "actual", "forecast", "absolute",
                                 [0.1])
    r = prof.collect()[0]
    assert r["method"] == "absolute" and r["n_residuals"] == 40
    assert r["scores"][0] == pytest.approx(1.0)  # |e| is constant 1
    fut = spark.createDataFrame([("a", 100.0)], ["id", "forecast"])
    out = ts_conformal_apply_profile(fut, prof, "id", "forecast").collect()[0]
    assert out["lower"] == pytest.approx(99.0)
    assert out["upper"] == pytest.approx(101.0)


def test_monthly_sql_path_preserves_time_of_day(spark):
    """SQL-path and model-path forecast timestamps must agree for monthly
    data with non-midnight times (add_months returns DATE; the sub-day
    component is re-added)."""
    import datetime as dt
    rows = [("a", dt.datetime(2023, m, 15, 7, 30, 0), float(m))
            for m in range(1, 13)]
    df = spark.createDataFrame(rows, ["id", "ds", "y"])
    from anofox_forecast_spark.operators.forecast import ts_forecast_by
    sql_out = ts_forecast_by(df, "id", "ds", "y", "Naive", 3, "1mo") \
        .orderBy("forecast_step").collect()
    udf_out = ts_forecast_by(df, "id", "ds", "y", "SES", 3, "1mo",
                             {"alpha": 0.3}).orderBy("forecast_step").collect()
    assert [r["ds"] for r in sql_out] == [r["ds"] for r in udf_out]
    assert all(r["ds"].hour == 7 and r["ds"].minute == 30 for r in sql_out)
    # month-end clamping on the SQL path: Dec 31 + 2mo → Feb 28
    import pandas as pd
    ends = pd.date_range("2022-01-31", periods=12, freq="ME")
    rows31 = [("b", e.to_pydatetime().replace(hour=12), float(i))
              for i, e in enumerate(ends)]
    df31 = spark.createDataFrame(rows31, ["id", "ds", "y"])
    out = ts_forecast_by(df31, "id", "ds", "y", "Naive", 2, "1mo") \
        .orderBy("forecast_step").collect()
    assert out[0]["ds"] == dt.datetime(2023, 1, 31, 12, 0, 0)
    assert out[1]["ds"] == dt.datetime(2023, 2, 28, 12, 0, 0)


def test_ngram_jaccard_skew_cap_plan(spark):
    """Posting-list cap must not add a cartesian product."""
    from anofox_forecast_spark import plans as P
    from anofox_forecast_spark.operators.dedup import ngram_jaccard_pairs
    docs = spark.createDataFrame([(i, f"text {i}") for i in range(20)],
                                 ["doc_id", "text"])
    P.assert_no_cartesian(
        ngram_jaccard_pairs(docs, "doc_id", "text", max_doc_freq=5))


# ---------------------------------------------------------------------------
# Portable-md5 dedup modes (round-2: bit-exact oracle verification path)
# ---------------------------------------------------------------------------

def _toy_docs(spark):
    rows = [(1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dogs"),
            (3, "completely different text about spark pipelines"),
            (4, "The Quick Brown Fox Jumps Over The Lazy Dog!")]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_minhash_md5_mode_finds_near_dups(spark):
    from anofox_forecast_spark.operators.dedup import minhash_lsh_pairs
    out = minhash_lsh_pairs(_toy_docs(spark), "doc_id", "text",
                            num_hashes=32, bands=8, threshold=0.4,
                            hash_fn="md5").collect()
    pairs = {(r.id_a, r.id_b) for r in out}
    assert (1, 2) in pairs  # one-char difference
    assert (1, 4) in pairs  # case/punct normalize away
    assert all({a, b} != {1, 3} and {a, b} != {2, 3} for a, b in pairs)
    for r in out:
        assert r.jaccard >= 0.4 and 0.0 <= r.est_jaccard <= 1.0


def test_minhash_salt_actually_varies_components(spark):
    # regression: a two-arg transform() lambda silently received the array
    # index as the second parameter, collapsing every signature component
    # to the same expression
    from anofox_forecast_spark.operators.dedup import minhash_signature
    df = spark.createDataFrame([("abcdefgh",)], ["t"])
    from pyspark.sql import functions as FF
    sh = FF.array_distinct(FF.transform(
        FF.sequence(FF.lit(1), FF.length("t") - 2),
        lambda i: FF.col("t").substr(i, FF.lit(3))))
    for fn in ("xxhash64", "md5"):
        sig = df.select(minhash_signature(sh, 8, fn).alias("s")).first()["s"]
        assert len(set(sig)) > 1, f"{fn} signature components all identical"


def test_simhash_md5_relational_matches_column_expr(spark):
    # the relational md5 simhash (explode -> vote -> reassemble) must agree
    # with the per-row Column-expression form bit for bit
    from anofox_forecast_spark.operators.dedup import _simhash_md5_df, simhash
    docs = _toy_docs(spark)
    rel = {r["__id"]: r["__sh"]
           for r in _simhash_md5_df(docs, "doc_id", "text").collect()}
    col = {r["doc_id"]: r["sh"]
           for r in docs.select("doc_id",
                                simhash(F.col("text"), hash_fn="md5")
                                .alias("sh")).collect()}
    assert rel == col


def test_simhash_md5_pairs_near_dups(spark):
    from anofox_forecast_spark.operators.dedup import simhash_pairs
    out = simhash_pairs(_toy_docs(spark), "doc_id", "text", max_hamming=16,
                        hash_fn="md5").collect()
    pairs = {(r.id_a, r.id_b) for r in out}
    assert (1, 2) in pairs and (1, 4) in pairs
