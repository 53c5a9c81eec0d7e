"""The DuckDB-SQL replay of Spark's xxhash64 (functions/xxhash_sql.py) is
bit-exact against the JVM implementation — the foundation of the
dedup_minhash_lsh / dedup_simhash fast-path oracles."""
import random

import duckdb
import pytest
from pyspark.sql import functions as F

from anofox_forecast_spark.functions import xxhash_sql as X


@pytest.fixture(scope="module")
def strings():
    rng = random.Random(417)
    alpha = "abcdefghijklmnopqrstuvwxyz 0123456789,éßü日本"
    out = [""]
    # cover every length regime: sub-4 tail, 4-byte, 8-byte chunks, one and
    # several 32-byte stripes, and multi-byte UTF-8 straddling boundaries
    for n in list(range(1, 40)) + [63, 64, 65, 83, 100, 127, 128]:
        for _ in range(3):
            out.append("".join(rng.choice(alpha) for _ in range(n)))
    return out


def _duck_hashes(strings, salt):
    con = duckdb.connect()
    con.execute("CREATE TABLE t (s VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(s,) for s in strings])
    q = f"""
WITH {X.hash_ctes('t', 's', 's', 'hu')}
SELECT s, {X.signed('hu')} AS h1,
       {X.signed(X.hash_int_expr(str(salt), 'hu'))} AS h2
FROM fin
"""
    return {s: (h1, h2) for s, h1, h2 in con.execute(q).fetchall()}


def test_sql_xxhash64_matches_spark(spark, strings):
    df = spark.createDataFrame([(s,) for s in strings], ["s"])
    rows = df.select(
        "s", F.xxhash64("s").alias("h1"),
        F.xxhash64("s", F.lit(7)).alias("h2")).collect()
    duck = _duck_hashes(strings, 7)
    for r in rows:
        d1, d2 = duck[r["s"]]
        assert d1 == r["h1"], f"plain hash diverges on {r['s']!r}"
        assert d2 == r["h2"], f"salted hash diverges on {r['s']!r}"
