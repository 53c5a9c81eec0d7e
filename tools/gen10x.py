"""Generate a throwaway 10x copy of sf0.1 into /tmp/scale10x-sf1.0:
10 key-offset copies of each driver table (series count and doc count scale
10x; per-series length unchanged — the scaling axis that matters for the
per-series operators). Documents/embeddings keep exact cross-copy dups,
the realistic crawl shape for dedup stress."""
import duckdb, os

SRC = "/root/testdata/sf0.1"
DST = "/tmp/scale10x-sf1.0"
os.makedirs(DST, exist_ok=True)
con = duckdb.connect()
con.execute("SET threads TO 16")

copies = "SELECT unnest(range(0, 10)) AS c"
specs = {
    "lineitem": ("l_orderkey + c * 100000000 AS l_orderkey, l_partkey, "
                 "l_suppkey + c * 1000000 AS l_suppkey, l_linenumber, l_quantity, "
                 "l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate"),
    "orders": ("o_orderkey + c * 100000000 AS o_orderkey, o_custkey + c * 1000000 AS o_custkey, "
               "o_orderstatus, o_totalprice, o_orderdate, o_orderpriority"),
    "events": ("event_id + c * 100000000 AS event_id, ts, user_id + c * 1000000 AS user_id, "
               "event_type, value, props"),
    "documents": "doc_id + c * 1000000 AS doc_id, text, lang, source, n_chars",
    "embeddings": "vec_id + c * 1000000 AS vec_id, embedding, label",
}
for t, proj in specs.items():
    con.execute(f"""
      COPY (SELECT {proj}
            FROM read_parquet('{SRC}/{t}.parquet'), ({copies}))
      TO '{DST}/{t}.parquet' (FORMAT parquet)""")
    print(t, con.execute(f"SELECT count(*) FROM read_parquet('{DST}/{t}.parquet')").fetchone()[0])
# small dims: straight copies
for t in ["region", "nation", "customer", "supplier", "part"]:
    con.execute(f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet')) TO '{DST}/{t}.parquet' (FORMAT parquet)")
print("done", sum(os.path.getsize(f"{DST}/{f}") for f in os.listdir(DST)) // 2**20, "MiB")
