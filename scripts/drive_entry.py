"""Driver-mimic: verify the __spark_entry__ contract end-to-end.

Run FROM /root/repo with PYTHONPATH=/root/repo:

    PYTHONPATH=/root/repo python scripts/drive_entry.py [op ...]

With no args: entry() smoke at sf0.001, then EVERY queries() entry vs
its oracle_sql() in DuckDB at sf0.01 (column names, row count,
order-insensitive values at 9dp). With args: only the named ops (the
fast inner loop while authoring). Exits 1 on any MISMATCH. This is the
/verify skill's recipe — committed here so the gate survives /tmp
wipes and machine resets.
"""
import math
import os
import sys

sys.path.insert(0, "/root/repo")

import duckdb
import __spark_entry__ as E
from pyspark.sql import SparkSession

SF01 = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.driver.memory", "8g")
    .appName("drive_entry")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

# 1. entry() smoke at sf0.001
res = E.entry(spark)
rows = res.collect()
print(f"entry(): {len(rows)} rows, schema={[f.name for f in res.schema.fields]}")
# the flagship filter_group_avg_topk query is non-empty at sf0.001 —
# a zero-row entry() means the pipeline broke, not that data is thin
# (ADVICE r15 item 4: `>= 0` was vacuously true)
assert len(rows) > 0

con = duckdb.connect()
for t in TABLES:
    p = f"{SF01}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

def canon(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])

    def norm(v):
        if isinstance(v, float):
            if math.isnan(v):
                return ("nan",)
            return round(v, 9)
        return v

    out = [tuple(norm(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)

queries = E.queries()
oracles = E.oracle_sql()
n_fail = 0
only = sys.argv[1:]
for name, fn in queries.items():
    if only and name not in only:
        continue
    try:
        sdf = fn(spark, SF01)
        s_cols = [f.name for f in sdf.schema.fields]
        s_rows = sdf.collect()
    except Exception as ex:
        print(f"{name}: SPARK ERROR {type(ex).__name__}: {ex}")
        n_fail += 1
        continue
    sql = oracles.get(name)
    if sql is None:
        print(f"{name}: rows-only ({len(s_rows)} rows)")
        continue
    try:
        o = con.execute(sql)
        o_cols = [d[0] for d in o.description]
        o_rows = o.fetchall()
    except Exception as ex:
        print(f"{name}: ORACLE ERROR {type(ex).__name__}: {ex}")
        n_fail += 1
        continue
    if sorted(s_cols) != sorted(o_cols):
        print(f"{name}: SCHEMA MISMATCH spark={sorted(s_cols)} oracle={sorted(o_cols)}")
        n_fail += 1
        continue
    if len(s_rows) != len(o_rows):
        print(f"{name}: ROWCOUNT MISMATCH spark={len(s_rows)} oracle={len(o_rows)}")
        n_fail += 1
        continue
    sc = canon([tuple(r) for r in s_rows], s_cols)
    oc = canon(o_rows, o_cols)
    if sc != oc:
        bad = [(a, b) for a, b in zip(sc, oc) if a != b][:3]
        print(f"{name}: VALUE MISMATCH (first diffs: {bad})")
        n_fail += 1
        continue
    print(f"{name}: OK ({len(s_rows)} rows)")

print(f"DONE: {len(queries)} queries, {n_fail} failures")
sys.exit(1 if n_fail else 0)
