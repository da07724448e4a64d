"""Ad-hoc differential check for a subset of registry ops (dev loop).

Usage: python scripts/check_ops.py op1 op2 ...   [SF_DIR=/root/testdata/sf0.01]

Runs the same DuckDB differential as tests/test_oracle_parity.py but
only for the named ops — the fast inner loop while authoring a new
operator, without paying full-suite startup.
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from health_etl_pipeline_and_analytics_with_machine_learning_spark.operators.registry import (
    REGISTRY,
)
from health_etl_pipeline_and_analytics_with_machine_learning_spark.session import (
    get_spark,
)

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


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


def strict_type_check(res, s_schema):
    """Round-5 driver-red lesson: ``fetchall()`` converts DuckDB HUGEINT
    to Python int, masking numeric-class mismatches the driver's
    pandas/Arrow fetch turns into float64/decimal — local green, driver
    red. Compare declared result types instead: every shared column must
    be in the same numeric class on both sides. The class maps live in
    ONE place (`oracle_types`, shared with tests/test_driver_conditions)
    so the dev-loop check can't drift from the parity gate (ADVICE r6).
    """
    from health_etl_pipeline_and_analytics_with_machine_learning_spark.oracle_types import (
        class_mismatches,
    )

    return class_mismatches(res.description, s_schema)


def main():
    sf_dir = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
    names = sys.argv[1:]
    if not names:
        print("usage: check_ops.py <op> [...]")
        return 2
    spark = get_spark(app_name="check_ops", cpus=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    rc = 0
    for name in names:
        rq = REGISTRY[name]
        try:
            sdf = rq.fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
            if rq.oracle is None:
                print(f"{name}: rows-only ({len(s_rows)} rows)")
                continue
            res = con.execute(rq.oracle)
            o_cols = [d[0] for d in res.description]
            type_errs = strict_type_check(res, sdf.schema)
            o_rows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ERROR {type(e).__name__}: {e}")
            rc = 1
            continue
        if type_errs:
            print(f"{name}: TYPE mismatch {type_errs}")
            rc = 1
            continue
        if sorted(s_cols) != sorted(o_cols):
            print(f"{name}: SCHEMA mismatch spark={sorted(s_cols)} oracle={sorted(o_cols)}")
            rc = 1
            continue
        cs, co = canon(s_rows, s_cols), canon(o_rows, o_cols)
        if len(cs) != len(co):
            print(f"{name}: ROWS mismatch spark={len(cs)} oracle={len(co)}")
            rc = 1
        elif cs != co:
            diff = [(a, b) for a, b in zip(cs, co) if a != b][:3]
            print(f"{name}: VALUE mismatch ({len(cs)} rows), first diffs: {diff}")
            rc = 1
        else:
            print(f"{name}: OK ({len(cs)} rows)")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
