"""Per-job fixed-cost probe (r18, VERDICT r17 item 3).

Measures the ~0.5-0.8 s/job floor the r17 sf0.001 sweep attributed to
"plan build + scheduling + Python-worker round trips", decomposed into:

  1. bare job submission        spark.range collect
  2. parquet scan + collect     1 job, no shuffle
  3. scan + groupBy + collect   1 shuffle (AQE materialization barrier)
  4. the quantile engine's three jobs on the bench's ETL frame shape
  5. a streaming micro-batch    (minimal rate -> memory replay)

Each timed with a warm lap first, min-of-5, under several conf
combinations (AQE coalesce parallelismFirst, shuffle partition count)
so the lever that actually moves the floor is identified before any
session.py change. Run on an idle box; results go to stdout.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from health_etl_pipeline_and_analytics_with_machine_learning_spark.session import (  # noqa: E402
    get_spark,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def timeit(fn, n=5, warm=1):
    for _ in range(warm):
        fn()
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    spark = get_spark(app_name="floor_probe")
    from health_etl_pipeline_and_analytics_with_machine_learning_spark.operators.registry import (
        load,
    )

    li = load(spark, SF_DIR, "lineitem")

    def bare():
        spark.range(100).collect()

    def scan():
        li.select("l_quantity").collect() and None

    def scan_agg():
        li.groupBy("l_returnflag").agg(F.sum("l_quantity")).collect()

    def scan_agg_wide():
        li.groupBy("l_returnflag", "l_linestatus").agg(
            *[F.sum(F.col("l_quantity") + i).alias(f"s{i}") for i in range(8)]
        ).collect()

    def stats_agg():
        # the quantile engine's stats job shape: N single-row aggregates
        aggs = []
        for c in ("l_quantity", "l_extendedprice", "l_discount", "l_tax"):
            v = F.col(c).cast("double")
            aggs += [
                F.count(F.when(v.isNotNull(), 1)).alias(f"n_{c}"),
                F.min(v).alias(f"lo_{c}"),
                F.max(v).alias(f"hi_{c}"),
            ]
        li.agg(*aggs).first()

    def arrow_pass():
        # a minimal mapInArrow job (Python-worker round trip)
        import pyarrow as pa

        def gen(batches):
            for rb in batches:
                yield pa.RecordBatch.from_arrays([rb.column(0)], names=["v"])

        li.select(F.col("l_quantity").cast("double").alias("v")).mapInArrow(
            gen, "v double"
        ).groupBy().count().collect()

    probes = [
        ("bare_range_collect", bare),
        ("parquet_scan_project_collect", scan),
        ("scan_groupby_agg_collect", scan_agg),
        ("scan_groupby_agg8_collect", scan_agg_wide),
        ("stats_agg_12cols", stats_agg),
        ("arrow_mapinarrow_pass", arrow_pass),
    ]

    confs = [
        ("baseline", {}),
        (
            "parallelismFirst=false",
            {"spark.sql.adaptive.coalescePartitions.parallelismFirst": "false"},
        ),
        ("shuffle.partitions=8", {"spark.sql.shuffle.partitions": "8"}),
        ("shuffle.partitions=4", {"spark.sql.shuffle.partitions": "4"}),
        ("AQE=off", {"spark.sql.adaptive.enabled": "false"}),
        (
            "pf=false+sp=8",
            {
                "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
                "spark.sql.shuffle.partitions": "8",
            },
        ),
    ]

    base = {
        "spark.sql.adaptive.coalescePartitions.parallelismFirst": spark.conf.get(
            "spark.sql.adaptive.coalescePartitions.parallelismFirst", "true"
        ),
        "spark.sql.shuffle.partitions": spark.conf.get("spark.sql.shuffle.partitions"),
        "spark.sql.adaptive.enabled": spark.conf.get("spark.sql.adaptive.enabled"),
    }

    for cname, conf in confs:
        for k, v in base.items():
            spark.conf.set(k, v)
        for k, v in conf.items():
            spark.conf.set(k, v)
        row = {name: round(timeit(fn), 4) for name, fn in probes}
        print(f"{cname:28s} " + "  ".join(f"{k}={v}" for k, v in row.items()))
        sys.stdout.flush()
    spark.stop()


if __name__ == "__main__":
    main()
