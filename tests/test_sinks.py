"""CSV sink round-trip: single-file export parity and the partitioned
default."""

from __future__ import annotations

import os

from health_etl_pipeline_and_analytics_with_machine_learning_spark.operators.registry import load
from health_etl_pipeline_and_analytics_with_machine_learning_spark.sources.sinks import (
    write_csv,
)
from conftest import SF_SMOKE


def test_single_file_csv_roundtrip(spark, tmp_path):
    nation = load(spark, SF_SMOKE, "nation")
    out = str(tmp_path / "nation.csv")
    write_csv(nation, out, single_file=True)
    assert os.path.isfile(out)
    back = spark.read.csv(out, header=True)
    assert back.count() == nation.count()
    assert back.columns == nation.columns


def test_partitioned_csv_roundtrip(spark, tmp_path):
    orders = load(spark, SF_SMOKE, "orders")
    out = str(tmp_path / "orders_csv")
    write_csv(orders, out)
    back = spark.read.csv(out, header=True)
    assert back.count() == orders.count()


def test_compacted_parquet_reduces_file_count(spark, tmp_path):
    """A deliberately over-partitioned frame (64 upstream partitions of
    a few MB total) must compact to ONE parquet file, and round-trip
    identically."""
    import glob

    from health_etl_pipeline_and_analytics_with_machine_learning_spark.sources.sinks import (
        write_compacted_parquet,
    )

    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").repartition(64)
    out = str(tmp_path / "compacted")
    write_compacted_parquet(li, out)
    files = glob.glob(f"{out}/part-*.parquet")
    assert len(files) == 1, f"expected 1 compacted file, got {len(files)}"
    assert spark.read.parquet(out).count() == li.count()


def test_jsonl_roundtrip_preserves_schema_and_rows(spark, tmp_path):
    from pyspark.sql import functions as F

    from health_etl_pipeline_and_analytics_with_machine_learning_spark.sources.sinks import (
        read_jsonl,
        write_jsonl,
    )

    src = load(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    path = str(tmp_path / "orders_jsonl")
    write_jsonl(src, path)
    back = read_jsonl(spark, path, schema=src.schema)
    assert back.schema == src.schema
    assert back.count() == src.count()
    # value-level: orderkey-summed checksum must survive the roundtrip
    a = src.agg(F.sum("o_totalprice")).first()[0]
    b = back.agg(F.sum("o_totalprice")).first()[0]
    assert abs(a - b) < 1e-6

    one = str(tmp_path / "orders.jsonl")
    write_jsonl(src.limit(5), one, single_file=True)
    import json as _json
    import os as _os

    assert _os.path.isfile(one)
    lines = [l for l in open(one).read().splitlines() if l]
    assert len(lines) == 5 and all("o_orderkey" in _json.loads(l) for l in lines)
