"""Dump .explain('formatted') for the r17-touched queries into
plans/r17/<query>_<tag>.txt (tag = before/after). Usage:

    PYTHONPATH=/root/repo python scripts/dump_r17_plans.py <tag> [op ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from health_etl_pipeline_and_analytics_with_machine_learning_spark.operators import (  # noqa: E402
    registry,
)
import health_etl_pipeline_and_analytics_with_machine_learning_spark.operators  # noqa: F401,E402
from health_etl_pipeline_and_analytics_with_machine_learning_spark.session import (  # noqa: E402
    get_spark,
)

SF = "/root/testdata/sf0.001"  # plan shape is scale-independent

#: the r17 optimization round's touched-query set (OPTIMIZATION_r17.md)
DEFAULT_OPS = [
    "text_simhash",
    "simhash_near_pairs",
    "streaming_neardup_probe",
    "streaming_neardup_store_maintenance",
    "streaming_neardup_store_compaction",
    "median_fill",
    "iqr_clip",
    "quantile_profile",
    "similarity_ivf_topk",
    "similarity_pq_topk",
    "similarity_ivf_pq_topk",
    "similarity_ivf_pq_residual_topk",
    "dedup_connected_components",
]


def main() -> None:
    tag = sys.argv[1]
    ops = sys.argv[2:] or DEFAULT_OPS
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r17")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name=f"dump_r17_{tag}", cpus=8)
    for name in ops:
        rq = registry.REGISTRY[name]
        try:
            plan = rq.fn(spark, SF)._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as exc:  # pragma: no cover
            plan = f"EXPLAIN FAILED: {exc}"
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(plan)
        print(f"{name}: {len(plan)} chars")
    spark.stop()


if __name__ == "__main__":
    main()
