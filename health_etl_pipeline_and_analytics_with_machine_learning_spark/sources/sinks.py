"""Relational file sinks (SURVEY §2.1).

The reference writes one cleaned CSV (`cleaned_global_health_data.csv`,
Health_Jim.py:432-434) and reloads it. The engine's canonical silver
sink is parquet (typed, splittable, predicate-pushable); CSV remains
for export parity. ``single_file=True`` coalesces to one partition for
byte-level file parity — correct only for export-sized results; a
100 TB table is written partitioned, never coalesced.
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import DataFrame


def write_csv(
    df: DataFrame, path: str, single_file: bool = False, header: bool = True
) -> str:
    """Write a CSV sink. With ``single_file``, produce exactly one
    ``.csv`` FILE at ``path`` (Spark writes a directory of parts; the
    one part is moved out and the directory removed)."""
    if not single_file:
        df.write.mode("overwrite").option("header", header).csv(path)
        return path
    tmp = path + ".__spark_tmp__"
    df.coalesce(1).write.mode("overwrite").option("header", header).csv(tmp)
    (part,) = glob.glob(os.path.join(tmp, "part-*.csv"))
    if os.path.exists(path):
        os.remove(path)
    shutil.move(part, path)
    shutil.rmtree(tmp)
    return path


def write_silver_parquet(df: DataFrame, path: str) -> str:
    """The canonical cleaned-table sink."""
    df.write.mode("overwrite").parquet(path)
    return path
