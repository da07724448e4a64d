"""Query registry shared by every operator module.

Each registered query is a pair:
- a Spark implementation ``fn(spark, sf_dir) -> DataFrame``, and
- an optional ANSI-SQL oracle string runnable by DuckDB on the same
  parquet tables (views ``region nation customer supplier part orders
  lineitem events documents embeddings`` are pre-registered by the
  driver). ``oracle=None`` marks a genuinely non-SQL-expressible op —
  the driver then records a weaker rows-only check.

Column names must be identical between the two sides (the driver's
comparison sorts columns by name before hashing values), so every
computed column is aliased the same way in both. Aggregated doubles are
rounded (ROUND_DP decimals) on BOTH sides: Spark and DuckDB accumulate
floating-point sums in different orders, so the raw last-ULP bits are
not comparable, but the rounded values are.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

#: decimals to which cross-engine-compared aggregate doubles are rounded
ROUND_DP = 4


@dataclass
class RegisteredQuery:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, RegisteredQuery] = {}


def query(name: str, oracle: str | None, tags: tuple[str, ...] = ()):
    """Decorator: register ``fn(spark, sf_dir) -> DataFrame`` under ``name``."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = RegisteredQuery(name=name, fn=fn, oracle=oracle, tags=tags)
        return fn

    return deco


def round_cmp(col, dp: int = ROUND_DP):
    """Cross-engine-stable rounding for aggregated doubles.

    A plain ``ROUND(x, dp)`` diverges between Spark (HALF_UP) and DuckDB
    (half-to-even) whenever the true mean lands exactly on a half
    boundary — which genuinely happens when averaging 2-decimal data over
    power-of-two group sizes (e.g. mean 70.49125 over 16 rows → 70.4913
    vs 70.4912). The fix is to use the *same* IEEE-double formula on both
    sides: an inner round at ``dp+3`` absorbs summation-order noise
    (~1e-12), then ``FLOOR(x*10^dp + 0.5)/10^dp`` pins the tie-break to
    identical double ops in both engines. Pair with :func:`round_cmp_sql`
    in the oracle.
    """
    from pyspark.sql import functions as F

    scale = float(10**dp)
    return F.floor(F.round(col, dp + 3) * scale + F.lit(0.5)) / F.lit(scale)


def round_cmp_sql(expr: str, dp: int = ROUND_DP) -> str:
    """DuckDB-side twin of :func:`round_cmp` — textually identical math."""
    scale = float(10**dp)
    return f"FLOOR(ROUND({expr}, {dp + 3}) * {scale} + 0.5) / {scale}"


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """Read one of the driver's parquet tables.

    ``events.parquet`` stores ``ts`` as parquet TIMESTAMP(NANOS), which
    Spark's vectorized reader rejects outright. We read nanos as a long
    (legacy conf, runtime-settable) and rebuild a microsecond timestamp —
    the same precision DuckDB coerces nanos to, so oracle comparisons on
    derived time columns agree.
    """
    if table == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F

        df = spark.read.parquet(f"{sf_dir}/{table}.parquet")
        # integer division: ts/1000 via `/` is a double and loses the
        # last microsecond above 2^53 ns — DuckDB truncates exactly
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")
