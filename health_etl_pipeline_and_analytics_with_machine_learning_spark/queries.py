"""Health-domain analytics — the reference's full query surface as named
functions, each with BOTH a DataFrame build and a SQL twin (the reference
keeps both surfaces too: pandas twins in nb@2/6/10/14, SQL in
nb@3/7/11/15/18/21; app variants Health_Jim.py:439-547).

Every function takes the cleaned health DataFrame (pipeline.py output).
``sql_twins()`` returns Spark-SQL strings over a ``global_health_data``
temp view that produce identical results — Catalyst compiles both
surfaces to the same plans. The dual surface doubles as a differential
test (tests/test_health_queries.py), which is the reference's own
informal test strategy made rigorous (SURVEY §5.1).

Scale notes: every query here is filter → groupBy(low-cardinality keys)
→ agg → sort/limit. Partial aggregation collapses the shuffle to
|groups| rows per task; top-k compiles to TakeOrderedAndProject. Results
are ≤ a few hundred rows by construction — safe to collect for reports.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

VIEW = "global_health_data"


def q1_deadliest_diseases(df: DataFrame, top_n: int = 5) -> DataFrame:
    """nb@3:2-13 — top diseases by average mortality (app variant uses
    top_n=10 and no null filter; post-sweep the filter is a no-op anyway)."""
    return (
        df.filter(F.col("Mortality_Rate_per_100").isNotNull())
        .groupBy("Disease Name")
        .agg(
            F.avg("Mortality_Rate_per_100").alias("avg_mortality"),
            F.count(F.lit(1)).alias("record_count"),
        )
        .orderBy(F.desc("avg_mortality"), F.asc("Disease Name"))
        .limit(top_n)
    )


def q2_recovery_trends(df: DataFrame, limit: int = 50) -> DataFrame:
    """nb@7:2-13 — per (Year, disease) counts and mean recovery, mixed-
    direction sort (recovery ASC, cases DESC)."""
    return (
        df.groupBy("Year", "Disease Name")
        .agg(
            F.count(F.lit(1)).alias("cases"),
            F.avg("Recovery_Rate").alias("avg_recovery"),
        )
        .orderBy(
            F.asc("avg_recovery"), F.desc("cases"), F.asc("Year"), F.asc("Disease Name")
        )
        .limit(limit)
    )


def q3_access_vs_mortality(df: DataFrame) -> DataFrame:
    """nb@11:2-13 — per-country averages with HAVING avg_mortality IS NOT
    NULL (= post-agg filter, exactly the pandas twin's dropna)."""
    return (
        df.groupBy("Country")
        .agg(
            F.avg("Healthcare_Access_Pct").alias("avg_healthcare_access"),
            F.avg("Mortality_Rate_per_100").alias("avg_mortality"),
            F.avg("Doctors_per_1000").alias("avg_doctors"),
        )
        .filter(F.col("avg_mortality").isNotNull())
        .orderBy(F.desc("avg_healthcare_access"), F.asc("Country"))
    )


def q4_treatment_cost(df: DataFrame) -> DataFrame:
    """nb@15:2-14 — cost/recovery/count per (disease, treatment type)."""
    return (
        df.filter(F.col("Avg_Treatment_Cost_USD").isNotNull())
        .groupBy("Disease Name", "Treatment_Type")
        .agg(
            F.avg("Avg_Treatment_Cost_USD").alias("avg_cost"),
            F.avg("Recovery_Rate").alias("avg_recovery"),
            F.count(F.lit(1)).alias("cases"),
        )
        .orderBy(F.desc("avg_cost"), F.asc("Disease Name"), F.asc("Treatment_Type"))
    )


def q5_gender_split(df: DataFrame, top_n: int = 10) -> DataFrame:
    """nb@18:1-13 — gender totals for the deadliest diseases.

    The reference's WHERE "Mortality_Rate" IS NOT NULL references a
    nonexistent column; SQLite silently treats it as a string literal
    (always truthy) so the query is actually UNFILTERED (SURVEY §2.2 Q7).
    Spark would raise AnalysisException on the typo. We implement the
    INTENDED filter on Mortality_Rate_per_100 — which is also a no-op
    post-sweep — so results agree with the reference either way."""
    return (
        df.filter(F.col("Mortality_Rate_per_100").isNotNull())
        .groupBy("Disease Name")
        .agg(
            F.avg("Mortality_Rate_per_100").alias("Avg_Mortality_Rate"),
            F.sum("Affected_Male").alias("Total_Affected_Male"),
            F.sum("Affected_Female").alias("Total_Affected_Female"),
        )
        .orderBy(F.desc("Avg_Mortality_Rate"), F.asc("Disease Name"))
        .limit(top_n)
    )


def q6_urban_rural_level1(df: DataFrame) -> DataFrame:
    """nb@21:1-16 — per (Country, disease) averages, access-filtered."""
    return (
        df.filter(F.col("Healthcare_Access_Pct").isNotNull())
        .groupBy("Country", "Disease Name")
        .agg(
            F.avg("Healthcare_Access_Pct").alias("Avg_Healthcare_Access"),
            F.avg("Population_Affected").alias("Avg_Affected_Population"),
            F.avg("Urban_Population_Pct").alias("Avg_Urban_Pct"),
            F.avg("Rural_Population_Pct").alias("Avg_Rural_Pct"),
        )
        .orderBy(F.desc("Avg_Affected_Population"), F.asc("Country"), F.asc("Disease Name"))
    )


def q6_urban_rural_disease_rank(df: DataFrame, limit: int = 50) -> DataFrame:
    """nb@22:1-12 — level-2 re-agg of the level-1 result: per-disease
    mean of the per-(country, disease) averages. Deliberately an
    avg-of-avgs, not a flat per-disease average (reference semantics)."""
    return (
        q6_urban_rural_level1(df)
        .groupBy("Disease Name")
        .agg(
            F.avg("Avg_Affected_Population").alias("Avg_Affected_Population"),
            F.avg("Avg_Healthcare_Access").alias("Avg_Healthcare_Access"),
            F.avg("Avg_Urban_Pct").alias("Avg_Urban_Pct"),
            F.avg("Avg_Rural_Pct").alias("Avg_Rural_Pct"),
        )
        .orderBy(F.desc("Avg_Affected_Population"), F.asc("Disease Name"))
        .limit(limit)
    )


def mortality_trend(df: DataFrame, country: str | None = None) -> DataFrame:
    """Health_Jim.py:461-471 — avg mortality per year, optionally for one
    country (the app's country-only slice of the full frame)."""
    base = df if country is None else df.filter(F.col("Country") == country)
    return (
        base.groupBy("Year")
        .agg(F.avg("Mortality_Rate_per_100").alias("avg_mortality"))
        .orderBy("Year")
    )


def gender_impact_melted(df: DataFrame) -> DataFrame:
    """Health_Jim.py:487-501 — per-disease gender totals, melted to long
    form (disease, Gender, Affected Population) for plotting."""
    wide = df.groupBy("Disease Name").agg(
        F.sum("Affected_Male").alias("Total_Male"),
        F.sum("Affected_Female").alias("Total_Female"),
    )
    return wide.unpivot(
        ids=["Disease Name"],
        values=["Total_Male", "Total_Female"],
        variableColumnName="Gender",
        valueColumnName="Affected Population",
    ).orderBy("Disease Name", "Gender")


def correlation_with_mortality(df: DataFrame, feature_cols: list[str] | None = None) -> DataFrame:
    """Health_Jim.py:519-547 — Pearson correlation of each numeric driver
    vs Mortality_Rate_per_100, as ONE wide aggregate (single pass)."""
    if feature_cols is None:
        skip = {"Mortality_Rate_per_100", "Record_ID", "Row_num", "Year"}
        feature_cols = [
            f.name
            for f in df.schema.fields
            if f.dataType.typeName() in ("double", "long", "integer") and f.name not in skip
        ]
    row = df.agg(
        *[
            F.corr(F.col("`Mortality_Rate_per_100`"), F.col(f"`{c}`")).alias(c)
            for c in feature_cols
        ]
    )
    return row.unpivot(
        ids=[], values=feature_cols, variableColumnName="feature", valueColumnName="correlation"
    ).orderBy(F.desc(F.abs(F.col("correlation"))))


def overview_metrics(df: DataFrame) -> DataFrame:
    """nb@28:64-82 — scalar overview: totals, nuniques, rounded means."""
    return df.agg(
        F.count(F.lit(1)).alias("total_records"),
        F.countDistinct("Country").alias("countries"),
        F.countDistinct("Disease Name").alias("diseases"),
        F.round(F.avg("Mortality_Rate_per_100"), 2).alias("avg_mortality"),
        F.round(F.avg("Recovery_Rate"), 2).alias("avg_recovery"),
        F.round(F.avg("Avg_Treatment_Cost_USD"), 2).alias("avg_treatment_cost"),
    )


def value_counts(df: DataFrame, col: str, top_n: int = 10) -> DataFrame:
    """nb@0:375-385 — record counts per category, desc."""
    return (
        df.groupBy(col)
        .agg(F.count(F.lit(1)).alias("count"))
        .orderBy(F.desc("count"), F.asc(col))
        .limit(top_n)
    )


def sql_twins() -> dict[str, str]:
    """Spark-SQL twins over the ``global_health_data`` temp view. These
    are (modulo the q5 bug fix and deterministic tiebreakers) the
    reference's own SQL strings — ANSI enough to run unchanged."""
    return {
        "q1_deadliest_diseases": f"""
            SELECT `Disease Name`,
                   AVG(Mortality_Rate_per_100) AS avg_mortality,
                   COUNT(*) AS record_count
            FROM {VIEW}
            WHERE Mortality_Rate_per_100 IS NOT NULL
            GROUP BY `Disease Name`
            ORDER BY avg_mortality DESC, `Disease Name`
            LIMIT 5
        """,
        "q2_recovery_trends": f"""
            SELECT Year, `Disease Name`,
                   COUNT(*) AS cases,
                   AVG(Recovery_Rate) AS avg_recovery
            FROM {VIEW}
            GROUP BY Year, `Disease Name`
            ORDER BY avg_recovery, cases DESC, Year, `Disease Name`
            LIMIT 50
        """,
        "q3_access_vs_mortality": f"""
            SELECT Country,
                   AVG(Healthcare_Access_Pct) AS avg_healthcare_access,
                   AVG(Mortality_Rate_per_100) AS avg_mortality,
                   AVG(Doctors_per_1000) AS avg_doctors
            FROM {VIEW}
            GROUP BY Country
            HAVING AVG(Mortality_Rate_per_100) IS NOT NULL
            ORDER BY avg_healthcare_access DESC, Country
        """,
        "q4_treatment_cost": f"""
            SELECT `Disease Name`, Treatment_Type,
                   AVG(Avg_Treatment_Cost_USD) AS avg_cost,
                   AVG(Recovery_Rate) AS avg_recovery,
                   COUNT(*) AS cases
            FROM {VIEW}
            WHERE Avg_Treatment_Cost_USD IS NOT NULL
            GROUP BY `Disease Name`, Treatment_Type
            ORDER BY avg_cost DESC, `Disease Name`, Treatment_Type
        """,
        "q5_gender_split": f"""
            SELECT `Disease Name`,
                   AVG(Mortality_Rate_per_100) AS Avg_Mortality_Rate,
                   SUM(Affected_Male) AS Total_Affected_Male,
                   SUM(Affected_Female) AS Total_Affected_Female
            FROM {VIEW}
            WHERE Mortality_Rate_per_100 IS NOT NULL
            GROUP BY `Disease Name`
            ORDER BY Avg_Mortality_Rate DESC, `Disease Name`
            LIMIT 10
        """,
        "q6_urban_rural_level1": f"""
            SELECT Country, `Disease Name`,
                   AVG(Healthcare_Access_Pct) AS Avg_Healthcare_Access,
                   AVG(Population_Affected) AS Avg_Affected_Population,
                   AVG(Urban_Population_Pct) AS Avg_Urban_Pct,
                   AVG(Rural_Population_Pct) AS Avg_Rural_Pct
            FROM {VIEW}
            WHERE Healthcare_Access_Pct IS NOT NULL
            GROUP BY Country, `Disease Name`
            ORDER BY Avg_Affected_Population DESC, Country, `Disease Name`
        """,
    }
