"""Per-expression unit tests — FIXTURES.md §3 scalar edge-case table.

Expected values are the verified behaviors of the reference's cleaning
functions (SURVEY §2.11 quirks included)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from health_etl_pipeline_and_analytics_with_machine_learning_spark.functions.cleaning import (
    capitalize_treatment,
    clean_availability,
    clean_country,
    clean_disease,
    clean_numeric,
)

NUMERIC_CASES = [
    (None, None),
    ("'0", 0.0),
    ("'35500.22", 35500.22),
    ("12,5", 12.5),
    ("'.'", None),
    ("", None),
    ("abc", None),
    ("-3.5", -3.5),
    ("'1167", 1167.0),
    ("1.2.3", None),
    (".5", 0.5),
    ("5.", 5.0),
]

COUNTRY_CASES = [
    (None, "Unknown"),
    ("T?u?r?k?e?y?", "Turkey"),
    ("USA", "Usa"),  # quirk Q2: str.capitalize, not initcap
    ("G%rmany", "Germany"),
    ("Can@da", "Canada"),
    ("Mex!co", "Mexico"),
    ("?r?zil", "Brazil"),
    ("@#$%", "Unknown"),  # empty after strip
    ("It@l¥", "Italy"),  # quirk Q1 normalize decision (latin1 variant added)
    ("united  kingdom", "United Kingdom"),
]

DISEASE_CASES = [
    (None, "Unknown"),
    (" Ebola ", "Ebola"),
    ("HIV/A!DS", "HIVADS"),  # quirk Q4: strip-before-replace
    ("Influen&za", "Influenza"),
    ("alzheimer's disease", "Alzheimer'S Disease"),  # quirk Q3: Python .title()
    ("COVID-19", "COVID-19"),  # acronym guard
    ("Tub?rculosis", "Tubrculosis"),  # quirk Q5
    ("Pol!o", "Polo"),  # strip fires before the Pol!o→Polio replacement
]

AVAILABILITY_CASES = [
    (None, "Unknown"),
    ("high ", "High"),
    ("NONE", "None"),
    ("M?dium", "Medium"),  # quirk Q8: unknown-token fallback
    ("none", "None"),  # quirk Q9: label 'None', not a null
    ("garbage", "Medium"),
]

TREATMENT_CASES = [
    (None, "Unknown"),
    ("medication", "Medication"),
    ("SURGERY", "Surgery"),
]


def test_clean_numeric(spark):
    df = spark.createDataFrame([(c[0],) for c in NUMERIC_CASES], ["raw"])
    got = [r[0] for r in df.select(clean_numeric(F.col("raw"))).collect()]
    assert got == pytest.approx([c[1] for c in NUMERIC_CASES])


def test_clean_country(spark):
    df = spark.createDataFrame([(c[0],) for c in COUNTRY_CASES], ["raw"])
    got = [r[0] for r in df.select(clean_country(F.col("raw"))).collect()]
    assert got == [c[1] for c in COUNTRY_CASES]


def test_clean_disease(spark):
    df = spark.createDataFrame([(c[0],) for c in DISEASE_CASES], ["raw"])
    got = [r[0] for r in df.select(clean_disease(F.col("raw"))).collect()]
    assert got == [c[1] for c in DISEASE_CASES]


def test_clean_availability(spark):
    df = spark.createDataFrame([(c[0],) for c in AVAILABILITY_CASES], ["raw"])
    got = [r[0] for r in df.select(clean_availability(F.col("raw"))).collect()]
    assert got == [c[1] for c in AVAILABILITY_CASES]


def test_capitalize_treatment(spark):
    df = spark.createDataFrame([(c[0],) for c in TREATMENT_CASES], ["raw"])
    got = [r[0] for r in df.select(capitalize_treatment(F.col("raw"))).collect()]
    assert got == [c[1] for c in TREATMENT_CASES]
