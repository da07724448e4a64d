"""Hypothesis differential fuzz: the Catalyst expressions that reproduce
CPython string/number semantics are compared against the REAL CPython
behavior (and the reference's numeric-cleaning spec) on random ASCII
inputs — the strongest form of the §2.8 expression unit tests.

ASCII alphabet by design: the engine's casing expressions are scoped to
ASCII (see functions/textcase.py — Java vs Python regex class semantics
diverge on Unicode, unreachable after the reference's own stripping).

Each hypothesis example carries a BATCH of strings through one Spark
job so the fuzz stays fast.
"""

from __future__ import annotations

import re

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from health_etl_pipeline_and_analytics_with_machine_learning_spark.functions.cleaning import (
    clean_numeric,
)
from health_etl_pipeline_and_analytics_with_machine_learning_spark.functions.textcase import (
    py_capitalize,
    py_capitalize_words,
    py_title,
)

ALPHABET = (
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
    " '-.,!?@/()~%&"
)
TEXTS = st.lists(st.text(alphabet=ALPHABET, max_size=24), min_size=1, max_size=40)

_spark = None


import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _bind_spark(spark):
    """hypothesis @given can't take pytest fixtures — bind the session
    into the module global before every test."""
    global _spark
    _spark = spark


def _run(spark, strings, expr_builder):
    df = spark.createDataFrame([(s,) for s in strings], ["raw"])
    return [r[0] for r in df.select(expr_builder(F.col("raw"))).collect()]


def ref_clean_numeric(v: str | None) -> float | None:
    """The reference's clean_numeric_value spec (Health_Jim.py:240-254):
    drop apostrophes, comma→dot, strip non-[digit dot minus], ''/'.'→
    NaN, float() else NaN."""
    if v is None:
        return None
    s = str(v).replace("'", "").replace(",", ".")
    s = re.sub(r"[^\d\.\-]", "", s)
    if s in ("", "."):
        return None
    try:
        return float(s)
    except ValueError:
        return None


@settings(max_examples=15, deadline=None)
@given(TEXTS)
def test_clean_numeric_matches_reference_spec(strings):
    got = _run(_spark, strings, clean_numeric)
    want = [ref_clean_numeric(s) for s in strings]
    for s, g, w in zip(strings, got, want):
        if w is None:
            assert g is None, f"{s!r}: spark={g!r} python=None"
        else:
            assert g is not None and abs(g - w) < 1e-9, f"{s!r}: spark={g!r} python={w!r}"


@settings(max_examples=15, deadline=None)
@given(TEXTS)
def test_py_title_matches_cpython(strings):
    got = _run(_spark, strings, py_title)
    want = [s.title() for s in strings]
    assert got == want


@settings(max_examples=15, deadline=None)
@given(TEXTS)
def test_py_capitalize_matches_cpython(strings):
    got = _run(_spark, strings, py_capitalize)
    want = [s.capitalize() for s in strings]
    assert got == want


@settings(max_examples=15, deadline=None)
@given(TEXTS)
def test_py_capitalize_words_matches_cpython(strings):
    got = _run(_spark, strings, py_capitalize_words)
    want = [" ".join(p.capitalize() for p in s.split()) for s in strings]
    assert got == want


