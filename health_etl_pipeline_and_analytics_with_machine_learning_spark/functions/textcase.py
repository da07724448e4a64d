"""Python string-casing semantics as native Catalyst expressions.

The reference cleans names with CPython's ``str.title()`` and
``str.capitalize()`` (Health_Jim.py:192, 214, 264). Spark's ``initcap``
does NOT match either (SURVEY §2.11 Q2/Q3: ``USA``→``Usa`` via
capitalize; ``alzheimer's disease``→``Alzheimer'S Disease`` via title —
title() re-capitalizes after any non-letter, initcap only after
whitespace). These helpers reproduce the exact semantics with
higher-order array expressions — JVM-side, no Python UDFs.

ASCII-scoped deliberately: Java regex ``\\w``/letter classes are ASCII
by default while Python's are Unicode; the reference corpus is ASCII
after its own char-stripping, so the divergence is unreachable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def py_title(col: Column) -> Column:
    """CPython ``str.title()``: a letter is uppercased iff the previous
    character is not a letter; letters after a letter are lowercased;
    non-letters pass through. Fold over the character array.
    """
    return F.aggregate(
        F.split(col, ""),
        F.struct(F.lit("").alias("out"), F.lit(False).alias("prev_alpha")),
        lambda acc, c: F.struct(
            F.concat(
                acc.getField("out"),
                F.when(
                    c.rlike("^[A-Za-z]$"),
                    F.when(acc.getField("prev_alpha"), F.lower(c)).otherwise(F.upper(c)),
                ).otherwise(c),
            ).alias("out"),
            c.rlike("^[A-Za-z]$").alias("prev_alpha"),
        ),
        lambda acc: acc.getField("out"),
    )


def py_capitalize(col: Column) -> Column:
    """CPython ``str.capitalize()``: first character uppercased, ALL
    remaining characters lowercased (``USA`` → ``Usa``). NB: not initcap."""
    return F.concat(F.upper(F.substring(col, 1, 1)), F.lower(F.substring(col, 2, 2_000_000)))


def py_capitalize_words(col: Column) -> Column:
    """``' '.join(p.capitalize() for p in s.split())`` — split on
    whitespace runs (dropping empties, like ``str.split()`` with no
    args), capitalize each part, join with single spaces
    (Health_Jim.py:190-192)."""
    return F.array_join(
        F.transform(
            F.filter(F.split(col, r"\s+"), lambda w: w != F.lit("")),
            lambda w: F.concat(
                F.upper(F.substring(w, 1, 1)), F.lower(F.substring(w, 2, 2_000_000))
            ),
        ),
        " ",
    )
