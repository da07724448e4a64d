"""Python string-casing semantics as native Catalyst expressions.

The reference cleans names with CPython's ``str.title()`` and
``str.capitalize()`` (Health_Jim.py:192, 214, 264). Spark's ``initcap``
does NOT match either (SURVEY §2.11 Q2/Q3: ``USA``→``Usa`` via
capitalize; ``alzheimer's disease``→``Alzheimer'S Disease`` via title —
title() re-capitalizes after ANY non-letter, initcap only after
whitespace).

Implementation constraint that matters at scale: one single
higher-order-function expression (CodegenFallback) in a projection
knocks the WHOLE operator out of whole-stage codegen — measured 6× on
the 35-column ETL projection. So these are built from
regexp_replace + initcap only (earlier versions used an
``aggregate`` fold over the character array; tests/test_fuzz_expressions.py
pins CPython equivalence either way):

- ``py_capitalize_words``: ``' '.join(p.capitalize() for p in s.split())``
  ≡ ``initcap`` after collapsing whitespace runs to single spaces —
  initcap capitalizes the char after each space iff it's a letter and
  lowercases the rest of the word, exactly per-word ``capitalize()``.
- ``py_title``: insert a ``\\x01␠`` marker after EVERY non-letter, so
  initcap sees a space boundary exactly where title() sees a non-letter
  boundary, then strip the markers (initcap preserves non-letters, so
  positions survive). ``\\x01`` cannot occur in cleaned input (both
  reference strip regexes remove control characters); raw inputs
  containing ``\\x01`` are out of scope, like the rest of the engine's
  ASCII stance.

ASCII-scoped deliberately: Java regex ``\\w``/letter classes are ASCII
by default while Python's are Unicode; the reference corpus is ASCII
after its own char-stripping, so the divergence is unreachable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_MARK = "\x01 "


def py_title(col: Column) -> Column:
    """CPython ``str.title()``: a letter is uppercased iff the previous
    character is not a letter; letters after a letter are lowercased;
    non-letters pass through."""
    marked = F.regexp_replace(col, "([^A-Za-z])", "$1" + _MARK)
    return F.regexp_replace(F.initcap(marked), _MARK, "")


def py_capitalize(col: Column) -> Column:
    """CPython ``str.capitalize()``: first character uppercased, ALL
    remaining characters lowercased (``USA`` → ``Usa``). NB: not initcap."""
    return F.concat(F.upper(F.substring(col, 1, 1)), F.lower(F.substring(col, 2, 2_000_000)))


def py_capitalize_words(col: Column) -> Column:
    """``' '.join(p.capitalize() for p in s.split())`` — collapse
    whitespace runs, trim, initcap (Health_Jim.py:190-192)."""
    return F.initcap(F.trim(F.regexp_replace(col, r"\s+", " ")))
