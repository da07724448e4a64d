"""Raw CSV ingest with encoding fallback + multi-token NA handling.

Reference behavior (Health_Jim.py:136-155): try utf-8 → latin1 → cp1252
with pandas ``na_values`` list; the real dataset is NOT valid UTF-8
(verified byte 0xA5), so the latin1 fallback genuinely fires.

Spark's CSV reader takes one encoding and one nullValue, so this wrapper:
1. probes the encoding on a bounded head sample of the file (driver-side,
   reads only ``PROBE_BYTES`` — at 100 TB you probe, you don't scan);
2. reads everything as strings with the winning encoding;
3. applies the cell-exact NA-token nulling expression to every column.

Type repair happens downstream in the cleaning pipeline, exactly like the
reference (schema is "inferred, then forcibly repaired", SURVEY §1.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.cleaning import null_na_tokens

ENCODINGS = ("utf-8", "latin1", "cp1252")
#: python codec name → charset name Spark's CSV reader accepts.
#: cp1252 maps to iso-8859-1 (nearest supported; differs only in
#: 0x80–0x9F, and the branch is unreachable anyway — latin1 decodes
#: every byte sequence, so the third fallback never fires).
SPARK_CHARSET = {"utf-8": "UTF-8", "latin1": "ISO-8859-1", "cp1252": "ISO-8859-1"}
PROBE_BYTES = 4 << 20


def detect_encoding(path: str, encodings: tuple[str, ...] = ENCODINGS) -> str:
    """First encoding that strictly decodes the head of the file.

    latin1 maps every byte, so it always succeeds as the second try —
    mirroring the reference's fallback order.
    """
    with open(path, "rb") as f:
        head = f.read(PROBE_BYTES)
    for enc in encodings:
        try:
            head.decode(enc)
            return enc
        except UnicodeDecodeError:
            continue
    raise ValueError(
        f"Could not decode {path} with any of {encodings}; specify the encoding explicitly."
    )


def read_csv_raw(spark: SparkSession, path: str, encoding: str | None = None) -> DataFrame:
    """Read a raw CSV: header, all columns as strings, NA tokens → NULL."""
    enc = encoding or detect_encoding(path)
    df = spark.read.csv(
        path, header=True, inferSchema=False, encoding=SPARK_CHARSET.get(enc, enc)
    )
    return df.select(
        *[null_na_tokens(F.col(f"`{c}`")).alias(c) for c in df.columns]
    )
