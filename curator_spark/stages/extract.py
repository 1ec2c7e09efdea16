"""HTML → text extraction as a NATIVE expression (no Python).

The synthetic corpus wraps `text` as
`<html>...<body><p>{text}</p></body></html>` (FIXTURES.md §1), so
extraction is a deterministic, byte-stable regexp_extract over the
decoded binary column — whole-stage codegen, pushdown-friendly, and
`html` is read only by this stage (column pruning keeps it out of every
other scan). Analog of the reference's multimodal unpack (SURVEY P12).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (?s) so the body may contain newlines (repeated-line profile).
_BODY_RE = r"(?s)<p>(.*)</p>"


def extracted_text(html: Column) -> Column:
    return F.regexp_extract(F.decode(html, "UTF-8"), _BODY_RE, 1)


def with_extracted_text(df: DataFrame, out: str = "extracted_text") -> DataFrame:
    return df.withColumn(out, extracted_text(F.col("html")))
