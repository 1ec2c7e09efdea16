"""Truncated-JSON repair as native Catalyst expressions.

The reference patches incomplete guided-decoding JSON by appending the
missing closing brace (reference: request_processor/offline/
vllm_offline_request_processor.py:150-165, applied at :101 and :208).
This is the generalized, engine-parity form: append as many ``}`` as
the brace balance requires, then let the JSON parser decide validity.
Pure string built-ins — length/replace/concat/repeat — so the repair
runs inside whole-stage codegen on a 100 TB scan; no Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def brace_deficit(c: Column) -> Column:
    """How many closing braces the string is short (>= 0)."""
    opens = F.length(c) - F.length(F.replace(c, F.lit("{"), F.lit("")))
    closes = F.length(c) - F.length(F.replace(c, F.lit("}"), F.lit("")))
    return F.greatest(opens - closes, F.lit(0))


def fix_json(c: Column) -> Column:
    """Append the missing closing braces (identity on balanced input)."""
    return F.concat(c, F.repeat(F.lit("}"), brace_deficit(c)))


SQL_BRACE_DEFICIT = (
    "greatest(length({c}) - length(replace({c}, '{{', ''))"
    " - (length({c}) - length(replace({c}, '}}', ''))), 0)"
)


def sql_fix_json(c: str) -> str:
    """DuckDB twin of fix_json for the oracle queries."""
    return f"{c} || repeat('}}', {SQL_BRACE_DEFICIT.format(c=c)})"
