"""Driver-style Spark-vs-DuckDB comparison harness.

Replicates the per-round correctness gate: for each registry query,
run the Spark program and the DuckDB oracle SQL on the same parquet
tables, then compare row count, column names, and an order-insensitive
value hash (columns sorted by name, rows sorted by their full value
tuple, floats canonicalized through repr of float64).
"""

from __future__ import annotations

import hashlib
import math
from dataclasses import dataclass

import duckdb
import pandas as pd

from curator_spark.queries.common import TABLES


def _canon_cell(v) -> str:
    if v is None or v is pd.NA or (isinstance(v, float) and math.isnan(v)):
        return "\x00NULL"
    if isinstance(v, float):
        return repr(float(v))
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def frame_hash(df: pd.DataFrame) -> str:
    cols = sorted(df.columns)
    # canonicalize COLUMN-wise: iterrows materializes each row as a
    # mixed-dtype Series, upcasting int64 to float64 whenever any other
    # column is float (or an int column holds a NULL) — 2**62+1 and
    # 2**62+2 become the same float64, so genuinely different 64-bit
    # hash/id outputs could false-PASS the value compare. Per-column
    # .tolist() preserves exact python ints.
    rows = _canon_rows(df, cols)
    h = hashlib.sha256()
    for r in rows:
        h.update(r.encode("utf-8", "surrogatepass"))
        h.update(b"\x02")
    return h.hexdigest()


@dataclass
class CompareResult:
    name: str
    spark_rows: int
    oracle_rows: int | None
    columns_match: bool | None
    values_match: bool | None
    detail: str = ""

    @property
    def ok(self) -> bool:
        if self.oracle_rows is None:  # rows-only check
            return self.spark_rows >= 0
        return bool(
            self.spark_rows == self.oracle_rows
            and self.columns_match
            and self.values_match
        )


def duckdb_run(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con.execute(sql).df()


def _oracle_for(name: str, sf_dir: str) -> str | None:
    """Resolve the oracle SQL for a query at a given sf-dir. Pinned
    golden oracles (model-scored queries) are per-sf-dir VALUES
    tables; everything else is one sf-independent SQL string."""
    import os

    from curator_spark.queries import ORACLES
    from curator_spark.queries.pipelineq import PINNED

    by_sf = PINNED.get(name)
    if by_sf is not None:
        return by_sf.get(os.path.basename(sf_dir.rstrip("/")))
    return ORACLES.get(name)


def compare_query(spark, name: str, sf_dir: str) -> CompareResult:
    from curator_spark.queries import ALL_QUERIES

    sdf = ALL_QUERIES[name](spark, sf_dir)
    spdf = sdf.toPandas()
    sql = _oracle_for(name, sf_dir)
    if sql is None:
        return CompareResult(name, len(spdf), None, None, None, "rows-only")
    odf = duckdb_run(sql, sf_dir)
    cols_match = sorted(spdf.columns) == sorted(odf.columns)
    detail = ""
    values_match = False
    if cols_match:
        hs, ho = frame_hash(spdf), frame_hash(odf)
        values_match = hs == ho
        if not values_match:
            detail = _first_diff(spdf, odf)
    else:
        detail = f"spark cols {sorted(spdf.columns)} vs oracle {sorted(odf.columns)}"
    return CompareResult(
        name, len(spdf), len(odf), cols_match, values_match, detail
    )


def _canon_rows(df: pd.DataFrame, cols: list[str]) -> list[str]:
    col_cells = [[_canon_cell(v) for v in df[c].tolist()] for c in cols]
    return sorted("\x01".join(cells) for cells in zip(*col_cells))


def _first_diff(a: pd.DataFrame, b: pd.DataFrame, n: int = 3) -> str:
    cols = sorted(a.columns)
    ra = _canon_rows(a, cols)
    rb = _canon_rows(b, cols)
    sa, sb = set(ra), set(rb)
    only_a = list(sa - sb)[:n]
    only_b = list(sb - sa)[:n]
    return f"only_spark={only_a!r} only_oracle={only_b!r}"
