#!/usr/bin/env python
"""Simulate the driver's CORRECTNESS gate locally: run every measured
registry query at sf0.01 against its DuckDB oracle (same row-count /
column / value-hash comparison) and print one line per query. Run this
before every round ends — a red row here is a red row in
CORRECTNESS_r{N}.json.

Usage: python tools/driver_sim.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from curator_spark.engine.session import get_spark
    from curator_spark.oracle.compare import compare_query
    from curator_spark.queries import MEASURED

    spark = get_spark("driver-sim", cores=16, shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    bad = 0
    for name in MEASURED:
        try:
            r = compare_query(spark, name, sf_dir)
            status = "OK " if r.ok else "FAIL"
            if r.oracle_rows is None:
                status = "ROWS"  # rows-only (no oracle)
            if not r.ok:
                bad += 1
            print(
                f"{status} {name}: spark={r.spark_rows} "
                f"oracle={r.oracle_rows} {r.detail[:160]}"
            )
        except Exception as e:  # the driver records errors as red rows
            bad += 1
            print(f"ERR  {name}: {type(e).__name__}: {str(e)[:200]}")
    spark.stop()
    print(f"\n{bad} failing of {len(MEASURED)} measured queries")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
