#!/usr/bin/env python
"""Materialize golden-fixture parquet for every kernel-backed catalog query.

The kernels (tabulation hash, URL normalizer, robots grammar, MinHash /
SimHash / winnowing, ANN, summaries) are pinned exactly by the pytest
reference-vector suites; DuckDB cannot recompute them, so the driver's
cross-engine gate needs their verified outputs materialized.  This script
runs each query at sf0.01 (the driver's correctness scale) and writes one
single-file parquet per query under fixtures/golden/sf0.01/ — the oracle
SQL in queries.py is a plain SELECT against that file.

Regenerate ONLY after deliberately changing a kernel, with the pytest suite
green: `python scripts/make_goldens.py` (optionally a query-name filter
argv).  A stale golden will (correctly) fail the oracle gate.
"""

from __future__ import annotations

import os
import sys

import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from open_source_search_engine_spark.queries import (  # noqa: E402
    GOLDEN_DIR, GOLDEN_SF, GOLDEN_QUERIES)
from open_source_search_engine_spark.session import get_spark  # noqa: E402

SF_DIR = f"/root/testdata/{GOLDEN_SF}"


def main() -> None:
    only = set(sys.argv[1:])
    out_dir = os.path.join(GOLDEN_DIR, GOLDEN_SF)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app="make-goldens", master="local[32]",
                      shuffle_partitions=32)
    for name, fn, _order in GOLDEN_QUERIES:
        if only and name not in only:
            continue
        # toArrow keeps the Spark types exactly — toPandas would coerce a
        # nullable long column to float64 and the golden parquet would no
        # longer schema-match the live Spark result.
        tbl = fn(spark, SF_DIR).toArrow()
        path = os.path.join(out_dir, f"{name}.parquet")
        pq.write_table(tbl, path)
        print(f"{name}: {tbl.num_rows} rows -> {path}")


if __name__ == "__main__":
    main()
