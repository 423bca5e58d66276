#!/usr/bin/env python
"""Local replica of the driver's CORRECTNESS gate.

For every key in ``__spark_entry__.queries()``: run the Spark query at
sf0.01, run the DuckDB oracle SQL with the same parquet tables registered
as views, and compare row count, column-name set, and a value hash over
(column-name-sorted, row-sorted) data.  Floats are rounded to 9
significant decimals before hashing so float64 formatting noise doesn't
flag — the driver's exact hash may differ, but any mismatch this script
finds IS a real value divergence worth fixing.

Usage: python scripts/check_contract.py [key ...]
"""

from __future__ import annotations

import hashlib
import json
import math
import os
import sys
import traceback

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _norm_cell(v):
    if v is None:
        return "\0"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def value_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x1f".join(_norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main() -> int:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import duckdb

    import __spark_entry__ as ent
    from open_source_search_engine_spark.session import get_spark

    qs = ent.queries()
    oracles = ent.oracle_sql()
    keys = sys.argv[1:] or list(qs)

    spark = get_spark(app="contract-check", master="local[32]",
                      shuffle_partitions=32)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    results: dict[str, dict] = {}
    n_bad = 0
    for key in keys:
        rec: dict = {}
        try:
            sdf = qs[key](spark, SF_DIR)
            srows = sdf.collect()
            scols = sdf.columns
            rec["spark_rows"] = len(srows)
            if key not in oracles:
                rec["err"] = "no_oracle"
            else:
                orel = con.execute(oracles[key])
                ocols = [d[0] for d in orel.description]
                orows = orel.fetchall()
                rec["oracle_rows"] = len(orows)
                rec["rows_match"] = len(srows) == len(orows)
                rec["schema_match"] = sorted(scols) == sorted(ocols)
                sh = value_hash(scols, [tuple(r) for r in srows])
                oh = value_hash(ocols, orows)
                rec["hash_match"] = sh == oh
                if not (rec["rows_match"] and rec["schema_match"]
                        and rec["hash_match"]):
                    n_bad += 1
                    if not rec["schema_match"]:
                        rec["spark_cols"] = sorted(scols)
                        rec["oracle_cols"] = sorted(ocols)
        except Exception as e:  # noqa: BLE001
            rec["err"] = f"{type(e).__name__}: {e}"
            rec["trace"] = traceback.format_exc()[-1500:]
            n_bad += 1
        results[key] = rec
        ok = rec.get("hash_match") and rec.get("rows_match") \
            and rec.get("schema_match")
        mark = "OK " if ok else ("NO-ORACLE" if rec.get("err") == "no_oracle"
                                 else "FAIL")
        print(f"{mark:9s} {key}  {json.dumps({k: v for k, v in rec.items() if k != 'trace'})}",
              flush=True)

    with open("/tmp/contract_check.json", "w") as f:
        json.dump(results, f, indent=1)
    print(f"\n{len(keys) - n_bad}/{len(keys)} green; details /tmp/contract_check.json")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main())
