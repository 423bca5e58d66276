"""Driver-style correctness gate, run locally: every oracle-backed query in
the catalog must match DuckDB exactly (row count + sorted column names +
values) on the same parquet; rows-only queries must at least execute and
return a stable schema.

Runs at sf0.01 — the driver's correctness scale AND the scale the golden
fixtures (fixtures/golden/sf0.01, scripts/make_goldens.py) are generated
at, so a kernel change that invalidates a golden fails here first."""

from __future__ import annotations

import os

import duckdb
import pytest

from open_source_search_engine_spark.queries import ORACLES, QUERIES, TABLES

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def _norm(v):
    return round(v, 6) if isinstance(v, float) else v


def _row_key(row):
    """None-safe sort key: NULLs first within a column (some operators
    emit NULL by design — e.g. docid_assign's full-block NULL avail_docid,
    text_lm_perplexity's unscored ce_milli — and Python can't compare
    None with a value)."""
    return tuple((v is not None, v if v is not None else 0) for v in row)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_match(spark, duck, name):
    sdf = QUERIES[name](spark, SF)
    scols = sorted(sdf.columns)
    sdata = sorted((tuple(_norm(r[c]) for c in scols)
                    for r in sdf.collect()), key=_row_key)
    res = duck.execute(ORACLES[name])
    colidx = {d[0]: i for i, d in enumerate(res.description)}
    ocols = sorted(colidx)
    odata = sorted((tuple(_norm(r[colidx[c]]) for c in ocols)
                    for r in res.fetchall()), key=_row_key)
    assert scols == ocols, f"{name}: column names diverge"
    assert len(sdata) == len(odata), f"{name}: row count diverges"
    assert sdata == odata, f"{name}: values diverge"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_runs(spark, name):
    df = QUERIES[name](spark, SF)
    assert df.count() >= 0
    assert len(df.columns) >= 2


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_arrow_types_are_hashable(duck, name):
    """The driver hashes oracle results via Arrow, where DuckDB's HUGEINT
    (the result type of an uncast SUM(BIGINT)) surfaces as decimal128(38,0)
    and hash-mismatches a value-identical Spark BIGINT column.  Round 2 lost
    two green rows to exactly this (embed_topk_bruteforce,
    dedup_embed_cosine_pairs, VERDICT r2 item 1) — gate the whole class:
    no oracle may emit a decimal/hugeint-typed column.  LIMIT 0 keeps it
    schema-only (no data materialized)."""
    import pyarrow as pa

    schema = duck.execute(
        f"SELECT * FROM ({ORACLES[name]}) _typegate LIMIT 0").arrow().schema
    bad = [f"{f.name}:{f.type}" for f in schema
           if pa.types.is_decimal(f.type)]
    assert not bad, (
        f"{name}: oracle emits decimal/HUGEINT columns {bad} — "
        f"CAST the aggregate to BIGINT/DOUBLE in the oracle SQL")
