"""Mimics the driver's correctness gate: run every queries() entry at a
small sf and compare row-count + sorted values against the DuckDB oracle."""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


def _normalize(rows, cols):
    out = []
    for row in rows:
        vals = []
        for c in cols:
            v = row[c] if not isinstance(row, tuple) else row[cols.index(c)]
            if isinstance(v, float):
                v = round(v, 6)
                if math.isnan(v):
                    v = "nan"
            vals.append(str(v))
        out.append(tuple(vals))
    return sorted(out)


ORACLE_KEYS = sorted(entry_mod.oracle_sql().keys())


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_query_matches_oracle(spark, ddb, name):
    q = entry_mod.queries()[name]
    sdf = q(spark, SF_DIR)
    cols = sorted(sdf.columns)
    spark_rows = _normalize(
        [r.asDict() for r in sdf.collect()], cols
    )
    odf = ddb.execute(entry_mod.oracle_sql()[name]).fetch_df()
    assert sorted(odf.columns.tolist()) == cols, (
        f"column mismatch: spark={cols} oracle={sorted(odf.columns.tolist())}"
    )
    oracle_rows = _normalize(
        odf.to_dict("records"), cols
    )
    assert len(spark_rows) == len(oracle_rows), (
        f"{name}: rowcount spark={len(spark_rows)} oracle={len(oracle_rows)}"
    )
    mismatches = [
        (a, b) for a, b in zip(spark_rows, oracle_rows) if a != b
    ][:5]
    assert not mismatches, f"{name}: first diffs {mismatches}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


@pytest.mark.parametrize(
    "name", [k for k in entry_mod.queries() if k not in entry_mod.oracle_sql()]
)
def test_rows_only_queries_run(spark, name):
    df = entry_mod.queries()[name](spark, SF_DIR)
    assert df.count() >= 0
