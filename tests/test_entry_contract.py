"""Replicates the driver's verify: entry() smoke + every queries()
entry vs its oracle_sql() on the sf0.01 tables (row count + values)."""

from __future__ import annotations

import math
import os

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def ddb01():
    con = duckdb.connect()
    for name in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{name}.parquet')"
        )
    yield con
    con.close()


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def _normalize(rows, cols):
    out = []
    for r in rows:
        vals = []
        for c in sorted(range(len(cols)), key=lambda i: cols[i]):
            v = r[c]
            if isinstance(v, float):
                v = round(v, 6)
                if math.isnan(v):
                    v = "NaN"
            if isinstance(v, bool):
                v = int(v)
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=repr)
    return out


@pytest.mark.parametrize("name", sorted(entrymod.queries().keys()))
def test_query_vs_oracle(spark, ddb01, name):
    q = entrymod.queries()[name]
    df = q(spark, SF_DIR)
    oracles = entrymod.oracle_sql()
    if name not in oracles:
        assert df.count() >= 0  # rows-only check, like the driver
        return
    sp_cols = df.columns
    sp = _normalize([tuple(r) for r in df.collect()], sp_cols)
    res = ddb01.execute(oracles[name])
    dk_cols = [d[0] for d in res.description]
    assert sorted(sp_cols) == sorted(dk_cols), (sp_cols, dk_cols)
    dk = _normalize(res.fetchall(), dk_cols)
    assert len(sp) == len(dk), f"{name}: rows {len(sp)} != {len(dk)}"
    mismatches = [i for i, (a, b) in enumerate(zip(sp, dk)) if a != b]
    assert not mismatches, (
        f"{name}: {len(mismatches)} mismatched rows, first: "
        f"{sp[mismatches[0]]} vs {dk[mismatches[0]]}"
    )
