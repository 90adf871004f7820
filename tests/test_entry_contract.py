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


def _canon(rows, cols):
    """Bug-compatible replica of the driver's canonicalizer: build a
    pandas DataFrame, sort columns by name, round float columns to
    6dp, then ``sort_values`` over ALL columns. This CRASHES on
    list/array-valued columns exactly like the driver does (r3's
    ``multimodal_features`` red row: ``TypeError: unhashable type:
    'list'`` in pandas factorize) — the prior repr-sort replica was
    list-safe and let that shape ship."""
    import pandas as pd

    df = pd.DataFrame(list(rows), columns=list(cols))
    df = df[sorted(df.columns)]
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
        elif df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: round(v, 6) if isinstance(v, float) else v
            )
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(
        drop=True
    )
    out = []
    for r in df.itertuples(index=False):
        vals = []
        for v in r:
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = round(v, 6)
            if isinstance(v, bool):
                v = int(v)
            vals.append(v)
        out.append(tuple(vals))
    return out


def test_canonicalizer_crashes_on_list_columns():
    """The fixture for bug-compatibility: an array-valued column must
    make _canon raise the same TypeError the driver raises."""
    with pytest.raises(TypeError, match="unhashable"):
        _canon([(1, [1.0, 2.0]), (2, [3.0])], ["id", "arr"])


@pytest.mark.parametrize("name", sorted(entrymod.queries().keys()))
def test_query_vs_oracle(spark, ddb01, name):
    q = entrymod.queries()[name]
    df = q(spark, SF_DIR)
    oracles = entrymod.oracle_sql()
    if name not in oracles:
        assert df.count() >= 0  # rows-only check, like the driver
        return
    sp_cols = df.columns
    sp = _canon([tuple(r) for r in df.collect()], sp_cols)
    res = ddb01.execute(oracles[name])
    dk_cols = [d[0] for d in res.description]
    assert sorted(sp_cols) == sorted(dk_cols), (sp_cols, dk_cols)
    dk = _canon(res.fetchall(), dk_cols)
    assert len(sp) == len(dk), f"{name}: rows {len(sp)} != {len(dk)}"
    mismatches = [i for i, (a, b) in enumerate(zip(sp, dk)) if a != b]
    assert not mismatches, (
        f"{name}: {len(mismatches)} mismatched rows, first: "
        f"{sp[mismatches[0]]} vs {dk[mismatches[0]]}"
    )


def test_registry_within_driver_window():
    """The driver checks only the FIRST 50 registered queries."""
    assert len(entrymod.queries()) <= 50


def test_no_container_columns_in_oracled_queries(spark):
    """Registry guard (VERDICT r3 #2): the driver's canonicalizer
    cannot sort ArrayType/MapType columns, so no ORACLED query may
    declare one in its schema. Plan-build only — nothing executes."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    oracles = entrymod.oracle_sql()
    bad = []
    for name, q in entrymod.queries().items():
        if name not in oracles:
            continue
        schema = q(spark, SF_DIR).schema
        for f in schema.fields:
            if isinstance(f.dataType, (ArrayType, MapType, StructType)):
                bad.append((name, f.name, f.dataType.simpleString()))
    assert not bad, f"oracled queries with driver-unsortable columns: {bad}"
