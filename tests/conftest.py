from __future__ import annotations

import os

import duckdb
import pytest

from fforma_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")  # keep test JVM light
    s = get_spark("fforma_spark_tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def ddb():
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


def assert_df_equal(spark_df, duck_rel, sort_cols, rtol=0.0, atol=0.0):
    """Order-insensitive comparison of a Spark DF against a DuckDB result."""
    import math

    sp = [tuple(r) for r in spark_df.collect()]
    dk = [tuple(r) for r in duck_rel.fetchall()]
    cols = spark_df.columns
    idx = [cols.index(c) for c in sort_cols]
    keyf = lambda t: tuple(t[i] for i in idx)  # noqa: E731
    sp.sort(key=keyf)
    dk.sort(key=keyf)
    assert len(sp) == len(dk), f"row count {len(sp)} != {len(dk)}"
    for a, b in zip(sp, dk):
        for x, y in zip(a, b):
            if isinstance(x, float) and isinstance(y, float):
                if math.isnan(x) and math.isnan(y):
                    continue
                assert math.isclose(x, y, rel_tol=rtol, abs_tol=max(atol, 1e-9)), (a, b)
            else:
                assert x == y, (a, b)
