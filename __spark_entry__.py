"""Driver contract for the spark-graft builder (PySpark target).

All queries live in fforma_spark.queries; this file only adapts them to
the driver's entry/queries/oracle_sql interface.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from fforma_spark.queries import ORACLES, QUERIES, flagship  # noqa: E402

_REPO = os.path.dirname(os.path.abspath(__file__))


def _ensure_shipped(spark: SparkSession) -> None:
    """Ship the fforma_spark package to executor Python workers.

    Equivalent to ``spark-submit --py-files``: the driver process may
    import this module from any cwd, but pandas-UDF workers need the
    package importable too. Zip once per process, addPyFile is
    idempotent.
    """
    import zipfile

    zpath = os.path.join("/tmp", "fforma_spark_pkg.zip")
    if not os.path.exists(zpath):
        with zipfile.ZipFile(zpath, "w") as z:
            pkg = os.path.join(_REPO, "fforma_spark")
            for root, _dirs, files in os.walk(pkg):
                for fn in files:
                    if fn.endswith(".py"):
                        full = os.path.join(root, fn)
                        z.write(full, os.path.relpath(full, _REPO))
    try:
        spark.sparkContext.addPyFile(zpath)
    except Exception:  # noqa: BLE001 — already added in this context
        pass


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    _ensure_shipped(spark)
    return flagship(spark, "/root/testdata/sf0.001")


def _wrap(fn: Callable[[SparkSession, str], DataFrame]):
    def inner(spark: SparkSession, sf_dir: str) -> DataFrame:
        _ensure_shipped(spark)
        return fn(spark, sf_dir)

    return inner


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _wrap(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
