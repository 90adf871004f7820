"""Session factory: master resolution must honor a spark-submit
--master (cluster deployment contract, SCALE.md §1) and only fall back
to local[$SPARK_GRAFT_CPUS] for plain python processes."""

from __future__ import annotations

import subprocess
import sys

from fforma_spark.session import _default_shuffle_partitions


def test_default_shuffle_partitions_resolution():
    assert _default_shuffle_partitions("local[8]", 32) == 8
    assert _default_shuffle_partitions("local[*]", 32) == 32
    assert _default_shuffle_partitions("yarn", 16) == 16
    assert _default_shuffle_partitions("spark://host:7077", 32) == 32
    assert _default_shuffle_partitions("k8s://https://host", 12) == 12
    # local[N,maxFailures] / local[*,F] retry forms must parse too
    assert _default_shuffle_partitions("local[8,3]", 32) == 8
    assert _default_shuffle_partitions("local[*,2]", 32) == 32


def test_get_spark_does_not_force_master_under_submit():
    """With the py4j gateway env present (how spark-submit launches
    python), get_spark must NOT inject a local master — the submitted
    one wins. Verified without a JVM: the builder's options map must
    lack spark.master in submit mode and carry local[N] otherwise."""
    code = """
import os, sys
os.environ["SPARK_GRAFT_CPUS"] = "7"
mode = sys.argv[1]
if mode == "submit":
    os.environ["PYSPARK_GATEWAY_PORT"] = "59999"
    os.environ["PYSPARK_GATEWAY_SECRET"] = "x"
else:
    os.environ.pop("PYSPARK_GATEWAY_PORT", None)

# intercept at the builder: record option writes, stop before JVM
from pyspark.sql import SparkSession
captured = {}
class FakeBuilder:
    def master(self, m): captured["master"] = m; return self
    def appName(self, a): return self
    def config(self, k, v=None): captured[k] = v; return self
    def getOrCreate(self): raise SystemExit(0)
import fforma_spark.session as S
S.SparkSession = type("S", (), {"builder": FakeBuilder()})
try:
    S.get_spark("probe")
except SystemExit:
    pass
print("MASTER=" + captured.get("master", "ABSENT"))
"""
    for mode, want in (("submit", "MASTER=ABSENT"), ("plain", "MASTER=local[7]")):
        out = subprocess.run(
            [sys.executable, "-c", code, mode],
            capture_output=True,
            text=True,
            check=True,
        )
        assert want in out.stdout, (mode, out.stdout, out.stderr)


def test_shuffle_guard_never_clobbers_user_runtime_value(spark):
    """r4 ADVICE fix: the auto-default marker stores the value it set,
    so a user's later explicit runtime value (spark.conf.set or
    get_spark(shuffle_partitions=...)) survives subsequent
    get_spark(None) calls; only the stock default or our own last
    auto-set value is overwritten."""
    from fforma_spark.session import get_spark

    key = "spark.sql.shuffle.partitions"
    marker = "spark.fforma.autoShufflePartitions"
    saved_val = spark.conf.get(key)
    saved_marker = spark.conf.get(marker, "")
    try:
        # user sets an explicit value directly on the runtime conf
        spark.conf.set(key, "13")
        spark.conf.set(marker, "")  # no prior auto-set
        get_spark("fforma_spark_tests")
        assert spark.conf.get(key) == "13"

        # an explicit get_spark(shuffle_partitions=...) also survives
        get_spark("fforma_spark_tests", shuffle_partitions=14)
        assert spark.conf.get(key) == "14"
        get_spark("fforma_spark_tests")
        assert spark.conf.get(key) == "14"

        # this session was CREATED with an explicit shuffle_partitions
        # (context conf), so the auto-resolve branch must never fire —
        # even when the marker claims the current value was auto-set
        spark.conf.set(key, "17")
        spark.conf.set(marker, "17")
        get_spark("fforma_spark_tests")
        assert spark.conf.get(key) == "17"
    finally:
        spark.conf.set(key, saved_val)
        spark.conf.set(marker, saved_marker)
