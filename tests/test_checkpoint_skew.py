"""Checkpointed tier resume + lineage, skew report, chunking."""

from __future__ import annotations

import json
import os

import pytest

from pyspark.sql import functions as F

from fforma_spark.operators.reshape import explode_panel
from fforma_spark.operators.rollup import TierSpec, rollup_tier
from fforma_spark.plans.checkpoint import (
    materialize_ladder,
    read_tier,
    tier_is_complete,
)
from fforma_spark.plans.skew import (
    assert_max_series_length,
    chunk_sequences,
    salted_repartition,
    skew_report,
)
from fforma_spark.sources.synth import synth_sequences

TIERS = (TierSpec("t1", 8), TierSpec("t2", 32), TierSpec("t3", 128))


@pytest.fixture()
def panel(spark):
    return explode_panel(synth_sequences(spark, n_docs=40, seed=17))


def _tier_as_dict(df):
    return {
        (r["doc_id"], r["bucket"]): (r["cnt"], r["vmin"], r["vmax"], r["vsum"])
        for r in df.collect()
    }


def test_materialize_and_resume(spark, panel, tmp_path):
    base = str(tmp_path / "tiers")
    m1 = materialize_ladder(panel, base, TIERS, fingerprint="fp1")
    assert all(not m.get("resumed") for m in m1.values())
    assert all(m["rows"] > 0 for m in m1.values())
    assert m1["t2"]["source_tier"] == "t1"
    # lineage present and consistent
    for m in m1.values():
        assert sum(p["rows"] for p in m["partitions"]) == m["rows"]

    # manifests make tiers complete
    for t in TIERS:
        assert tier_is_complete(base, t, "fp1")
        assert not tier_is_complete(base, t, "other-fp")

    # full rerun: everything resumed, nothing rewritten
    mtimes = {
        t.name: os.path.getmtime(os.path.join(base, t.name, "_manifest.json"))
        for t in TIERS
    }
    m2 = materialize_ladder(panel, base, TIERS, fingerprint="fp1")
    assert all(m.get("resumed") for m in m2.values())
    for t in TIERS:
        assert (
            os.path.getmtime(os.path.join(base, t.name, "_manifest.json"))
            == mtimes[t.name]
        )

    # kill after t1: drop t2+t3 manifests → only those rebuild
    for t in TIERS[1:]:
        os.remove(os.path.join(base, t.name, "_manifest.json"))
    m3 = materialize_ladder(panel, base, TIERS, fingerprint="fp1")
    assert m3["t1"].get("resumed")
    assert not m3["t2"].get("resumed") and not m3["t3"].get("resumed")

    # resumed outputs equal direct computation from raw
    direct_t3 = rollup_tier(panel, 128)
    assert _tier_as_dict(read_tier(spark, base, TIERS[2])) == _tier_as_dict(
        direct_t3
    )


def test_skew_report_and_whales(spark):
    seq = synth_sequences(spark, n_docs=120, seed=42)
    rep = skew_report(seq)
    assert rep["n_docs"] == 120
    assert rep["max"] >= rep["p99"] >= rep["p50"] > 0
    # generator plants ~100x whales at idx%97==3 → must be detected
    assert len(rep["whales"]) >= 1
    assert rep["whales"][0][1] > rep["whale_threshold"]


def test_salted_repartition_spreads_whale(spark):
    seq = synth_sequences(spark, n_docs=120, seed=42)
    panel = explode_panel(seq)
    whale = skew_report(seq)["whales"][0][0]
    parts = (
        salted_repartition(panel.filter(F.col("doc_id") == whale), 16, 16)
        .select(F.spark_partition_id().alias("pid"))
        .distinct()
        .count()
    )
    assert parts > 4  # one doc spread over many partitions


def test_chunk_sequences_rebuilds_exactly(spark):
    seq = synth_sequences(spark, n_docs=30, seed=5)
    chunks = chunk_sequences(seq, max_len=64)
    assert chunks.filter(F.col("n_tok") > 64).count() == 0
    # re-assemble: explode chunks with absolute positions == raw panel
    rebuilt = chunks.select(
        "doc_id",
        F.posexplode("tokens").alias("rel", "val"),
        "chunk_pos0",
    ).select(
        "doc_id",
        (F.col("chunk_pos0") + F.col("rel")).cast("long").alias("pos"),
        F.col("val").cast("int").alias("val"),
    )
    orig = explode_panel(seq, value_type="int")
    assert rebuilt.exceptAll(orig).count() == 0
    assert orig.exceptAll(rebuilt).count() == 0


def test_max_len_contract(spark):
    seq = synth_sequences(spark, n_docs=120, seed=42)
    with pytest.raises(ValueError, match="exceed max_len"):
        assert_max_series_length(seq, 100)
    assert_max_series_length(seq.filter(F.col("n_tok") <= 100), 100)
