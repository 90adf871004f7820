"""Physical-plan audits: the properties that make the engine viable at
100 TB, asserted on the actual optimized plans (SURVEY §7.3: no
BatchEvalPython anywhere; broadcasts for dims; pushdown on stored
columns)."""

from __future__ import annotations

import pytest

from fforma_spark.sources.synth import synth_sequences

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_no_rowwise_python_in_any_query(spark):
    """Every registered query must stay Arrow-vectorized: row-at-a-time
    BatchEvalPython is forbidden in the whole surface."""
    from fforma_spark.queries import QUERIES

    offenders = {}
    for name, fn in QUERIES.items():
        plan = _plan(fn(spark, SF))
        if "BatchEvalPython" in plan:
            offenders[name] = True
    assert not offenders, f"row-wise Python UDFs in: {sorted(offenders)}"


def test_nation_totals_uses_broadcast_joins(spark):
    from fforma_spark.queries import QUERIES

    plan = _plan(QUERIES["events_nation_totals"](spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_rollup_t1_single_exchange_from_stored_panel(spark, tmp_path):
    """T1 over a stored long panel: exactly ONE shuffle (the groupBy),
    with map-side partial aggregation before it."""
    from fforma_spark.operators.reshape import explode_panel
    from fforma_spark.operators.rollup import rollup_tier

    p = str(tmp_path / "panel")
    explode_panel(synth_sequences(spark, 50, 7)).write.parquet(p)
    import re

    t1 = rollup_tier(spark.read.parquet(p), 16)
    plan = _plan(t1)
    # formatted explain lists each node once in the tree and once in the
    # detail section — count detail headers "(n) Exchange"
    assert len(re.findall(r"^\(\d+\) Exchange", plan, re.M)) == 1
    # two-phase agg: a HashAggregate on each side of the exchange
    assert len(re.findall(r"^\(\d+\) HashAggregate", plan, re.M)) == 2


def test_minlen_filter_pushes_down_on_stored_table(spark, tmp_path):
    """n_tok >= k reaches the parquet scan when n_tok is a stored
    column (the canonical input table shape)."""
    from pyspark.sql import functions as F

    p = str(tmp_path / "seq")
    synth_sequences(spark, 50, 7).write.parquet(p)
    df = spark.read.parquet(p).filter(F.col("n_tok") >= 24).select("doc_id", "n_tok")
    plan = _plan(df)
    assert "PushedFilters: [" in plan
    assert "GreaterThanOrEqual(n_tok,24)" in plan
    # column pruning: tokens (the wide column) is not read
    readschema = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert readschema and "tokens" not in readschema[0]


def test_udf_stages_are_arrow_evaluated(spark):
    from fforma_spark.functions.features import features_wide
    from fforma_spark.sources.tables import sequences_from_documents

    plan = _plan(features_wide(sequences_from_documents(spark, SF)))
    assert "MapInPandas" in plan or "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan


def test_bucketed_tables_join_without_exchange(spark, tmp_path):
    """The SCALE.md §7 'designed for cluster' claim, demonstrated: two
    tables bucketed by doc_id on the same bucket count join with NO
    shuffle exchange — the truth⋈predictions join becomes bucket-local
    (exchange elimination is table DDL, not engine code)."""
    from fforma_spark.sources.tables import panel_from_events

    import pyspark.sql.functions as F

    panel = panel_from_events(spark, SF)
    # the engine's weights⋈forecasts shape: 1 row/doc joined onto the
    # panel on doc_id — the bucket key IS the join key
    left = panel.groupBy("doc_id").agg(F.avg("val").alias("w"))
    right = panel.select("doc_id", "pos", (panel["val"] * 2).alias("pred"))
    for name, df in (("bt_truth", left), ("bt_preds", right)):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.bucketBy(8, "doc_id")
            .sortBy("doc_id")
            .option("path", str(tmp_path / name))
            .mode("overwrite")
            .saveAsTable(name)
        )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force the sort-merge path (at 100 TB neither side broadcasts)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = (
            spark.table("bt_truth")
            .join(spark.table("bt_preds"), "doc_id")
            .select("doc_id", "pos", (F.col("w") * F.col("pred")).alias("y"))
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "Bucketed: true" in plan, plan
        assert j.count() > 0
        # the same join on plain (non-bucketed) frames DOES exchange
        plain = left.join(right, "doc_id")
        plain_plan = plain._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plain_plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bt_truth")
        spark.sql("DROP TABLE IF EXISTS bt_preds")
