"""Driver-facing query registry: every implemented operator from
SURVEY.md §2 gets a (spark, sf_dir) -> DataFrame callable here plus a
DuckDB oracle SQL string where the semantics are ANSI-SQL-expressible.

Column-name discipline: every computed column is aliased identically in
the Spark plan and the oracle SQL (the driver hash-compares by sorted
column name). Aggregated doubles are rounded to 6dp on BOTH sides so
engine-order float variation cannot flip the hash.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from fforma_spark.operators.gapfill import locf_fill, locf_fill_sql
from fforma_spark.operators.reshape import explode_panel
from fforma_spark.operators.rollup import (
    rollup_from_tier,
    rollup_tier,
    rollup_tier_sql,
)
from fforma_spark.sources.tables import (
    PANEL_FROM_EVENTS_SQL,
    SEQUENCES_FROM_DOCUMENTS_SQL,
    panel_from_events,
    sequences_from_documents,
)

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _round6(df: DataFrame, cols: list[str]) -> DataFrame:
    for c in cols:
        df = df.withColumn(c, F.round(c, 6))
    return df


# ---------------------------------------------------------------------------
# Retention-tier rollups (SURVEY §2.5 tumbling rebucket; north_rule core)
# ---------------------------------------------------------------------------

_T1_BUCKET = 16
_T2_FACTOR = 4


@register("rollup_t1_events", rollup_tier_sql(_T1_BUCKET, PANEL_FROM_EVENTS_SQL))
def rollup_t1_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1 continuous aggregate over the events-derived panel.

    Reference analog: ADIDA rebucket-aggregate
    (fforma/base/_models.py:770-779)."""
    panel = panel_from_events(spark, sf_dir)
    return _round6(rollup_tier(panel, _T1_BUCKET, exact_decimals=6), ["vsum", "vmean"])


@register(
    "rollup_t2_cascade",
    rollup_tier_sql(_T1_BUCKET * _T2_FACTOR, PANEL_FROM_EVENTS_SQL),
)
def rollup_t2_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T2 re-aggregated FROM T1 (partial→final), oracled against a
    direct bucket-64 aggregate of raw — proves cascade correctness."""
    panel = panel_from_events(spark, sf_dir)
    t1 = rollup_tier(panel, _T1_BUCKET, exact_decimals=6)
    return _round6(
        rollup_from_tier(t1, _T2_FACTOR, exact_decimals=6), ["vsum", "vmean"]
    )


_LOCF_TIER_SQL = (
    "SELECT doc_id, bucket, round(vmean,6) AS vmean, cnt FROM ("
    + rollup_tier_sql(_T1_BUCKET, PANEL_FROM_EVENTS_SQL)
    + ") WHERE (bucket % 3 <> 1) OR bucket = 0"
)


@register("locf_gapfill", locf_fill_sql(_LOCF_TIER_SQL, ["vmean", "cnt"]))
def locf_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense grid + LOCF over a deterministically-sparsified T1
    (north_rule gap-fill; reference pad analog _FFNN.py:128-142)."""
    panel = panel_from_events(spark, sf_dir)
    tier = rollup_tier(panel, _T1_BUCKET, exact_decimals=6).withColumn(
        "vmean", F.round("vmean", 6)
    )
    sparse = tier.filter((F.col("bucket") % 3 != 1) | (F.col("bucket") == 0)).select(
        "doc_id", "bucket", "vmean", "cnt"
    )
    return locf_fill(sparse, ["vmean", "cnt"]).select(
        "doc_id", "bucket", "vmean", "cnt", "is_gap"
    )


# ---------------------------------------------------------------------------
# Sequence-table scans/stats (SURVEY §2.1/§2.4)
# ---------------------------------------------------------------------------


@register(
    "seq_stats_documents",
    f"""
    SELECT doc_id, n_tok,
           CAST(list_min(tokens) AS INT) AS tok_min,
           CAST(list_max(tokens) AS INT) AS tok_max,
           CAST(list_sum(tokens) AS BIGINT) AS tok_sum
    FROM ({SEQUENCES_FROM_DOCUMENTS_SQL}) seqs
    WHERE n_tok > 0
    """,
)
def seq_stats_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-sequence token stats straight off the array column — no
    explode, no shuffle (per-group count/min/max: SURVEY §2.4)."""
    seq = sequences_from_documents(spark, sf_dir)
    return seq.filter(F.col("n_tok") > 0).select(
        "doc_id",
        "n_tok",
        F.array_min("tokens").alias("tok_min"),
        F.array_max("tokens").alias("tok_max"),
        F.aggregate(
            "tokens", F.lit(0).cast("long"), lambda acc, x: acc + x
        ).alias("tok_sum"),
    )


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver smoke entry: the full T1→T2 cascade + LOCF gap-fill."""
    panel = panel_from_events(spark, sf_dir)
    t1 = rollup_tier(panel, _T1_BUCKET)
    t2 = rollup_from_tier(t1, _T2_FACTOR)
    return locf_fill(t2, ["vmean"], key="bucket").select(
        "doc_id", "bucket", "cnt", "vmin", "vmax", "vmean", "is_gap"
    )
