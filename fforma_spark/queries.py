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

from fforma_spark.util import sql_round6, stable_round6  # noqa: E402

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
        df = df.withColumn(c, stable_round6(c))
    return df


def _sql_rounded(inner_sql: str, round_cols: list[str], keep_cols: list[str]) -> str:
    """Wrap a DuckDB subquery, stable-rounding ``round_cols``."""
    sel = ", ".join(
        keep_cols + [f"{sql_round6(c)} AS {c}" for c in round_cols]
    )
    return f"SELECT {sel} FROM ({inner_sql}) _rq"


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
    "SELECT doc_id, bucket, floor((vmean) * 1000000.0 + 0.5) / 1000000.0 AS vmean, cnt FROM ("
    + rollup_tier_sql(_T1_BUCKET, PANEL_FROM_EVENTS_SQL)
    + ") WHERE (bucket % 3 <> 1) OR bucket = 0"
)


@register("locf_gapfill", locf_fill_sql(_LOCF_TIER_SQL, ["vmean", "cnt"]))
def locf_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense grid + LOCF over a deterministically-sparsified T1
    (north_rule gap-fill; reference pad analog _FFNN.py:128-142)."""
    panel = panel_from_events(spark, sf_dir)
    tier = rollup_tier(panel, _T1_BUCKET, exact_decimals=6).withColumn(
        "vmean", stable_round6("vmean")
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


# ---------------------------------------------------------------------------
# T0 features (SURVEY §2.6) — closed-form subset, DuckDB-checked
# ---------------------------------------------------------------------------

from fforma_spark.functions.features import (  # noqa: E402
    features_sql,
    features_sql_oracle,
)

_FEATURE_ROUND = ["mean", "variance", "trend_slope", "x_acf1"]


@register(
    "features_sql_events",
    f"""
    SELECT doc_id, series_length, floor((mean) * 1000000.0 + 0.5) / 1000000.0 AS mean,
           floor((variance) * 1000000.0 + 0.5) / 1000000.0 AS variance, floor((trend_slope) * 1000000.0 + 0.5) / 1000000.0 AS trend_slope,
           floor((x_acf1) * 1000000.0 + 0.5) / 1000000.0 AS x_acf1, crossing_points
    FROM ({features_sql_oracle(PANEL_FROM_EVENTS_SQL)})
    """,
)
def features_sql_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series closed-form features (trend slope = covar_pop/var_pop
    == np.polyfit deg-1, fforma/base/_models.py:22-30; acf1 mean-
    centered biased-denominator, :136-152; crossing_points over the
    median)."""
    return _round6(
        features_sql(panel_from_events(spark, sf_dir)), _FEATURE_ROUND
    )


# ---------------------------------------------------------------------------
# Closed-form forecast models + evaluation + ensemble over events series
# (SURVEY §2.6 Naive/SeasonalNaive/RWD/Average; §2.10 evaluate; §2.9 softmin)
# ---------------------------------------------------------------------------

_H, _S = 8, 7

_SQL_FC = f"""
    WITH panel AS ({PANEL_FROM_EVENTS_SQL}),
    stats AS (
        SELECT doc_id, max(pos) + 1 AS n, max(pos) + 1 - {_H} AS cutoff
        FROM panel GROUP BY doc_id
        HAVING max(pos) + 1 > {_H} + {_S}
    ),
    train AS (
        SELECT p.* FROM panel p JOIN stats s USING (doc_id)
        WHERE p.pos < s.cutoff
    ),
    agg AS (
        SELECT doc_id,
               CAST(sum(CAST(val AS DECIMAL(30,6))) AS DOUBLE) / count(*) AS avg_f,
               arg_max(val, pos) AS last_v,
               arg_min(val, pos) AS first_v,
               count(*) AS n_train
        FROM train GROUP BY doc_id
    ),
    grid AS (
        SELECT s.doc_id, s.cutoff, unnest(generate_series(0, {_H} - 1)) AS pos
        FROM stats s
    )
    SELECT g.doc_id, g.pos,
           floor((a.last_v) * 1000000.0 + 0.5) / 1000000.0 AS naive_forec,
           floor((t.val) * 1000000.0 + 0.5) / 1000000.0 AS snaive_forec,
           floor((a.last_v + (a.last_v - a.first_v) / (a.n_train - 1) * (g.pos + 1)) * 1000000.0 + 0.5) / 1000000.0 AS rwd_forec,
           floor((a.avg_f) * 1000000.0 + 0.5) / 1000000.0 AS avg_forec
    FROM grid g
    JOIN agg a USING (doc_id)
    JOIN train t ON t.doc_id = g.doc_id
               AND t.pos = g.cutoff - {_S} + (g.pos % {_S})
"""


def _forecasts_events_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalyst-only Naive/SeasonalNaive/RandomWalkDrift/Average
    (fforma/base/_models.py:224-440) over the events-derived panel.

    Plan shape: one agg on doc_id, one small grid explode, one
    (doc_id,pos) equi-join for the seasonal tail — all broadcast-able
    per-doc scalars; no UDFs.
    """
    panel = panel_from_events(spark, sf_dir)
    stats = (
        panel.groupBy("doc_id")
        .agg((F.max("pos") + 1).alias("n"))
        .filter(F.col("n") > _H + _S)
        .withColumn("cutoff", F.col("n") - _H)
    )
    train = panel.join(stats.select("doc_id", "cutoff"), "doc_id").filter(
        F.col("pos") < F.col("cutoff")
    )
    agg = train.groupBy("doc_id").agg(
        (
            F.sum(F.col("val").cast("decimal(30,6)")).cast("double")
            / F.count("*")
        ).alias("avg_f"),
        F.max_by("val", "pos").alias("last_v"),
        F.min_by("val", "pos").alias("first_v"),
        F.count("*").alias("n_train"),
    )
    grid = stats.select(
        "doc_id",
        "cutoff",
        F.explode(F.sequence(F.lit(0), F.lit(_H - 1))).alias("pos"),
    )
    tail = train.select(
        "doc_id", F.col("pos").alias("_tpos"), F.col("val").alias("_tval")
    )
    return (
        grid.join(agg, "doc_id")
        .withColumn("_tpos", F.col("cutoff") - _S + F.pmod("pos", F.lit(_S)))
        .join(tail, ["doc_id", "_tpos"])
        .select(
            "doc_id",
            F.col("pos").cast("long").alias("pos"),
            stable_round6("last_v").alias("naive_forec"),
            stable_round6("_tval").alias("snaive_forec"),
            stable_round6(
                F.col("last_v")
                + (F.col("last_v") - F.col("first_v"))
                / (F.col("n_train") - 1)
                * (F.col("pos") + 1)).alias("rwd_forec"),
            stable_round6("avg_f").alias("avg_forec"),
        )
    )


register("forecasts_sql_events", _SQL_FC)(_forecasts_events_spark)


_SQL_EVAL = f"""
    WITH fc AS ({_SQL_FC}),
    panel AS ({PANEL_FROM_EVENTS_SQL}),
    stats AS (
        SELECT doc_id, max(pos) + 1 - {_H} AS cutoff
        FROM panel GROUP BY doc_id HAVING max(pos) + 1 > {_H} + {_S}
    ),
    truth AS (
        SELECT p.doc_id, p.pos - s.cutoff AS pos, p.val AS y
        FROM panel p JOIN stats s USING (doc_id)
        WHERE p.pos >= s.cutoff
    ),
    scale AS (
        SELECT p.doc_id,
               avg(abs(p.val - q.val)) AS mase_scale
        FROM panel p
        JOIN stats s ON p.doc_id = s.doc_id
        JOIN panel q ON q.doc_id = p.doc_id AND q.pos = p.pos - {_S}
        WHERE p.pos < s.cutoff AND q.pos < s.cutoff
        GROUP BY p.doc_id
    )
    SELECT t.doc_id,
           floor((200 * avg(CASE WHEN abs(t.y) + abs(f.naive_forec) <> 0
                 THEN abs(t.y - f.naive_forec) / (abs(t.y) + abs(f.naive_forec)) END)) * 1000000.0 + 0.5) / 1000000.0 AS naive_smape,
           floor((200 * avg(CASE WHEN abs(t.y) + abs(f.snaive_forec) <> 0
                 THEN abs(t.y - f.snaive_forec) / (abs(t.y) + abs(f.snaive_forec)) END)) * 1000000.0 + 0.5) / 1000000.0 AS snaive_smape,
           floor((100 * avg(abs(t.y - f.naive_forec)) / any_value(s.mase_scale)) * 1000000.0 + 0.5) / 1000000.0 AS naive_mase,
           floor((100 * avg(abs(t.y - f.snaive_forec)) / any_value(s.mase_scale)) * 1000000.0 + 0.5) / 1000000.0 AS snaive_mase
    FROM truth t
    JOIN fc f USING (doc_id, pos)
    JOIN scale s ON s.doc_id = t.doc_id
    GROUP BY t.doc_id
"""


def _eval_events_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series sMAPE (masked-invalid, metrics.py:117-148) and MASE
    (:150-180) of the closed-form models, Catalyst aggregates only."""
    from fforma_spark.functions.metrics import mase_scale

    panel = panel_from_events(spark, sf_dir)
    stats = (
        panel.groupBy("doc_id")
        .agg((F.max("pos") + 1).alias("n"))
        .filter(F.col("n") > _H + _S)
        .withColumn("cutoff", F.col("n") - _H)
    )
    truth = (
        panel.join(stats.select("doc_id", "cutoff"), "doc_id")
        .filter(F.col("pos") >= F.col("cutoff"))
        .select(
            "doc_id", (F.col("pos") - F.col("cutoff")).alias("pos"),
            F.col("val").alias("y"),
        )
    )
    train_panel = panel.join(stats.select("doc_id", "cutoff"), "doc_id").filter(
        F.col("pos") < F.col("cutoff")
    )
    scale = mase_scale(
        train_panel.select("doc_id", "pos", "val"), F.lit(_S)
    )
    fc = _forecasts_events_spark(spark, sf_dir)
    joined = truth.join(fc, ["doc_id", "pos"]).join(scale, "doc_id")
    aggs = []
    for m in ["naive", "snaive"]:
        e = F.abs(F.col("y") - F.col(f"{m}_forec"))
        sc = F.abs(F.col("y")) + F.abs(F.col(f"{m}_forec"))
        aggs.append(
            stable_round6(200 * F.avg(F.when(sc != 0, e / sc))).alias(
                f"{m}_smape"
            )
        )
        aggs.append(
            stable_round6(
                F.try_divide(100 * F.avg(e), F.first("mase_scale"))).alias(f"{m}_mase")
        )
    return joined.groupBy("doc_id").agg(*aggs)


register("eval_metrics_events", _SQL_EVAL)(_eval_events_spark)


@register(
    "softmin_ensemble_events",
    f"""
    WITH ev AS ({_SQL_EVAL}),
    fc AS ({_SQL_FC}),
    w AS (
        SELECT doc_id,
               exp(-(naive_smape - least(naive_smape, snaive_smape)))
               / (exp(-(naive_smape - least(naive_smape, snaive_smape)))
                  + exp(-(snaive_smape - least(naive_smape, snaive_smape)))) AS w_naive
        FROM ev
    )
    SELECT f.doc_id, f.pos,
           floor((w.w_naive * f.naive_forec + (1 - w.w_naive) * f.snaive_forec) * 1000000.0 + 0.5) / 1000000.0 AS y_hat
    FROM fc f JOIN w USING (doc_id)
    """,
)
def softmin_ensemble_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """softmax(-loss) weights (fforma/meta_learner/_basics.py:66-103)
    applied as the weighted rollup y_hat = Σ w·pred
    (fforma/meta_learner/_XGBoost.py:149-161) — broadcast join of the
    1-row-per-series weight table onto the prediction panel."""
    from fforma_spark.functions.ensemble import softmin_weights, weighted_rollup

    ev = _eval_events_spark(spark, sf_dir)
    w = softmin_weights(
        ev.select("doc_id", "naive_smape", "snaive_smape"),
        ["naive_smape", "snaive_smape"],
    )
    fc = _forecasts_events_spark(spark, sf_dir)
    out = weighted_rollup(
        fc,
        w,
        ["naive_forec", "snaive_forec"],
        ["naive_smape", "snaive_smape"],
    )
    return out.withColumn("y_hat", stable_round6("y_hat"))


# ---------------------------------------------------------------------------
# Filters / top-k / outlier masking (SURVEY §2.2, §2.7)
# ---------------------------------------------------------------------------


@register(
    "topk_series_by_volume",
    f"""
    SELECT doc_id, floor((total) * 1000000.0 + 0.5) / 1000000.0 AS total FROM (
        SELECT doc_id,
               CAST(sum(CAST(val AS DECIMAL(30,6))) AS DOUBLE) AS total
        FROM ({PANEL_FROM_EVENTS_SQL}) panel GROUP BY doc_id
    ) ORDER BY total DESC, doc_id LIMIT 10
    """,
)
def topk_series_by_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-N series by total volume (fforma/utils/utils.py:53-56
    nlargest) — agg + global top-k (Spark TakeOrderedAndProject, no
    full sort)."""
    panel = panel_from_events(spark, sf_dir)
    return (
        panel.groupBy("doc_id")
        .agg(
            stable_round6(
                F.sum(F.col("val").cast("decimal(30,6)")).cast("double")).alias("total")
        )
        .orderBy(F.desc("total"), "doc_id")
        .limit(10)
    )


@register(
    "outlier_iqr_mask",
    f"""
    WITH panel AS ({PANEL_FROM_EVENTS_SQL}),
    q AS (
        SELECT doc_id,
               CAST(quantile_cont(val, 0.25) AS DOUBLE) AS q1,
               CAST(quantile_cont(val, 0.75) AS DOUBLE) AS q3
        FROM panel GROUP BY doc_id
    )
    SELECT p.doc_id,
           count(*) AS n,
           sum(CASE WHEN p.val < q.q1 - 1.5 * (q.q3 - q.q1)
                      OR p.val > q.q3 + 1.5 * (q.q3 - q.q1)
               THEN 1 ELSE 0 END) AS n_outliers,
           floor((q.q1) * 1000000.0 + 0.5) / 1000000.0 AS q1, floor((q.q3) * 1000000.0 + 0.5) / 1000000.0 AS q3
    FROM panel p JOIN q USING (doc_id)
    GROUP BY p.doc_id, q.q1, q.q3
    """,
)
def outlier_iqr_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IQR outlier detection per series (fforma/experiments/datasets/
    business.py:16-40): exact quartiles (percentile == numpy linear
    interpolation) + fence counts."""
    panel = panel_from_events(spark, sf_dir)
    q = panel.groupBy("doc_id").agg(
        F.expr("percentile(val, 0.25)").alias("q1"),
        F.expr("percentile(val, 0.75)").alias("q3"),
    )
    iqr = F.col("q3") - F.col("q1")
    out = (
        panel.join(q, "doc_id")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n"),
            F.sum(
                F.when(
                    (F.col("val") < F.col("q1") - 1.5 * iqr)
                    | (F.col("val") > F.col("q3") + 1.5 * iqr),
                    1,
                ).otherwise(0)
            ).alias("n_outliers"),
            stable_round6(F.first("q1")).alias("q1"),
            stable_round6(F.first("q3")).alias("q3"),
        )
    )
    return out


@register(
    "minlen_filter_documents",
    f"""
    SELECT doc_id, n_tok FROM ({SEQUENCES_FROM_DOCUMENTS_SQL}) seqs
    WHERE n_tok >= 24
    """,
)
def minlen_filter_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min-length series filter (fforma/utils/utils.py:44-52) directly
    on the n_tok column — parquet-pushed-down predicate."""
    seq = sequences_from_documents(spark, sf_dir)
    return seq.filter(F.col("n_tok") >= 24).select("doc_id", "n_tok")


# ---------------------------------------------------------------------------
# Compression tier (SURVEY §2.12; north_rule Gorilla/delta-of-delta)
# ---------------------------------------------------------------------------


@register(
    "compress_roundtrip_documents",
    f"""
    SELECT doc_id, TRUE AS ok
    FROM ({SEQUENCES_FROM_DOCUMENTS_SQL}) seqs
    """,
)
def compress_roundtrip_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-row invariant decompress(compress(tokens)) == tokens over
    real text-derived sequences. The oracle is the identity truth
    table — any codec defect flips ok to false and breaks the hash."""
    from fforma_spark.functions.compress import roundtrip_check

    seq = sequences_from_documents(spark, sf_dir)
    return roundtrip_check(seq)


@register("compression_stats_documents")  # rows-only: byte counts are codec-internal
def compression_stats_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fforma_spark.functions.compress import compressed_blocks

    seq = sequences_from_documents(spark, sf_dir)
    return compressed_blocks(seq).select(
        "doc_id", "n_tok", "raw_bytes", "comp_bytes"
    )


# ---------------------------------------------------------------------------
# Kernel-backed rollups (SURVEY §2.6/§2.9/§2.10) — rows-only via the
# driver (values are pytest-verified bit-for-bit against the numpy
# oracle in tests/test_features.py / test_models_metrics.py; the
# sequential kernels are not ANSI-SQL-expressible)
# ---------------------------------------------------------------------------


@register("features_t0_documents")  # rows-only: mapInPandas kernels
def features_t0_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full tsfeatures-style T0 feature rollup (entropy, trend &
    seasonal strength, lumpiness, stability, hurst, acf10, ...) — ONE
    shuffle-free mapInPandas pass over the wide sequences table."""
    from fforma_spark.functions.features import features_wide

    return features_wide(sequences_from_documents(spark, sf_dir))


@register("base_forecasts_documents")  # rows-only: sequential kernels
def base_forecasts_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All 13 base-model forecasts per doc (naive..imapa incl. the
    Naive2 OWA benchmark) in one mapInPandas pass."""
    from fforma_spark.functions.models import base_forecasts

    return base_forecasts(sequences_from_documents(spark, sf_dir), default_h=8)


@register("owa_eval_documents")  # rows-only: depends on Naive2 kernel
def owa_eval_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series smape/mase/OWA vs the Naive2 benchmark for every
    model — the meta-learner's contribution-to-error input."""
    from fforma_spark.functions.metrics import evaluate_with_owa, mase_scale
    from fforma_spark.functions.models import (
        FORECAST_COLS,
        base_forecasts,
        holdout_truth,
        train_split,
    )

    seq = sequences_from_documents(spark, sf_dir)
    fc = base_forecasts(seq, default_h=8)
    truth = holdout_truth(seq, default_h=8)
    train_panel = explode_panel(train_split(seq, default_h=8)).select(
        "doc_id", "pos", "val"
    )
    scale = mase_scale(train_panel, F.lit(1))
    out = evaluate_with_owa(truth, fc, FORECAST_COLS, scale)
    return out.select(
        "doc_id",
        *[stable_round6(c).alias(c) for c in out.columns if c != "doc_id"],
    )


# Training-data pipeline registrations (dedup / similarity / text /
# multimodal) — imported for side effects.
import fforma_spark.pipeline.queries  # noqa: E402,F401


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver smoke entry: the full T1→T2 cascade + LOCF gap-fill."""
    panel = panel_from_events(spark, sf_dir)
    t1 = rollup_tier(panel, _T1_BUCKET)
    t2 = rollup_from_tier(t1, _T2_FACTOR)
    return locf_fill(t2, ["vmean"], key="bucket").select(
        "doc_id", "bucket", "cnt", "vmin", "vmax", "vmean", "is_gap"
    )
