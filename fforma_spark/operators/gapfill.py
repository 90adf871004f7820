"""Gap-fill: densify a sparse per-series grid and fill with LOCF.

The reference pads sparse panels to a dense (id × 1..max_h) grid with
constant-0 fill (fforma/meta_learner/_FFNN.py:128-142 ``pad_long_df``);
the north_rule upgrades the fill policy to last-observation-carried-
forward. Implementation is all Catalyst-native: sequence()+explode for
the dense grid, then ``last(val, ignorenulls=True)`` over a per-series
ordered window.

Scale notes: the grid explode is linear in output rows and needs no
shuffle beyond the per-doc agg for bounds; the LOCF window shuffles
once on doc_id. For whale docs the window is a single-pass running
state (no full-partition sort spill beyond the one orderBy).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def dense_grid(df: DataFrame, key: str = "bucket") -> DataFrame:
    """Per doc_id, the dense key range [min(key) .. max(key)] exploded.

    Template: the reference's ids × (1..max_h) cartesian pad
    (fforma/meta_learner/_FFNN.py:128-142), per-series bounds instead
    of a global max.
    """
    bounds = df.groupBy("doc_id").agg(
        F.min(key).alias("_lo"), F.max(key).alias("_hi")
    )
    return bounds.select(
        "doc_id",
        F.explode(F.sequence(F.col("_lo"), F.col("_hi"))).alias(key),
    )


def locf_fill(
    df: DataFrame,
    value_cols: list[str],
    key: str = "bucket",
) -> DataFrame:
    """Densify (doc_id, key) and LOCF-fill ``value_cols``.

    Output has one row per doc per key in the per-doc range; observed
    rows keep their values, gaps carry the last observed value forward
    (leading gaps stay NULL — nothing to carry).
    """
    grid = dense_grid(df, key)
    joined = grid.join(df, ["doc_id", key], "left")
    w = (
        W.partitionBy("doc_id")
        .orderBy(key)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    out = joined.withColumn("is_gap", F.col(value_cols[0]).isNull())
    for c in value_cols:
        out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return out


def locf_fill_sql(tier_sql: str, value_cols: list[str], key: str = "bucket") -> str:
    """DuckDB oracle for locf_fill over a tier subquery."""
    filled = ",\n               ".join(
        f"last_value(t.{c} IGNORE NULLS) OVER "
        f"(PARTITION BY g.doc_id ORDER BY g.{key} "
        f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS {c}"
        for c in value_cols
    )
    return f"""
        WITH tier AS ({tier_sql}),
        bounds AS (
            SELECT doc_id, min({key}) AS _lo, max({key}) AS _hi
            FROM tier GROUP BY doc_id
        ),
        grid AS (
            SELECT doc_id, unnest(generate_series(_lo, _hi)) AS {key}
            FROM bounds
        )
        SELECT g.doc_id, g.{key},
               {filled},
               t.{value_cols[0]} IS NULL AS is_gap
        FROM grid g LEFT JOIN tier t
          ON g.doc_id = t.doc_id AND g.{key} = t.{key}
    """
