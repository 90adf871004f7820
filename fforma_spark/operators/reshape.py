"""Long ↔ wide reshaping (reference: fforma/utils/reshaping.py).

The canonical engine input is already wide (tokens array per doc);
these operators move between that and the long panel (doc_id, pos, val)
— the reference's long_to_wide / wide_to_long pair
(fforma/utils/reshaping.py:12-40,61-90; vectorized variant
fforma/utils/evaluation.py:144-154) — using posexplode/collect_list so
arrays stay Arrow-columnar end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def explode_panel(seq_df: DataFrame, value_type: str = "double") -> DataFrame:
    """wide→long: (doc_id, tokens) → (doc_id, pos, val).

    Equivalent of the reference's wide_to_long
    (fforma/utils/reshaping.py:61-90); empty-token docs drop out, as the
    reference's explode does for empty lists.
    """
    return seq_df.select(
        "doc_id",
        F.posexplode("tokens").alias("pos", "val"),
    ).select(
        "doc_id",
        F.col("pos").cast("long").alias("pos"),
        F.col("val").cast(value_type).alias("val"),
    )


def collect_series(panel: DataFrame, value_type: str = "double") -> DataFrame:
    """long→wide: (doc_id, pos, val) → (doc_id, vals array sorted by pos).

    Equivalent of long_to_wide (fforma/utils/reshaping.py:12-40).
    sort_array on the (pos, val) struct guarantees position order
    regardless of shuffle nondeterminism — the engine's
    sort-before-reduce discipline (SURVEY.md §7.3).
    """
    return panel.groupBy("doc_id").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("pos", "val"))),
            lambda s: s["val"].cast(value_type),
        ).alias("vals"),
        F.count("*").cast("int").alias("n"),
    )


def train_to_horizontal(
    x_panel: DataFrame, y_panel: DataFrame
) -> DataFrame:
    """Zip two long panels into per-doc aligned arrays with the
    reference's length assert (fforma/utils/reshaping.py:42-59
    train_to_horizontal): X and y are collected wide per doc_id, outer-
    merged, and every row must carry equally long arrays — enforced in
    the PLAN with assert_true so a misaligned panel fails the job the
    same way the pandas assert does.

    Output: (doc_id, X array, y array, n).
    """
    xw = collect_series(x_panel).select(
        "doc_id", F.col("vals").alias("X"), F.col("n").alias("n_x")
    )
    yw = collect_series(y_panel).select(
        "doc_id", F.col("vals").alias("y"), F.col("n").alias("n_y")
    )
    j = xw.join(yw, "doc_id", "outer")
    # Load-bearing assert AS A FILTER: the CASE falls through to
    # raise_error when the lengths differ OR a doc exists on only one
    # side (NULL comparison). It must live in a Filter, not a projected
    # column — a column-attached check is silently column-PRUNED for
    # any consumer that doesn't select it, and a
    # when(assert_true(..).isNull(), X).otherwise(X) variant is dead
    # code (Catalyst collapses identical branches).
    guard = F.when(F.col("n_x") == F.col("n_y"), F.lit(True)).otherwise(
        F.raise_error(F.lit("ds_x and ds_y not corresponding"))
    )
    return j.filter(guard).select(
        "doc_id",
        "X",
        "y",
        F.col("n_x").alias("n"),
    )


def seasonal_onehot(df: DataFrame, prefixes: list[str]) -> DataFrame:
    """One-hot seasonal-period dummy from the id's first character
    (fforma/experiments/experiment.py:420 pd.get_dummies of
    unique_id.str[0]) — pure projection."""
    first = F.substring("doc_id", 1, 1)
    return df.select(
        "doc_id",
        *[
            F.when(first == p, 1).otherwise(0).cast("int").alias(f"sp_{p}")
            for p in prefixes
        ],
    )
