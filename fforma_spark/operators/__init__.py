from fforma_spark.operators.reshape import explode_panel, collect_series
from fforma_spark.operators.rollup import rollup_tier, rollup_from_tier, TierSpec
from fforma_spark.operators.gapfill import locf_fill, dense_grid

__all__ = [
    "explode_panel",
    "collect_series",
    "rollup_tier",
    "rollup_from_tier",
    "TierSpec",
    "locf_fill",
    "dense_grid",
]
