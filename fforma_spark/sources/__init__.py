from fforma_spark.sources.synth import synth_sequences
from fforma_spark.sources.tables import (
    load_table,
    sequences_from_documents,
    panel_from_events,
)

__all__ = [
    "synth_sequences",
    "load_table",
    "sequences_from_documents",
    "panel_from_events",
]
