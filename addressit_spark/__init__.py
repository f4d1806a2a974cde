"""addressit_spark — a PySpark-native address entity-resolution engine.

From-scratch re-creation of the query/data-processing capabilities of the
reference freeform address parser (DamonOehlman/addressit) as a distributed
pipeline: vectorized Arrow parse stage → blocking → pairwise scoring →
transitive clustering, plus the training-data-pipeline operator suite
(dedup, similarity search, text analysis, multimodal plumbing).
"""

from addressit_spark.kernel import (  # noqa: F401
    LOCALES,
    Locale,
    make_locale,
    parse,
    parse_to_row,
    to_string,
)

__version__ = "0.1.0"
