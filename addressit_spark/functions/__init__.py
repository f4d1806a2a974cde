"""Column-level function surface (the engine's `pyspark.sql.functions` twin).

Everything here is a pure Column expression or a registered UDF — importable
without instantiating any pipeline:

* ``format_address_col`` — O17 toString as JVM expressions.
* ``tokens_col`` — whitespace tokenization (empties dropped).
* ``shingles_col`` — distinct word n-gram shingles.
* ``cosine_col`` — cosine similarity of two ``array<float>`` columns.
* ``lsh_signature_col`` — random-hyperplane LSH bucket id.
* ``soundex`` (Python) — locality soundex identical to ``F.soundex``.
"""

from addressit_spark.operators.dedup import shingles_col  # noqa: F401
from addressit_spark.operators.similarity import (  # noqa: F401
    cosine_col,
    lsh_signature_col,
)
from addressit_spark.operators.text import tokens_col  # noqa: F401
from addressit_spark.parse_stage import format_address_col  # noqa: F401
from addressit_spark.sources.corpus import soundex  # noqa: F401
