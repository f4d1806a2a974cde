"""Column profiling: the data-validation pass a training pipeline runs
before trusting a new drop of data.

One output row per profiled column — row count, null count, distinct count,
lexical min/max — computed in a SINGLE aggregate over one scan: the per-
column expressions are all partial-aggregatable, so the map side reduces
each partition to one tiny row and the final exchange moves bytes, not
data. Distinct counts default to exact (`countDistinct`; Catalyst plans the
multi-distinct via expand) for oracle comparability; pass
``approx_distinct=True`` at 100 TB to swap in HLL++ sketches
(`approx_count_distinct`) — fixed-size mergeable state instead of a
distinct expansion per column.

Values are surfaced as strings so one fixed schema covers every column
type (binary/UTF8 min-max ordering matches ANSI engines on int and string
columns; avoid profiling float columns through the string cast if exact
oracle parity matters).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile(
    df: DataFrame,
    cols: Optional[Sequence[str]] = None,
    approx_distinct: bool = False,
) -> DataFrame:
    """One row per column: (column, n, n_null, n_distinct, min_val, max_val)."""
    cols = list(cols) if cols is not None else list(df.columns)
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        col = F.col(c)
        aggs.append(F.sum(col.isNull().cast("long")).alias(f"__null_{c}"))
        distinct = (
            F.approx_count_distinct(col)
            if approx_distinct
            else F.countDistinct(col)
        )
        aggs.append(distinct.alias(f"__dist_{c}"))
        aggs.append(F.min(col).cast("string").alias(f"__min_{c}"))
        aggs.append(F.max(col).cast("string").alias(f"__max_{c}"))
    one = df.agg(*aggs)
    # stack the single wide row into one row per column — a driver-free
    # explode of a literal-sized array (|cols| entries)
    stacked = one.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col("__n").alias("n"),
                        F.col(f"__null_{c}").alias("n_null"),
                        F.col(f"__dist_{c}").alias("n_distinct"),
                        F.col(f"__min_{c}").alias("min_val"),
                        F.col(f"__max_{c}").alias("max_val"),
                    )
                    for c in cols
                ]
            )
        ).alias("p")
    )
    return stacked.select("p.*")
