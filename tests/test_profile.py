"""Column-profiling operator: counts, nulls, distincts, bounds."""

from pyspark.sql import functions as F

from addressit_spark.operators.profile import profile


def test_profile_counts_nulls_distincts(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "a"), (None, "b")], "x long, s string"
    )
    rows = {r.column: r for r in profile(df).collect()}
    assert rows["x"].n == 4 and rows["x"].n_null == 1 and rows["x"].n_distinct == 3
    assert rows["x"].min_val == "1" and rows["x"].max_val == "3"
    assert rows["s"].n_null == 1 and rows["s"].n_distinct == 2
    assert rows["s"].min_val == "a" and rows["s"].max_val == "b"


def test_profile_approx_mode_single_scan(spark):
    df = spark.range(1000).withColumn("y", F.col("id") % 10)
    p = profile(df, approx_distinct=True)
    rows = {r.column: r for r in p.collect()}
    assert rows["y"].n_distinct == 10  # HLL exact at tiny cardinality
    plan = p._jdf.queryExecution().executedPlan().toString()
    # approx mode must not plan the multi-distinct Expand
    assert "Expand" not in plan
