"""Replicates the driver's verify: queries() vs oracle_sql() via DuckDB.

For every oracle-backed query: run the Spark DataFrame and the DuckDB SQL
side-by-side at sf0.01 and require identical row count, column set, and
values (order-insensitive). Rows-only queries are executed for ≥0 rows and
a stable schema. ``entry(spark)`` is smoke-checked like the driver does.
"""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{os.path.join(SF_DIR, t + '.parquet')}'"
        )
    return con


def _norm_value(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 9)
    if isinstance(v, (list, tuple)):
        return tuple(_norm_value(x) for x in v)
    return v


def _norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(_norm_value(r[i]) for i in order))
    return sorted(cols), sorted(out, key=repr)


ORACLE_NAMES = sorted(entry_mod.oracle_sql().keys())
ROWS_ONLY_NAMES = sorted(set(entry_mod.queries()) - set(ORACLE_NAMES))


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_query_matches_oracle(spark, ddb, name):
    q = entry_mod.queries()[name]
    sdf = q(spark, SF_DIR)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = ddb.execute(entry_mod.oracle_sql()[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = [tuple(r) for r in res.fetchall()]

    sc, sr = _norm_rows(spark_cols, spark_rows)
    dc, dr = _norm_rows(duck_cols, duck_rows)
    assert sc == dc, (name, sc, dc)
    assert len(sr) == len(dr), (name, len(sr), len(dr))
    mismatches = [(a, b) for a, b in zip(sr, dr) if a != b]
    assert not mismatches, (name, mismatches[:5])


@pytest.mark.parametrize("name", ROWS_ONLY_NAMES)
def test_rows_only_query_runs(spark, name):
    q = entry_mod.queries()[name]
    df = q(spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_hll_sketch_tracks_exact(spark):
    """approx_count_distinct (rsd=2%) stays within 5% of the exact twin."""
    qs = entry_mod.queries()
    exact = {
        r.source: r.n_distinct for r in qs["doc_distinct_exact"](spark, SF_DIR).collect()
    }
    for r in qs["doc_distinct_approx"](spark, SF_DIR).collect():
        assert abs(r.n_distinct_approx - exact[r.source]) <= max(
            0.05 * exact[r.source], 5
        ), (r.source, r.n_distinct_approx, exact[r.source])


def test_quantile_sketch_tracks_exact(spark):
    """percentile_approx (accuracy 10k) lands within one rank-neighborhood
    of the exact interpolated quantiles."""
    qs = entry_mod.queries()
    exact = {r.lang: r for r in qs["doc_len_quantiles"](spark, SF_DIR).collect()}
    for r in qs["doc_len_quantiles_approx"](spark, SF_DIR).collect():
        e = exact[r.lang]
        for c in ("p25", "p50", "p75", "p95"):
            # approx returns an actual data value; exact interpolates —
            # allow 5% relative slack around the interpolated value
            assert abs(getattr(r, c) - getattr(e, c)) <= max(
                0.05 * getattr(e, c), 2.0
            ), (r.lang, c, getattr(r, c), getattr(e, c))


def test_bench_headline_names_exist():
    """bench.py's timed query list must stay in sync with queries() —
    a rename would otherwise only surface as a KeyError in the driver's
    per-round bench run."""
    import bench

    missing = set(bench.HEADLINE_QUERIES) - set(entry_mod.queries())
    assert not missing, missing
    assert set(bench.HEADLINE_QUERIES) & set(entry_mod.oracle_sql())


def test_bench_comparable_set_is_frozen():
    """The cross-round comparable total only works if its key set never
    drifts: these are exactly the keys BENCH_r01.json timed. New queries
    belong in HEADLINE_QUERIES, never here."""
    import bench

    assert bench.R1_COMPARABLE_SET == [
        "pricing_summary", "top_customers", "regional_revenue",
        "events_user_top", "events_hourly", "doc_token_stats", "doc_quality",
        "exact_dup_prefix", "ngram_jaccard", "minhash_dups", "simhash_dups",
        "embedding_topk", "embedding_dup_lsh", "er_corpus_materialize",
        "er_parse_block", "er_score", "er_full_pipeline",
    ]
    # every comparable query must still be produced by the bench run:
    # headline-timed, or one of the always-emitted ER stage timers
    er_stages = {
        "er_corpus_materialize", "er_parse_block", "er_sim_dims",
        "er_score", "er_full_pipeline",
    }
    missing = set(bench.R1_COMPARABLE_SET) - set(bench.HEADLINE_QUERIES) - er_stages
    assert not missing, missing
    assert set(bench.BW_BOUND_QUERIES) <= er_stages


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = {r["metric"]: r["value"] for r in df.collect()}
    assert rows["sf0001_documents_rows"] > 0
    assert rows["er_pairwise_f1"] >= 0.99


def test_er_isolated_probe_failure_is_contained(monkeypatch):
    """The isolated-ER subprocess is best-effort: any failure (here a forced
    0s timeout) must yield None, never an exception that would break the
    driver's one-line bench JSON."""
    import bench

    monkeypatch.setenv("SPARK_GRAFT_ER_ISOLATED_TIMEOUT", "0")
    assert bench._er_isolated_probe() is None
