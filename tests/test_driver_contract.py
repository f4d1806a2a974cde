"""Replicates the driver's verify: queries() vs oracle_sql() via DuckDB.

For every oracle-backed query: run the Spark DataFrame and the DuckDB SQL
side-by-side at sf0.01 and require identical row count, column set, and
values (order-insensitive). Rows-only queries are executed for ≥0 rows and
a stable schema. ``entry(spark)`` is smoke-checked like the driver does.
"""

import json
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
    """approx_count_distinct (rsd=2%) stays within 5% of the exact twin
    (the sketch now rides the merged doc_sketches_approx long-format row)."""
    qs = entry_mod.queries()
    exact = {
        r.source: r.n_distinct for r in qs["doc_distinct_exact"](spark, SF_DIR).collect()
    }
    rows = qs["doc_sketches_approx"](spark, SF_DIR).collect()
    approx = {
        r.key: r.value for r in rows
        if r.sketch == "hll_distinct" and r.metric == "n_distinct_approx"
    }
    assert set(approx) == set(exact)
    for key, est in approx.items():
        assert abs(est - exact[key]) <= max(0.05 * exact[key], 5), (
            key, est, exact[key])


def test_quantile_sketch_tracks_exact(spark):
    """percentile_approx (accuracy 10k) lands within one rank-neighborhood
    of the exact interpolated quantiles."""
    qs = entry_mod.queries()
    exact = {r.lang: r for r in qs["doc_len_quantiles"](spark, SF_DIR).collect()}
    rows = qs["doc_sketches_approx"](spark, SF_DIR).collect()
    for r in rows:
        if r.sketch != "gk_quantiles" or r.metric not in ("p25", "p50", "p75", "p95"):
            continue
        e = getattr(exact[r.key], r.metric)
        # approx returns an actual data value; exact interpolates —
        # allow 5% relative slack around the interpolated value
        assert abs(r.value - e) <= max(0.05 * e, 2.0), (
            r.key, r.metric, r.value, e)


def test_bench_headline_names_exist():
    """bench.py's timed query list must stay in sync with queries() —
    a rename would otherwise only surface as a KeyError in the driver's
    per-round bench run."""
    import bench

    resolvable = set(entry_mod.queries()) | set(entry_mod.BENCH_ONLY_QUERIES)
    missing = set(bench.HEADLINE_QUERIES) - resolvable
    assert not missing, missing
    # registry names always win over retired bench-only names
    assert not set(entry_mod.BENCH_ONLY_QUERIES) & set(entry_mod.queries())
    assert set(bench.HEADLINE_QUERIES) & set(entry_mod.oracle_sql())


def test_bench_emit_report_fits_driver_window(tmp_path, monkeypatch):
    """The printed bench line must fit the driver's 2000-char tail window
    (round 4 overflowed it → BENCH_r04 parsed:null). Feed emit_report a
    replica of a full round-4-shaped report and require a parseable line
    under 1800 chars with the contract keys, plus the detail file carrying
    the bulk."""
    import bench

    monkeypatch.setattr(bench, "DETAIL_PATH", str(tmp_path / "detail.json"))
    queries = {
        f"q{i:02d}": round(0.1 * i, 3) for i in range(len(bench.HEADLINE_QUERIES) + 10)
    }
    report = {
        "metric": "headline_total_sec", "value": 40.0, "unit": "sec",
        "sf": 0.1, "cpus": 32, "queries": queries,
        "queries_trials": {q: [t, t + 9.9, t] for q, t in queries.items()},
        "comparable_total_sec": 30.0, "normalized_total_sec": 44.0,
        "er_pairs_per_sec": 200052.0, "er_clusters": 1859, "er_entities": 2000,
        "er_full_pipeline_stages": {
            "addresses": 0.71, "sim_dims": 3.48, "edges": 2.96, "clusters": 5.23
        },
        "er_isolated": {"queries": queries, "queries_trials": {}},
        "calibration": {
            "triad8_gbps": 76.6, "cpu8_iters": 1089000,
            "ref_triad8_gbps": 69.8, "ref_cpu8_iters": 955515,
            "host_cpu_factor": 1.14, "host_bw_factor": 1.10,
        },
        "queries_normalized": queries, "queries_normalized_bw": {},
    }
    line = bench.emit_report(report)
    assert len(line) <= 1800, len(line)
    parsed = json.loads(line)
    for key in ("metric", "value", "unit", "queries", "sf",
                "comparable_total_sec", "er_full_pipeline_stages", "detail"):
        assert key in parsed, key
    assert "queries_trials" not in parsed  # bulk lives in the detail file
    detail = json.loads((tmp_path / "detail.json").read_text())
    assert detail["queries_trials"] == report["queries_trials"]
    assert detail["er_isolated"]["queries"] == queries


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
    # the driver's correctness harness records only the first 50 registry
    # entries — the whole registry must fit, oracle-backed strictly first
    names = list(entry_mod.queries())
    oracle = set(entry_mod.oracle_sql())
    assert len(names) <= 50, len(names)
    first_rows_only = min(i for i, n in enumerate(names) if n not in oracle)
    assert all(n not in oracle for n in names[first_rows_only:]), (
        "oracle-backed entries must precede every rows-only entry")
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
