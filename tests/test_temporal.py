"""As-of join + sessionization: brute-force parity, DuckDB ASOF parity, plans."""

import random

import duckdb
import pytest

from pyspark.sql import functions as F

from addressit_spark.operators.temporal import asof_join, session_stats, sessionize


def _mk_tables(seed=7, n_left=300, n_right=120, n_keys=12):
    """Random numeric-ts tables with missing keys, dup timestamps, ties."""
    rng = random.Random(seed)
    left = [
        (f"k{rng.randrange(n_keys)}", float(rng.randrange(0, 500)), i)
        for i in range(n_left)
    ]
    # keys k0..k8 only on the right → k9+ never match; duplicate (key, ts)
    right = [
        (f"k{rng.randrange(n_keys - 3)}", float(rng.randrange(0, 500)), 1000 + i)
        for i in range(n_right)
    ]
    return left, right


def _brute_asof(left, right, direction="backward", strict=False, tolerance=None):
    out = {}
    for key, lts, lid in left:
        best = None
        for rkey, rts, rid in right:
            if rkey != key:
                continue
            if direction == "backward":
                ok = rts < lts if strict else rts <= lts
            else:
                ok = rts > lts if strict else rts >= lts
            if not ok:
                continue
            if tolerance is not None and abs(lts - rts) > tolerance:
                continue
            # nearest ts; tie → greatest rid (the tiebreak column)
            cand = (-abs(lts - rts), rid)
            if best is None or cand > best:
                best = cand
        out[lid] = None if best is None else best[1]
    return out


@pytest.fixture(scope="module")
def frames(spark):
    left, right = _mk_tables()
    ldf = spark.createDataFrame(left, "key string, lts double, lid long")
    rdf = spark.createDataFrame(right, "key string, rts double, rid long")
    return left, right, ldf, rdf


@pytest.mark.parametrize("direction", ["backward", "forward"])
@pytest.mark.parametrize("strict", [False, True])
def test_asof_matches_brute_force(frames, direction, strict):
    left, right, ldf, rdf = frames
    got = asof_join(
        ldf, rdf, "key", "lts", "rts",
        payload_cols=["rid"], direction=direction, strict=strict, tiebreak="rid",
    )
    want = _brute_asof(left, right, direction=direction, strict=strict)
    rows = {r.lid: r.rid for r in got.collect()}
    assert rows == want


def test_asof_tolerance(frames):
    left, right, ldf, rdf = frames
    got = asof_join(
        ldf, rdf, "key", "lts", "rts",
        payload_cols=["rid"], tolerance_s=25.0, tiebreak="rid",
    )
    want = _brute_asof(left, right, tolerance=25.0)
    # tolerance nulls out-of-range matches AFTER the positional match
    # (pandas semantics): recompute want the same way
    pos = _brute_asof(left, right)
    by_id = {rid: rts for _, rts, rid in right}
    want = {
        lid: (rid if rid is not None and abs(
            next(l[1] for l in left if l[2] == lid) - by_id[rid]) <= 25.0 else None)
        for lid, rid in pos.items()
    }
    rows = {r.lid: r.rid for r in got.collect()}
    assert rows == want


def test_asof_matches_duckdb_asof_join(frames):
    """Backward-inclusive asof ≡ DuckDB's native ASOF JOIN, value for value."""
    left, right, ldf, rdf = frames
    # DuckDB ASOF is nondeterministic on duplicate (key, ts) — dedup the
    # right side to max rid per (key, ts) and run both engines on that.
    rdedup = rdf.groupBy("key", "rts").agg(F.max("rid").alias("rid"))
    got = sorted(
        (r.lid, r.rid)
        for r in asof_join(
            ldf, rdedup, "key", "lts", "rts", payload_cols=["rid"]
        ).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE l AS SELECT * FROM (VALUES %s) t(key, lts, lid)"
                % ", ".join(f"('{k}', {ts}, {i})" for k, ts, i in left))
    rd = {(k, ts): None for k, ts, _ in right}
    for k, ts, rid in right:
        rd[(k, ts)] = max(rd[(k, ts)] or 0, rid)
    con.execute("CREATE TABLE r AS SELECT * FROM (VALUES %s) t(key, rts, rid)"
                % ", ".join(f"('{k}', {ts}, {rid})" for (k, ts), rid in rd.items()))
    want = sorted(
        (int(a), None if b is None else int(b))
        for a, b in con.execute(
            "SELECT l.lid, r.rid FROM l ASOF LEFT JOIN r"
            " ON l.key = r.key AND l.lts >= r.rts"
        ).fetchall()
    )
    assert got == want


@pytest.mark.parametrize("direction", ["backward", "forward"])
@pytest.mark.parametrize("strict", [False, True])
@pytest.mark.parametrize("bucket_s", [7.0, 25.0, 10_000.0])
def test_asof_bucketed_equals_unbucketed(frames, direction, strict, bucket_s):
    """Skew-guard mode (partition by key+time-bucket with carry injection)
    returns exactly the plain single-partition-per-key result — including
    the degenerate one-bucket width and widths that leave many buckets
    with no right rows (carry must hop over empty buckets)."""
    left, right, ldf, rdf = frames
    kw = dict(
        payload_cols=["rid"], direction=direction, strict=strict, tiebreak="rid"
    )
    plain = {
        r.lid: r.rid for r in asof_join(ldf, rdf, "key", "lts", "rts", **kw).collect()
    }
    bucketed = {
        r.lid: r.rid
        for r in asof_join(
            ldf, rdf, "key", "lts", "rts", bucket_s=bucket_s, **kw
        ).collect()
    }
    assert bucketed == plain


def test_asof_bucketed_boundary_cases(spark):
    """Rows exactly on bucket edges: a right row AT a bucket start belongs to
    that bucket (never a carry), inclusive/strict matching at the edge, and
    a bucket with no right rows anywhere before it stays unmatched."""
    ldf = spark.createDataFrame(
        [("a", 10.0, 1), ("a", 20.0, 2), ("b", 35.0, 3), ("c", 5.0, 4)],
        "key string, lts double, lid long",
    )
    rdf = spark.createDataFrame(
        # a@10.0 sits exactly on the bucket-1 boundary; a@9.9 is bucket 0
        [("a", 10.0, 100), ("a", 9.9, 101), ("b", 19.9, 102)],
        "key string, rts double, rid long",
    )

    def run(**kw):
        return {
            r.lid: r.rid
            for r in asof_join(
                ldf, rdf, "key", "lts", "rts",
                payload_cols=["rid"], bucket_s=10.0, tiebreak="rid", **kw
            ).collect()
        }

    # inclusive backward: left a@10 takes right a@10 (same bucket, same ts);
    # left a@20 carries a@10 over the empty bucket; b@35 carries b@19.9
    # across two bucket hops; c has no rights at all
    assert run() == {1: 100, 2: 100, 3: 102, 4: None}
    # strict backward: a@10 must NOT see a@10 — falls back to the 9.9 carry
    assert run(strict=True) == {1: 101, 2: 100, 3: 102, 4: None}
    # forward: only a@10 has a right row at-or-after it
    assert run(direction="forward") == {1: 100, 2: None, 3: None, 4: None}
    assert run(direction="forward", strict=True) == {
        1: None, 2: None, 3: None, 4: None,
    }


def test_asof_bucketed_tolerance(frames):
    left, right, ldf, rdf = frames
    kw = dict(payload_cols=["rid"], tolerance_s=25.0, tiebreak="rid")
    plain = {
        r.lid: r.rid for r in asof_join(ldf, rdf, "key", "lts", "rts", **kw).collect()
    }
    bucketed = {
        r.lid: r.rid
        for r in asof_join(ldf, rdf, "key", "lts", "rts", bucket_s=13.0, **kw).collect()
    }
    assert bucketed == plain


def test_asof_bucketed_partitions_by_bucket(frames):
    """The skew-guard plan really exchanges on (key, bucket), not (key)."""
    _, _, ldf, rdf = frames
    plan = asof_join(
        ldf, rdf, "key", "lts", "rts", payload_cols=["rid"], bucket_s=10.0
    )._jdf.queryExecution().executedPlan().toString()
    assert "__b" in plan.split("Window")[-1] or "__b" in plan
    assert "CartesianProduct" not in plan and "EvalPython" not in plan


def test_asof_multi_key_and_renamed(spark):
    ldf = spark.createDataFrame(
        [("a", 1, 10.0, 1), ("a", 2, 10.0, 2), ("b", 1, 10.0, 3)],
        "g string, sub long, lts double, lid long",
    )
    rdf = spark.createDataFrame(
        [("a", 1, 5.0, 100), ("a", 2, 7.0, 200), ("b", 2, 1.0, 300)],
        "grp string, sub long, rts double, rid long",
    )
    got = {
        r.lid: r.rid
        for r in asof_join(
            ldf, rdf, [("g", "grp"), "sub"], "lts", "rts", payload_cols=["rid"]
        ).collect()
    }
    assert got == {1: 100, 2: 200, 3: None}


def test_asof_collision_raises(frames):
    _, _, ldf, rdf = frames
    with pytest.raises(ValueError, match="collide"):
        asof_join(ldf, rdf.withColumnRenamed("rid", "lid"), "key", "lts", "rts")


def test_asof_plan_single_exchange_no_python(frames):
    _, _, ldf, rdf = frames
    plan = asof_join(
        ldf, rdf, "key", "lts", "rts", payload_cols=["rid"]
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    assert "EvalPython" not in plan
    # one hash exchange on the key feeds the window sort; union sides may
    # each show the same exchange requirement but there is no join exchange
    assert plan.count("Exchange hashpartitioning") <= 2


def _brute_sessions(rows, gap):
    """rows: (key, ts, id) → {id: session_seq} with (ts, id) ordering."""
    out = {}
    by_key = {}
    for key, ts, i in sorted(rows, key=lambda r: (r[0], r[1], r[2])):
        prev = by_key.get(key)
        if prev is None or ts - prev[0] > gap:
            seq = 1 if prev is None else prev[1] + 1
        else:
            seq = prev[1]
        by_key[key] = (ts, seq)
        out[i] = seq
    return out


def test_sessionize_matches_brute_force(spark):
    rng = random.Random(11)
    rows = [
        (f"u{rng.randrange(8)}", float(rng.randrange(0, 300)), i) for i in range(400)
    ]
    df = spark.createDataFrame(rows, "key string, ts double, id long")
    got = {
        r.id: r.session_seq
        for r in sessionize(df, "key", "ts", 10.0, order_tiebreak="id").collect()
    }
    assert got == _brute_sessions(rows, 10.0)


@pytest.mark.parametrize("bucket_s", [5.0, 17.0, 10_000.0])
def test_sessionize_bucketed_equals_unbucketed(spark, bucket_s):
    """Skew-guard sessionization (bucket + boundary stitch) ≡ plain —
    including sessions that span several buckets and empty buckets between
    events of one session."""
    rng = random.Random(23)
    rows = [
        (f"u{rng.randrange(6)}", float(rng.randrange(0, 400)), i) for i in range(500)
    ]
    # a hot key with dense and sparse stretches
    rows += [("hot", float(t), 1000 + t) for t in range(0, 120)]
    rows += [("hot", 300.0 + 40.0 * j, 2000 + j) for j in range(5)]
    df = spark.createDataFrame(rows, "key string, ts double, id long")
    plain = {
        r.id: r.session_seq
        for r in sessionize(df, "key", "ts", 12.0, order_tiebreak="id").collect()
    }
    bucketed = {
        r.id: r.session_seq
        for r in sessionize(
            df, "key", "ts", 12.0, order_tiebreak="id", bucket_s=bucket_s
        ).collect()
    }
    assert bucketed == plain


def test_sessionize_gap_boundary_inclusive(spark):
    # exactly gap_s after the predecessor CONTINUES the session (> not >=)
    df = spark.createDataFrame(
        [("u", 0.0, 0), ("u", 10.0, 1), ("u", 20.1, 2)],
        "key string, ts double, id long",
    )
    got = {r.id: r.session_seq for r in sessionize(df, "key", "ts", 10.0).collect()}
    assert got == {0: 1, 1: 1, 2: 2}


def test_session_stats(spark):
    df = spark.createDataFrame(
        [("u", 0.0, 1.0), ("u", 5.0, 2.0), ("u", 100.0, 4.0)],
        "key string, ts double, value double",
    )
    rows = {
        (r.key, r.session_seq): (r.n_events, r.duration_s, r.sum_value)
        for r in session_stats(df, "key", "ts", 30.0, value_col="value").collect()
    }
    assert rows == {("u", 1): (2, 5.0, 3.0), ("u", 2): (1, 0.0, 4.0)}


def test_session_stats_single_shuffle(spark):
    df = spark.createDataFrame(
        [("u", 0.0, 1.0)], "key string, ts double, value double"
    )
    plan = (
        session_stats(df, "key", "ts", 30.0, value_col="value")
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the groupBy reuses the window's hashpartitioning(key) exchange
    assert plan.count("Exchange hashpartitioning") == 1


@pytest.fixture()
def ny_timezone(spark):
    """Temporarily run with a non-UTC session timezone spanning US DST."""
    old = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    yield spark
    spark.conf.set("spark.sql.session.timeZone", old)


def test_sessionize_ntz_across_dst_non_utc_session(ny_timezone):
    """NTZ gap arithmetic must be timezone-independent (ADVICE round 3).

    2026-03-08 02:00 America/New_York does not exist (spring-forward):
    routing NTZ through a session-tz TIMESTAMP cast made the 01:30→03:30
    wall-clock gap read as 3600s instead of 7200s, so a 5400s session gap
    wrongly kept the two events in one session. The field-arithmetic
    conversion sees the true wall-clock difference in any session timezone.
    """
    import datetime as dt

    from pyspark.sql.types import (
        LongType,
        StructField,
        StructType,
        StringType,
        TimestampNTZType,
    )

    spark = ny_timezone
    schema = StructType(
        [
            StructField("key", StringType()),
            StructField("ts", TimestampNTZType()),
            StructField("id", LongType()),
        ]
    )
    df = spark.createDataFrame(
        [
            ("u", dt.datetime(2026, 3, 8, 1, 30), 0),
            ("u", dt.datetime(2026, 3, 8, 3, 30), 1),
        ],
        schema,
    )
    got = {r.id: r.session_seq for r in sessionize(df, "key", "ts", 5400.0).collect()}
    assert got == {0: 1, 1: 2}
    # bucketed variant takes the same corrected arithmetic
    got_b = {
        r.id: r.session_seq
        for r in sessionize(df, "key", "ts", 5400.0, bucket_s=3600.0).collect()
    }
    assert got_b == got


def test_asof_tolerance_ntz_across_dst_non_utc_session(ny_timezone):
    """Tolerance on NTZ timestamps must use wall-clock seconds across DST."""
    import datetime as dt

    from pyspark.sql.types import (
        LongType,
        StructField,
        StructType,
        StringType,
        TimestampNTZType,
    )

    spark = ny_timezone
    lschema = StructType(
        [
            StructField("key", StringType()),
            StructField("lts", TimestampNTZType()),
            StructField("lid", LongType()),
        ]
    )
    rschema = StructType(
        [
            StructField("key", StringType()),
            StructField("rts", TimestampNTZType()),
            StructField("rid", LongType()),
        ]
    )
    ldf = spark.createDataFrame(
        [("k", dt.datetime(2026, 3, 8, 3, 30), 0)], lschema
    )
    rdf = spark.createDataFrame(
        [("k", dt.datetime(2026, 3, 8, 1, 30), 100)], rschema
    )
    # true wall-clock distance is 7200s; the old session-tz cast read 3600s
    # and wrongly kept the match under a 5400s tolerance
    out = asof_join(
        ldf, rdf, "key", "lts", "rts", tolerance_s=5400.0
    ).collect()
    assert out[0].rid is None
    out = asof_join(
        ldf, rdf, "key", "lts", "rts", tolerance_s=7200.0
    ).collect()
    assert out[0].rid == 100


def test_asof_date_typed_right_with_tolerance_and_bucket(spark):
    """DateType ts columns work with tolerance_s/bucket_s (ADVICE round 3).

    A bare double cast on DATE is rejected by Spark, so tolerance/bucket
    arithmetic on a date-typed side used to fail at analysis time.
    """
    import datetime as dt

    ldf = spark.createDataFrame(
        [("k", dt.datetime(2026, 1, 10, 12, 0), 0)],
        "key string, lts timestamp_ntz, lid long",
    )
    rdf = spark.createDataFrame(
        [("k", dt.date(2026, 1, 8), 8), ("k", dt.date(2026, 1, 1), 1)],
        "key string, rts date, rid long",
    )
    got = asof_join(
        ldf, rdf, "key", "lts", "rts", tolerance_s=5 * 86400.0
    ).collect()
    assert got[0].rid == 8
    # 2.5-day tolerance excludes the 2.5-day-distant Jan 8 00:00 match
    got = asof_join(
        ldf, rdf, "key", "lts", "rts", tolerance_s=2.0 * 86400.0
    ).collect()
    assert got[0].rid is None
    # bucketed plan agrees with the plain one on date-typed right side
    plain = asof_join(ldf, rdf, "key", "lts", "rts").collect()
    bucketed = asof_join(
        ldf, rdf, "key", "lts", "rts", bucket_s=86400.0
    ).collect()
    assert plain == bucketed
