"""Temporal operators: merge as-of join and gap-based sessionization.

Neither exists as a Spark built-in, and the naive formulations melt down at
scale: an as-of join written as a range join (``l.key = r.key AND r.ts <=
l.ts`` + max-per-row) explodes to O(|matches|) intermediate rows before the
per-row argmax, and a sessionizer written with a self-join is quadratic per
key. Both operators here are **single-shuffle window compositions** — the
only data movement is one hash exchange on the equi-key, then a sort within
each key partition, all JVM-side whole-stage-codegen expressions (no UDF of
any kind). That is the plan shape that survives 100 TB: cost is
O(rows log rows-per-partition) with no multiplicative blowup, AQE handles
residual key skew, and the window never materializes more than a sort run.

``asof_join`` uses the tagged-union trick (the classic "merge as-of" from
kdb+/pandas ``merge_asof``, re-expressed relationally): stack both tables,
sort each key group by (ts, side) so right rows precede left rows at equal
timestamps, and carry the most recent right payload forward with
``last(payload, ignorenulls=True)`` over an unbounded-preceding row frame.
DuckDB's native ``ASOF JOIN`` replays the backward-inclusive case, which is
how the driver oracle checks it value-for-value.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

OnSpec = Union[str, Sequence[Union[str, Tuple[str, str]]]]


def _as_seconds(col: Column, dt) -> Column:
    """Numeric seconds for gap/tolerance arithmetic, for any orderable type.

    TIMESTAMP_NTZ (what parquet timestamps load as) cannot cast to double
    directly, and routing it through TIMESTAMP would interpret the wall
    clock in the session timezone — differences of two such casts are then
    wrong by the offset change across a DST transition (an hour-long gap or
    overlap) in any non-UTC session. Instead the wall clock is mapped to
    seconds by pure field arithmetic (days-since-epoch × 86400 + time of
    day, fractional seconds preserved by ``date_part('SECOND')``) — a
    strictly monotone, timezone-independent mapping. DATE gets the same
    day arithmetic (a bare double cast is rejected by Spark). TIMESTAMP
    (LTZ) keeps the double cast: that is epoch seconds of the instant,
    already timezone-independent.
    """
    from pyspark.sql.types import DateType, TimestampNTZType

    if isinstance(dt, DateType):
        return F.unix_date(col).cast("double") * F.lit(86400.0)
    if isinstance(dt, TimestampNTZType):
        return (
            F.unix_date(col.cast("date")).cast("double") * F.lit(86400.0)
            + F.date_part(F.lit("HOUR"), col).cast("double") * F.lit(3600.0)
            + F.date_part(F.lit("MINUTE"), col).cast("double") * F.lit(60.0)
            + F.date_part(F.lit("SECOND"), col).cast("double")
        )
    return col.cast("double")


def _normalize_on(on: OnSpec) -> "list[tuple[str, str]]":
    if isinstance(on, str):
        return [(on, on)]
    pairs = []
    for item in on:
        pairs.append((item, item) if isinstance(item, str) else (item[0], item[1]))
    return pairs


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: OnSpec,
    left_ts: str,
    right_ts: str,
    payload_cols: Optional[Sequence[str]] = None,
    direction: str = "backward",
    strict: bool = False,
    tolerance_s: Optional[float] = None,
    tiebreak: Optional[str] = None,
    matched_ts_col: Optional[str] = None,
    bucket_s: Optional[float] = None,
) -> DataFrame:
    """Left as-of join: attach to each left row the nearest right row.

    For every left row, the matched right row is the one sharing the
    equi-key ``on`` with the greatest ``right_ts`` ≤ ``left_ts``
    (``direction="backward"``, inclusive — DuckDB/pandas default) or the
    smallest ``right_ts`` ≥ ``left_ts`` (``"forward"``). ``strict=True``
    makes the comparison exclusive. Unmatched left rows keep NULL payload
    (left-outer semantics).

    ``on`` — a column name, or a list of names / ``(left_col, right_col)``
    pairs for differently-named keys.
    ``payload_cols`` — right columns to attach (default: all non-key
    columns); a name colliding with a left column raises.
    ``tolerance_s`` — max |left_ts − right_ts| in seconds; farther matches
    become NULL (evaluated after the positional match, like pandas).
    ``tiebreak`` — right column; among right rows tied on (key, ts) the row
    with the greatest tiebreak value wins, making the join deterministic
    when (key, ts) is not unique. Without it, ties are partition-order
    dependent (same caveat as DuckDB ASOF on duplicate timestamps).
    ``matched_ts_col`` — optionally expose the matched right timestamp.
    ``bucket_s`` — skew guard: partition by (key, ⌊ts/bucket_s⌋) instead of
    (key), bounding the per-partition sort for hot keys (a key with 10⁹
    events would otherwise sort in one task). Semantics are preserved by
    carry injection: per (key, bucket) the boundary-relevant right row —
    latest for backward, earliest for forward — is reduced with
    ``max_by``/``min_by`` (a tiny table: one row per non-empty bucket,
    independent of per-bucket row count), a running scan over that table
    (the same tagged-union window at bucket granularity) computes each left
    bucket's carry from strictly-earlier (resp. later) buckets, and the
    carry is injected into the bucket's window as an ordinary right row.
    Identical results to the unbucketed plan (asserted in tests).

    Plan: union the tagged sides, ONE hash exchange on the key (plus two
    bucket-granularity exchanges in skew-guard mode), in-partition sort by
    (ts, side, tiebreak), ``last(..., ignorenulls=True)`` over an
    unbounded-preceding ROW frame. No range-join explosion, no per-row
    Python, no broadcast requirement on either side.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    pairs = _normalize_on(on)
    rkeys = [r for _, r in pairs]
    if payload_cols is None:
        payload_cols = [c for c in right.columns if c not in rkeys and c != right_ts]
    collisions = set(payload_cols) & set(left.columns)
    if collisions:
        raise ValueError(f"payload columns collide with left columns: {collisions}")

    keys = [f"__k{i}" for i in range(len(pairs))]
    # right rows sort BEFORE left rows at equal ts (side 0 < 1) so equal
    # timestamps match; strict flips the order so they don't.
    r_side, l_side = (0, 1) if not strict else (1, 0)

    payload = F.struct(
        *[F.col(c) for c in payload_cols], F.col(right_ts).alias("__rts")
    )
    rtagged = right.select(
        *[F.col(rk).alias(k) for k, (_, rk) in zip(keys, pairs)],
        F.col(right_ts).alias("__ts"),
        F.lit(r_side).alias("__side"),
        (F.col(tiebreak) if tiebreak else F.lit(0)).alias("__tb"),
        payload.alias("__p"),
    )
    payload_type = rtagged.schema["__p"].dataType
    ltagged = left.select(
        *[F.col(lk).alias(k) for k, (lk, _) in zip(keys, pairs)],
        F.col(left_ts).alias("__ts"),
        F.lit(l_side).alias("__side"),
        F.lit(None).cast(rtagged.schema["__tb"].dataType).alias("__tb"),
        F.lit(None).cast(payload_type).alias("__p"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
    )
    rtagged = rtagged.withColumn(
        "__l", F.lit(None).cast(ltagged.schema["__l"].dataType)
    )

    if direction == "backward":
        order = [F.col("__ts").asc(), F.col("__side").asc(), F.col("__tb").asc()]
    else:
        # descending ts: the "most recently seen" right row in sort order is
        # the one with the SMALLEST ts ≥ the current left ts
        order = [F.col("__ts").desc(), F.col("__side").asc(), F.col("__tb").asc()]
    if bucket_s is None:
        part_cols = keys
        stacked_rows = ltagged.unionByName(rtagged.select(*ltagged.columns))
    else:
        backward = direction == "backward"
        bwidth = F.lit(float(bucket_s))
        lt = ltagged.withColumn(
            "__b",
            F.floor(
                _as_seconds(F.col("__ts"), left.schema[left_ts].dataType) / bwidth
            ).cast("long"),
        )
        rt = rtagged.select(*ltagged.columns).withColumn(
            "__b",
            F.floor(
                _as_seconds(F.col("__ts"), right.schema[right_ts].dataType) / bwidth
            ).cast("long"),
        )
        # boundary-relevant right row per non-empty (key, bucket): the one a
        # later (resp. earlier) bucket would match — nearest ts toward the
        # boundary, MAX tiebreak among ties (the unbucketed tie rule)
        worder = (
            [F.col("__ts").desc(), F.col("__tb").desc()]
            if backward
            else [F.col("__ts").asc(), F.col("__tb").desc()]
        )
        wpb = Window.partitionBy(*keys, "__b").orderBy(*worder)
        per_bucket = (
            rt.withColumn("__rn", F.row_number().over(wpb))
            .where(F.col("__rn") == 1)
            .select(*keys, "__b", F.struct("__ts", "__tb", "__p").alias("__w"))
        )
        # running carry at bucket granularity: a bucket-b winner becomes
        # visible from bucket b±1 on (__vb shift), so each left bucket's
        # last() sees exactly the strictly-earlier (resp. later) buckets
        wtype = per_bucket.schema["__w"].dataType
        vis = F.col("__b") + (1 if backward else -1)
        stacked = per_bucket.select(
            *keys, vis.alias("__vb"), F.lit(0).alias("__cs"), F.col("__w")
        ).unionByName(
            lt.select(*keys, "__b")
            .distinct()
            .select(
                *keys,
                F.col("__b").alias("__vb"),
                F.lit(1).alias("__cs"),
                F.lit(None).cast(wtype).alias("__w"),
            )
        )
        vorder = [
            F.col("__vb").asc() if backward else F.col("__vb").desc(),
            F.col("__cs").asc(),
        ]
        wb = (
            Window.partitionBy(*keys)
            .orderBy(*vorder)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carries = (
            stacked.withColumn("__c", F.last("__w", ignorenulls=True).over(wb))
            .where((F.col("__cs") == 1) & F.col("__c").isNotNull())
            .select(
                *keys,
                F.col("__c.__ts").alias("__ts"),
                F.lit(r_side).alias("__side"),
                F.col("__c.__tb").alias("__tb"),
                F.col("__c.__p").alias("__p"),
                F.lit(None).cast(ltagged.schema["__l"].dataType).alias("__l"),
                F.col("__vb").alias("__b"),
            )
        )
        part_cols = keys + ["__b"]
        stacked_rows = lt.unionByName(rt).unionByName(carries.select(*lt.columns))
    w = (
        Window.partitionBy(*part_cols)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = stacked_rows.withColumn(
        "__m", F.last("__p", ignorenulls=True).over(w)
    )
    out = matched.where(F.col("__side") == l_side)
    if tolerance_s is not None:
        lsec = _as_seconds(F.col("__ts"), matched.schema["__ts"].dataType)
        rsec = _as_seconds(
            F.col("__m.__rts"), right.schema[right_ts].dataType
        )
        within = F.abs(lsec - rsec) <= F.lit(float(tolerance_s))
        out = out.withColumn(
            "__m", F.when(within, F.col("__m"))  # NULL __m stays NULL
        )
    cols = [F.col(f"__l.{c}").alias(c) for c in left.columns]
    cols += [F.col(f"__m.{c}").alias(c) for c in payload_cols]
    if matched_ts_col is not None:
        cols.append(F.col("__m.__rts").alias(matched_ts_col))
    return out.select(*cols)


def sessionize(
    df: DataFrame,
    key: str,
    ts: str,
    gap_s: float,
    order_tiebreak: Optional[str] = None,
    session_col: str = "session_seq",
    bucket_s: Optional[float] = None,
) -> DataFrame:
    """Assign gap-based session numbers within each key.

    A new session starts when the gap to the previous event of the same key
    exceeds ``gap_s`` seconds (strictly greater — an event exactly ``gap_s``
    after its predecessor continues the session). ``session_col`` is a
    1-based BIGINT sequence per key; ``(key, session_col)`` identifies a
    session. ``order_tiebreak`` makes the event order (hence the boundary
    placement) deterministic when (key, ts) is not unique.

    Single shuffle on ``key``; ``lag`` + running ``sum`` over an explicit
    ROW frame (a RANGE frame would hand tied timestamps the same running
    sum and mis-place boundaries). Pure column expressions, so the whole
    operator stays inside whole-stage codegen.

    ``bucket_s`` — skew guard, same idea as :func:`asof_join`'s: partition
    by (key, ⌊ts/bucket_s⌋) so a hot key's timeline sorts in bounded
    chunks, then stitch sessions across bucket boundaries in a second pass
    at BUCKET granularity (one row per non-empty bucket): a bucket whose
    first event is within ``gap_s`` of the previous non-empty bucket's last
    event continues that bucket's final session; an exclusive running sum
    of (sessions − merged) renumbers every bucket's local sequence into the
    global one. Identical output to the unbucketed plan (asserted in
    tests).
    """
    ts_dt = df.schema[ts].dataType
    gap = F.lit(float(gap_s))

    if bucket_s is None:
        order = [F.col(ts).asc()]
        if order_tiebreak:
            order.append(F.col(order_tiebreak).asc())
        w = Window.partitionBy(key).orderBy(*order)
        prev = F.lag(F.col(ts)).over(w)
        is_new = F.when(
            prev.isNull()
            | ((_as_seconds(F.col(ts), ts_dt) - _as_seconds(prev, ts_dt)) > gap),
            F.lit(1),
        ).otherwise(F.lit(0))
        seq = F.sum(is_new).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return df.withColumn(session_col, seq.cast("long"))

    sec = _as_seconds(F.col(ts), ts_dt)
    b = df.withColumn("__b", F.floor(sec / F.lit(float(bucket_s))).cast("long"))
    order = [F.col(ts).asc()]
    if order_tiebreak:
        order.append(F.col(order_tiebreak).asc())
    wloc = Window.partitionBy(key, "__b").orderBy(*order)
    prev = F.lag(F.col(ts)).over(wloc)
    is_new = F.when(
        prev.isNull()
        | ((_as_seconds(F.col(ts), ts_dt) - _as_seconds(prev, ts_dt)) > gap),
        F.lit(1),
    ).otherwise(F.lit(0))
    local = b.withColumn(
        "__ls",
        F.sum(is_new)
        .over(wloc.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long"),
    )
    # one row per non-empty (key, bucket): first/last event second + local
    # session count — the only state the cross-boundary pass needs
    summary = local.groupBy(key, "__b").agg(
        F.min(sec).alias("__first"),
        F.max(sec).alias("__last"),
        F.max("__ls").alias("__n"),
    )
    wb = Window.partitionBy(key).orderBy("__b")
    prev_last = F.lag("__last").over(wb)
    merged = F.when(
        prev_last.isNotNull() & ((F.col("__first") - prev_last) <= gap), F.lit(1)
    ).otherwise(F.lit(0))
    offsets = summary.withColumn("__m", merged).withColumn(
        "__before",
        F.coalesce(
            F.sum(F.col("__n") - F.col("__m")).over(
                Window.partitionBy(key)
                .orderBy("__b")
                .rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    )
    out = local.join(
        offsets.select(key, "__b", "__m", "__before"), [key, "__b"]
    ).withColumn(
        session_col,
        (F.col("__before") + F.col("__ls") - F.col("__m")).cast("long"),
    )
    return out.drop("__b", "__ls", "__m", "__before")


def session_stats(
    df: DataFrame,
    key: str,
    ts: str,
    gap_s: float,
    value_col: Optional[str] = None,
    order_tiebreak: Optional[str] = None,
    bucket_s: Optional[float] = None,
) -> DataFrame:
    """Per-session rollup: bounds, event count, duration, optional value sum.

    The groupBy reuses the sessionizer's hash partitioning on ``key``
    (Catalyst sees the child exchange already satisfies the grouping's
    distribution requirement on the prefix), so the rollup adds no second
    full shuffle of the event table. ``bucket_s`` passes through to the
    sessionizer's skew guard.
    """
    s = sessionize(
        df, key, ts, gap_s, order_tiebreak=order_tiebreak, bucket_s=bucket_s
    )
    sec = _as_seconds(F.col(ts), df.schema[ts].dataType)
    aggs = [
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts).alias("session_start"),
        F.max(ts).alias("session_end"),
        (F.max(sec) - F.min(sec)).alias("duration_s"),
    ]
    if value_col is not None:
        aggs.append(F.round(F.sum(value_col), 4).alias("sum_value"))
    return s.groupBy(key, "session_seq").agg(*aggs)
