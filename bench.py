#!/usr/bin/env python
"""Benchmark harness.

Default mode (what the driver runs per round): times the headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE compact JSON line::

    {"metric": "headline_total_sec", "value": N, "unit": "sec",
     "queries": {...per-query sec...}, "sf": 0.1, "detail": "BENCH/..."}

The bulky evidence (per-trial arrays, isolated ER re-runs, normalization
maps) goes to ``BENCH/r05_detail.json`` — the driver's tail-capture window
is 2000 chars and round 4's all-in-one line overflowed it (parsed: null).

``--scaling`` mode: N-vs-4N-executor evidence → BENCH/BASELINE.md. Runs the
identical fused scoring job on byte-identical prepared input at 1-vs-4
executors (2 cores each — the bandwidth-headroom regime, two input sizes for
marginal-rate analysis) and at 2-vs-8 executors (4 cores each — the
saturated regime), real executor JVMs via ``local-cluster``, taskset-pinned,
interleaved best-of trials, plus pinned STREAM/CPU hardware-ceiling probes.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
os.environ.setdefault("PYTHONPATH", REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# Optional master override, e.g. local-cluster[8,4,4096] for the multi-executor
# scaling evidence (separate executor JVMs — real heaps, real exchanges).
MASTER = os.environ.get("SPARK_GRAFT_MASTER", "")
ER_ENTITIES = int(os.environ.get("SPARK_GRAFT_ER_ENTITIES", "0"))  # 0 → per-sf default
ONLY_ER = os.environ.get("SPARK_GRAFT_BENCH_ONLY_ER", "") == "1"  # scaling mode
SKIP_FULL = os.environ.get("SPARK_GRAFT_SKIP_FULL", "") == "1"  # scaling mode
# best-of-N; default raised to 3 in round 4 — interleaved A/B runs this round
# measured the SAME query swinging 2.3s → 12.9s between adjacent runs on
# UNCHANGED code, so 2 samples still confuse a stall with a regression
QUERY_TRIALS = int(os.environ.get("SPARK_GRAFT_QUERY_TRIALS", "3"))
# The ER checkpoint stages materialize multi-GB localCheckpoints, which is
# exactly the surface the host's episodic bandwidth stalls land on (round 3:
# one stage reported 17.7s whose isolated cost was 5.6s, with a 4-9x spread
# within minutes on an idle box). Best-of-2 under-samples a landscape that
# spiky, so the ER stages default to more trials than the sub-second
# relational queries.
ER_TRIALS = int(os.environ.get("SPARK_GRAFT_ER_TRIALS", "3"))
# Stages whose wall time is dominated by memory-bandwidth traffic (Arrow
# batches + eager localCheckpoint/cache materialization, not codegen'd
# compute). Their bandwidth-side normalization is reported alongside the CPU
# one — for a mixed stage the reference-host-equivalent time lies between.
BW_BOUND_QUERIES = ("er_corpus_materialize", "er_parse_block", "er_sim_dims")

# the round-1 timed set: BENCH_r01 carried exactly these keys, so a sum over
# them stays comparable across rounds even as new queries join the headline
# list (round 3 added events_order_asof/user_sessions and its total jumped
# for reasons that had nothing to do with the code)
R1_COMPARABLE_SET = [
    "pricing_summary", "top_customers", "regional_revenue", "events_user_top",
    "events_hourly", "doc_token_stats", "doc_quality", "exact_dup_prefix",
    "ngram_jaccard", "minhash_dups", "simhash_dups", "embedding_topk",
    "embedding_dup_lsh", "er_corpus_materialize", "er_parse_block",
    "er_score", "er_full_pipeline",
]

# headline query set timed per round (must all exist in __spark_entry__.queries();
# asserted by tests/test_driver_contract.py so a rename can't break the driver run)
HEADLINE_QUERIES = [
    "pricing_summary",
    "top_customers",
    "regional_revenue",
    "events_user_top",
    "events_hourly",
    "events_order_asof",
    "user_sessions",
    "doc_token_stats",
    "doc_quality",
    "exact_dup_prefix",
    "ngram_jaccard",
    "minhash_dups",
    "simhash_dups",
    "embedding_topk",
    "embedding_dup_lsh",
]


def _sf_number(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def run_bench() -> dict:
    from pyspark.sql import functions as F

    import __spark_entry__ as entry_mod
    from addressit_spark.blocking import address_table
    from addressit_spark.parse_stage import parse_spans
    from addressit_spark.pipeline import run_pipeline
    from addressit_spark.scoring import score_pairs_fused, surface_sim_map
    from addressit_spark.session import get_spark
    from addressit_spark.sources.corpus import documents_view, synth_corpus

    spark = get_spark(
        master=MASTER or f"local[{CPUS}]",
        app_name="addressit_spark_bench",
        shuffle_partitions=max(4 * CPUS, 32),
        driver_memory="16g" if MASTER else "32g",
    )
    sf = _sf_number(SF_DIR)
    timings: dict[str, float] = {}
    trials_log: dict[str, list] = {}
    extras: dict[str, object] = {}

    def timed(name, fn):
        t0 = time.monotonic()
        out = fn()
        dt = round(time.monotonic() - t0, 3)
        timings[name] = dt
        trials_log[name] = [dt]
        return out

    def timed_best(name, fn, trials=QUERY_TRIALS):
        """Best-of-N wall time for a repeatable action; full array recorded.

        This host stalls episodically (multi-second freezes that land on
        whichever stage is running — observed inflating one stage 10-50×
        while the rest of the same run is at full speed), so a single
        sample per query confuses one unlucky stall with a regression.
        The headline number is min-of-N (discards stalls), and the FULL
        per-trial array is emitted as queries_trials[name] so a reader can
        see stall spread, first-run (cold) cost, and whether even the min
        was stall-contaminated — trials[0] is always the coldest run.
        """
        out, best = None, None
        ts = trials_log.setdefault(name, [])
        for _ in range(max(trials, 1)):
            t0 = time.monotonic()
            out = fn()
            dt = time.monotonic() - t0
            ts.append(round(dt, 3))
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
        return out

    # --- headline relational / text / dedup / similarity queries ---
    # retired registry names (consolidated out of the driver's 50-entry
    # correctness window) stay timeable so cross-round comparable sets and
    # headline lists keep their exact original computations
    qmap = {**entry_mod.BENCH_ONLY_QUERIES, **entry_mod.queries()}
    if not ONLY_ER:
        # untimed JVM/session warmup so the first timed query doesn't absorb
        # ~4s of codegen/JIT/session startup and round-over-round deltas
        # stay readable
        qmap["pricing_summary"](spark, SF_DIR).count()
        qmap["top_customers"](spark, SF_DIR).count()
    # count() would let Catalyst prune the asof window / session rollup out
    # of the plan (row count is projection-independent) — checksum a result
    # column instead so the operator genuinely executes
    checksum_col = {"events_order_asof": "last_totalprice", "user_sessions": "duration_s"}
    for name in [] if ONLY_ER else HEADLINE_QUERIES:
        if name in checksum_col:
            timed_best(
                name,
                lambda n=name: qmap[n](spark, SF_DIR)
                .agg(F.count(F.lit(1)), F.sum(checksum_col[n]))
                .collect(),
            )
        else:
            timed_best(name, lambda n=name: qmap[n](spark, SF_DIR).count())

    # --- ER pipeline: parse → block → score → cluster on the synthetic
    #     interleaved corpus sized to the scale factor ---
    n_entities = ER_ENTITIES or entry_mod._entities_for(SF_DIR)
    corpus = documents_view(synth_corpus(spark, n_entities, seed=42))
    corpus = timed("er_corpus_materialize", lambda: corpus.cache()) or corpus
    corpus.count()

    # best-of-N like the headline queries (stall defense): each trial
    # materializes its own localCheckpoint snapshot; the previous trial's
    # (identical) snapshot is unpersisted as soon as the next lands.
    # ER_TRIALS (default 3) — see the constant's comment: these stages are
    # where the host's bandwidth stalls land, and 2 samples under-sample it.
    def timed_best_ckpt(name, build, trials=ER_TRIALS):
        prev = {"df": None}

        def trial():
            df = build().localCheckpoint(eager=True)
            df.count()
            if prev["df"] is not None:
                prev["df"].unpersist()
            prev["df"] = df
            return df

        return timed_best(name, trial, trials=trials)

    addresses = timed_best_ckpt(
        "er_parse_block", lambda: address_table(parse_spans(corpus))
    )
    n_addr = addresses.count()

    # The surface-similarity dim is the pipeline's materialized dim stage
    # (same role as in run_pipeline): timed separately, then reused by every
    # scoring trial — at 10^12 pairs its build cost is ~0.001% of the
    # scoring pass, so folding it into each trial at bench scale would
    # misattribute a fixed dim-build to the per-pair metric by ~1000×.
    # same block-size cap as the production pipeline's sim stage
    sims = timed_best_ckpt(
        "er_sim_dims", lambda: surface_sim_map(addresses, max_block_size=100_000, max_block_surfaces=256)
    )

    # Scoring throughput (the north metric: candidate-pairs-scored/sec),
    # measured on the PRODUCTION plan: block self-join fused directly into
    # the surface-factored scorer with interned int surface ids in the
    # shuffle — candidate pairs are never materialized (pinning 10^12-scale
    # pair tables is exactly what the design avoids). The measured action is
    # agg(sum(score), count) so every score is genuinely evaluated — a bare
    # count() would let Catalyst prune the scoring arithmetic out of the
    # plan. One warmup pass on a subset JIT-compiles the codegen'd join
    # before measurement; best of N trials defends against shared-host noise.
    warm_scored, _ = score_pairs_fused(
        addresses.limit(max(n_addr // 10, 1000)), sims=sims
    )
    warm_scored.agg(F.sum("score")).collect()
    score_trials = int(os.environ.get("SPARK_GRAFT_SCORE_TRIALS", str(ER_TRIALS)))
    best_t, scored_n = None, 0
    trials_log["er_score"] = []
    for _ in range(score_trials):
        scored_df, _ = score_pairs_fused(addresses, sims=sims)
        t0 = time.monotonic()
        row = scored_df.agg(
            F.sum("score").alias("s"), F.count(F.lit(1)).alias("n")
        ).collect()[0]
        scored_n = row["n"]
        t_trial = time.monotonic() - t0
        trials_log["er_score"].append(round(t_trial, 3))
        best_t = t_trial if best_t is None else min(best_t, t_trial)
    timings["er_score"] = round(best_t, 3)
    extras["er_address_spans"] = n_addr
    extras["er_pairs_scored"] = scored_n
    extras["er_score_sum"] = round(row["s"], 2)
    extras["er_pairs_per_sec"] = round(scored_n / best_t, 1) if best_t > 0 else None

    if not SKIP_FULL:
        # best-of-N like every other stage; each trial runs the whole
        # pipeline and the driving action is the cluster count. Per-trial
        # STAGE attribution (parse/sim/score+edges/cluster wall seconds,
        # read from StageStore lineage — eager localCheckpoints make each
        # stage's wall time real) lands in er_full_pipeline_stages, so a
        # regression in the flagship number is diagnosable to a stage.
        n_clusters = {}
        stage_trials: list = []

        def _full():
            res = run_pipeline(spark, corpus)
            n_clusters["n"] = res.clusters.select("component").distinct().count()
            stage_trials.append(
                {
                    s: m["wall_sec"]
                    for s, m in res.lineage.items()
                    if "wall_sec" in m
                }
            )

        timed_best("er_full_pipeline", _full, trials=ER_TRIALS)
        extras["er_clusters"] = n_clusters["n"]
        full_trials = trials_log["er_full_pipeline"]
        best_i = full_trials.index(min(full_trials))
        extras["er_full_pipeline_stages"] = stage_trials[best_i]
        extras["er_full_pipeline_stages_trials"] = stage_trials
    extras["er_entities"] = n_entities

    corpus.unpersist()

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        # full per-trial arrays (trials[0] = coldest run): the stall spread
        # is visible instead of silently discarded by the min
        "queries_trials": trials_log,
        # fixed round-1 query set → the ONLY total comparable across rounds
        "comparable_total_sec": round(
            sum(timings[q] for q in R1_COMPARABLE_SET if q in timings), 3
        ),
        "comparable_set": [q for q in R1_COMPARABLE_SET if q in timings],
        "sf": sf,
        "cpus": CPUS,
        **extras,
    }
    spark.stop()
    out["calibration"] = _calibration()
    factor = out["calibration"]["host_cpu_factor"]
    bw_factor = out["calibration"]["host_bw_factor"]
    out["queries_normalized"] = {
        q: round(t * factor, 3) for q, t in timings.items()
    }
    # bandwidth-side normalization for the checkpoint-materialization stages
    # (the r3 gap: a 3× bandwidth-stall inflation that the CPU factor 0.893
    # could not explain at bw factor 0.27). For these stages the
    # reference-host-equivalent time lies between the cpu- and bw-normalized
    # values; the per-trial arrays above are the primary stall evidence.
    out["queries_normalized_bw"] = {
        q: round(timings[q] * bw_factor, 3)
        for q in BW_BOUND_QUERIES
        if q in timings
    }
    out["bw_bound_queries"] = [q for q in BW_BOUND_QUERIES if q in timings]
    out["normalized_total_sec"] = round(total * factor, 3)
    if not ONLY_ER:
        out["er_isolated"] = _er_isolated_probe()
    return out


def _er_isolated_probe() -> dict | None:
    """Re-measure the ER stages in a FRESH session (subprocess).

    In default mode the ER stages run after the headline queries in the same
    JVM; accumulated state (old-gen occupancy, shuffle files) can read them
    ~2× above their isolated cost (round 4: er_score 5.06s in-session vs
    2.65s isolated, minutes apart). Attaching the isolated numbers makes the
    bias self-quantifying per round. Timeout-guarded and best-effort: a
    failure attaches None, never breaks the primary JSON line.
    """
    env = dict(
        os.environ,
        SPARK_GRAFT_BENCH_ONLY_ER="1",
        SPARK_GRAFT_SKIP_FULL="1",
        PYTHONPATH=REPO,
    )
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            capture_output=True, text=True, env=env,
            timeout=int(os.environ.get("SPARK_GRAFT_ER_ISOLATED_TIMEOUT", "420")),
        )
        iso = json.loads(proc.stdout.strip().splitlines()[-1])
        return {
            "queries": iso["queries"],
            "queries_trials": iso["queries_trials"],
            "er_pairs_per_sec": iso.get("er_pairs_per_sec"),
        }
    except Exception:
        return None


# Reference host speeds: median-of-3 pinned probes recorded in round 2
# (BENCH/BASELINE.md hardware-ceilings table). Dividing a current probe by
# these yields the host-speed factor; multiplying measured times by the CPU
# factor gives "reference-host-equivalent" times, so per-round BENCH files
# are comparable across this host's 2-10x noisy-neighbor swings.
REF_TRIAD8_GBPS = 69.8
REF_CPU8_ITERS = 955_515


def run_inc_cc_bench() -> dict:
    """--inc-cc: quantify the streaming clustering win at bench scale.

    Times a FULL connected-components recompute over all match edges vs an
    incremental fold (``incremental_components``: touched-cluster
    contraction) of a ~1% edge batch onto the labeling of the other 99% —
    the per-micro-batch operation ``incremental_er`` performs. Asserts both
    labelings agree before reporting. Interleaved best-of-N per the host's
    noisy-neighbor policy.
    """
    from pyspark.sql import functions as F

    import __spark_entry__ as entry_mod
    from addressit_spark.blocking import address_table
    from addressit_spark.cluster import (
        connected_components,
        incremental_components,
        touched_split,
    )
    from addressit_spark.parse_stage import parse_spans
    from addressit_spark.scoring import match_edges, score_pairs_fused, surface_sim_map
    from addressit_spark.session import get_spark
    from addressit_spark.sources.corpus import documents_view, synth_corpus

    spark = get_spark(
        master=MASTER or f"local[{CPUS}]",
        app_name="addressit_spark_inc_cc",
        shuffle_partitions=max(4 * CPUS, 32),
    )
    n_entities = ER_ENTITIES or entry_mod._entities_for(SF_DIR)
    corpus = documents_view(synth_corpus(spark, n_entities, seed=42))
    addresses = address_table(parse_spans(corpus)).localCheckpoint(eager=True)
    sims = surface_sim_map(addresses, max_block_size=100_000, max_block_surfaces=256).localCheckpoint(eager=True)
    scored, _ = score_pairs_fused(addresses, sims=sims)
    edges = match_edges(scored).localCheckpoint(eager=True)
    n_edges = edges.count()

    batch = edges.where(F.xxhash64("src", "dst") % 100 == 0).localCheckpoint(eager=True)
    base = edges.where(F.xxhash64("src", "dst") % 100 != 0).localCheckpoint(eager=True)
    n_batch = batch.count()
    base_labels = connected_components(base).localCheckpoint(eager=True)
    base_labels.count()

    # work entering the iterated fixpoint (the per-round shuffle payload):
    # full = every edge ever; incremental = touched-cluster stars + batch —
    # counted with the SAME split the timed operator executes
    n_touched_members = touched_split(base_labels, batch)[0].count()

    t_full, t_inc = None, None
    for _ in range(3):  # interleaved trials, best-of-3
        t0 = time.monotonic()
        full = connected_components(edges)
        n_full = full.count()
        t = time.monotonic() - t0
        t_full = t if t_full is None else min(t_full, t)
        t0 = time.monotonic()
        inc = incremental_components(base_labels, batch)
        n_inc = inc.count()
        t = time.monotonic() - t0
        t_inc = t if t_inc is None else min(t_inc, t)
    # labelings must agree exactly (symmetric difference empty)
    assert n_full == n_inc, (n_full, n_inc)
    diff = (
        full.unionByName(inc)
        .groupBy("uid", "component")
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") != 2)
        .count()
    )
    assert diff == 0, diff
    out = {
        "metric": "inc_cc_speedup",
        "value": round(t_full / t_inc, 2),
        "n_edges": n_edges,
        "n_batch_edges": n_batch,
        "n_labeled_nodes": n_full,
        "fixpoint_rows_full": n_edges,
        "fixpoint_rows_incremental": n_touched_members + n_batch,
        "work_ratio": round(n_edges / max(n_touched_members + n_batch, 1), 1),
        "t_full_cc_sec": round(t_full, 3),
        "t_incremental_sec": round(t_inc, 3),
        "sf": _sf_number(SF_DIR),
        "cpus": CPUS,
    }
    spark.stop()
    return out


def _calibration() -> dict:
    """Host-speed block for the default bench JSON (run AFTER spark.stop()).

    Median of 3 probes each: STREAM-add bandwidth and cache-resident CPU at
    8 processes (the regimes BENCH/BASELINE.md's ceiling table uses). The
    CPU factor (current/reference) is the primary normalizer — the headline
    queries at sf0.1 are compute-bound at this scale; the bandwidth factor
    is reported for the shuffle-heavy entries.
    """
    triads = sorted(_mp_triad(8, seconds=2.0) for _ in range(3))
    cpus = sorted(_mp_cpu(8, seconds=2.0) for _ in range(3))
    triad = triads[1]
    cpu = cpus[1] * 2.5  # rescale the 2s probe to the 5s reference window
    return {
        "triad8_gbps": triad,
        "cpu8_iters": int(cpu),
        "ref_triad8_gbps": REF_TRIAD8_GBPS,
        "ref_cpu8_iters": REF_CPU8_ITERS,
        "host_cpu_factor": round(cpu / REF_CPU8_ITERS, 4),
        "host_bw_factor": round(triad / REF_TRIAD8_GBPS, 4),
    }


def _mp_triad(nproc: int, seconds: float = 5.0) -> float:
    """STREAM-add memory-bandwidth probe (GB/s) at nproc processes."""
    import multiprocessing as mp

    import numpy as np

    def worker(q):
        a = np.random.rand(8_000_000)
        b = np.random.rand(8_000_000)
        c = np.empty_like(a)
        n_pass = 0
        t0 = time.monotonic()
        while time.monotonic() - t0 < seconds:
            np.add(a, b, out=c)  # 192 MB of traffic per pass
            n_pass += 1
        q.put(n_pass)

    q = mp.Queue()
    ps = [mp.Process(target=worker, args=(q,)) for _ in range(nproc)]
    for p in ps:
        p.start()
    for p in ps:
        p.join()
    total = sum(q.get() for _ in ps)
    return round(total * 192 / 1024 / seconds, 2)


def _mp_cpu(nproc: int, seconds: float = 5.0) -> int:
    """Cache-resident CPU probe (iterations) at nproc processes."""
    import multiprocessing as mp

    import numpy as np

    def worker(q):
        a = np.random.rand(20_000)  # 160 KB, L2-resident
        n = 0
        t0 = time.monotonic()
        while time.monotonic() - t0 < seconds:
            a = np.sqrt(a * 1.0000001 + 0.5) * 1.9999
            n += 1
        q.put(n)

    q = mp.Queue()
    ps = [mp.Process(target=worker, args=(q,)) for _ in range(nproc)]
    for p in ps:
        p.start()
    for p in ps:
        p.join()
    return sum(q.get() for _ in ps)


SCALING_DIR = os.environ.get("SPARK_GRAFT_SCALING_DIR", "/tmp/spark_graft_scaling")


def run_scaling_worker() -> dict:
    """One measured configuration: read prepared addresses, score, report.

    The measured action is ``agg(sum(score), count)`` over the fused
    blocking+scoring plan with the (tiny) surface-sim dim prebuilt — the
    production shape: dims are materialized stages reused across the massive
    scoring pass. A subset warmup JIT-compiles the codegen before timing.
    """
    import time as _t

    from pyspark.sql import functions as F

    from addressit_spark.scoring import score_pairs_fused, surface_sim_map
    from addressit_spark.session import get_spark

    nexec = int(os.environ["SG_NEXEC"])
    cores_per = int(os.environ["SG_CORES_PER"])
    spark = get_spark(
        master=f"local-cluster[{nexec},{cores_per},4096]",
        app_name="scaling_worker",
        shuffle_partitions=128,
        driver_memory="8g",
    )
    spark.sparkContext.setLogLevel("ERROR")
    addresses = spark.read.parquet(os.environ["SG_ADDR"]).localCheckpoint(eager=True)
    n_addr = addresses.count()
    t0 = _t.monotonic()
    sims = surface_sim_map(addresses, max_block_size=100_000, max_block_surfaces=256).localCheckpoint(
        eager=True
    )
    sim_sec = round(_t.monotonic() - t0, 3)
    warm, _ = score_pairs_fused(addresses.limit(max(n_addr // 10, 1000)), sims=sims)
    warm.agg(F.sum("score")).collect()
    times = []
    r = None
    for _ in range(int(os.environ.get("SG_TRIALS", "2"))):
        sc, _ = score_pairs_fused(addresses, sims=sims)
        t0 = _t.monotonic()
        r = sc.agg(F.sum("score").alias("s"), F.count(F.lit(1)).alias("n")).collect()[0]
        times.append(round(_t.monotonic() - t0, 3))
    spark.stop()
    return {
        "nexec": nexec,
        "cores_per": cores_per,
        "n_addr": n_addr,
        "sim_sec": sim_sec,
        "times": times,
        "n_pairs": r["n"],
        "score_sum": round(r["s"], 2),
    }


def _prepare_addresses(entities: int) -> str:
    """Materialize the deterministic addresses table once (any core count)."""
    path = os.path.join(SCALING_DIR, f"addr_{entities}")
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return path
    from addressit_spark.blocking import address_table
    from addressit_spark.parse_stage import parse_spans
    from addressit_spark.session import get_spark
    from addressit_spark.sources.corpus import documents_view, synth_corpus

    spark = get_spark(master="local[32]", app_name="scaling_prep",
                      shuffle_partitions=64, driver_memory="16g")
    spark.sparkContext.setLogLevel("ERROR")
    docs = documents_view(synth_corpus(spark, entities, seed=42))
    address_table(parse_spans(docs)).write.mode("overwrite").parquet(path)
    spark.stop()
    return path


def _run_worker(nexec: int, cores_per: int, cpuset: str, addr_path: str) -> dict:
    env = dict(
        os.environ,
        SG_NEXEC=str(nexec),
        SG_CORES_PER=str(cores_per),
        SG_ADDR=addr_path,
        PYTHONPATH=REPO,
    )
    last_err = ""
    for attempt in range(3):
        proc = subprocess.run(
            ["taskset", "-c", cpuset, sys.executable, os.path.abspath(__file__),
             "--scaling-worker"],
            capture_output=True, text=True, env=env,
        )
        lines = proc.stdout.strip().splitlines()
        if lines:
            try:
                return json.loads(lines[-1])
            except json.JSONDecodeError:
                pass
        last_err = proc.stderr[-2000:]
        print(f"# scaling worker nexec={nexec} attempt {attempt} failed, retrying",
              file=sys.stderr)
    raise RuntimeError(
        f"scaling worker nexec={nexec} cpuset={cpuset} failed 3x: {last_err}"
    )


def run_scaling() -> None:
    """N-vs-4N-executor scaling evidence → BENCH/BASELINE.md.

    Two configurations of the SAME fused scoring job on byte-identical
    prepared inputs, each with real executor JVMs (own heap/GC/Python
    workers, netty exchanges) and the whole process tree taskset-pinned to
    its core budget, trials interleaved N/4N/N/4N with best-of per level
    (shared noisy host):

    * PRIMARY — 1 vs 4 executors (2 cores each): the host's DRAM bandwidth
      still multiplies across this range (triad probe below), which is what
      a real cluster provides at ANY size (each executor brings its own
      memory system). Measured at two input sizes so the fixed per-job
      overhead (~1s of scheduling/broadcast) separates from the marginal
      per-pair rate — the quantity that governs 10^12-pair scale.
    * SATURATED — 2 vs 8 executors (4 cores each, 8→32 cores): beyond ~8
      cores ONE box cannot add bandwidth (triad scales ~1.1×), so
      bandwidth-bound phases pin while CPU-bound phases keep scaling; the
      hardware-ceiling probes quantify exactly that.
    """
    trials = int(os.environ.get("SPARK_GRAFT_SCALING_TRIALS", "2"))
    os.makedirs(SCALING_DIR, exist_ok=True)

    # hardware ceilings (pinned like the Spark runs)
    ceilings = {}
    for procs, cpuset in ((2, "0-1"), (8, "0-7"), (32, "0-31")):
        out = subprocess.run(
            ["taskset", "-c", cpuset, sys.executable, os.path.abspath(__file__),
             "--triad", str(procs)], capture_output=True, text=True,
        )
        ceilings[f"triad_{procs}"] = json.loads(out.stdout.strip().splitlines()[-1])["gbps"]
    for procs, cpuset in ((8, "0-7"), (32, "0-31")):
        out = subprocess.run(
            ["taskset", "-c", cpuset, sys.executable, os.path.abspath(__file__),
             "--cpuburn", str(procs)], capture_output=True, text=True,
        )
        ceilings[f"cpu_{procs}"] = json.loads(out.stdout.strip().splitlines()[-1])["iters"]

    sizes = [int(s) for s in os.environ.get(
        "SPARK_GRAFT_SCALING_SIZES", "300000,600000").split(",")]
    paths = {n: _prepare_addresses(n) for n in sizes}

    # PRIMARY: 1 vs 4 executors × 2 cores. Round-robin ALL four
    # (size × level) configurations inside each trial so a noisy-neighbor
    # period on this shared host distorts every configuration equally
    # instead of poisoning one size's best-of.
    primary: dict = {n: {1: [], 4: []} for n in sizes}
    for _ in range(trials):
        for n in sizes:
            primary[n][1].append(_run_worker(1, 2, "0-1", paths[n]))
            primary[n][4].append(_run_worker(4, 2, "0-7", paths[n]))

    # SATURATED: 2 vs 8 executors × 4 cores at the base size, interleaved
    base = sizes[0]
    saturated: dict = {2: [], 8: []}
    for _ in range(trials):
        saturated[2].append(_run_worker(2, 4, "0-7", paths[base]))
        saturated[8].append(_run_worker(8, 4, "0-31", paths[base]))

    def best(runs):
        return min(t for r in runs for t in r["times"])

    def tput(runs):
        n_pairs = runs[0]["n_pairs"]
        return round(n_pairs / best(runs), 1)

    p_small, p_big = sizes[0], sizes[-1]
    tN_s, t4_s = best(primary[p_small][1]), best(primary[p_small][4])
    tN_b, t4_b = best(primary[p_big][1]), best(primary[p_big][4])
    pairs_s = primary[p_small][1][0]["n_pairs"]
    pairs_b = primary[p_big][1][0]["n_pairs"]
    eff_avg = round(tN_b / (4 * t4_b), 4)
    marg_N = (tN_b - tN_s) / (pairs_b - pairs_s)
    marg_4 = (t4_b - t4_s) / (pairs_b - pairs_s)
    eff_marginal = round(marg_N / (4 * marg_4), 4)
    sat_tN, sat_t4 = best(saturated[2]), best(saturated[8])
    eff_sat = round(sat_tN / (4 * sat_t4), 4)
    report = {
        "efficiency": eff_avg,
        "efficiency_marginal": eff_marginal,
        "efficiency_saturated": eff_sat,
        "t_N": round(pairs_b / tN_b, 1),
        "t_4N": round(pairs_b / t4_b, 1),
        "t8": round(pairs_s / sat_tN, 1),
        "t32": round(pairs_s / sat_t4, 1),
        "ceilings": ceilings,
    }

    md = os.path.join(REPO, "BENCH", "BASELINE.md")
    os.makedirs(os.path.dirname(md), exist_ok=True)
    with open(md, "w") as fh:
        fh.write(_scaling_report_md(
            sizes, primary, saturated, ceilings, report,
            pairs_s, pairs_b, tN_s, t4_s, tN_b, t4_b, sat_tN, sat_t4,
        ))
    report["report"] = md
    print(json.dumps(report))


def _scaling_report_md(sizes, primary, saturated, ceilings, report,
                       pairs_s, pairs_b, tN_s, t4_s, tN_b, t4_b,
                       sat_tN, sat_t4) -> str:
    p_small, p_big = sizes[0], sizes[-1]
    all_times = lambda runs: [t for r in runs for t in r["times"]]
    bw_gain = round(ceilings["triad_8"] / ceilings["triad_2"], 2)
    bw_gain_sat = round(ceilings["triad_32"] / ceilings["triad_8"], 2)
    cpu_gain = round(ceilings["cpu_32"] / ceilings["cpu_8"], 2)
    return f"""# BENCH/BASELINE — measured scaling evidence

North_rule criterion: throughput scaling efficiency ≥ 0.8 between N and 4N
executors. No real cluster exists in this sandbox, so per the driver
instruction the identical job runs at two cluster sizes emulated with
`local-cluster` (real executor JVMs — own heaps/GC/Python workers, netty
shuffle), the whole process tree `taskset`-pinned to its core budget,
trials interleaved N/4N/N/4N, best per level reported (shared host with
2-10× noisy-neighbor interference). Workload: the PRODUCTION fused
blocking+scoring plan (`score_pairs_fused`, surface-sim dim prebuilt as the
pipeline's materialized stage), measured action `agg(sum(score), count)` so
every score is genuinely computed; input = deterministic corpus (seed 42)
parsed to the addresses table once and read from parquet byte-identically
by every configuration.

The literal `spark-submit --py-files` deployment shape (full pipeline,
package importable only from the shipped zip) is measured separately at the
same two cluster sizes — see `BENCH/SUBMIT.md` (`scripts/submit_scaling.py`).

## Primary: 1 vs 4 executors (2 cores each) — the regime a real cluster lives in

Every added executor on a real cluster brings its own DRAM bandwidth. This
host's bandwidth still multiplies across 2→8 cores (STREAM-add probe:
{ceilings["triad_2"]} → {ceilings["triad_8"]} GB/s = {bw_gain}×), so this
configuration faithfully emulates adding executors. Two input sizes
separate the fixed per-job cost (scheduling, dim broadcast — amortized to
nothing at 10^12 pairs) from the marginal per-pair rate that governs scale.

| input | candidate pairs | 1 executor best (all) | 4 executors best (all) | speedup |
|---|---|---|---|---|
| {p_small//1000}k entities | {pairs_s:,} | {tN_s}s {all_times(primary[p_small][1])} | {t4_s}s {all_times(primary[p_small][4])} | {round(tN_s/t4_s,2)}× |
| {p_big//1000}k entities | {pairs_b:,} | {tN_b}s {all_times(primary[p_big][1])} | {t4_b}s {all_times(primary[p_big][4])} | {round(tN_b/t4_b,2)}× |

* **Average efficiency at the large size: {report["efficiency"]}**
  (throughput {report["t_N"]:,.0f} → {report["t_4N"]:,.0f} pairs/s).
* **Marginal efficiency (Δtime/Δpairs between the two sizes):
  {report["efficiency_marginal"]}** — the asymptotic per-pair rate scales at
  {round(4*report["efficiency_marginal"],2)}× for 4× executors. At 10^12
  pairs the fixed intercept ({round(tN_b - (pairs_b)* (tN_b-tN_s)/(pairs_b-pairs_s),1)}s
  at N) is ~10⁻⁵ of the job, so the marginal rate IS the production number.

## Saturated regime: 2 vs 8 executors (4 cores each, 8→32 cores)

| cluster size | pairs scored/sec (best) | all trials (s) |
|---|---|---|
| 2 executors (N) | {report["t8"]:,.1f} | {all_times(saturated[2])} |
| 8 executors (4N) | {report["t32"]:,.1f} | {all_times(saturated[8])} |

Efficiency {report["efficiency_saturated"]} — bounded by host physics, not
the dataflow, per the ceiling probes below.

## Hardware ceilings (taskset-pinned, same cores as the Spark runs)

| probe | 2 procs | 8 procs | 32 procs | 8→32 scaling |
|---|---|---|---|---|
| STREAM-add bandwidth (GB/s) | {ceilings["triad_2"]} | {ceilings["triad_8"]} | {ceilings["triad_32"]} | {bw_gain_sat}× |
| cache-resident CPU (iters) | — | {ceilings["cpu_8"]:,} | {ceilings["cpu_32"]:,} | {cpu_gain}× |

DRAM bandwidth is SATURATED by 8 cores ({ceilings["triad_8"]} GB/s; 32 cores
add only {bw_gain_sat}×); pure CPU scales {cpu_gain}×/4 = {round(cpu_gain/4,2)}
— the host's absolute parallel ceiling. Stage-level attribution of the fused
plan (profiled in round 2, 673M pairs): the probe+score phase scales
**3.5×/4 = 0.87** — at/above the CPU ceiling, i.e. the dataflow adds zero
serialization — while the salted-join row emission scales ~1.2×, exactly the
bandwidth ceiling. The end-to-end saturated number is the bandwidth-weighted
mix of the two. On a real 4N-executor cluster the bandwidth term multiplies
with N (each executor has its own memory system), which is precisely the
resource one box cannot emulate past 8 cores — and the primary configuration
above, which stays inside the host's bandwidth headroom, measures
{report["efficiency_marginal"]} marginal efficiency for the identical plan.

## Plan posture

Shuffles on uniformly-hashed salt-spread keys (triangle salting, cap 64
buckets; blocks > 100k rows dropped with a logged metric); the 10^12-row
shuffle carries only 8-byte interned feature hashes; similarity is computed
once per distinct co-occurring surface pair into a cache-resident broadcast
map (single 8-byte canonical pair-hash key); AQE handles residual skew. No driver-side
collects in the pair path. Connected components iterates on join-assigned
8-byte long node ids (min-uid labels restored by one relabel pass): 2.9×
fewer shuffle bytes per round with high-entropy uids.

## SMJ pin cost at bench scale (round 3)

The table-sized dedup self-joins pin sort-merge (`hint("merge")`) because a
checkpointed source can carry a tiny size estimate and flip the planner to
broadcasting a whole table side — fatal at 100 TB. Cost of that pin at toy
scale, measured sf0.1 / local[32], interleaved best-of-3, identical output
rows both ways (`pin_smj=False` removes the pins and lets AQE choose):

| query | rows | pinned (default) | AQE free | pinned/AQE |
|---|---|---|---|---|
| ngram_jaccard | 256 | 2.38s | 2.98s | 0.80 |
| minhash_dups | 256 | 3.28s | 3.76s | 0.87 |
| simhash_dups | 583 | 1.43s | 1.13s | 1.26 |

The pins are free-to-negative on the shingle/band joins and cost a ~0.3s
constant on simhash at this scale — kept as the default; `pin_smj=False`
is the escape hatch for provably-small inputs.

## Incremental clustering at bench scale (round 3)

`incremental_components` (the per-micro-batch clustering `incremental_er`
uses) folds a ~1% edge batch into the prior labeling by re-clustering only
touched clusters. Measured with `bench.py --inc-cc` (sf0.1 / local[32],
interleaved best-of-3, label sets asserted identical to the full recompute):

| accumulated edges | batch edges | fixpoint rows full → incremental | work ratio | wall full → incremental |
|---|---|---|---|---|
| 46,028 | 476 | 46,028 → 2,758 | 16.7× | 3.14s → 4.36s (0.72×) |
| 895,267 | 9,060 | 895,267 → 52,441 | 17.1× | 12.56s → 10.64s (1.18×) |

The per-round shuffle payload (rows entering the iterated fixpoint — the
quantity that scales) drops ~17× for a 1% batch; at production ratios
(one micro-batch vs 10^12 accumulated edges) it is the corpus/batch ratio.
Wall-clock at toy scale is bounded by the fixed per-round job latency of
the CC loop (same round count either way), so the speedup crosses over
as the graph grows: 0.72× at 46k edges, 1.18× at 0.9M — the asymptote
follows the work ratio.

## Host-speed calibration of the per-round BENCH files

This host's noisy-neighbor swings (2-10×, minutes-long) made round-2's
headline total look 60% slower than round-1's with no code change. From
round 3 on, default-mode `bench.py` therefore appends a `calibration`
block after `spark.stop()`: median-of-3 `_mp_triad(8)` (STREAM-add GB/s)
and `_mp_cpu(8)` (cache-resident iterations, rescaled to the 5 s reference
window) probes, compared against the round-2 reference values
(69.8 GB/s / 955,515 iters). `host_cpu_factor = cpu8_iters / 955515` is
the primary normalizer — the sf0.1 headline queries are compute-bound at
bench scale — and the JSON also carries `queries_normalized` (each query
time × the CPU factor, i.e. reference-host-equivalent seconds) plus
`normalized_total_sec`. Compare BENCH_r{{N}} files on the normalized
numbers; `host_bw_factor` is reported alongside for the shuffle-heavy
entries. A factor ≪ 1 means the host was slow that round, not the code.

## Reading the per-round BENCH files (round-4 methodology)

Round 3's ER-stage timings were contaminated by episodic host stalls
(`er_parse_block` reported 17.7s for a stage whose isolated cost was ~5.6s).
From round 4 the default-mode JSON records: **`queries_trials`** — the FULL
per-trial array for every timed entry (trials[0] = coldest run; the headline
value is the min, so cold cost and stall spread are both visible);
**ER stages run ≥3 trials** (`SPARK_GRAFT_ER_TRIALS`);
**`comparable_total_sec`** — the sum over the FIXED round-1 query set (the
headline `value` grows with the timed set and is NOT comparable across
rounds); **`queries_normalized_bw`** — bandwidth-side normalization for the
declared `bw_bound_queries` (checkpoint-materialization stages), bounding
the reference-host-equivalent time from the bandwidth side where the CPU
factor cannot explain a stall; **`er_full_pipeline_stages`** — per-stage
wall seconds inside the flagship pipeline from StageStore lineage, so a
flagship regression is attributable to a stage.

**Same-JVM bias on the ER stages.** In default mode the ER stages run in
the same SparkSession after the headline queries; accumulated JVM state
(old-gen occupancy, shuffle files) can read them ~2× higher than their
isolated cost (measured round 4: `er_score` 5.06s in-session vs 2.65s
tight-array in `SPARK_GRAFT_BENCH_ONLY_ER=1` mode minutes apart). The
in-session number is kept for cross-round comparability (r1-r3 measured
the same way); from round 4 the default-mode JSON also attaches
**`er_isolated`** — the same stages re-measured in a fresh subprocess
session — so the bias is self-quantifying per round.

**Round-3 addendum — episodic stalls, not just slow windows.** On the
round-3 VM the interference is spikier than round 2's minutes-long slow
windows: multi-second full stalls land on whichever stage happens to be
running, inflating that one stage 10-50× while the rest of the same run is
at full speed (observed: `er_parse_block` 163.5 s in one default-mode run
vs 1.7 s for the identical plan isolated minutes later; the next full run
moved the anomaly to `embedding_dup_lsh`; a live STREAM probe during one
episode read **5.4 GB/s** at 8 procs vs the 69.8 reference — 8% of
reference bandwidth). Point-in-time calibration probes cannot capture an
episode that hits mid-run, which is why the trial arrays above are the
primary evidence and any single number is read against them.

Raw JSON (best runs):

```json
{json.dumps({"primary": {str(k): {str(e): primary[k][e] for e in (1, 4)} for k in primary}, "saturated": {str(k): v for k, v in saturated.items()}}, indent=1)}
```
"""


DETAIL_PATH = os.environ.get(
    "SPARK_GRAFT_BENCH_DETAIL", os.path.join(REPO, "BENCH", "r05_detail.json")
)

# keys kept on the printed headline line; everything else (trial arrays,
# isolated re-runs, normalization maps, probe raws) goes to DETAIL_PATH
_COMPACT_KEYS = (
    "metric", "value", "unit", "sf", "cpus",
    "comparable_total_sec", "normalized_total_sec",
    "er_pairs_per_sec", "er_clusters", "er_entities",
    "er_full_pipeline_stages",
)


def emit_report(report: dict) -> str:
    """Write the FULL report to DETAIL_PATH; return a compact headline line.

    Round 4's report line (trial arrays + er_isolated + stage maps) outgrew
    the driver's 2000-char tail-capture window → ``BENCH_r04.json``
    ``"parsed": null``. The driver parses the LAST JSON line of the tail, so
    the printed line must stay well under 2000 chars; the bulky evidence is
    committed as a BENCH/ detail file instead. Degrades by dropping the
    per-query map down to the frozen comparable set if the full map would
    overflow (it does not at the current query count — belt and braces).
    """
    os.makedirs(os.path.dirname(DETAIL_PATH), exist_ok=True)
    with open(DETAIL_PATH, "w") as fh:
        json.dump(report, fh, indent=1, sort_keys=True)

    compact = {k: report[k] for k in _COMPACT_KEYS if k in report}
    cal = report.get("calibration") or {}
    compact["calibration"] = {
        k: cal[k] for k in ("host_cpu_factor", "host_bw_factor") if k in cal
    }
    compact["detail"] = os.path.relpath(DETAIL_PATH, REPO)
    for qset in (
        report.get("queries", {}),
        {q: t for q, t in report.get("queries", {}).items()
         if q in R1_COMPARABLE_SET},
        {},
    ):
        line = json.dumps({**compact, "queries": qset})
        if len(line) <= 1800:
            return line
    return json.dumps(compact)


if __name__ == "__main__":
    if "--scaling-worker" in sys.argv:
        print(json.dumps(run_scaling_worker()))
    elif "--triad" in sys.argv:
        print(json.dumps({"gbps": _mp_triad(int(sys.argv[sys.argv.index("--triad") + 1]))}))
    elif "--cpuburn" in sys.argv:
        print(json.dumps({"iters": _mp_cpu(int(sys.argv[sys.argv.index("--cpuburn") + 1]))}))
    elif "--scaling" in sys.argv:
        run_scaling()
    elif "--inc-cc" in sys.argv:
        print(json.dumps(run_inc_cc_bench()))
    else:
        report = run_bench()
        if ONLY_ER:
            # scaling/isolated-probe workers are machine-parsed by the parent
            # process, which wants the full dict on stdout, not a detail file
            print(json.dumps(report))
        else:
            print(emit_report(report))
