"""Gopher-style boilerplate shape signals: scalar reference + DuckDB parity."""

import duckdb
import pytest

from addressit_spark.operators.text import with_boilerplate_stats


def _ref(text):
    text = text or ""
    words = [t for t in text.split() if t]
    n_sym = text.count("#") + text.replace("…", "").count("...")
    # count via the same regex alternation semantics: '#' or literal '...'
    import re

    n_sym = len(re.findall(r"#|\.\.\.", text))
    swr = round(n_sym / len(words), 4) if words else 0.0
    lines = [l.strip() for l in text.split("\n") if l.strip()]
    if not lines:
        return swr, 0.0, 0.0
    nb = sum(1 for l in lines if l[0] in "-*•")
    ne = sum(1 for l in lines if l.endswith("...") or l.endswith("…"))
    return swr, round(nb / len(lines), 4), round(ne / len(lines), 4)


def test_boilerplate_stats_semantics_and_duckdb_parity(spark):
    docs = [
        ("d1", "# header\nplain text line\nanother # tag here"),
        ("d2", "- one\n- two\n* three\nplain"),
        ("d3", "to be continued...\nor not…\nthe end"),
        ("d4", "no shapes at all just words"),
        ("d5", ""),
        ("d6", None),
        ("d7", "• unicode bullet\n•• double\nplain ... mid ellipsis"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        r["doc_id"]: (
            r["symbol_word_ratio"], r["bullet_line_frac"], r["ellipsis_line_frac"]
        )
        for r in with_boilerplate_stats(df).collect()
    }
    for doc_id, text in docs:
        assert got[doc_id] == pytest.approx(_ref(text), abs=1e-9), (
            doc_id, got[doc_id], _ref(text),
        )

    # plan stays pure-JVM
    plan = with_boilerplate_stats(df)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan

    # DuckDB replay on the real documents table
    sf_dir = "/root/testdata/sf0.001"
    real = spark.read.parquet(sf_dir + "/documents.parquet")
    mine = {
        r["doc_id"]: (
            r["symbol_word_ratio"], r["bullet_line_frac"], r["ellipsis_line_frac"]
        )
        for r in with_boilerplate_stats(real).select(
            "doc_id", "symbol_word_ratio", "bullet_line_frac", "ellipsis_line_frac"
        ).collect()
    }
    con = duckdb.connect()
    theirs = con.execute(
        f"""
        WITH base AS (
            SELECT doc_id,
                   coalesce(text, '') AS t,
                   list_filter(list_transform(string_split(coalesce(text, ''), chr(10)),
                                              l -> trim(l)), l -> l <> '') AS lines,
                   list_filter(string_split_regex(trim(coalesce(text, '')), '\\s+'),
                               w -> w <> '') AS words
            FROM read_parquet('{sf_dir}/documents.parquet')
        )
        SELECT doc_id,
               CASE WHEN len(words) > 0
                    THEN round(len(regexp_extract_all(t, '#|\\.\\.\\.')) * 1.0 / len(words), 4)
                    ELSE 0.0 END AS swr,
               CASE WHEN len(lines) > 0
                    THEN round(len(list_filter(lines, l -> regexp_matches(l, '^[-*•]'))) * 1.0 / len(lines), 4)
                    ELSE 0.0 END AS blf,
               CASE WHEN len(lines) > 0
                    THEN round(len(list_filter(lines, l -> regexp_matches(l, '(\\.\\.\\.|…)$'))) * 1.0 / len(lines), 4)
                    ELSE 0.0 END AS elf
        FROM base
        """
    ).fetchall()
    con.close()
    assert len(theirs) == len(mine) > 0
    for doc_id, swr, blf, elf in theirs:
        assert mine[doc_id] == pytest.approx((swr, blf, elf), abs=1e-4), doc_id


def test_gopher_filter_rules_and_single_scan(spark):
    """Composite filter: rule attribution, keep semantics, one-scan plan."""
    from addressit_spark.operators.text import gopher_filter

    # ≥50 tokens, every 3-gram unique, mean token length in [3,10],
    # stopword mass from the interleaved "the"/"and"
    good = " ".join(
        ("the word%03d and item%03d" % (i, i)).strip() for i in range(20)
    )
    docs = [
        ("keepme", good),
        ("short", "too short"),
        ("spam", "spam " * 200),  # dup 3-grams, no stopwords, short tokens
        ("bullets", "\n".join("- item %d is here now" % i for i in range(20))),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {r["doc_id"]: r.asDict() for r in gopher_filter(df).collect()}

    assert got["keepme"]["keep"] and got["keepme"]["drop_reasons"] == []
    assert not got["short"]["keep"]
    assert "n_tokens" in got["short"]["drop_reasons"]
    assert not got["spam"]["keep"]
    assert {"dup_ngrams", "stopwords"} <= set(got["spam"]["drop_reasons"])
    assert not got["bullets"]["keep"]
    assert "bullet_lines" in got["bullets"]["drop_reasons"]

    # one scan, no shuffle, no Python: the whole filter is a projection
    plan = gopher_filter(df)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "Exchange" not in plan

    # the audit view a pipeline would run: rejection mix per rule
    real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    from pyspark.sql import functions as F

    mix = (
        gopher_filter(real)
        .select(F.explode_outer("drop_reasons").alias("rule"))
        .groupBy("rule")
        .count()
        .collect()
    )
    assert sum(r["count"] for r in mix) >= real.count()  # every doc audited
