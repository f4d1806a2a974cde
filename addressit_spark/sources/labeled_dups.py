"""Labeled near-duplicate document corpus for dedup quality floors.

The consensus/keep-policy dedup chain is value-checked against oracles, but
value-correctness says nothing about DETECTION quality — whether the
detectors actually find real near-dups and reject non-dups. This module
synthesizes ground truth the same way ``sources/corpus.py`` does for
addresses: deterministic BLAKE2-keyed generation of base documents plus
mildly perturbed variants, labeled by group.

* every doc in a group derives from the group's base text; within-group
  pairs are TRUE near-dups (1-3 token edits on a 50-90-token doc — the
  boilerplate/near-copy regime web dedup targets);
* cross-group pairs are TRUE negatives (independent token draws from a
  shared vocabulary: topical overlap, no copied passages).

Generation is embarrassingly parallel over ``spark.range`` (one row per
group → mapInPandas fan-out to variants), so the plan scales like the main
corpus generator.
"""

from __future__ import annotations

import hashlib
from typing import Iterator, List

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

LABELED_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("group_id", LongType()),
        StructField("variant", IntegerType()),
        StructField("text", StringType()),
    ]
)

# deterministic pseudo-word vocabulary: syllable products, no RNG
_SYL_A = ["ba", "cor", "del", "fen", "gar", "hol", "jin", "kel", "lor", "mun"]
_SYL_B = ["da", "ine", "ost", "ul", "er", "ach", "im", "ov", "ax", "eth"]
_SYL_C = ["", "", "ton", "berg", "ford", "wick", "dale", "more", "sen", "by"]
VOCAB: List[str] = [
    a + b + c for a in _SYL_A for b in _SYL_B for c in _SYL_C
]  # 1000 words


def _h(seed: int, *keys: object) -> int:
    raw = "|".join(str(k) for k in keys).encode()
    return int.from_bytes(
        hashlib.blake2b(b"dupgen|%d|" % seed + raw, digest_size=8).digest(), "big"
    )


def _base_tokens(gid: int, seed: int) -> List[str]:
    n = 50 + _h(seed, "len", gid) % 41  # 50..90 tokens
    return [
        VOCAB[_h(seed, "tok", gid, i) % len(VOCAB)] for i in range(n)
    ]


def _perturb(tokens: List[str], gid: int, v: int, seed: int) -> List[str]:
    """1-3 token edits (replace / delete / adjacent-swap / duplicate)."""
    out = list(tokens)
    n_edits = 1 + _h(seed, "nedit", gid, v) % 3
    for e in range(n_edits):
        if not out:
            break
        pos = _h(seed, "pos", gid, v, e) % len(out)
        op = _h(seed, "op", gid, v, e) % 4
        if op == 0:
            out[pos] = VOCAB[_h(seed, "rep", gid, v, e) % len(VOCAB)]
        elif op == 1 and len(out) > 10:
            del out[pos]
        elif op == 2 and pos + 1 < len(out):
            out[pos], out[pos + 1] = out[pos + 1], out[pos]
        else:
            out.insert(pos, out[pos])
    return out


def synth_labeled_dup_corpus(
    spark: SparkSession, n_groups: int, seed: int = 13, partitions: int = 0
) -> DataFrame:
    """(doc_id, group_id, variant, text): variant 0 is the base document;
    a deterministic 0-2 extra variants per group are mild perturbations of
    it. Groups with ≥2 docs define the positive pairs; everything
    cross-group is negative.
    """
    if partitions <= 0:
        partitions = max(spark.sparkContext.defaultParallelism, 8)
    gids = spark.range(0, n_groups, 1, partitions)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for gid in pdf["id"]:
                gid = int(gid)
                base = _base_tokens(gid, seed)
                n_variants = 1 + _h(seed, "nvar", gid) % 3  # 1..3 docs
                for v in range(n_variants):
                    toks = base if v == 0 else _perturb(base, gid, v, seed)
                    rows.append(
                        {
                            "doc_id": "g%06dv%d" % (gid, v),
                            "group_id": gid,
                            "variant": v,
                            "text": " ".join(toks),
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "group_id", "variant", "text"]
            )

    return gids.mapInPandas(gen, schema=LABELED_SCHEMA)
