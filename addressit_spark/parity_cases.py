"""Transcribed reference test corpus (golden expectations).

140 active cases from the reference tape suite:
  * /root/reference/test/parse.js        — 14 cases, default locale (en-US)
  * /root/reference/test/locale-en-AU.js — 11 cases
  * /root/reference/test/locale-en-US.js — 24 cases
  * /root/reference/test/street-types.js — 91 generated cases

Assertion semantics follow /root/reference/test/helpers/expect.js:3-19:
only the keys present in ``expected`` are asserted; an explicit ``None``
in an asserted key means "must be absent" (tape's ``undefined``).

Plus the probe-verified quirk corpus (SURVEY.md §2.8).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

Case = Tuple[str, str, Dict[str, object]]  # (input, locale, expected)

# --- test/parse.js (default locale = en-US per /root/reference/index.js:50) ---
PARSE_CASES: List[Case] = [
    ("2649 Logan Road, Eight Mile Plains, QLD", "en-US",
     {"number": "2649", "street": "Logan Road", "regions": ["Eight Mile Plains", "QLD"]}),
    ("2649 Logan Road Eight Mile Plains, QLD", "en-US",
     {"number": "2649", "street": "Logan Road", "regions": ["Eight Mile Plains", "QLD"]}),
    ("4 N 2nd St #950, San Jose, CA", "en-US",
     {"unit": "950", "number": "4", "street": "N 2nd St", "regions": ["San Jose"]}),
    ("1 Queen Street, Brisbane", "en-US",
     {"number": "1", "street": "Queen Street", "regions": ["Brisbane"]}),
    ("754 Robinson Rd West, Aspley, QLD", "en-US",
     {"number": "754", "street": "Robinson Rd West", "regions": ["Aspley", "QLD"]}),
    ("Sydney", "en-US", {"regions": ["Sydney"]}),
    ("Perth", "en-US", {"regions": ["Perth"]}),
    ("1/135 Ferny Way, Ferny Grove", "en-US",
     {"unit": "1", "number": "135", "street": "Ferny Way", "regions": ["Ferny Grove"]}),
    ("Shop 8, 431 St Kilda Rd Melbourne", "en-US",
     {"unit": "8", "number": "431", "street": "St Kilda Rd", "regions": ["Melbourne"]}),
    ("Eight Mile Plains", "en-US", {"regions": ["Eight Mile Plains"]}),
    ("St George", "en-US", {"regions": ["St George"]}),
    ("3N751 Hawthorn Dr., St. Charles, IL", "en-US",
     {"number": "3N751", "street": "Hawthorn Dr", "regions": ["St Charles"]}),
    ("8/437 St Kilda Road Melbourne, VIC", "en-US",
     {"unit": "8", "number": "437", "street": "St Kilda Road", "regions": ["Melbourne", "VIC"]}),
    ("18 E. Main St.", "en-US",
     {"number": "18", "street": "E. Main St", "regions": []}),
]

# --- test/locale-en-AU.js ---
AU_CASES: List[Case] = [
    ("2649 Logan Road, Eight Mile Plains, QLD 4113", "en-AU",
     {"number": "2649", "street": "Logan Road", "regions": ["Eight Mile Plains", "QLD"],
      "postalcode": "4113"}),
    ("2649 Logan Road Eight Mile Plains, QLD 4113", "en-AU",
     {"number": "2649", "street": "Logan Road", "regions": ["Eight Mile Plains", "QLD"],
      "postalcode": "4113"}),
    ("1 Queen Street, Brisbane 4000", "en-AU",
     {"number": "1", "street": "Queen Street", "regions": ["Brisbane"], "postalcode": "4000"}),
    ("754 Robinson Rd West, Aspley, QLD 4035", "en-AU",
     {"number": "754", "street": "Robinson Rd West", "regions": ["Aspley", "QLD"],
      "postalcode": "4035"}),
    ("Sydney 2000", "en-AU", {"regions": ["Sydney"], "postalcode": "2000"}),
    ("Perth", "en-AU", {"regions": ["Perth"]}),
    ("1/135 Ferny Way, Ferny Grove 4054", "en-AU",
     {"unit": "1", "number": "135", "street": "Ferny Way", "regions": ["Ferny Grove"],
      "postalcode": "4054"}),
    ("Eight Mile Plains 4113", "en-AU",
     {"regions": ["Eight Mile Plains"], "postalcode": "4113"}),
    ("8/437 St Kilda Road Melbourne, VIC ", "en-AU",
     {"unit": "8", "number": "437", "street": "St Kilda Road", "regions": ["Melbourne", "VIC"]}),
    ("BOOM", "en-AU", {"regions": ["BOOM"], "postalcode": None}),
    ("Eight Mile Plains 9999", "en-AU",
     {"regions": ["Eight Mile Plains 9999"], "postalcode": None}),
]

# --- test/locale-en-US.js ---
US_CASES: List[Case] = [
    ("123 Main St, New York, NY 10010", "en-US",
     {"number": "123", "street": "Main St", "state": "NY", "regions": ["New York"],
      "postalcode": "10010"}),
    ("123 Main St New York, NY 10010", "en-US",
     {"number": "123", "street": "Main St", "state": "NY", "regions": ["New York"],
      "postalcode": "10010"}),
    ("123 Main St New York NY 10010", "en-US",
     {"number": "123", "street": "Main St", "state": "NY", "regions": ["New York"],
      "postalcode": "10010"}),
    ("123 E 21st st, Brooklyn NY 11020", "en-US",
     {"number": "123", "street": "E 21st st", "state": "NY", "regions": ["Brooklyn"],
      "postalcode": "11020"}),
    ("754 Pharr Rd, Atlanta, Georgia 31035", "en-US",
     {"number": "754", "street": "Pharr Rd", "state": "GA", "regions": ["Atlanta"],
      "postalcode": "31035"}),
    ("601 21st Ave N, Myrtle Beach, South Carolina 29577", "en-US",
     {"number": "601", "street": "21st Ave N", "state": "SC", "regions": ["Myrtle Beach"],
      "postalcode": "29577"}),
    ("425 W 23rd St, New York, NY 10011", "en-US",
     {"number": "425", "street": "W 23rd St", "state": "NY", "regions": ["New York"],
      "postalcode": "10011"}),
    ("1035 Comanchee Trl, West Columbia, South Carolina 29169", "en-US",
     {"number": "1035", "street": "Comanchee Trl", "state": "SC",
      "regions": ["West Columbia"], "postalcode": "29169"}),
    ("Texas 76013", "en-US", {"state": "TX", "regions": [], "postalcode": "76013"}),
    ("Dallas", "en-US", {"regions": ["Dallas"]}),
    ("California", "en-US", {"state": "CA"}),
    ("New York", "en-US", {"state": "NY"}),
    ("New York, NY", "en-US", {"state": "NY", "regions": ["New York"]}),
    ("New York, New York", "en-US", {"state": "NY", "regions": ["New York"]}),
    ("northern mariana islands", "en-US", {"state": "MP"}),
    ("Santa Monica, California 90407", "en-US",
     {"state": "CA", "regions": ["Santa Monica"], "postalcode": "90407"}),
    ("Grand canyon 86023", "en-US",
     {"regions": ["Grand canyon"], "postalcode": "86023"}),
    ("CT, 06410", "en-US", {"regions": ["CT"], "postalcode": "06410"}),
    ("BOOM", "en-US", {"regions": ["BOOM"], "postalcode": None}),
    ("Niagara Falls 76B09", "en-US",
     {"regions": ["Niagara Falls 76B09"], "postalcode": None}),
    ("123 Broadway, New York, NY 10010", "en-US",
     {"number": "123", "street": "Broadway", "state": "NY", "regions": ["New York"],
      "postalcode": "10010"}),
    ("Mt Tabor Park, 6220 SE Salmon St, Portland, OR 97215, USA", "en-US",
     {"number": "6220", "street": "SE Salmon St", "state": "OR", "country": "USA",
      "regions": ["Mt Tabor Park", "Portland", "97215"]}),
    ("Mt Tabor Park", "en-US", {"regions": ["Mt Tabor Park"]}),
    ("Mt", "en-US", {"state": "MT"}),
]

# --- test/street-types.js (91 enabled type surface forms) ---
STREET_TYPE_NAMES: List[str] = [
    "ALLEY", "ALLY", "APPROACH", "APP", "ARCADE", "ARC", "AVENUE", "AV", "AVE",
    "BOULEVARD", "BLVD", "BROW", "BYPASS", "BYPA", "CAUSEWAY", "CWAY",
    "CIRCUIT", "CCT", "CIRCUS", "CIRC", "CLOSE", "CL", "COPSE", "CPSE",
    "CORNER", "CNR", "COURT", "CT", "CRT", "CRESCENT", "CRES", "DRIVE", "DR",
    "ESPLANADE", "ESP", "FREEWAY", "FWAY", "FRONTAGE", "FRNT", "GLADE", "GLD",
    "GREEN", "GRN", "HIGHWAY", "HWY", "LANE", "LN", "LINK", "LOOP", "MALL",
    "MEWS", "PACKET", "PCKT", "PARADE", "PDE", "PARKWAY", "PKWY", "PLACE",
    "PL", "PROMENADE", "PROM", "RESERVE", "RES", "RISE", "ROAD", "RD", "ROW",
    "SQUARE", "SQ", "STREET", "ST", "STRIP", "STRP", "TARN", "TERRACE", "TCE",
    "THOROUGHFARE", "TFRE", "TRACK", "TRAC", "TRAIL", "TRL", "TRUNKWAY",
    "TWAY", "VISTA", "VSTA", "WALK", "WAY", "WALKWAY", "WWAY", "YARD",
]

STREET_TYPE_CASES: List[Case] = [
    (
        "15 FOO %s BARVILLE" % name,
        "en-US",
        {"number": "15", "street": "FOO %s" % name, "regions": ["BARVILLE"]},
    )
    for name in STREET_TYPE_NAMES
]

# --- probe-verified quirk corpus (SURVEY.md §2.8) ---
QUIRK_CASES: List[Case] = [
    # Q1: ZIP+4 self-substitution leaves postalcode unset, token → regions
    ("123 Main St, New York, NY 10010-1234", "en-US",
     {"number": "123", "street": "Main St", "state": "NY", "postalcode": None,
      "regions": ["New York", "10010-1234"]}),
    # Q2: AU postcode regex unanchored at start strips the whole token
    ("Somewhere X2000", "en-AU",
     {"postalcode": "2000", "regions": ["Somewhere"]}),
    # Q3: number == '' (not None) when a street had no leading number
    ("Queen Street Brisbane", "en-US",
     {"number": "", "street": "Queen Street", "regions": ["Brisbane"]}),
    # Q4: multi-number '/' join
    ("5 10 Main St Town", "en-US",
     {"number": "5/10", "street": "Main St", "regions": ["Town"]}),
    ("10/15/20 Main St", "en-US",
     {"unit": "10", "number": "15/20", "street": "Main St", "regions": []}),
    # Q5: split-street direction requires a trailing comma
    ("754 Robinson Rd West Aspley", "en-US",
     {"number": "754", "street": "Robinson Rd", "regions": ["West Aspley"]}),
    # Q6: multi-token match is state-only → 'UNITED STATES' never matches country
    ("UNITED STATES", "en-US",
     {"country": None, "regions": ["UNITED STATES"]}),
    # unit regex 1 only matches fused forms; 'APT 12' falls through
    ("APT 12 52 Example St Sydney", "en-US",
     {"unit": None, "number": "12/52", "street": "Example St", "regions": ["APT Sydney"]}),
    # Q10: cleaned text is the output text
    ("Shop 8, 431 St Kilda Rd Melbourne", "en-US",
     {"text": "8/431 St Kilda Rd Melbourne"}),
]

ALL_REFERENCE_CASES: List[Case] = PARSE_CASES + AU_CASES + US_CASES + STREET_TYPE_CASES
ALL_CASES: List[Case] = ALL_REFERENCE_CASES + QUIRK_CASES


def case_id(case: Case) -> str:
    text, locale, _ = case
    return "%s|%s" % (locale, text)
