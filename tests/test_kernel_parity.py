"""Parity tests: the kernel must reproduce all 140 reference test cases.

Assertion semantics mirror /root/reference/test/helpers/expect.js:3-19 —
only keys listed in ``expected`` are checked; an expected value of ``None``
asserts the field is absent (tape's ``undefined``).
"""

import pytest

from addressit_spark.kernel import parse
from addressit_spark.parity_cases import (
    ALL_REFERENCE_CASES,
    QUIRK_CASES,
    STREET_TYPE_CASES,
    case_id,
)


def _check(case):
    text, locale, expected = case
    got = parse(text, locale)
    for key, want in expected.items():
        assert got[key] == want, (
            "input=%r locale=%s field=%s: got %r want %r (full=%r)"
            % (text, locale, key, got[key], want, got)
        )


@pytest.mark.parametrize("case", ALL_REFERENCE_CASES, ids=case_id)
def test_reference_parity(case):
    _check(case)


@pytest.mark.parametrize("case", QUIRK_CASES, ids=case_id)
def test_quirk_corpus(case):
    _check(case)


def test_case_count():
    # 14 parse + 11 en-AU + 24 en-US + 91 street types = 140 active cases.
    assert len(ALL_REFERENCE_CASES) == 140
    assert len(STREET_TYPE_CASES) == 91


def test_number_empty_string_vs_absent():
    # Q3: '' when a street was found with no number; None when no street at all.
    assert parse("Queen Street Brisbane")["number"] == ""
    assert parse("Sydney")["number"] is None


def test_regions_always_list():
    assert parse("BOOM")["regions"] == ["BOOM"]
    assert parse("a, , b")["regions"] == ["a", "b"]
