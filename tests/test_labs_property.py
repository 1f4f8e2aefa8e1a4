"""Property-based tests (SURVEY.md §5.4) for the lab value[x] tagged union:
for ANY input string exactly one branch of the dispatch fires, the tag
agrees with which typed fields are populated, and numeric branches
round-trip through a pure-Python mirror of the reference regexes
(cnics_to_fhir.py:804-827)."""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from cnics_to_fhir_spark.functions import labs

INT_RE = re.compile("^" + labs.INTEGER_RE + "$")
RANGE_RE = re.compile("^" + labs.RANGE_RE + "$")
DEC_RE = re.compile("^" + labs.DECIMAL_RE + "$")
CMP_RE = re.compile("^" + labs.COMPARATOR_RE + labs.DECIMAL_RE + "$")


def ref_tag(s: str) -> str:
    """Pure-Python mirror of the dispatch order."""
    if INT_RE.match(s):
        return "valueInteger"
    if RANGE_RE.match(s):
        return "valueRange"
    if DEC_RE.match(s) or CMP_RE.match(s):
        return "valueQuantity"
    return "valueString"


# Generators: targeted branch inputs + adversarial free-form strings
ints = st.from_regex(r"\A(0|[-+]?[1-9][0-9]{0,8})\Z")
decimals = st.from_regex(r"\A-?(0|[1-9][0-9]{0,6})(\.[0-9]{1,6})?([eE][+-]?[0-9]{1,2})?\Z")
ranges = st.from_regex(r"\A(0|[1-9][0-9]{0,4}) ?- ?(0|[1-9][0-9]{0,4})\Z")
comparators = st.from_regex(r"\A(<|<=|>=|>)-?(0|[1-9][0-9]{0,6})(\.[0-9]{1,4})?\Z")
junk = st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=16)
values = st.one_of(ints, decimals, ranges, comparators, junk)


def _spark_eval(spark, samples: list[str]):
    df = spark.createDataFrame([(s,) for s in samples], ["result"])
    return df.select(
        "result", labs.typed_value_struct(F.col("result")).alias("v")
    ).collect()


@settings(max_examples=12, deadline=None)
@given(st.lists(values, min_size=1, max_size=40, unique=True))
def test_exactly_one_branch_and_tag_consistency(spark, samples):
    for row in _spark_eval(spark, samples):
        s, v = row["result"], row["v"]
        assert v["value_type"] == ref_tag(s), s
        populated = {
            "valueInteger": v["value_integer"] is not None,
            "valueRange": v["value_range_low"] is not None or v["value_range_high"] is not None,
            "valueQuantity": v["value_quantity"] is not None,
            "valueString": v["value_string"] is not None,
        }
        # exactly the tagged branch's fields populated, all others null
        for tag, is_set in populated.items():
            assert is_set == (v["value_type"] == tag), (s, v.asDict())
        # comparator only ever with a comparator-shaped quantity
        if v["value_comparator"] is not None:
            assert v["value_type"] == "valueQuantity" and CMP_RE.match(s), s


@settings(max_examples=10, deadline=None)
@given(st.lists(ints, min_size=1, max_size=40, unique=True))
def test_integer_round_trip(spark, samples):
    for row in _spark_eval(spark, samples):
        assert row["v"]["value_integer"] == int(row["result"].replace(" ", ""))


@settings(max_examples=10, deadline=None)
@given(st.lists(comparators, min_size=1, max_size=40, unique=True))
def test_comparator_round_trip(spark, samples):
    for row in _spark_eval(spark, samples):
        m = CMP_RE.match(row["result"])
        assert row["v"]["value_comparator"] == m.group(1)
        assert abs(row["v"]["value_quantity"] - float(m.group(2))) < 1e-9


@settings(max_examples=10, deadline=None)
@given(st.lists(ranges, min_size=1, max_size=40, unique=True))
def test_range_round_trip(spark, samples):
    for row in _spark_eval(spark, samples):
        m = RANGE_RE.match(row["result"])
        if INT_RE.match(row["result"]):  # e.g. plain int never reaches range
            continue
        assert row["v"]["value_range_low"] == float(m.group(1).replace(" ", ""))
        assert row["v"]["value_range_high"] == float(m.group(2).replace(" ", ""))
