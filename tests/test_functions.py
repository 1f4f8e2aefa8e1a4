"""Golden tests for the scalar transform layer (SURVEY.md §5.2): every
dispatch branch of F1-F3, all 8 race branches, both ethnicity branches, all
3 med statuses, and all 5 lab value types incl. comparator and sci-notation
decimals, unit defaulting, and reference ranges."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cnics_to_fhir_spark.functions import coding, demographics, labs, medications

STD = ["COPD", "Diabetes Mellitus Type 2"]


def _dx(spark, values):
    df = spark.createDataFrame([(v,) for v in values], ["dx"])
    in_std = coding.standard_membership(F.col("dx"), STD)
    return df.select(
        "dx",
        coding.dx_coding_system(F.col("dx"), in_std).alias("system"),
        coding.dx_coding_code(F.col("dx"), in_std).alias("code"),
        coding.dx_coding_display(F.col("dx"), in_std).alias("display"),
    ).collect()


def test_dx_dispatch_branches(spark):
    rows = {r["dx"]: r for r in _dx(
        spark,
        ["E11.9", "J44.1", "250.00", "V02.61", "COPD", "some free text", "V99", "A15"],
    )}
    # ICD-10: ^[A-Z]\d{2} and not ^V (cnics_to_fhir.py:12, :32)
    assert rows["E11.9"]["system"] == coding.ICD10_SYSTEM
    assert rows["E11.9"]["code"] == "E11.9"
    assert rows["A15"]["system"] == coding.ICD10_SYSTEM
    # ICD-9: ^\d{3} or ^V\d{2} (cnics_to_fhir.py:14)
    assert rows["250.00"]["system"] == coding.ICD9_SYSTEM
    assert rows["V02.61"]["system"] == coding.ICD9_SYSTEM
    # V99 matches ^V\d{2} → ICD-9, NOT ICD-10 (the ^V exclusion)
    assert rows["V99"]["system"] == coding.ICD9_SYSTEM
    # standard list (cnics_to_fhir.py:16)
    assert rows["COPD"]["system"] == coding.CNICS_DX_SYSTEM
    assert rows["COPD"]["code"] == "COPD"
    # SNOMED fallback (cnics_to_fhir.py:18-19, :28-29)
    assert rows["some free text"]["system"] == coding.SNOMED_SYSTEM
    assert rows["some free text"]["code"] == "404684003"
    assert rows["some free text"]["display"] == "Clinical finding (finding): some free text"


def test_dx_category_maps(spark):
    df = spark.createDataFrame(
        [(k,) for k in coding.DX_TO_CATEGORY], ["t"]
    ).select(
        "t",
        coding.dx_category(F.col("t")).alias("cat"),
        coding.dx_verification_status(F.col("t")).alias("ver"),
    )
    for r in df.collect():
        assert r["cat"] == coding.DX_TO_CATEGORY[r["t"]]
        assert r["ver"] == coding.DX_TO_VERIFICATION_STATUS[r["t"]]


def test_race_branches(spark):
    df = spark.createDataFrame(
        [(k,) for k in demographics.RACE_MAP] + [("Nonsense",), (None,)], ["race"]
    )
    out = {r["race"]: r for r in df.select(
        "race", demographics.race_coding(F.col("race")).alias("rc")
    ).collect()}
    for k, (code, display) in demographics.RACE_MAP.items():
        assert out[k]["rc"]["code"] == code and out[k]["rc"]["display"] == display
    assert out["Nonsense"]["rc"] is None  # unmapped → no extension (:444-468)
    assert out[None]["rc"] is None


def test_ethnicity_and_sex(spark):
    df = spark.createDataFrame(
        [("Yes", "Female"), ("No", "Male"), (None, "Unknown")], ["h", "s"]
    )
    rows = df.select(
        demographics.ethnicity_coding(F.col("h")).alias("e"),
        demographics.birth_sex_code(F.col("s")).alias("bs"),
        demographics.gender(F.col("s")).alias("g"),
    ).collect()
    assert rows[0]["e"]["code"] == "2135-2" and rows[0]["bs"] == "F" and rows[0]["g"] == "female"
    assert rows[1]["e"]["code"] == "2186-5" and rows[1]["bs"] == "M" and rows[1]["g"] == "male"
    assert rows[2]["e"] is None and rows[2]["bs"] is None and rows[2]["g"] is None


def test_med_status(spark):
    import datetime

    d = datetime.date(2020, 1, 1)
    df = spark.createDataFrame(
        [(None, None), (d, d), (d, None), (None, d)], ["start", "end"]
    )
    out = [r["st"] for r in df.select(
        medications.med_status(F.col("start"), F.col("end")).alias("st")
    ).collect()]
    # (start,end): (null,·)→unknown; (set,set)→stopped; (set,null)→active
    # end_date ignored when start is null (cnics_to_fhir.py:41-46)
    assert out == ["unknown", "stopped", "active", "unknown"]


@pytest.mark.parametrize(
    "result,vtype,ival,qval,cmp_,lo,hi,sval",
    [
        ("42", "valueInteger", 42, None, None, None, None, None),
        ("0", "valueInteger", 0, None, None, None, None, None),
        ("+ 3", "valueInteger", 3, None, None, None, None, None),
        ("4-6", "valueRange", None, None, None, 4.0, 6.0, None),
        ("5.7", "valueQuantity", None, 5.7, None, None, None, None),
        ("1e5", "valueQuantity", None, 100000.0, None, None, None, None),
        ("-0.5", "valueQuantity", None, -0.5, None, None, None, None),
        ("<7.0", "valueQuantity", None, 7.0, "<", None, None, None),
        (">=6.5", "valueQuantity", None, 6.5, ">=", None, None, None),
        ("POSITIVE", "valueString", None, None, None, None, None, "POSITIVE"),
        ("00", "valueString", None, None, None, None, None, "00"),
        # '-0' fails integer_re (sign needs [1-9]) but matches decimal_re
        ("-0", "valueQuantity", None, -0.0, None, None, None, None),
        ("+5.7", "valueString", None, None, None, None, None, "+5.7"),
    ],
)
def test_lab_value_typing(spark, result, vtype, ival, qval, cmp_, lo, hi, sval):
    df = spark.createDataFrame([(result,)], ["r"])
    v = df.select(labs.typed_value_struct(F.col("r")).alias("v")).collect()[0]["v"]
    assert v["value_type"] == vtype
    assert v["value_integer"] == ival
    assert v["value_quantity"] == qval
    assert v["value_comparator"] == cmp_
    assert v["value_range_low"] == lo
    assert v["value_range_high"] == hi
    assert v["value_string"] == sval


def test_unit_default_and_refrange(spark):
    df = spark.createDataFrame(
        [(None, "3.5", "bad"), ("mg/dL", None, "7.5")], ["u", "lo", "hi"]
    )
    rows = df.select(
        labs.effective_unit(F.col("u")).alias("unit"),
        labs.ref_range_value(F.col("lo")).alias("lo"),
        labs.ref_range_value(F.col("hi")).alias("hi"),
    ).collect()
    assert rows[0]["unit"] == "%" and rows[0]["lo"] == 3.5 and rows[0]["hi"] is None
    assert rows[1]["unit"] == "mg/dL" and rows[1]["lo"] is None and rows[1]["hi"] == 7.5


def test_med_code_double_space(spark):
    df = spark.createDataFrame([("DRUG  NAME",), ("A   B",)], ["m"])
    out = [r["c"] for r in df.select(medications.med_code(F.col("m")).alias("c")).collect()]
    assert out[0] == "DRUG NAME"
    assert out[1] == "A  B"  # one non-overlapping pass, like str.replace
